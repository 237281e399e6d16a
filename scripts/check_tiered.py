#!/usr/bin/env python3
"""Tiered oracle compare for LARGE synthetic scale points (sf10+).

Same canonicalization/hash contract as check.py (the driver gate), but
each oracle runs in a kill-able subprocess with a wall-clock budget:
a query whose DuckDB replay outgrows the budget at this scale is
recorded EXPLICITLY as tier "rows_slope" (engine row count + slope vs
a reference record) instead of silently skipped — the VERDICT r9 #1
"tier each query explicitly, no silent skips" contract.

Usage:
  check_tiered.py <sfDir> <verifyOutDir> <outJson>
      [--timeout SECONDS] [--ref REFERENCE_JSON] [--label LABEL]

Tiers emitted per query:
  compare     — DuckDB replay ran; rows+schema+hash verdict recorded
  rows_slope  — oracle exceeded the budget (or DuckDB OOM'd); engine
                rows recorded, slope computed against --ref's rows
  certificate — named in CERTIFICATE_QUERIES; checked by its own
                certificate script, recorded here by reference
  rows_only   — no oracle SQL exists (sketch/tokenizer surfaces)
"""
import sys, os, json, math, time, queue
import multiprocessing as mp

CERTIFICATE_QUERIES = {
    # oracle's recursive pair-closure is quadratic in component size;
    # checked by the linear labeling certificate instead
    "mm_crossmodal_keep_list",  # scripts/check_crossmodal.py
    "dd_keep_list",             # scripts/check_keeplist.py
    "dd_dup_clusters",          # scripts/check_keeplist.py
    "dd_quality_keep_list",     # scripts/check_keeplist.py
    "mm_phash_keep_list",       # scripts/check_keeplist.py
    "dd_cluster_stats",         # scripts/check_keeplist.py (aggregation
                                # of the certified cluster table)
    "t_corpus_yield",           # scripts/check_keeplist.py (oracle's own
                                # linear tail over the certified keepers)
}

def canon(df):
    import pandas as pd
    df = df.reindex(sorted(df.columns), axis=1)
    def norm(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return f"{v:.6g}"
        if isinstance(v, list):
            return tuple(norm(x) for x in v)
        try:
            import numpy as np
            if isinstance(v, np.ndarray):
                return tuple(norm(x) for x in v.tolist())
            if isinstance(v, (np.floating,)):
                return norm(float(v))
            if isinstance(v, (np.integer,)):
                return int(v)
        except ImportError:
            pass
        return v
    out = df.map(norm)
    return out.sort_values(by=list(out.columns),
                           key=lambda s: s.map(repr)).reset_index(drop=True)

def views_sql(sf_dir):
    stmts = []
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            src = f"read_parquet('{p}/*.parquet')"
            stmts.append((t, src))
        elif os.path.exists(p):
            stmts.append((t, f"read_parquet('{p}')"))
    return stmts

def native_set_compare(con, sql, spark_path):
    """Full-strength set-equality compare executed ENTIRELY inside
    DuckDB — no pandas. The r10 sweep proved the per-cell Python canon
    (float printf + repr sort) is the bottleneck above ~1M rows, not
    the oracle SQL: q_cdc_events/q_cdc_scd2/q_window_functions sat in
    rows_slope with sub-minute oracles because canon() alone needed
    100M+ interpreter calls. This path applies the SAME normalization
    contract (floats to 6 significant digits, NaN pinned, columns
    sorted by name) symmetrically to both sides via printf inside
    DuckDB, then compares as bags with two EXCEPT ALLs — hash-based,
    multithreaded, no global sort. A pass here is rows+schema+values
    equality, the same strength as the pandas path."""
    con.execute(f"CREATE OR REPLACE TEMP TABLE wn_raw AS {sql}")
    con.execute("CREATE OR REPLACE TEMP TABLE gn_raw AS "
                f"SELECT * FROM read_parquet('{spark_path}/*.parquet')")
    wcols = {r[0]: r[1] for r in con.execute("DESCRIBE wn_raw").fetchall()}
    gcols = {r[0]: r[1] for r in con.execute("DESCRIBE gn_raw").fetchall()}
    if sorted(wcols) != sorted(gcols):
        return {"status": "mismatch",
                "detail": f"schema {sorted(gcols)} vs {sorted(wcols)}"}
    wrows = con.execute("SELECT count(*) FROM wn_raw").fetchone()[0]
    grows = con.execute("SELECT count(*) FROM gn_raw").fetchone()[0]
    if wrows != grows:
        return {"status": "mismatch", "detail": f"rows {grows} vs {wrows}"}

    def norm_expr(c, t_want, t_got):
        ts = (t_want, t_got)
        quoted = f'"{c}"'
        def is_float(t):
            return t in ("FLOAT", "DOUBLE") or t.startswith("DECIMAL")
        if any(is_float(t) for t in ts):
            # NULL pins to 'NaN' to match the pandas tier exactly:
            # fetchdf turns SQL NULL into NaN, so canon() conflates the
            # two — without the IS NULL arm this tier would be STRICTER
            # than the driver gate and the verdict would depend on
            # which tier ran (ADVICE r11)
            return (f"CASE WHEN {quoted} IS NULL THEN 'NaN' "
                    f"WHEN isnan(CAST({quoted} AS DOUBLE)) THEN 'NaN' "
                    f"ELSE printf('%.6g', CAST({quoted} AS DOUBLE)) END "
                    f"AS {quoted}")
        ints = ("TINYINT", "SMALLINT", "INTEGER", "BIGINT", "HUGEINT",
                "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT")
        if all(t in ints for t in ts):
            return f"CAST({quoted} AS HUGEINT) AS {quoted}"
        if any(t.endswith("[]") for t in ts):
            inner = ts[0][:-2] if ts[0].endswith("[]") else ts[1][:-2]
            if is_float(inner):
                return (f"list_transform({quoted}, x -> CASE WHEN "
                        f"x IS NULL THEN 'NaN' WHEN "
                        f"isnan(CAST(x AS DOUBLE)) THEN 'NaN' ELSE "
                        f"printf('%.6g', CAST(x AS DOUBLE)) END) AS {quoted}")
            ints_inner = all(t[:-2] in ints for t in ts if t.endswith("[]"))
            if ints_inner:
                return f"CAST({quoted} AS BIGINT[]) AS {quoted}"
            # VARCHAR[]/struct-list columns pass through unchanged: a
            # forced BIGINT[] cast throws, the throw was caught as
            # oracle_error, and the query silently downgraded to
            # rows_slope even though the oracle was fine (ADVICE r11)
            return f"{quoted} AS {quoted}"
        if any(t.startswith("TIMESTAMP") for t in ts):
            return f"CAST(CAST({quoted} AS TIMESTAMP) AS VARCHAR) AS {quoted}"
        return f"{quoted} AS {quoted}"

    sel = ", ".join(norm_expr(c, wcols[c], gcols[c]) for c in sorted(wcols))
    con.execute(f"CREATE OR REPLACE TEMP TABLE wn AS SELECT {sel} FROM wn_raw")
    con.execute(f"CREATE OR REPLACE TEMP TABLE gn AS SELECT {sel} FROM gn_raw")
    ndiff = con.execute(
        "SELECT count(*) FROM ("
        "(SELECT * FROM wn EXCEPT ALL SELECT * FROM gn) UNION ALL "
        "(SELECT * FROM gn EXCEPT ALL SELECT * FROM wn))").fetchone()[0]
    if ndiff:
        sample = con.execute(
            "SELECT * FROM (SELECT * FROM gn EXCEPT ALL SELECT * FROM wn) "
            "LIMIT 2").fetchall()
        return {"status": "mismatch",
                "detail": f"{ndiff} bag-diff rows; spark-only sample: "
                          f"{sample}"[:300]}
    return {"status": "match", "rows": grows, "method": "duckdb_native"}


def tolerance_proc(sf_dir, out_dir, name, q):
    """Subprocess: tolerance-tier compare (VERDICT r13 #6) for the
    sketch surfaces with no cross-engine hash form — approx value
    gated inside its documented error envelope of the exact twin's
    DuckDB-computed value. Logic shared with check.py (the sf0.01
    pre-check), so the envelope definition exists exactly once."""
    try:
        import duckdb, check
        con = duckdb.connect()
        con.execute(f"SET temp_directory='/tmp/duckdb_tiered_{os.getpid()}'")
        con.execute(f"SET threads={os.environ.get('DUCKDB_THREADS', '16')}")
        con.execute(
            f"SET memory_limit='{os.environ.get('DUCKDB_MEM', '48GB')}'")
        con.execute("SET preserve_insertion_order=false")
        for t, src in views_sql(sf_dir):
            if t == "events":
                ts_t = con.execute(
                    f"SELECT typeof(ts) FROM {src} LIMIT 1").fetchone()[0]
                if ts_t == "BIGINT":
                    src = (f"(SELECT * REPLACE (make_timestamp(ts // 1000)"
                           f" AS ts) FROM {src})")
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM {src}")
        oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
        r = check.tolerance_check(con, out_dir, oracles, name)
        if r is None:
            q.put({"status": "not_applicable"})
        else:
            q.put({"status": "tol_ok" if r[0] else "tol_fail",
                   "detail": r[1]})
    except Exception as e:
        q.put({"status": "oracle_error", "detail": str(e)[:300]})


def oracle_proc(sf_dir, sql, spark_path, q, got_rows=0):
    """Subprocess: run one oracle + compare; put verdict on the queue."""
    try:
        import duckdb, pandas as pd
        con = duckdb.connect()
        con.execute(f"SET temp_directory='/tmp/duckdb_tiered_{os.getpid()}'")
        con.execute(f"SET threads={os.environ.get('DUCKDB_THREADS', '16')}")
        # spill instead of dying: an unbounded resident set let the
        # sf10 sim_ivfpq training-replay oracle OOM-kill its subprocess
        con.execute(
            f"SET memory_limit='{os.environ.get('DUCKDB_MEM', '48GB')}'")
        # the compare canonicalizes (sorted hash / set compare), so
        # result order never matters — and ordered materialization
        # buffering is what pushed the big sf10 oracles past the /tmp
        # spill budget (same lesson as the certificate scripts)
        con.execute("SET preserve_insertion_order=false")
        for t, src in views_sql(sf_dir):
            if t == "events":
                ts_t = con.execute(
                    f"SELECT typeof(ts) FROM {src} LIMIT 1").fetchone()[0]
                if ts_t == "BIGINT":
                    src = (f"(SELECT * REPLACE (make_timestamp(ts // 1000)"
                           f" AS ts) FROM {src})")
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM {src}")
        native_above = int(os.environ.get("NATIVE_CMP_ABOVE", "200000"))
        if got_rows > native_above:
            q.put(native_set_compare(con, sql, spark_path))
            return
        want = canon(con.execute(sql).fetchdf())
        got = canon(pd.read_parquet(spark_path))
        if list(want.columns) != list(got.columns):
            q.put({"status": "mismatch",
                   "detail": f"schema {list(got.columns)} vs {list(want.columns)}"})
        elif len(want) != len(got):
            q.put({"status": "mismatch",
                   "detail": f"rows {len(got)} vs {len(want)}"})
        elif not want.equals(got):
            q.put({"status": "mismatch", "detail": "values differ"})
        else:
            q.put({"status": "match", "rows": len(got)})
    except Exception as e:
        q.put({"status": "oracle_error", "detail": str(e)[:300]})

def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    opts = {}
    argv = sys.argv[1:]
    for i, a in enumerate(argv):
        if a.startswith("--"):
            nxt = argv[i + 1] if i + 1 < len(argv) else ""
            # valueless flags (e.g. --compare-certs) map to ""
            opts[a[2:]] = "" if nxt.startswith("--") or nxt == "" else nxt
    sf_dir, out_dir, out_json = args[0], args[1], args[2]
    budget = float(opts.get("timeout", 600))
    label = opts.get("label", sf_dir)
    ref = {}
    if "ref" in opts:
        ref = json.load(open(opts["ref"])).get("queries", {})

    import pandas as pd
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    all_queries = sorted(
        d for d in os.listdir(out_dir)
        if os.path.isdir(os.path.join(out_dir, d)))
    # --shard i/n: process only this stripe (parallel instances each
    # write their own out_json; merge with merge_tiered.py)
    if "shard" in opts:
        i, n = map(int, opts["shard"].split("/"))
        all_queries = [q for k, q in enumerate(all_queries) if k % n == i]
    results = {}
    counts = {"match": 0, "mismatch": 0, "rows_slope": 0,
              "rows_only": 0, "tolerance": 0, "certificate": 0, "missing": 0,
              "oracle_error": 0}

    for name in all_queries:
        spark_path = f"{out_dir}/{name}"
        t0 = time.time()
        try:
            got_rows = len(pd.read_parquet(spark_path))
        except Exception as e:
            results[name] = {"tier": "missing", "detail": str(e)[:200]}
            counts["missing"] += 1
            print(f"MISSING  {name}")
            continue
        slope = None
        if name in ref and ref[name].get("rows"):
            slope = round(got_rows / ref[name]["rows"], 2)
        # --compare-certs: at scales where the closure oracle still fits
        # the budget (sf1), run the FULL compare for certificate queries
        # too — the certificate tier is for the scale where the closure
        # representation, not the engine, is the super-linear stage
        if name in CERTIFICATE_QUERIES and "compare-certs" not in opts:
            script = ("check_crossmodal.py" if name == "mm_crossmodal_keep_list"
                      else "check_keeplist.py")
            results[name] = {"tier": "certificate", "rows": got_rows,
                             "slope_vs_ref": slope,
                             "detail": f"checked by scripts/{script} — "
                                       "protocol in CERTIFICATES.md"}
            counts["certificate"] += 1
            print(f"CERT     {name} ({got_rows} rows)")
            continue
        if name not in oracles:
            # sketch surfaces with an exact twin upgrade to the
            # quantitative tolerance tier (VERDICT r13 #6); budget
            # blowout downgrades to rows_only EXPLICITLY, like the
            # compare tier's rows_slope contract
            import check as _check
            if name in _check.TOLERANCE_QUERIES:
                q = mp.Queue()
                p = mp.Process(target=tolerance_proc,
                               args=(sf_dir, out_dir, name, q))
                p.start()
                p.join(budget)
                verdict = {"status": "not_applicable"}
                if p.is_alive():
                    p.terminate()
                    p.join()
                    import shutil
                    shutil.rmtree(f"/tmp/duckdb_tiered_{p.pid}",
                                  ignore_errors=True)
                    verdict = {"status": "budget"}
                else:
                    try:
                        verdict = q.get(timeout=5)
                    except queue.Empty:
                        verdict = {"status": "oracle_error",
                                   "detail": "subprocess died (OOM?)"}
                        # reap the dead child's DuckDB spill on the
                        # OOM path too, mirroring the compare tier's
                        # oracle_error rmtree (ADVICE r14 — the
                        # q_table_profile twin at sf10 can spill
                        # before dying and ENOSPC later oracles)
                        import shutil
                        shutil.rmtree(f"/tmp/duckdb_tiered_{p.pid}",
                                      ignore_errors=True)
                sec = round(time.time() - t0, 1)
                if verdict["status"] in ("tol_ok", "tol_fail"):
                    ok = verdict["status"] == "tol_ok"
                    results[name] = {"tier": "tolerance", "match": ok,
                                     "rows": got_rows,
                                     "slope_vs_ref": slope,
                                     "oracle_sec": sec,
                                     "detail": verdict["detail"]}
                    counts["tolerance" if ok else "mismatch"] += 1
                    print(f"{'OK~' if ok else 'MISMATCH'}      {name} "
                          f"(tolerance: {verdict['detail']}, {sec}s)")
                    continue
                # budget / twin-oracle error: record the downgrade
                # reason instead of silently reading as rows_only
                results[name] = {"tier": "rows_only", "rows": got_rows,
                                 "slope_vs_ref": slope,
                                 "detail": "tolerance tier unavailable: "
                                           + verdict.get("detail",
                                                         verdict["status"])}
                counts["rows_only"] += 1
                print(f"ROWSONLY {name} ({got_rows} rows) [tolerance "
                      f"unavailable: {verdict['status']}]")
                continue
            results[name] = {"tier": "rows_only", "rows": got_rows,
                             "slope_vs_ref": slope}
            counts["rows_only"] += 1
            print(f"ROWSONLY {name} ({got_rows} rows)")
            continue

        q = mp.Queue()
        p = mp.Process(target=oracle_proc,
                       args=(sf_dir, oracles[name], spark_path, q, got_rows))
        p.start()
        p.join(budget)
        if p.is_alive():
            p.terminate()
            p.join()
            # reap the dead child's DuckDB spill: terminate() skips its
            # in-process cleanup, and a 2400s budget kill can leave
            # ~70GB of temp storage that ENOSPCs every later oracle in
            # the sweep (observed at sf10, round 11)
            import shutil
            shutil.rmtree(f"/tmp/duckdb_tiered_{p.pid}",
                          ignore_errors=True)
            results[name] = {"tier": "rows_slope", "rows": got_rows,
                             "slope_vs_ref": slope,
                             "detail": f"oracle exceeded {budget:.0f}s budget"}
            counts["rows_slope"] += 1
            print(f"SLOPE    {name} ({got_rows} rows, slope {slope}) "
                  f"[oracle > {budget:.0f}s]")
            continue
        # q.get with a timeout, NOT q.empty(): the feeder thread of a
        # mp.Queue can still be flushing when the child exits, so
        # empty() can transiently report True for a queue that is about
        # to deliver the verdict — mislabeling a successful compare as
        # a dead subprocess (ADVICE r10).
        try:
            verdict = q.get(timeout=5)
        except queue.Empty:
            verdict = {"status": "oracle_error",
                       "detail": "subprocess died (OOM?)"}
        if verdict["status"] == "oracle_error":
            # reap the child's DuckDB spill on THIS path too: an
            # OOM/SIGKILL'd child skips DuckDB's temp cleanup exactly
            # like the budget terminate() above, and a caught-exception
            # child may still have spilled before raising (ADVICE r11)
            import shutil
            shutil.rmtree(f"/tmp/duckdb_tiered_{p.pid}", ignore_errors=True)
        sec = round(time.time() - t0, 1)
        if verdict["status"] == "match":
            results[name] = {"tier": "compare", "match": True,
                             "rows": got_rows, "slope_vs_ref": slope,
                             "oracle_sec": sec}
            if verdict.get("method"):
                results[name]["method"] = verdict["method"]
            counts["match"] += 1
            print(f"OK       {name} ({got_rows} rows, {sec}s"
                  f"{', ' + verdict['method'] if verdict.get('method') else ''})")
        elif verdict["status"] == "oracle_error":
            results[name] = {"tier": "rows_slope", "rows": got_rows,
                             "slope_vs_ref": slope,
                             "detail": "oracle failed at this scale: "
                                       + verdict.get("detail", "")}
            counts["rows_slope"] += 1
            print(f"SLOPE    {name} ({got_rows} rows) [oracle error: "
                  f"{verdict.get('detail','')[:120]}]")
        else:
            results[name] = {"tier": "compare", "match": False,
                             "rows": got_rows,
                             "detail": verdict.get("detail", "")}
            counts["mismatch"] += 1
            print(f"MISMATCH {name}: {verdict.get('detail','')}")

    doc = {
        "sf": label,
        "protocol": (
            "graft.Verify engine dump -> tiered DuckDB compare "
            f"(per-oracle budget {budget:.0f}s, canonicalization identical "
            "to the driver gate). Tier 'compare' = full rows+schema+hash; "
            "'rows_slope' = oracle compare-bound at this scale, engine "
            "rows + slope vs the reference record stand in; "
            "'certificate' = dedicated certificate script; 'tolerance' = "
            "sketch value gated inside its documented error envelope of "
            "the exact twin's DuckDB value (measured deviation recorded); "
            "'rows_only' = no SQL oracle or tolerance form exists "
            "(tokenizer surface, spec-gated by an exact twin)."),
        "counts": counts,
        "queries": results,
    }
    with open(out_json, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
    print(f"\n{counts}")
    ok = counts["mismatch"] == 0 and counts["missing"] == 0
    sys.exit(0 if ok else 1)

if __name__ == "__main__":
    main()
