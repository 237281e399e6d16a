#!/usr/bin/env python3
"""Certificate-check oracle for dd_keep_list at big SFs.

Usage: python3 scripts/check_keeplist.py <sfDir> <verifyOutDir>

Why this exists: the driver-gate oracle (oracle_sql.json, run
unchanged at sf0.01/sf0.1) recomputes the near-dup clustering with a
recursive transitive-closure CTE over (src, dst) PAIRS — quadratic in
component size. The synthetic corpus plants ~10 near-duplicate
replicas per duplicated doc, so at sf10 (500k docs) the closure is
the one super-linear stage; the ENGINE is linear (min-label
propagation). Same situation — and same remedy — as
mm_crossmodal_keep_list (scripts/check_crossmodal.py): replace the
closure with a certificate of equal strength, every ingredient still
derived independently by DuckDB.

 - The candidate edge set E is derived by DuckDB from raw documents
   using the SAME minhash/banding CTE chain as the driver-gate oracle
   (SQL text read from oracle_sql.json, truncated before the closure
   stage — the two tiers can never drift).
 - The exact-fingerprint table (md5 of normalized text) and its
   per-group canonical minimum are derived directly (linear).
 - The Spark output (doc_id, keep, reason, dup_of) is then PROVEN to
   be the unique minimal connected-component labeling of E plus the
   keep/reason decoration dd_keep_list defines:
     (a) exactly one verdict row per corpus document;
     (b) keep <=> dup_of IS NULL, and reason = 'keep' <=> keep;
     (c) every DROPPED doc's reason matches DuckDB's exact-canonical
         computation ('exact_dup' iff doc_id <> min of its md5 group,
         'near_dup' otherwise);
     (d) every edge (x, y) in E has label(x) == label(y), where
         label(v) = coalesce(dup_of, doc_id)  [no component split];
     (e) every referenced label labels itself and is the MINIMUM
         doc_id of its label group [minimality];
     (f) every dropped member is REACHABLE from its label's keeper in
         E [no two components share a label — kills over-merge];
     (g) every doc with NO incident E edge keeps itself [isolated
         docs are their own canonical: an exact-dup group of size >= 2
         shares all minhash bands, so it always has E edges — pinned
         by (c)+(g) together].
   By (d) labels are constant on components; by (f) each label group
   lies inside ONE component; by (e) the label is the component
   minimum; by (g) the labeling is the identity off the edge set —
   which is precisely the oracle's clusters+keeper definition. Any
   deviation flips at least one check, so pass == hash-equality with
   the full recompute, at O(E * diameter) instead of the pair closure.
"""
import sys, os, json, time
import duckdb


def main(sf_dir, out_dir):
    con = duckdb.connect()
    con.execute(f"SET temp_directory='/tmp/duckdb_keeplist_{os.getpid()}'")
    con.execute(f"SET threads={os.environ.get('DUCKDB_THREADS', '16')}")
    # bound the resident set so a 70M-edge derivation spills to the
    # temp dir instead of OOM-killing the process (sf10 lesson)
    con.execute(
        f"SET memory_limit='{os.environ.get('DUCKDB_MEM', '48GB')}'")
    doc_path = f"{sf_dir}/documents.parquet"
    src = (f"read_parquet('{doc_path}/*.parquet')" if os.path.isdir(doc_path)
           else f"read_parquet('{doc_path}')")
    con.execute(f"CREATE VIEW documents AS SELECT * FROM {src}")

    sql = json.load(open(f"{out_dir}/oracle_sql.json"))["dd_keep_list"]
    # CTE chain through cand/edges, skipping the quadratic closure
    withs = sql[:sql.index("reach AS (")].rstrip().rstrip(",")

    t0 = time.time()
    con.execute(f"CREATE TEMP TABLE E AS {withs} SELECT src, dst FROM edges")
    n_edges = con.execute("SELECT count(*) FROM E").fetchone()[0]
    print(f"[cert] independent edge derivation: {n_edges} directed edges "
          f"in {time.time() - t0:.0f}s")
    # exact fingerprints + per-group canonical minimum (linear)
    con.execute(f"""CREATE TEMP TABLE FP AS {withs}
        SELECT doc_id, md5(array_to_string(toks, ' ')) AS fp FROM t""")
    con.execute("""CREATE TEMP TABLE CANON AS
        SELECT doc_id, min(doc_id) OVER (PARTITION BY fp)
          AS exact_canonical FROM FP""")

    spark_dir = f"{out_dir}/dd_keep_list"
    con.execute("CREATE TEMP TABLE O AS SELECT * FROM "
                f"read_parquet('{spark_dir}/*.parquet')")
    # compact label table + undirected half of E: the label checks
    # only need each edge once and a 2-int label row, which keeps the
    # 70M-edge joins streaming instead of spilling
    con.execute("""CREATE TEMP TABLE LAB AS
        SELECT doc_id, coalesce(dup_of, doc_id) AS l FROM O""")
    con.execute("CREATE TEMP TABLE EH AS "
                "SELECT src, dst FROM E WHERE src < dst")

    fails = []

    def check(name, bad_sql):
        t0 = time.time()
        n = con.execute(bad_sql).fetchone()[0]
        print(f"[cert] {name}: {'OK' if n == 0 else f'FAIL ({n})'} "
              f"({time.time() - t0:.0f}s)")
        if n:
            fails.append(name)

    # (a) one verdict per corpus document
    check("one row per doc", """
        SELECT count(*) FROM (
          SELECT doc_id FROM O GROUP BY doc_id HAVING count(*) <> 1
          UNION ALL
          SELECT d.doc_id FROM documents d LEFT JOIN O USING (doc_id)
          WHERE O.doc_id IS NULL
          UNION ALL
          SELECT o.doc_id FROM O o LEFT JOIN documents d USING (doc_id)
          WHERE d.doc_id IS NULL)""")
    # (b) one decision, one pointer, coherent reason
    check("keep/dup_of/reason coherence", """
        SELECT count(*) FROM O
        WHERE keep <> (dup_of IS NULL) OR (reason = 'keep') <> keep""")
    # (c) dropped reasons match the independent exact-canonical
    check("dropped reason vs md5 canonical", """
        SELECT count(*) FROM O JOIN CANON USING (doc_id)
        WHERE NOT O.keep AND O.reason <>
          (CASE WHEN O.doc_id <> CANON.exact_canonical
                THEN 'exact_dup' ELSE 'near_dup' END)""")
    # (d) labels constant across every edge (undirected half suffices)
    check("edge label consistency", """
        SELECT count(*) FROM EH
        JOIN LAB a ON a.doc_id = EH.src
        JOIN LAB b ON b.doc_id = EH.dst
        WHERE a.l <> b.l""")
    # (e) every referenced label keeps itself and is its group minimum
    check("label minimality", """
        WITH lab AS (
          SELECT doc_id, coalesce(dup_of, doc_id) AS l FROM O)
        SELECT count(*) FROM (
          SELECT l FROM lab GROUP BY l HAVING min(doc_id) <> l
          UNION ALL
          SELECT o.dup_of FROM (SELECT DISTINCT dup_of FROM O
                                WHERE dup_of IS NOT NULL) r
          JOIN O o ON o.doc_id = r.dup_of WHERE o.dup_of IS NOT NULL)""")
    # (f) every dropped member reachable from its keeper
    t0 = time.time()
    check("keeper reachability (no over-merge)", """
        WITH RECURSIVE seeds AS (
          SELECT DISTINCT dup_of AS seed FROM O WHERE dup_of IS NOT NULL),
        r AS (
          SELECT seed, seed AS node FROM seeds
          UNION
          SELECT r.seed, E.dst AS node FROM r JOIN E ON E.src = r.node)
        SELECT count(*) FROM O
        LEFT JOIN r ON r.seed = O.dup_of AND r.node = O.doc_id
        WHERE O.dup_of IS NOT NULL AND r.node IS NULL""")
    print(f"[cert] reachability fixpoint in {time.time() - t0:.0f}s")
    # (g) isolated docs keep themselves
    check("isolated docs keep", """
        SELECT count(*) FROM O
        LEFT JOIN (SELECT DISTINCT src FROM E) e ON e.src = O.doc_id
        WHERE e.src IS NULL AND NOT O.keep""")

    n_rows = con.execute("SELECT count(*) FROM O").fetchone()[0]
    if fails:
        print(f"\nCERT FAIL dd_keep_list: {fails}")
        return 1
    print(f"\nCERT OK dd_keep_list ({n_rows} rows, {n_edges} edges, "
          f"all 7 checks)")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
