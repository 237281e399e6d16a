#!/usr/bin/env python3
"""Certificate-check oracle for mm_crossmodal_keep_list at big SFs.

Usage: python3 scripts/check_crossmodal.py <sfDir> <verifyOutDir>

Why this exists: the driver-gate oracle (oracle_sql.json, run
unchanged at sf0.01/sf0.1) recomputes the keep-list with a recursive
transitive-closure CTE — (src, dst) PAIRS for every reachable pair.
That is quadratic in component size, and the synthetic sf1 corpus
(10 near-duplicate replicas per doc, chained across both sketch
modalities) produces a giant component of ~36k of 50k assets:
~1.3e9 closure rows, >100 min of DuckDB CPU (round 7 recorded the
compare as `pending` for exactly this reason). The ENGINE is linear
(min-label propagation, O(E * diameter)); only the ORACLE
REPRESENTATION was quadratic.

This script replaces recomputation with a certificate check of equal
strength, all derivation still independent (DuckDB):

 - The edge set E, vis-dup set and txt-dup set are derived by DuckDB
   from the raw documents table using the SAME namespaced sketch /
   banding / theta-verify CTE chain as the driver-gate oracle (the
   SQL text is read from oracle_sql.json and truncated before the
   closure stage, so the two tiers can never drift).
 - The Spark output (doc_id, keep, dup_of, vis_dup, txt_dup) is then
   PROVEN to be the unique minimal connected-component labeling of E:
     (a) exactly one verdict row per document;
     (b) vis_dup / txt_dup flags equal DuckDB's sets;
     (c) keep <=> dup_of IS NULL (one decision, one pointer);
     (d) every edge (x, y) in E has label(x) == label(y), where
         label(v) = coalesce(dup_of, doc_id)  [no component is ever
         SPLIT across labels — kills under-merge];
     (e) every referenced label l labels itself (dup_of null) and is
         the MINIMUM doc_id of its label group [minimality];
     (f) every labeled member is REACHABLE from its label's keeper in
         E [no two true components ever share a label — kills
         over-merge]. Reachability runs as a vertex-frontier
         recursive CTE seeded at the keepers: the working set is
         (seed, node) rows, which under a correct labeling is exactly
         one row per node — linear, never the pair closure.
   Given (d), labels are constant on components; given (f), each
   label group lies inside ONE component; so label groups ARE the
   components, and (e) pins each label to the component minimum —
   which is precisely the engine's definition. Any deviation flips at
   least one check, so pass == hash-equality with the full
   recompute, at O(E * diameter) instead of O(sum |C|^2).
"""
import sys, os, json, time
import duckdb


def main(sf_dir, out_dir):
    con = duckdb.connect()
    # keep spill out of the CWD (an unset temp_directory spills to
    # ./.tmp — at sf10 that filled the repo volume) and bound the
    # resident set so big derivations spill instead of OOM-killing
    con.execute(f"SET temp_directory='/tmp/duckdb_crossmodal_{os.getpid()}'")
    con.execute(f"SET threads={os.environ.get('DUCKDB_THREADS', '16')}")
    con.execute(
        f"SET memory_limit='{os.environ.get('DUCKDB_MEM', '48GB')}'")
    # the cert only checks SET membership — don't pay ordered
    # materialization buffering on the 36M-edge temp tables
    con.execute("SET preserve_insertion_order=false")
    doc_path = f"{sf_dir}/documents.parquet"
    src = (f"read_parquet('{doc_path}/*.parquet')" if os.path.isdir(doc_path)
           else f"read_parquet('{doc_path}')")
    con.execute(f"CREATE VIEW documents AS SELECT * FROM {src}")

    sql = json.load(open(f"{out_dir}/oracle_sql.json"))["mm_crossmodal_keep_list"]
    # CTE chain through dedges, skipping the quadratic closure stage;
    # vd/td sit after the closure in the oracle text, so re-attach them
    withs = sql[:sql.index("reach AS (")].rstrip().rstrip(",")
    vdtd = sql[sql.index("vd AS ("):sql.rindex("SELECT d.doc_id")] \
        .rstrip().rstrip(",")
    withs = withs + ",\n" + vdtd

    t0 = time.time()
    con.execute(f"CREATE TEMP TABLE E AS {withs} SELECT src, dst FROM dedges")
    con.execute(f"CREATE TEMP TABLE VD AS {withs} SELECT doc_id FROM vd")
    con.execute(f"CREATE TEMP TABLE TD AS {withs} SELECT doc_id FROM td")
    n_edges = con.execute("SELECT count(*) FROM E").fetchone()[0]
    print(f"[cert] independent edge derivation: {n_edges} directed edges "
          f"in {time.time() - t0:.0f}s")

    spark_dir = f"{out_dir}/mm_crossmodal_keep_list"
    con.execute("CREATE TEMP TABLE O AS SELECT * FROM "
                f"read_parquet('{spark_dir}/*.parquet')")
    # compact label table + undirected half of E (sf10 lesson, same
    # as check_keeplist): the label checks need each edge once and a
    # 2-int label row, which keeps the 36M-edge join streaming
    # instead of spilling past the disk budget
    con.execute("""CREATE TEMP TABLE LAB AS
        SELECT doc_id, coalesce(dup_of, doc_id) AS l FROM O""")
    con.execute("CREATE TEMP TABLE EH AS "
                "SELECT src, dst FROM E WHERE src < dst")

    fails = []

    def check(name, bad_sql, expect_zero=True):
        n = con.execute(bad_sql).fetchone()[0]
        ok = (n == 0) if expect_zero else (n != 0)
        print(f"[cert] {name}: {'OK' if ok else f'FAIL ({n})'}")
        if not ok:
            fails.append(name)

    # (a) one verdict per document
    check("one row per doc", """
        SELECT count(*) FROM (
          SELECT doc_id FROM O GROUP BY doc_id HAVING count(*) <> 1
          UNION ALL
          SELECT d.doc_id FROM documents d LEFT JOIN O USING (doc_id)
          WHERE O.doc_id IS NULL
          UNION ALL
          SELECT o.doc_id FROM O o LEFT JOIN documents d USING (doc_id)
          WHERE d.doc_id IS NULL)""")
    # (b) flags
    check("vis_dup flags", """
        SELECT count(*) FROM O
        LEFT JOIN VD USING (doc_id)
        WHERE O.vis_dup <> (VD.doc_id IS NOT NULL)""")
    check("txt_dup flags", """
        SELECT count(*) FROM O
        LEFT JOIN TD USING (doc_id)
        WHERE O.txt_dup <> (TD.doc_id IS NOT NULL)""")
    # (c) keep <=> dup_of null
    check("keep/dup_of coherence",
          "SELECT count(*) FROM O WHERE keep <> (dup_of IS NULL)")
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
    # (f) every labeled member reachable from its keeper
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

    n_rows = con.execute("SELECT count(*) FROM O").fetchone()[0]
    if fails:
        print(f"\nCERT FAIL mm_crossmodal_keep_list: {fails}")
        return 1
    print(f"\nCERT OK mm_crossmodal_keep_list ({n_rows} rows, "
          f"{n_edges} edges, all 7 checks)")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
