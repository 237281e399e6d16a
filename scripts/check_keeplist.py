#!/usr/bin/env python3
"""Certificate-check oracle for the cluster/keeper-shaped queries at
big SFs: dd_keep_list, dd_dup_clusters, dd_quality_keep_list and
mm_phash_keep_list.

Usage: python3 scripts/check_keeplist.py <sfDir> <verifyOutDir> [query ...]
       (default: dd_keep_list; several names share one edge derivation)

Why this exists: the driver-gate oracles (oracle_sql.json, run
unchanged at sf0.01/sf0.1) recompute the near-dup clustering with a
recursive transitive-closure CTE over (src, dst) PAIRS — quadratic in
component size. The synthetic corpus plants ~10 near-duplicate
replicas per duplicated doc, so at sf10 (500k docs) the closure is
the one super-linear stage; the ENGINE is linear (min-label
propagation). Same situation — and same remedy — as
mm_crossmodal_keep_list (scripts/check_crossmodal.py): replace the
closure with a certificate of equal strength, every ingredient still
derived independently by DuckDB.

 - The candidate edge set E is derived by DuckDB from raw documents
   using the SAME minhash/banding (or pHash/banding) CTE chain as the
   driver-gate oracle (the SQL text is read from oracle_sql.json,
   truncated before the closure stage — the two tiers can never
   drift). The three dedup-family queries share one chain verbatim
   (asserted, then derived once per invocation).
 - The exact-fingerprint table (md5 of normalized text) and its
   per-group canonical minimum are derived directly (linear).
 - The Spark output is then PROVEN to be the unique minimal
   connected-component labeling of E plus the per-query decoration:
     (a) exactly one verdict row per in-scope id (corpus documents
         for the keep lists; E's endpoints for the cluster tables);
     (b) the per-query decision columns are coherent (keep <=> dup_of
         IS NULL; reason; is_kept <=> doc_id = keeper);
     (c) every DROPPED doc's reason matches DuckDB's exact-canonical
         computation (dd_keep_list only);
     (d) every edge (x, y) in E has label(x) == label(y), where
         label(v) = the query's cluster/keeper column  [no component
         split — kills under-merge];
     (e) every referenced label labels itself and is the MINIMUM
         doc_id of its label group [minimality];
     (f) every non-self-labeled member is REACHABLE from its label's
         representative in E [no two components share a label — kills
         over-merge]; reachability runs as a vertex-frontier
         recursive CTE seeded at the representatives — (seed, node)
         rows, one per node under a correct labeling, never the pair
         closure;
     (g) every doc with NO incident E edge keeps itself (keep lists) /
         has no row (cluster tables — scope is E's endpoints).
   By (d) labels are constant on components; by (f) each label group
   lies inside ONE component; by (e) the label is the component
   minimum; by (g) the labeling is the identity off the edge set —
   which is precisely the oracle's clusters+keeper definition. Any
   deviation flips at least one check, so pass == hash-equality with
   the full recompute, at O(E * diameter) instead of the pair closure.
 - dd_quality_keep_list adds the quality decoration on top of the
   proven labels: per-doc scores re-derived by DuckDB from the
   oracle's own qm/qsc CTE text (spliced past the closure), and the
   keeper re-derived as the oracle's argmax (score DESC, doc_id ASC)
   within each PROVEN cluster — a window over cluster labels, linear.
   Score compares use the %.6g contract of the driver gate.
"""
import sys, os, json, time
import duckdb

# query -> (name of the undirected-edge CTE in its oracle SQL)
EDGE_CTE = {
    "dd_keep_list": "edges",
    "dd_dup_clusters": "edges",
    "dd_quality_keep_list": "edges",
    "mm_phash_keep_list": "dedges",
    # dd_cluster_stats needs no edge set of its own: it is certified as
    # the exact DuckDB aggregation of the dd_dup_clusters output, which
    # must be certificate-green in the SAME invocation (precondition
    # enforced below) — stats over a proven-equal cluster table equal
    # stats over the oracle's own closure
    "dd_cluster_stats": "edges",
}


def truncated_prefix(sql):
    """The oracle's WITH chain up to (not including) the quadratic
    closure stage."""
    return sql[:sql.index("reach AS (")].rstrip().rstrip(",")


class Cert:
    def __init__(self, con, name):
        self.con, self.name, self.fails = con, name, []

    def check(self, what, bad_sql):
        t0 = time.time()
        n = self.con.execute(bad_sql).fetchone()[0]
        print(f"[cert:{self.name}] {what}: "
              f"{'OK' if n == 0 else f'FAIL ({n})'} "
              f"({time.time() - t0:.0f}s)")
        if n:
            self.fails.append(what)


def load_output(con, out_dir, name):
    con.execute("CREATE OR REPLACE TEMP TABLE O AS SELECT * FROM "
                f"read_parquet('{out_dir}/{name}/*.parquet')")
    return con.execute("SELECT count(*) FROM O").fetchone()[0]


def label_checks(c, label_expr, seeds_pred):
    """Checks (d)(e)(f) shared by every query: labels constant on
    edges, referenced labels self-labeled group minima, members
    reachable from their representative. `label_expr` builds LAB's l
    from O; `seeds_pred` selects O's non-self-labeled rows."""
    con = c.con
    con.execute(f"""CREATE OR REPLACE TEMP TABLE LAB AS
        SELECT doc_id, {label_expr} AS l FROM O""")
    # undirected half: the label check needs each edge once, and a
    # 2-int row keeps the sf10 70M-edge joins streaming, not spilling
    con.execute("CREATE OR REPLACE TEMP TABLE EH AS "
                "SELECT src, dst FROM E WHERE src < dst")
    # (d) labels constant across every edge
    c.check("edge label consistency", """
        SELECT count(*) FROM EH
        JOIN LAB a ON a.doc_id = EH.src
        JOIN LAB b ON b.doc_id = EH.dst
        WHERE a.l <> b.l""")
    # (e) every referenced label labels itself and is its group minimum
    c.check("label minimality", f"""
        SELECT count(*) FROM (
          SELECT l FROM LAB GROUP BY l HAVING min(doc_id) <> l
          UNION ALL
          SELECT r.l FROM (SELECT DISTINCT l FROM LAB) r
          JOIN LAB o ON o.doc_id = r.l WHERE o.l <> r.l)""")
    # (f) every non-self-labeled member reachable from its label's rep
    t0 = time.time()
    c.check("keeper reachability (no over-merge)", f"""
        WITH RECURSIVE seeds AS (
          SELECT DISTINCT l AS seed FROM LAB WHERE {seeds_pred}),
        r AS (
          SELECT seed, seed AS node FROM seeds
          UNION
          SELECT r.seed, E.dst AS node FROM r JOIN E ON E.src = r.node)
        SELECT count(*) FROM LAB
        LEFT JOIN r ON r.seed = LAB.l AND r.node = LAB.doc_id
        WHERE {seeds_pred} AND r.node IS NULL""")
    print(f"[cert:{c.name}] reachability fixpoint in "
          f"{time.time() - t0:.0f}s")


def cert_keep_list(con, withs, out_dir):
    """dd_keep_list: (doc_id, keep, reason, dup_of) over the corpus."""
    c = Cert(con, "dd_keep_list")
    # exact fingerprints + per-group canonical minimum (linear)
    con.execute(f"""CREATE OR REPLACE TEMP TABLE FP AS {withs}
        SELECT doc_id, md5(array_to_string(toks, ' ')) AS fp FROM t""")
    con.execute("""CREATE OR REPLACE TEMP TABLE CANON AS
        SELECT doc_id, min(doc_id) OVER (PARTITION BY fp)
          AS exact_canonical FROM FP""")
    n_rows = load_output(con, out_dir, "dd_keep_list")
    # (a) one verdict per corpus document
    c.check("one row per doc", """
        SELECT count(*) FROM (
          SELECT doc_id FROM O GROUP BY doc_id HAVING count(*) <> 1
          UNION ALL
          SELECT d.doc_id FROM documents d LEFT JOIN O USING (doc_id)
          WHERE O.doc_id IS NULL
          UNION ALL
          SELECT o.doc_id FROM O o LEFT JOIN documents d USING (doc_id)
          WHERE d.doc_id IS NULL)""")
    # (b) one decision, one pointer, coherent reason
    c.check("keep/dup_of/reason coherence", """
        SELECT count(*) FROM O
        WHERE keep <> (dup_of IS NULL) OR (reason = 'keep') <> keep""")
    # (c) dropped reasons match the independent exact-canonical
    c.check("dropped reason vs md5 canonical", """
        SELECT count(*) FROM O JOIN CANON USING (doc_id)
        WHERE NOT O.keep AND O.reason <>
          (CASE WHEN O.doc_id <> CANON.exact_canonical
                THEN 'exact_dup' ELSE 'near_dup' END)""")
    label_checks(c, "coalesce(dup_of, doc_id)", "l <> doc_id")
    # (g) isolated docs keep themselves
    c.check("isolated docs keep", """
        SELECT count(*) FROM O
        LEFT JOIN (SELECT DISTINCT src FROM E) e ON e.src = O.doc_id
        WHERE e.src IS NULL AND NOT O.keep""")
    return c.fails, n_rows


def cert_dup_clusters(con, out_dir):
    """dd_dup_clusters: (doc_id, cluster_id) over E's endpoints."""
    c = Cert(con, "dd_dup_clusters")
    n_rows = load_output(con, out_dir, "dd_dup_clusters")
    # (a)+(g) scope: exactly one row per edge endpoint, none off-edge
    c.check("one row per edge endpoint", """
        SELECT count(*) FROM (
          SELECT doc_id FROM O GROUP BY doc_id HAVING count(*) <> 1
          UNION ALL
          SELECT e.src FROM (SELECT DISTINCT src FROM E) e
          LEFT JOIN O ON O.doc_id = e.src WHERE O.doc_id IS NULL
          UNION ALL
          SELECT o.doc_id FROM O o
          LEFT JOIN (SELECT DISTINCT src FROM E) e ON e.src = o.doc_id
          WHERE e.src IS NULL)""")
    label_checks(c, "cluster_id", "l <> doc_id")
    return c.fails, n_rows


def cert_quality_keep_list(con, sql, out_dir):
    """dd_quality_keep_list: dup_clusters' labeling plus the quality
    decoration (scores + argmax keeper)."""
    c = Cert(con, "dd_quality_keep_list")
    n_rows = load_output(con, out_dir, "dd_quality_keep_list")
    # (a)+(g) scope, as dup_clusters
    c.check("one row per edge endpoint", """
        SELECT count(*) FROM (
          SELECT doc_id FROM O GROUP BY doc_id HAVING count(*) <> 1
          UNION ALL
          SELECT e.src FROM (SELECT DISTINCT src FROM E) e
          LEFT JOIN O ON O.doc_id = e.src WHERE O.doc_id IS NULL
          UNION ALL
          SELECT o.doc_id FROM O o
          LEFT JOIN (SELECT DISTINCT src FROM E) e ON e.src = o.doc_id
          WHERE e.src IS NULL)""")
    label_checks(c, "cluster_id", "l <> doc_id")
    # independent per-doc scores: splice the oracle's own qm/qsc CTEs
    # past the closure (they only need `t` from the shared prefix)
    withs = truncated_prefix(sql)
    qm_qsc = sql[sql.index("qm AS ("):sql.index("qk AS (")] \
        .rstrip().rstrip(",")
    con.execute(f"CREATE OR REPLACE TEMP TABLE QSC AS {withs},\n"
                f"{qm_qsc} SELECT doc_id, score FROM qsc")
    # per-doc score matches, under the driver gate's %.6g contract
    c.check("quality_score vs independent qsc", """
        SELECT count(*) FROM O JOIN QSC USING (doc_id)
        WHERE printf('%.6g', O.quality_score)
           <> printf('%.6g', round(QSC.score, 6))""")
    # keeper re-derived as the oracle's argmax (raw score DESC, doc_id
    # ASC) within each PROVEN cluster — linear window over labels
    con.execute("""CREATE OR REPLACE TEMP TABLE ARG AS
        SELECT cluster_id, doc_id AS keeper, score AS keeper_score FROM (
          SELECT O.cluster_id, O.doc_id, QSC.score,
            ROW_NUMBER() OVER (PARTITION BY O.cluster_id
              ORDER BY QSC.score DESC, O.doc_id ASC) AS rn
          FROM O JOIN QSC USING (doc_id))
        WHERE rn = 1""")
    c.check("keeper is the per-cluster quality argmax", """
        SELECT count(*) FROM O JOIN ARG USING (cluster_id)
        WHERE O.keeper <> ARG.keeper
           OR printf('%.6g', O.keeper_score)
           <> printf('%.6g', round(ARG.keeper_score, 6))""")
    # (b) is_kept coherence
    c.check("is_kept coherence",
            "SELECT count(*) FROM O WHERE is_kept <> (doc_id = keeper)")
    return c.fails, n_rows


def cert_cluster_stats(con, out_dir, dup_clusters_green):
    """dd_cluster_stats: the exact DuckDB aggregation of the (proven)
    dd_dup_clusters output, bag-compared against the Spark output.
    Valid ONLY when dd_dup_clusters' own certificate is green in this
    invocation — stats over a proven-equal cluster table equal stats
    over the oracle's closure."""
    c = Cert(con, "dd_cluster_stats")
    if not dup_clusters_green:
        print("[cert:dd_cluster_stats] SKIP — requires a green "
              "dd_dup_clusters certificate in the same invocation")
        return ["precondition: dd_dup_clusters not certified green"], 0
    n_rows = load_output(con, out_dir, "dd_cluster_stats")
    con.execute(f"""CREATE OR REPLACE TEMP TABLE WANT AS
        WITH cl AS (SELECT * FROM
               read_parquet('{out_dir}/dd_dup_clusters/*.parquet')),
             cs AS (SELECT cluster_id, COUNT(*) AS cluster_size
                    FROM cl GROUP BY 1)
        SELECT cluster_size, COUNT(*) AS n_clusters,
          CAST(SUM(cluster_size) AS BIGINT) AS n_docs,
          CAST(SUM(cluster_size) - COUNT(*) AS BIGINT) AS n_droppable
        FROM cs GROUP BY cluster_size""")
    c.check("stats equal the aggregation of the proven cluster table", """
        SELECT count(*) FROM (
          (SELECT * FROM WANT EXCEPT ALL SELECT * FROM O)
          UNION ALL
          (SELECT * FROM O EXCEPT ALL SELECT * FROM WANT))""")
    return c.fails, n_rows


def cert_corpus_yield(con, sql, out_dir, keep_list_green):
    """t_corpus_yield: its oracle is linear EXCEPT the keeper closure.
    With dd_keep_list certificate-proven equal to the oracle's keeper
    labeling, keeper(doc) = coalesce(dup_of, doc_id) substitutes for
    the closure exactly; the rest of the oracle chain (tokenization,
    quality, lang-id, the final rollup) reruns VERBATIM from its own
    SQL text over raw documents, and the result bag-compares against
    the Spark output. Valid ONLY when dd_keep_list's certificate is
    green in this invocation."""
    c = Cert(con, "t_corpus_yield")
    if not keep_list_green:
        print("[cert:t_corpus_yield] SKIP — requires a green "
              "dd_keep_list certificate in the same invocation")
        return ["precondition: dd_keep_list not certified green"], 0
    n_rows = load_output(con, out_dir, "t_corpus_yield")
    # the proven keeper table, named like the oracle's CTE so the
    # spliced chain resolves it as a base table
    con.execute(f"""CREATE OR REPLACE TEMP TABLE keeper AS
        SELECT doc_id, coalesce(dup_of, doc_id) AS keeper
        FROM read_parquet('{out_dir}/dd_keep_list/*.parquet')""")
    # the oracle's own linear tail, verbatim from its SQL text
    tail = "WITH " + sql[sql.index("d2 AS ("):]
    con.execute(f"CREATE OR REPLACE TEMP TABLE WANT AS {tail}")
    c.check("yield report equals oracle tail over proven keepers", """
        SELECT count(*) FROM (
          (SELECT * FROM WANT EXCEPT ALL SELECT * FROM O)
          UNION ALL
          (SELECT * FROM O EXCEPT ALL SELECT * FROM WANT))""")
    con.execute("DROP TABLE keeper")
    return c.fails, n_rows


def cert_phash_keep_list(con, out_dir):
    """mm_phash_keep_list: (doc_id, keep, dup_of) over the corpus."""
    c = Cert(con, "mm_phash_keep_list")
    n_rows = load_output(con, out_dir, "mm_phash_keep_list")
    # (a) one verdict per corpus document
    c.check("one row per doc", """
        SELECT count(*) FROM (
          SELECT doc_id FROM O GROUP BY doc_id HAVING count(*) <> 1
          UNION ALL
          SELECT d.doc_id FROM documents d LEFT JOIN O USING (doc_id)
          WHERE O.doc_id IS NULL
          UNION ALL
          SELECT o.doc_id FROM O o LEFT JOIN documents d USING (doc_id)
          WHERE d.doc_id IS NULL)""")
    # (b) one decision, one pointer
    c.check("keep/dup_of coherence",
            "SELECT count(*) FROM O WHERE keep <> (dup_of IS NULL)")
    label_checks(c, "coalesce(dup_of, doc_id)", "l <> doc_id")
    # (g) isolated docs keep themselves
    c.check("isolated docs keep", """
        SELECT count(*) FROM O
        LEFT JOIN (SELECT DISTINCT src FROM E) e ON e.src = O.doc_id
        WHERE e.src IS NULL AND NOT O.keep""")
    return c.fails, n_rows


def main(sf_dir, out_dir, names):
    con = duckdb.connect()
    con.execute(f"SET temp_directory='/tmp/duckdb_keeplist_{os.getpid()}'")
    con.execute(f"SET threads={os.environ.get('DUCKDB_THREADS', '16')}")
    # bound the resident set so a 70M-edge derivation spills to the
    # temp dir instead of OOM-killing the process (sf10 lesson)
    con.execute(
        f"SET memory_limit='{os.environ.get('DUCKDB_MEM', '48GB')}'")
    # set membership only — skip ordered materialization buffering
    con.execute("SET preserve_insertion_order=false")
    doc_path = f"{sf_dir}/documents.parquet"
    src = (f"read_parquet('{doc_path}/*.parquet')" if os.path.isdir(doc_path)
           else f"read_parquet('{doc_path}')")
    con.execute(f"CREATE VIEW documents AS SELECT * FROM {src}")

    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    all_fails = {}
    green = set()
    derived_from = None  # the prefix E currently holds (dedup family shares)
    for name in names:
        if name in ("dd_cluster_stats", "t_corpus_yield"):
            fails, n_rows = (
                cert_cluster_stats(con, out_dir, "dd_dup_clusters" in green)
                if name == "dd_cluster_stats"
                else cert_corpus_yield(con, oracles[name], out_dir,
                                       "dd_keep_list" in green))
            if fails:
                print(f"\nCERT FAIL {name}: {fails}\n")
                all_fails[name] = fails
            else:
                green.add(name)
                print(f"\nCERT OK {name} ({n_rows} rows, oracle tail "
                      f"over the certified labeling)\n")
            continue
        sql = oracles[name]
        withs = truncated_prefix(sql)
        key = (withs, EDGE_CTE[name])
        if key != derived_from:
            if derived_from is not None:
                # switching edge families (doc-corpus -> phash): drop the
                # previous family's working tables BEFORE the new edge
                # derivation, not after — at sf10 the resident 70M-edge
                # doc tables plus the phash derivation's spill exceeded
                # /tmp and ENOSPC'd the whole run (observed round 12).
                # Enumerate the session's temp tables instead of keeping
                # a hand-synced name list: a cert function adding a temp
                # table must not silently stay resident (ADVICE r12 —
                # the hardcoded list had already drifted from reality).
                temps = [r[0] for r in con.execute(
                    "SELECT table_name FROM duckdb_tables() "
                    "WHERE temporary").fetchall()]
                for t in temps:
                    con.execute(f'DROP TABLE IF EXISTS "{t}"')
            t0 = time.time()
            con.execute(f"CREATE OR REPLACE TEMP TABLE E AS {withs} "
                        f"SELECT src, dst FROM {EDGE_CTE[name]}")
            derived_from = key
            n_edges = con.execute("SELECT count(*) FROM E").fetchone()[0]
            print(f"[cert:{name}] independent edge derivation: {n_edges} "
                  f"directed edges in {time.time() - t0:.0f}s")
        else:
            n_edges = con.execute("SELECT count(*) FROM E").fetchone()[0]
            print(f"[cert:{name}] reusing shared edge derivation "
                  f"({n_edges} edges — identical truncated CTE prefix)")
        if name == "dd_keep_list":
            fails, n_rows = cert_keep_list(con, withs, out_dir)
        elif name == "dd_dup_clusters":
            fails, n_rows = cert_dup_clusters(con, out_dir)
        elif name == "dd_quality_keep_list":
            fails, n_rows = cert_quality_keep_list(con, sql, out_dir)
        elif name == "mm_phash_keep_list":
            fails, n_rows = cert_phash_keep_list(con, out_dir)
        else:
            raise SystemExit(f"no certificate defined for {name}")
        if fails:
            print(f"\nCERT FAIL {name}: {fails}\n")
            all_fails[name] = fails
        else:
            green.add(name)
            print(f"\nCERT OK {name} ({n_rows} rows, {n_edges} edges)\n")
    return all_fails


def adversarial(sf_dir, out_dir):
    """Checker-of-the-checker: perturb a CORRECT Spark output and
    assert that EXACTLY the intended certificate check flips — a
    vacuous certificate (every check trivially 0 rows) or an
    over-eager one (perturbation trips unrelated checks) both fail
    here. Two canonical corruptions:
      - over-merge: relabel one whole cluster onto another cluster's
        representative (reasons/coherence kept consistent, and the
        absorbing rep chosen as the global minimum so minimality
        still holds) -> only reachability (f) may fire;
      - non-argmax keeper: within one multi-member cluster, point
        keeper/keeper_score/is_kept at a coherent NON-argmax member
        -> only the argmax decoration may fire.
    Requires the unperturbed outputs to be certificate-green first."""
    import tempfile, shutil

    def run_perturbed(name, select_sql, expect):
        tmp = tempfile.mkdtemp(prefix="cert_adv_")
        try:
            shutil.copy(f"{out_dir}/oracle_sql.json",
                        f"{tmp}/oracle_sql.json")
            os.makedirs(f"{tmp}/{name}")
            con = duckdb.connect()
            con.execute(f"COPY ({select_sql}) TO "
                        f"'{tmp}/{name}/part-0.parquet' (FORMAT parquet)")
            con.close()
            fails = main(sf_dir, tmp, [name]).get(name, [])
            hit = [f for f in fails if expect in f]
            others = [f for f in fails if expect not in f]
            if not hit:
                print(f"ADVERSARIAL FAIL {name}: perturbation was NOT "
                      f"caught by '{expect}' (fails: {fails})")
                return False
            if others:
                print(f"ADVERSARIAL FAIL {name}: perturbation tripped "
                      f"unrelated checks too: {others}")
                return False
            print(f"ADVERSARIAL OK {name}: '{expect}' (and only it) "
                  f"flipped as designed")
            return True
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    # baseline: the real outputs must be green before perturbing
    base = main(sf_dir, out_dir,
                ["dd_keep_list", "dd_quality_keep_list"])
    if base:
        print(f"ADVERSARIAL ABORT: unperturbed outputs not green: {base}")
        return 1

    # the perturbations below need material to perturb: with fewer
    # than two multi-member clusters, two.r2 is NULL and the overmerge
    # SELECT degenerates to an identity copy, which would surface as a
    # misleading "perturbation was NOT caught" instead of the real
    # diagnosis (corpus too small). Same for the nonargmax target
    # cluster. Abort explicitly instead (ADVICE r13).
    con = duckdb.connect()
    n_multi = con.execute(
        f"""SELECT count(*) FROM (
              SELECT coalesce(dup_of, doc_id) AS l
              FROM read_parquet('{out_dir}/dd_keep_list/*.parquet')
              GROUP BY l HAVING count(*) >= 2)""").fetchone()[0]
    n_qmulti = con.execute(
        f"""SELECT count(*) FROM (
              SELECT cluster_id
              FROM read_parquet(
                '{out_dir}/dd_quality_keep_list/*.parquet')
              GROUP BY cluster_id HAVING count(*) >= 2)""").fetchone()[0]
    con.close()
    if n_multi < 2 or n_qmulti < 1:
        print(f"ADVERSARIAL ABORT: dataset too small for adversarial "
              f"harness (multi-member keep-list clusters: {n_multi}, "
              f"need >= 2; multi-member quality clusters: {n_qmulti}, "
              f"need >= 1) — run against a larger sf dir")
        return 1

    overmerge = f"""
        WITH O AS (SELECT * FROM
               read_parquet('{out_dir}/dd_keep_list/*.parquet')),
        lab AS (SELECT doc_id, coalesce(dup_of, doc_id) AS l FROM O),
        multi AS (SELECT l FROM lab GROUP BY l HAVING count(*) >= 2),
        two AS (SELECT (SELECT min(l) FROM multi) AS r1,
          (SELECT min(l) FROM multi
           WHERE l > (SELECT min(l) FROM multi)) AS r2)
        SELECT O.doc_id,
          CASE WHEN lab.l = two.r2 THEN false ELSE O.keep END AS keep,
          CASE WHEN O.doc_id = two.r2 THEN 'near_dup'
               ELSE O.reason END AS reason,
          CASE WHEN lab.l = two.r2 THEN two.r1
               ELSE O.dup_of END AS dup_of
        FROM O JOIN lab USING (doc_id) CROSS JOIN two"""

    nonargmax = f"""
        WITH O AS (SELECT * FROM
               read_parquet('{out_dir}/dd_quality_keep_list/*.parquet')),
        tgt AS (SELECT cluster_id FROM O GROUP BY cluster_id
                HAVING count(*) >= 2 ORDER BY cluster_id LIMIT 1),
        alt AS (SELECT O.cluster_id,
                  max(CASE WHEN O.doc_id <> O.keeper
                      THEN O.doc_id END) AS nk
                FROM O JOIN tgt USING (cluster_id) GROUP BY O.cluster_id),
        sc AS (SELECT O.cluster_id, O.quality_score AS ns
               FROM O JOIN alt ON O.cluster_id = alt.cluster_id
                AND O.doc_id = alt.nk)
        SELECT O.cluster_id, O.doc_id, O.quality_score,
          CASE WHEN alt.nk IS NOT NULL THEN alt.nk
               ELSE O.keeper END AS keeper,
          CASE WHEN alt.nk IS NOT NULL THEN sc.ns
               ELSE O.keeper_score END AS keeper_score,
          CASE WHEN alt.nk IS NOT NULL THEN (O.doc_id = alt.nk)
               ELSE O.is_kept END AS is_kept
        FROM O LEFT JOIN alt USING (cluster_id)
        LEFT JOIN sc USING (cluster_id)"""

    ok = run_perturbed("dd_keep_list", overmerge,
                       "keeper reachability")
    ok = run_perturbed("dd_quality_keep_list", nonargmax,
                       "keeper is the per-cluster quality argmax") and ok
    return 0 if ok else 1


if __name__ == "__main__":
    if "--adversarial" in sys.argv:
        sys.exit(adversarial(sys.argv[1], sys.argv[2]))
    qnames = sys.argv[3:] or ["dd_keep_list"]
    sys.exit(1 if main(sys.argv[1], sys.argv[2], qnames) else 0)
