#!/usr/bin/env python3
"""Local pre-check mirroring the driver's DuckDB oracle compare.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>

Dev-iteration tool only — NOT part of the Scala library. Runs each
oracle_sql.json query in DuckDB over the same parquet tables, loads the
Spark parquet result, canonicalizes both (sort columns by name, sort
rows, normalize floats) and diffs.
"""
import sys, os, json, math
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
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
    return out.sort_values(by=list(out.columns), key=lambda s: s.map(repr)).reset_index(drop=True)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written dir (e.g. ScaleUp sf1)
            src = f"read_parquet('{p}/*.parquet')"
            ts_t = (con.execute(f"SELECT typeof(ts) FROM {src} LIMIT 1")
                    .fetchone()[0] if t == "events" else None)
            if ts_t == "BIGINT":
                # ScaleUp replicates events.ts as raw nanosecond longs
                # (the same shape Tables.events reads); expose the same
                # micro-truncated TIMESTAMP the original table has
                src = (f"(SELECT * REPLACE (make_timestamp(ts // 1000)"
                       f" AS ts) FROM {src})")
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM {src}")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        spark_path = f"{out_dir}/{name}"
        if not os.path.isdir(spark_path):
            print(f"MISSING  {name} (no spark output)")
            n_fail += 1
            continue
        try:
            got = canon(pd.read_parquet(spark_path))
            want = canon(con.execute(sql).df())
        except Exception as e:
            print(f"ERROR    {name}: {e}")
            n_fail += 1
            continue
        both_empty = (len(got) == 0 and len(want) == 0 and
                      list(got.columns) == list(want.columns))
        if got.equals(want) or both_empty:
            # empty frames: pandas .equals is dtype-sensitive (parquet
            # int64 vs duckdb object on zero rows) — same columns and
            # zero rows on both sides IS a match
            print(f"OK       {name} ({len(got)} rows)")
            n_pass += 1
        else:
            n_fail += 1
            print(f"MISMATCH {name}: spark {got.shape} vs duckdb {want.shape}")
            if list(got.columns) != list(want.columns):
                print(f"  cols spark={list(got.columns)} duckdb={list(want.columns)}")
            else:
                neq = (got != want).any(axis=1)
                bad = neq[neq].index[:3]
                for i in bad:
                    print(f"  row {i}:\n    spark : {got.loc[i].to_dict()}\n    duckdb: {want.loc[i].to_dict()}")
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
