#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify first
(writes <out>/<query>.parquet + <out>/oracle_sql.json), then this script runs
each oracle SQL in DuckDB over the same sf dir and compares (columns sorted
by name, rows sorted, exact values).

usage: check_oracle.py <sfDir> <verifyOutDir>
"""
import json, sys, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize cell values for hashing-style compare
    def canon(v):
        if v is None or (isinstance(v, float) and pd.isna(v)):
            return "NULL"
        if isinstance(v, float):
            return repr(v)
        if isinstance(v, (list, tuple)) or str(type(v)).endswith("ndarray'>"):
            return str(list(v))
        return str(v)
    out = df.apply(lambda c: c.map(canon))
    return out.sort_values(by=list(out.columns)).reset_index(drop=True)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    results = {}
    for name in sorted(oracle):
        sql = oracle[name]
        got_path = os.path.join(out_dir, name)
        if not glob.glob(os.path.join(got_path, "*.parquet")):
            results[name] = "NO_SPARK_OUTPUT"
            continue
        try:
            exp = con.execute(sql).df()
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR: {str(e)[:120]}"
            continue
        got = duckdb.sql(f"SELECT * FROM '{got_path}/*.parquet'").df()
        if sorted(exp.columns) != sorted(got.columns):
            results[name] = f"SCHEMA_MISMATCH spark={sorted(got.columns)} duck={sorted(exp.columns)}"
            continue
        ne, ng = norm(exp), norm(got)
        if len(ne) != len(ng):
            results[name] = f"ROWCOUNT spark={len(ng)} duck={len(ne)}"
            continue
        if ne.equals(ng):
            results[name] = f"OK rows={len(ng)}"
        else:
            diff = (ne != ng).any(axis=1)
            i = diff.idxmax()
            results[name] = (f"VALUE_MISMATCH rows={len(ng)} ndiff={int(diff.sum())} "
                             f"first@{i}: duck={ne.loc[i].to_dict()} spark={ng.loc[i].to_dict()}")
    ok = sum(1 for v in results.values() if v.startswith("OK"))
    for k, v in results.items():
        print(("PASS " if v.startswith("OK") else "FAIL ") + k + ": " + v)
    print(f"== {ok}/{len(results)} oracle queries match")
    # rows-only queries (no oracle): report row counts
    for p in sorted(glob.glob(os.path.join(out_dir, "q*"))):
        name = os.path.basename(p)
        if name not in oracle and glob.glob(os.path.join(p, "*.parquet")):
            n = duckdb.sql(f"SELECT count(*) FROM '{p}/*.parquet'").fetchone()[0]
            print(f"INFO {name}: rows-only, {n} rows")
    return 0 if ok == len(results) else 1

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
