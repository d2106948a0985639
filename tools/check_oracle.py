#!/usr/bin/env python3
"""Local twin of the driver's correctness gate: for each query result
parquet under OUTDIR, run the matching oracle SQL from oracle_sql.json in
DuckDB over the sf tables and compare rows/schema/values exactly
(columns sorted by name, rows in result order).

Usage: check_oracle.py SFDIR OUTDIR [query ...]
"""
import json, os, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        if v != v:  # NaN (pandas null) — compare as None
            return None
        return round(v, 9)
    # LIST columns: numpy arrays (spark parquet) vs python lists (duckdb)
    # — canonicalize both to tuples so tuple comparison stays scalar
    if hasattr(v, "tolist") and not isinstance(v, (str, bytes)):
        v = v.tolist()
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sfdir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    fails = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        res_dir = os.path.join(outdir, name)
        if not os.path.isdir(res_dir):
            print(f"{name}: MISSING result dir")
            fails += 1
            continue
        spark = con.execute(
            f"SELECT * FROM '{res_dir}/*.parquet'").fetch_df()
        oracle = con.execute(sql).fetch_df()
        scols, ocols = sorted(spark.columns), sorted(oracle.columns)
        if scols != ocols:
            print(f"{name}: SCHEMA mismatch spark={scols} oracle={ocols}")
            fails += 1
            continue
        if len(spark) != len(oracle):
            print(f"{name}: ROWS mismatch spark={len(spark)} oracle={len(oracle)}")
            fails += 1
            continue
        srows = [tuple(norm(v) for v in r) for r in spark[scols].itertuples(index=False)]
        orows = [tuple(norm(v) for v in r) for r in oracle[ocols].itertuples(index=False)]
        if srows != orows:
            bad = next(i for i, (a, b) in enumerate(zip(srows, orows)) if a != b)
            print(f"{name}: VALUE mismatch at row {bad}:\n  spark : {srows[bad]}\n  oracle: {orows[bad]}")
            fails += 1
            continue
        print(f"{name}: OK ({len(spark)} rows)")
    sys.exit(1 if fails else 0)

if __name__ == "__main__":
    main()
