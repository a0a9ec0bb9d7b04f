#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB over the same parquet tables, compare row-sets against the Spark
parquet dumps written by graft.Verify (columns sorted by name, rows sorted,
values canonicalized). Usage: check_oracle.py <sfDir> <verifyOutDir>"""
import sys, json, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(v):
    if isinstance(v, float):
        return "%.10g" % v
    if v is None:
        return "<null>"
    return str(v)

def rowset(df):
    cols = sorted(df.columns)
    rows = [tuple(canon(v) for v in row) for row in df[cols].itertuples(index=False)]
    return cols, sorted(rows)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(d.split("/")[-1] for d in glob.glob(f"{out_dir}/*") if not d.endswith(".json"))
    fails = 0
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); fails += 1; continue
        spark_df = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        if name not in oracle:
            print(f"SKIP {name}: rows-only check -> {len(spark_df)} rows " +
                  ("OK" if len(spark_df) > 0 else "FAIL(empty)"))
            if len(spark_df) == 0: fails += 1
            continue
        try:
            duck_df = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); fails += 1; continue
        sc, sr = rowset(spark_df)
        dc, dr = rowset(duck_df)
        if sc != dc:
            print(f"FAIL {name}: columns differ spark={sc} duck={dc}"); fails += 1
        elif sr != dr:
            diff = [i for i, (a, b) in enumerate(zip(sr, dr)) if a != b][:3]
            print(f"FAIL {name}: {len(sr)} vs {len(dr)} rows; first diffs at {diff}")
            for i in diff:
                print(f"   spark: {sr[i] if i < len(sr) else '<none>'}")
                print(f"   duck : {dr[i] if i < len(dr) else '<none>'}")
            if not diff and len(sr) != len(dr):
                print(f"   spark extra: {sr[len(dr):len(dr)+2]}")
                print(f"   duck extra : {dr[len(sr):len(sr)+2]}")
            fails += 1
        else:
            print(f"PASS {name}: {len(sr)} rows")
    print(f"\n{fails} failures / {len(names)} queries")
    return 1 if fails else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
