#!/usr/bin/env python3
"""Local dev-only replica of the driver's correctness gate: run Verify's
parquet output against DuckDB executing oracle_sql.json on the same tables.
Compares row count, sorted-column-name schema, and a value hash."""
import sys, json, glob, hashlib
import duckdb
import pandas as pd

verify_out, sf_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
# Pin the session timezone: Spark runs UTC (GraftSession). Today's testdata
# carries naive TIMESTAMP (tz-free on both engines), but a regeneration
# with isAdjustedToUTC=true would make DuckDB read TIMESTAMPTZ and bucket
# days/cast dates in the MACHINE-LOCAL zone without this.
con.execute("SET TimeZone='UTC'")
for t in glob.glob(f"{sf_dir}/*.parquet"):
    name = t.split("/")[-1].replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{t}')")

oracle = json.load(open(f"{verify_out}/oracle_sql.json"))

def canon(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    rows = []
    for row in df.itertuples(index=False):
        vals = []
        for v in row:
            if pd.isna(v) if not isinstance(v, (list, tuple)) else False:
                vals.append("NULL")
            elif isinstance(v, float):
                vals.append(f"{v:.6f}")
            else:
                vals.append(str(v))
        rows.append("|".join(vals))
    rows.sort()
    return hashlib.md5("\n".join(rows).encode()).hexdigest()

fails = 0
for name, sql in sorted(oracle.items()):
    try:
        spark_df = pd.read_parquet(f"{verify_out}/{name}")
        duck_df = con.execute(sql).df()
        sc, dc = sorted(spark_df.columns), sorted(duck_df.columns)
        ok_schema = sc == dc
        ok_rows = len(spark_df) == len(duck_df)
        ok_hash = ok_schema and canon(spark_df) == canon(duck_df)
        status = "OK" if (ok_schema and ok_rows and ok_hash) else "FAIL"
        if status == "FAIL":
            fails += 1
            print(f"{status} {name}: rows spark={len(spark_df)} duck={len(duck_df)} schema_ok={ok_schema} hash_ok={ok_hash}")
            if not ok_schema:
                print(f"   spark cols: {sc}\n   duck  cols: {dc}")
            elif ok_rows:
                s = spark_df[sorted(spark_df.columns)].sort_values(sc).head(3)
                d = duck_df[sorted(duck_df.columns)].sort_values(dc).head(3)
                print("   spark:", s.to_dict("records"))
                print("   duck :", d.to_dict("records"))
        else:
            print(f"{status} {name} ({len(spark_df)} rows)")
    except Exception as e:
        fails += 1
        print(f"ERROR {name}: {e}")
print(f"\n{len(oracle) - fails}/{len(oracle)} queries match")
sys.exit(1 if fails else 0)
