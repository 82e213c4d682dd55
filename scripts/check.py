#!/usr/bin/env python3
"""Local replica of the driver's verify->duckdb compare.

Usage: python3 scripts/check.py /tmp/vout /root/testdata/sf0.01
Reads each <name>/ parquet dir written by graft.Verify plus oracle_sql.json,
runs the oracle SQL in DuckDB against views named after the testdata tables,
sorts columns by name and rows by value, and hash-compares.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes: timestamps -> iso str, floats -> rounded str, ints -> int64
    out = pd.DataFrame()
    for c in df.columns:
        s = df[c]
        if str(s.dtype).startswith("datetime"):
            s = s.astype("datetime64[us]").astype(str)
        elif s.dtype == object:
            s = s.apply(lambda v: str(sorted(v)) if isinstance(v, (list,)) else str(v))
        elif str(s.dtype).startswith("float"):
            s = s.round(6)
        out[c] = s
    return out.sort_values(by=list(out.columns)).reset_index(drop=True)

def main(vout, sfdir):
    con = duckdb.connect()
    # Scale spot-checks (100M-row corpora): an in-memory DuckDB has no
    # temp_directory, so a heavy oracle grows unbounded (observed 91 GB RSS
    # at events1000x) instead of spilling. Opt-in via env.
    # SET doesn't take bind parameters in DuckDB — escape quotes instead,
    # so a quote in the env value can't break out of the literal.
    def q(v):
        return "'" + v.replace("'", "''") + "'"
    if os.environ.get("CHECK_DUCKDB_TMP"):
        con.execute(f"SET temp_directory={q(os.environ['CHECK_DUCKDB_TMP'])}")
    if os.environ.get("CHECK_DUCKDB_MEM"):
        con.execute(f"SET memory_limit={q(os.environ['CHECK_DUCKDB_MEM'])}")
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{vout}/oracle_sql.json"))
    ok = fail = 0
    for name, sql in sorted(oracle.items()):
        res_dir = f"{vout}/{name}"
        files = glob.glob(f"{res_dir}/*.parquet")
        if not files:
            print(f"MISS  {name}: no spark result"); fail += 1; continue
        try:
            spark_df = canon(pd.concat([pd.read_parquet(f) for f in files]))
            duck_df = canon(con.sql(sql).df())
        except Exception as e:
            print(f"ERR   {name}: {e}"); fail += 1; continue
        if list(spark_df.columns) != list(duck_df.columns):
            print(f"COLS  {name}: spark={list(spark_df.columns)} duck={list(duck_df.columns)}"); fail += 1; continue
        if len(spark_df) != len(duck_df):
            print(f"ROWS  {name}: spark={len(spark_df)} duck={len(duck_df)}"); fail += 1; continue
        if not spark_df.equals(duck_df):
            diff = (spark_df != duck_df)
            cells = diff.to_numpy().sum()
            print(f"VALS  {name}: {cells} differing cells")
            mask = diff.any(axis=1)
            print("  spark:", spark_df[mask].head(3).to_dict("records"))
            print("  duck :", duck_df[mask].head(3).to_dict("records"))
            fail += 1; continue
        print(f"OK    {name} ({len(spark_df)} rows)"); ok += 1
    print(f"\n{ok} ok, {fail} fail")
    return 1 if fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
