#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify),
reads <verifyOutDir>/oracle_sql.json, runs each oracle against DuckDB
views over <sfDir>/*.parquet, and compares result multisets exactly
(columns aligned by sorted name — same normalization the driver uses).
"""
import sys, os, json, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(oracles):
        spark_glob = os.path.join(out_dir, name, "*.parquet")
        if not glob.glob(spark_glob):
            print(f"FAIL {name}: no spark output at {spark_glob}")
            n_fail += 1
            continue
        try:
            con.execute(f"CREATE OR REPLACE VIEW spark_out AS SELECT * FROM read_parquet('{spark_glob}')")
            cols = [r[0] for r in con.execute(
                "SELECT column_name FROM information_schema.columns "
                "WHERE table_name='spark_out' ORDER BY column_name").fetchall()]
            collist = ", ".join(f'"{c}"' for c in cols)
            oracle = oracles[name]
            a = con.execute(f"SELECT count(*) FROM spark_out").fetchone()[0]
            b = con.execute(f"SELECT count(*) FROM ({oracle})").fetchone()[0]
            d1 = con.execute(
                f"SELECT count(*) FROM (SELECT {collist} FROM spark_out "
                f"EXCEPT ALL SELECT {collist} FROM ({oracle}))").fetchone()[0]
            d2 = con.execute(
                f"SELECT count(*) FROM (SELECT {collist} FROM ({oracle}) "
                f"EXCEPT ALL SELECT {collist} FROM spark_out)").fetchone()[0]
            if a == b and d1 == 0 and d2 == 0:
                print(f"PASS {name} ({a} rows)")
                n_pass += 1
            else:
                print(f"FAIL {name}: spark={a} oracle={b} spark-only={d1} oracle-only={d2}")
                if d1 or d2:
                    ex = con.execute(
                        f"SELECT {collist} FROM spark_out EXCEPT ALL "
                        f"SELECT {collist} FROM ({oracle}) LIMIT 3").fetchall()
                    ex2 = con.execute(
                        f"SELECT {collist} FROM ({oracle}) EXCEPT ALL "
                        f"SELECT {collist} FROM spark_out LIMIT 3").fetchall()
                    print(f"  cols: {cols}")
                    print(f"  spark-only sample: {ex}")
                    print(f"  oracle-only sample: {ex2}")
                n_fail += 1
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
