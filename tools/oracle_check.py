#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify),
reads <verifyOutDir>/oracle_sql.json, runs each oracle against DuckDB
views over <sfDir>/*.parquet, and compares result multisets exactly
(columns aligned by sorted name — same normalization the driver uses).

Also compares DESCRIBE column TYPES between the Spark output and the
oracle: the driver's hash gate is type-sensitive, so an oracle whose
aggregate-derived column silently promotes (DuckDB sum(BIGINT) ->
HUGEINT, avg -> DOUBLE vs DECIMAL, ...) must fail HERE, locally,
not only at adjudication. Value multisets compare with implicit
casts and cannot see that class of drift (the round-11 txt_pack_chunks
escape).
"""
import sys, os, json, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def type_class(t):
    """Driver-hash equivalence class of a DuckDB column type.

    Calibrated against CORRECTNESS_r11: sibling integer WIDTHS hash
    alike (15 entries with INTEGER-vs-BIGINT drift pass the driver's
    gate), while representation changes do not (HUGEINT — DuckDB's
    sum(BIGINT) promotion — failed txt_pack_chunks despite identical
    values; it exports as decimal128, not an int). So int widths
    collapse to one class; HUGEINT, DECIMAL(p,s), FLOAT/DOUBLE,
    VARCHAR, TIMESTAMP..., remain distinct.

    DECIMAL(p,s) compares by the FULL type string, so precision-only
    differences (DECIMAL(38,2) vs DECIMAL(12,2)) fail here. That
    sensitivity is ASSUMED, not calibrated — no adjudicated row has
    exercised it; conservative by design (a false FAIL locally is
    cheap, a false PASS ships red).
    """
    if t is None:
        return None
    u = t.upper()
    if u in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return "INT"
    return u

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
            # type gate first: DESCRIBE both sides, compare per column.
            # A mismatch is a hard FAIL even when every value matches —
            # the driver's hash covers types, so this is exactly what
            # ships red while a value-only local check stays green.
            stypes = {r[0]: r[1] for r in con.execute(
                "DESCRIBE spark_out").fetchall()}
            otypes = {r[0]: r[1] for r in con.execute(
                f"DESCRIBE (SELECT * FROM ({oracle}))").fetchall()}
            # column-SET mismatch is a distinct failure from type drift:
            # a column present on only one side is a schema-shape bug
            # (wrong/missing alias), not a promotion issue, and reporting
            # it as "BIGINT vs None" obscured that
            only_s = sorted(stypes.keys() - otypes.keys())
            only_o = sorted(otypes.keys() - stypes.keys())
            if only_s or only_o:
                print(f"FAIL {name}: column set mismatch: "
                      f"spark-only={only_s} oracle-only={only_o}")
                n_fail += 1
                continue
            tdiff = sorted(c for c in stypes
                           if type_class(stypes[c]) != type_class(otypes[c]))
            if tdiff:
                print(f"FAIL {name}: column TYPE drift (spark vs oracle): " +
                      "; ".join(f"{c}: {stypes[c]} vs {otypes[c]}"
                                for c in tdiff))
                n_fail += 1
                continue
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
