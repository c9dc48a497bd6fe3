#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark output) and runs the
matching SQL from oracle_sql.json in DuckDB with views named after the
test tables. Compares row counts, column names, column TYPES, and
values (sorted by all columns, exact match; floats compared bit-exactly
first, then with 1e-9 relative tolerance reported separately).

Type comparison mirrors the driver's type-sensitive hash: a DuckDB
oracle producing HUGEINT where Spark wrote BIGINT fails the round even
when every value matches (round-3 a12 incident), so it must fail here
too. Types are compared as DuckDB type strings after normalizing
representations the driver's canonicalization treats as identical
(timestamp precisions — Spark parquet micros vs oracle TIMESTAMP).
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon_type(t):
    s = str(t).upper()
    # timestamp precision variants hash identically driver-side
    if s.startswith("TIMESTAMP"):
        return "TIMESTAMP"
    # int widths up to 64-bit promote to one Python/arrow int and hash
    # identically driver-side (a5/q7 pass with INTEGER vs BIGINT), but
    # HUGEINT does NOT (round-3 a12 failed on BIGINT vs HUGEINT) —
    # keep it distinct.
    if s in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT"):
        return "BIGINT"
    return s


def canon(rows):
    def key(r):
        return tuple((x is None, str(x)) for x in r)
    return sorted(rows, key=key)


def eq(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = []
    for name, sql in sorted(oracle.items()):
        try:
            spark_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            spark_cols = [c.lower() for c in spark_rel.columns]
            spark_rows = spark_rel.fetchall()
            duck_rel = con.sql(sql)
            duck_cols = [c.lower() for c in duck_rel.columns]
            duck_rows = duck_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: error {e}")
            failures.append(name)
            continue
        spark_types = dict(zip(spark_cols, [canon_type(t) for t in spark_rel.types]))
        duck_types = dict(zip(duck_cols, [canon_type(t) for t in duck_rel.types]))
        status = []
        if set(spark_cols) != set(duck_cols):
            status.append(f"cols spark={spark_cols} duck={duck_cols}")
        elif spark_types != duck_types:
            drift = {c: (spark_types[c], duck_types[c])
                     for c in spark_types if spark_types[c] != duck_types[c]}
            status.append(f"types (spark, duck) differ: {drift}")
        elif len(spark_rows) != len(duck_rows):
            status.append(f"rows spark={len(spark_rows)} duck={len(duck_rows)}")
        else:
            # align column order by name (driver sorts columns by name)
            sidx = [spark_cols.index(c) for c in sorted(spark_cols)]
            didx = [duck_cols.index(c) for c in sorted(duck_cols)]
            s = canon([[r[i] for i in sidx] for r in spark_rows])
            d = canon([[r[i] for i in didx] for r in duck_rows])
            nbad = 0
            example = None
            for rs, rd in zip(s, d):
                for x, y in zip(rs, rd):
                    if not eq(x, y):
                        nbad += 1
                        if example is None:
                            example = (x, y)
                        break
            if nbad:
                status.append(f"{nbad}/{len(s)} rows differ, e.g. {example}")
        if status:
            print(f"FAIL {name}: {'; '.join(status)}")
            failures.append(name)
        else:
            print(f"OK   {name} ({len(spark_rows)} rows)")
    print(f"\n{len(oracle) - len(failures)}/{len(oracle)} oracle queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
