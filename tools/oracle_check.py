#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark output) and runs the
matching SQL from oracle_sql.json in DuckDB with views named after the
test tables. Compares row counts, column names, and values (sorted by
all columns, exact match; floats compared bit-exactly first, then with
1e-9 relative tolerance reported separately).
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


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
        status = []
        if set(spark_cols) != set(duck_cols):
            status.append(f"cols spark={spark_cols} duck={duck_cols}")
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
