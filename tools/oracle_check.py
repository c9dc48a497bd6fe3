#!/usr/bin/env python3
"""Local replica of the driver's DuckDB correctness gate.

Usage:
  python3 tools/oracle_check.py [--json <summary_path>] <verify_out_dir> [sf_dir] [name ...]

--json writes a machine-readable summary ({"sf_dir", "total", "passed",
"queries": {name: "pass" | "<failure reason>"}}) — the closing
discipline writes it to bench_results/correctness_rN_closing.json so a
round's hard correctness signal survives even if the driver-side
artifact ships empty (the r8 lesson: CORRECTNESS_r08.json was {}).

1. graft.Verify has already dumped each SparkEntry query to
   <verify_out_dir>/<name>/ (parquet) plus oracle_sql.json.
2. For each oracled name, run the SQL in DuckDB over the raw testdata
   parquet, sort columns by name (the driver's rule), sort rows, and
   compare against the Spark parquet cell-by-cell (exact for
   non-floats, 1e-9 relative for floats).

Driver-side python env has duckdb+pandas+pyarrow; this never runs on
the Spark classpath.
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()


def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(by=list(df.columns), ignore_index=True,
                          key=lambda s: s.map(lambda v: str(v)))


def cells_equal(a, b):
    if a is None and b is None:
        return True
    try:
        if isinstance(a, float) or isinstance(b, float):
            fa, fb = float(a), float(b)
            if math.isnan(fa) and math.isnan(fb):
                return True
            return math.isclose(fa, fb, rel_tol=1e-9, abs_tol=1e-12)
    except (TypeError, ValueError):
        pass
    if str(a) == str(b):
        return True
    # pandas NaN vs None
    try:
        if a != a and b != b:  # noqa: PLR0124 — NaN check
            return True
    except Exception:
        pass
    return False


def main():
    argv = list(sys.argv[1:])
    json_out = None
    if argv and argv[0] == "--json":
        json_out = Path(argv[1])
        argv = argv[2:]
    out_dir = Path(argv[0])
    sf_dir = Path(argv[1]) if len(argv) > 1 else Path("/root/testdata/sf0.01")
    only = set(argv[2:])

    con = duckdb.connect()
    for t in TABLES:
        p = sf_dir / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    oracle_sql = json.loads((out_dir / "oracle_sql.json").read_text())
    names = sorted(n for n in oracle_sql if not only or n in only)
    failures = []
    for name in names:
        spark_dir = out_dir / name
        if not spark_dir.exists():
            failures.append((name, "missing spark dump"))
            print(f"FAIL {name}: spark dump missing")
            continue
        try:
            spark_df = con.execute(
                f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')").df()
            ora_df = con.execute(oracle_sql[name]).df()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"exec error: {e}"))
            print(f"FAIL {name}: {e}")
            continue
        s, o = norm(spark_df), norm(ora_df)
        if list(s.columns) != list(o.columns):
            failures.append((name, f"schema {list(s.columns)} vs {list(o.columns)}"))
            print(f"FAIL {name}: schema {list(s.columns)} vs {list(o.columns)}")
            continue
        if len(s) != len(o):
            failures.append((name, f"rows {len(s)} vs {len(o)}"))
            print(f"FAIL {name}: rows {len(s)} vs {len(o)}")
            continue
        bad = None
        for col in s.columns:
            sv, ov = s[col].tolist(), o[col].tolist()
            for i, (a, b) in enumerate(zip(sv, ov)):
                if not cells_equal(a, b):
                    bad = (col, i, a, b)
                    break
            if bad:
                break
        if bad:
            failures.append((name, f"value {bad}"))
            print(f"FAIL {name}: col={bad[0]} row={bad[1]} spark={bad[2]!r} oracle={bad[3]!r}")
        else:
            print(f"ok   {name} ({len(s)} rows)")

    print(f"\n{len(names) - len(failures)}/{len(names)} pass")
    if json_out is not None:
        failed = dict(failures)
        summary = {
            "sf_dir": str(sf_dir),
            "total": len(names),
            "passed": len(names) - len(failures),
            "queries": {n: failed.get(n, "pass") for n in names},
        }
        json_out.parent.mkdir(parents=True, exist_ok=True)
        json_out.write_text(json.dumps(summary, indent=1, sort_keys=True) + "\n")
        print(f"summary -> {json_out}")
    if failures:
        sys.exit(1)


if __name__ == "__main__":
    main()
