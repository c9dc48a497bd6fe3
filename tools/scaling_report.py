#!/usr/bin/env python3
"""Scaling-curvature report (r13 verdict next-round #7).

Usage: python3 tools/scaling_report.py <bench_small.json> <bench_big.json> <out.json>

Each input is a graft.Bench stdout file whose LAST line is the JSON
summary ({"queries": {name: best_sec, ...}, "sf": ...}). Emits per-query
slopes t_big/t_small beside the data-scale ratio, ranked by t_big, and
names every superlinear mover (slope > data ratio — per-query fixed
overhead means honest linear scaling shows slope WELL BELOW the data
ratio at these SFs, so slope >= ratio is a red flag, not noise).
"""
import json
import sys
from pathlib import Path


def last_json(path):
    lines = [l for l in Path(path).read_text().splitlines() if l.strip().startswith("{")]
    return json.loads(lines[-1])


def main():
    small, big, out = sys.argv[1], sys.argv[2], sys.argv[3]
    s, b = last_json(small), last_json(big)

    def sf_of(d, default):
        raw = str(d.get("sf", default))
        m = raw.rsplit("sf", 1)[-1]
        try:
            return float(m)
        except ValueError:
            return default

    sf_s, sf_b = sf_of(s, 0.01), sf_of(b, 0.1)
    data_ratio = sf_b / sf_s
    qs, qb = s["queries"], b["queries"]
    rows = []
    for name in sorted(qb):
        ts, tb = qs.get(name, -1.0), qb[name]
        if ts is None or tb is None or ts <= 0 or tb <= 0:
            continue
        rows.append({"query": name, "t_small": round(ts, 3),
                     "t_big": round(tb, 3), "slope": round(tb / ts, 2)})
    rows.sort(key=lambda r: -r["t_big"])
    superlinear = [r for r in rows if r["slope"] >= data_ratio]
    report = {
        "sf_small": sf_s, "sf_big": sf_b, "data_ratio": data_ratio,
        "note": ("slope = t(sf_big)/t(sf_small); per-query fixed overhead "
                 "(session, planning, tiny-table gates) keeps honest linear "
                 "operators WELL below the data ratio at these SFs, so any "
                 "slope >= data_ratio names a superlinear mover to audit"),
        "superlinear": superlinear,
        "top_by_t_big": rows[:25],
        "all": rows,
    }
    Path(out).parent.mkdir(parents=True, exist_ok=True)
    Path(out).write_text(json.dumps(report, indent=1) + "\n")
    print(f"queries: {len(rows)}, data_ratio: {data_ratio:g}, "
          f"superlinear: {[r['query'] for r in superlinear]}")
    for r in rows[:20]:
        print(f"  {r['query']:<28} {r['t_small']:>7.3f}s -> {r['t_big']:>7.3f}s  slope {r['slope']:>5.2f}")


if __name__ == "__main__":
    main()
