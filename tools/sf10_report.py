#!/usr/bin/env python3
"""Merge a full-surface sf10 bench capture with the committed sf1 capture
into BENCH_SF10.json: per-query {sf1_sec, sf10_sec, ratio_for_10x} plus a
note slot for every ratio > 10 (contract explanation or fix pointer).

Usage: python3 tools/sf10_report.py <bench_sf10.json> <BENCH_SF1.json> <out.json> [note_json]
note_json: optional {query: note} map merged into >10x rows.
"""
import json
import sys


def qmap(path):
    d = json.loads(open(path).read().strip())
    return d, d["queries"]


def main():
    sf10_path, sf1_path, out_path = sys.argv[1], sys.argv[2], sys.argv[3]
    notes = json.loads(open(sys.argv[4]).read()) if len(sys.argv) > 4 else {}
    d10, q10 = qmap(sf10_path)
    _, q1 = qmap(sf1_path)
    rows = {}
    for q in sorted(q10):
        t10 = q10[q]
        t1 = q1.get(q)
        row = {"sf1_sec": round(t1, 2) if t1 is not None else None,
               "sf10_sec": round(t10, 2)}
        if t1 and t1 > 0 and t10 >= 0:
            row["ratio_for_10x"] = round(t10 / t1, 2)
        if t10 < 0:
            row["verdict"] = "FAILED at sf10"
        elif q in notes:
            row["verdict"] = notes[q]
        elif row.get("ratio_for_10x", 0) > 10:
            row["verdict"] = "OVER 10x - NEEDS A NOTE OR A FIX"
        rows[q] = row
    over = [q for q, r in rows.items() if r.get("ratio_for_10x", 0) > 10]
    out = {
        "note": ("full-surface sf10 checkpoint: every driver query on the "
                 "100-replica fixture (testdata_sf10, ScaleUp), single cold "
                 "pass at SPARK_DRIVER_MEM=32g; sf1 numbers are min-of-2 "
                 "from the committed BENCH_SF1.json. Grade: ratio <= ~10x "
                 "for 10x data; every >10x row carries a verdict."),
        "passes": d10.get("passes"),
        "failed": d10.get("failed"),
        "load_avg_at_gate": d10.get("load_avg_at_gate"),
        "n_queries": len(rows),
        "n_over_10x": len(over),
        "over_10x": sorted(over),
        "queries": rows,
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=False)
    print(f"wrote {out_path}: {len(rows)} queries, {len(over)} over 10x: {sorted(over)}")


if __name__ == "__main__":
    main()
