#!/usr/bin/env python3
"""Merge an sf30 spot capture with the committed sf1/sf10 captures into a
three-point scaling artifact: per-query {sf1_sec, sf10_sec, sf30_sec,
ratio_sf30_over_sf10 (3x data), ratio_sf30_over_sf1 (30x data)} plus a
verdict slot for every row whose sf30/sf10 ratio exceeds ~3x linear.

BENCH_SF10.json stores per-query dicts ({sf1_sec, sf10_sec, ...}); plain
bench captures store per-query seconds — both shapes are accepted.

Usage: python3 tools/sf30_report.py <bench_sf30.json> <BENCH_SF1.json> \
           <BENCH_SF10.json> <out.json> [note_json]
note_json: optional {query: verdict} map; also used for queries excluded
from the run (key prefixed "excluded:" keeps them in the artifact).
"""
import json
import sys


def qsec(path, key):
    d = json.loads(open(path).read().strip())
    out = {}
    for q, v in d["queries"].items():
        out[q] = v[key] if isinstance(v, dict) else v
    return d, out


def main():
    sf30_path, sf1_path, sf10_path, out_path = sys.argv[1:5]
    notes = json.loads(open(sys.argv[5]).read()) if len(sys.argv) > 5 else {}
    d30, q30 = qsec(sf30_path, "sf30_sec")
    _, q1 = qsec(sf1_path, "sf1_sec")
    _, q10 = qsec(sf10_path, "sf10_sec")
    rows = {}
    for q in sorted(q30):
        t30, t10, t1 = q30[q], q10.get(q), q1.get(q)
        row = {"sf1_sec": round(t1, 2) if t1 is not None else None,
               "sf10_sec": round(t10, 2) if t10 is not None else None,
               "sf30_sec": round(t30, 2)}
        if t10 and t10 > 0:
            row["ratio_sf30_over_sf10_for_3x"] = round(t30 / t10, 2)
        if t1 and t1 > 0:
            row["ratio_sf30_over_sf1_for_30x"] = round(t30 / t1, 2)
        if t30 < 0:
            row["verdict"] = "FAILED at sf30"
        elif q in notes:
            row["verdict"] = notes[q]
        elif row.get("ratio_sf30_over_sf10_for_3x", 0) > 4.5:
            row["verdict"] = "OVER ~3x-linear - NEEDS A NOTE OR A FIX"
        rows[q] = row
    excluded = {k.split(":", 1)[1]: v for k, v in notes.items()
                if k.startswith("excluded:")}
    over = [q for q, r in rows.items()
            if r.get("ratio_sf30_over_sf10_for_3x", 0) > 4.5]
    out = {
        "note": ("sf30 spot checkpoint (300 replicas of sf0.1, past the old "
                 "312-affine text ceiling mechanism via the r13 textPerms "
                 "lift): the slowest sf10 queries re-measured at 3x sf10 for "
                 "a third scale point; min-of-%d passes"
                 % d30.get("passes", 1)),
        "sf": d30.get("sf"),
        "passes": d30.get("passes"),
        "valid": d30.get("valid"),
        "load_tainted": d30.get("load_tainted"),
        "load_avg_before": d30.get("load_avg_before"),
        "load_line_at_gate": d30.get("load_line_at_gate"),
        "load_gate_waited_sec": d30.get("load_gate_waited_sec"),
        "calibration_before": d30.get("calibration_before"),
        "calibration_after": d30.get("calibration_after"),
        "calibration_ratio": d30.get("calibration_ratio"),
        "shared_warmup": d30.get("shared_warmup"),
        "queries_total": d30.get("queries_total"),
        "over_3x_linear": sorted(over),
        "excluded": excluded,
        "queries": rows,
        "queries_samples": d30.get("queries_samples"),
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({q: rows[q] for q in over}, indent=1) if over
          else "all rows within ~3x-linear")


if __name__ == "__main__":
    main()
