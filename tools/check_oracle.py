#!/usr/bin/env python3
"""Local pre-check of the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <verifyOutDir> <sfDir>

Reads each <outDir>/<name>/ parquet (written by graft.Verify), runs the
matching oracle SQL from <outDir>/oracle_sql.json in DuckDB against the
sf parquet tables, and compares: row count, schema (column names), and
values (columns sorted by name, rows sorted by all columns).
"""
import json, sys, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)          # full precision repr — exact match required
    return repr(v)

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out

# The driver's hasher goes through pandas: HUGEINT/DECIMAL columns become
# float/object and hash differently from BIGINT even when values are equal
# (round-1 lesson: SUM(int) in DuckDB returns HUGEINT). Int widths below
# 128 bits all collapse to the same repr, so they're equivalent.
def norm_type(t):
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT"):
        return "int"
    if t in ("FLOAT", "DOUBLE"):
        return "float"
    return t

def type_mismatch(con, out_dir, name, sql):
    got = dict((r[0], norm_type(r[1])) for r in con.execute(
        f"DESCRIBE SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchall())
    want = dict((r[0], norm_type(r[1])) for r in con.execute(
        f"DESCRIBE {sql}").fetchall())
    return {c: (got.get(c), want.get(c))
            for c in set(got) | set(want) if got.get(c) != want.get(c)}

def main(out_dir, sf_dir):
    import os, time
    # Sweep knobs (both optional): CHECK_ONLY=<substr,substr> restricts to
    # matching query names; CHECK_SKIP=<substr,substr> drops names whose
    # DuckDB twin is infeasible at the current scale (e.g. the all-pairs
    # levenshtein oracle at sf1); CHECK_TIMES=1 prints per-query seconds.
    only = [s for s in os.environ.get("CHECK_ONLY", "").split(",") if s]
    skip = [s for s in os.environ.get("CHECK_SKIP", "").split(",") if s]
    times = os.environ.get("CHECK_TIMES") == "1"
    # CHECK_JSON_OUT=<path>: also write the sweep as a committed-artifact
    # JSON (per-query pass/rows/oracle_sec + summary) — the shape of
    # CORRECTNESS_SF1.json. CHECK_SKIP'd queries get skipped=true stubs;
    # fill in skip_reason by hand where a DuckDB twin is infeasible.
    json_out = os.environ.get("CHECK_JSON_OUT")
    art = {}
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    for name, sql in sorted(oracle.items()):
        if only and not any(s in name for s in only):
            continue
        if any(s in name for s in skip):
            print(f"SKIP {name} (CHECK_SKIP)")
            art[name] = {"skipped": True}
            n_skip += 1
            continue
        t0 = time.time()
        def fail(msg):
            print(f"FAIL {name}: {msg}")
            art[name] = {"pass": False, "detail": msg[:300],
                         "oracle_sec": round(time.time() - t0, 1)}
        try:
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchall()
            got_cols = [d[0] for d in con.description]
            want = con.execute(sql).fetchall()
            want_cols = [d[0] for d in con.description]
        except Exception as e:
            fail(f"exception {e}")
            n_fail += 1
            continue
        if sorted(got_cols) != sorted(want_cols):
            fail(f"cols spark={sorted(got_cols)} oracle={sorted(want_cols)}")
            n_fail += 1
            continue
        tdiff = type_mismatch(con, out_dir, name, sql)
        if tdiff:
            fail(f"type mismatch (spark,oracle): {tdiff}")
            n_fail += 1
            continue
        g, w = canon(got, got_cols), canon(want, want_cols)
        if len(g) != len(w):
            fail(f"rows spark={len(g)} oracle={len(w)}")
            n_fail += 1
        elif g != w:
            diff = [(a, b) for a, b in zip(g, w) if a != b][:3]
            fail(f"value mismatch, first diffs: {diff}")
            n_fail += 1
        else:
            suffix = f" [{time.time() - t0:.1f}s]" if times else ""
            print(f"PASS {name} ({len(g)} rows){suffix}", flush=True)
            art[name] = {"pass": True, "rows": len(g),
                         "oracle_sec": round(time.time() - t0, 1)}
            n_pass += 1
    skipped = f", {n_skip} skip" if n_skip else ""
    print(f"== {n_pass} pass, {n_fail} fail{skipped} ==")
    if json_out:
        doc = {"queries": art, "sf_dir": sf_dir,
               "summary": {"pass": n_pass, "fail": n_fail, "skip": n_skip}}
        with open(json_out, "w") as f:
            json.dump(doc, f, indent=1, sort_keys=True)
        print(f"artifact written: {json_out}")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
