#!/usr/bin/env python3
"""Build the DuckDB-oracle view of a ScaleUp-produced fixture.

graft.tools.ScaleUp runs in Spark, which has no nanosecond timestamp type:
it reads the driver fixture's TIMESTAMP(NANOS) events.ts as epoch-nanos
BIGINT (spark.sql.legacy.parquet.nanosAsLong) and writes it back as plain
BIGINT. Spark consumers see identical values either way, but the oracle SQL
calls epoch_ns(ts), which needs a timestamp type.

On the DRIVER fixture, DuckDB 1.0 reads TIMESTAMP(NANOS) as a microsecond
TIMESTAMP — i.e. the oracle side is µs-TRUNCATED while Spark keeps full
nanos (all committed queries already normalize through µs-derived columns,
so both engines agree). This script reproduces exactly that oracle view for
the scaled fixture: a companion dir of symlinks with events.parquet
rewritten as make_timestamp(ts // 1000).

Usage: python3 tools/make_oracle_dir.py [sf_dir] [oracle_dir]
       defaults: /root/repo/testdata_sf1 /tmp/sf1_oracle
"""
import glob
import os
import sys
import duckdb

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata_sf1"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1_oracle"
os.makedirs(out, exist_ok=True)
con = duckdb.connect()
for f in glob.glob(f"{sf}/*.parquet"):
    dst = os.path.join(out, os.path.basename(f))
    if os.path.lexists(dst):
        os.remove(dst)
    if os.path.basename(f) != "events.parquet":
        os.symlink(f, dst)
        continue
    t = con.execute(f"SELECT typeof(ts) FROM '{f}' LIMIT 1").fetchone()[0]
    if t != "BIGINT":           # already a timestamp type: view matches
        os.symlink(f, dst)
        continue
    con.execute(f"""
      COPY (SELECT * REPLACE (make_timestamp(ts // 1000) AS ts) FROM '{f}')
      TO '{dst}' (FORMAT PARQUET)""")
    print(f"events.ts BIGINT -> TIMESTAMP(us) at {dst}")
print(f"oracle dir ready: {out}")
