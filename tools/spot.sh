#!/bin/bash
# Quick local spot bench: tools/spot.sh '<regex>' [passes] [sfdir] [out]
# Gates disabled — iteration numbers only, never committed artifacts.
set -e
REGEX="${1:?usage: spot.sh <regex> [passes] [sfdir] [out]}"
PASSES="${2:-1}"
SFDIR="${3:-/root/testdata/sf0.1}"
OUT="${4:-/tmp/spot.json}"
SPARK_GRAFT_SF_DIR="$SFDIR" SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_ONLY="$REGEX" SPARK_GRAFT_BENCH_PASSES="$PASSES" \
SPARK_GRAFT_LOAD_GATE=0 SPARK_GRAFT_CAL_GATE=0 \
SPARK_GRAFT_BENCH_OUT="$OUT" \
sbt -batch "runMain graft.Bench" 2>&1 | grep -E "\[bench\]|error\]" | tail -40
