#!/usr/bin/env bash
# Canonical benchmark invocation: stdout is EXACTLY two JSON lines —
# the full per-query summary, then a SHORT machine-readable trailer
# ({"metric":"total",...,"n_queries":N,...}) printed LAST so a consumer
# holding only a bounded TAIL of stdout still parses the verdict
# (round 14: BENCH_r13.json was rc=0 yet parsed:null because the single
# 196-query line truncated mid-object in the driver's tail window).
#
# Why this wrapper exists: two rounds of BENCH_r{N}.json came back with
# "parsed": null because a bare `sbt "runMain graft.Bench"` wraps the JSON
# in sbt decoration ("[info] running ...", "[success] Total time ...") and
# pre-setLogLevel Spark startup lines. Fixes layered here:
#   - `sbt -error` silences sbt's own [info]/[success] decoration;
#   - build.sbt pins `run / outputStrategy := Some(StdoutOutput)` so the
#     forked JVM's stdout bypasses sbt's (now error-level) logger;
#   - Spark/log4j noise goes to stderr, which this script leaves untouched;
#   - a final grep keeps only the JSON line as belt-and-braces — if the JVM
#     ever prints an unexpected stdout line, the contract still holds.
# Bench also writes the identical JSON whole to BENCH_local_<sf>.json, so
# no consumer ever depends on a bounded stdout tail.
#
# Usage:  tools/bench.sh                         # full suite at $SPARK_GRAFT_SF_DIR
#         SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 tools/bench.sh
#         SPARK_GRAFT_BENCH_ONLY=q31 tools/bench.sh   # iterate on one query
set -euo pipefail
cd "$(dirname "$0")/.."
: "${SPARK_GRAFT_SF_DIR:=/root/testdata/sf0.1}"
export SPARK_GRAFT_SF_DIR
sbt -error -batch "runMain graft.Bench" | grep -E '^\{"(queries|metric)"'
