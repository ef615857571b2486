#!/usr/bin/env bash
# Multi-JVM correctness gate: run graft.Verify under local-cluster[2,8,4096]
# (executors in SEPARATE JVMs — real serialization boundaries for
# broadcasts, TypedImperativeAggregate buffers, expression closures), then
# the DuckDB compare on that dump. See BENCH_NOTES.md "Round 19".
#
# Usage: tools/lc_verify.sh [sfDir] [outDir] [onlyCsvNames]
set -euo pipefail
cd "$(dirname "$0")/.."
SF="${1:-/root/testdata/sf0.01}"
OUT="${2:-target/verify-lc}"
ONLY="${3:-}"

sbt -batch compile "export Runtime/fullClasspath" 2>/dev/null \
  | grep -E '^/' | tail -1 > target/runtime_cp.txt
CP=$(cat target/runtime_cp.txt)

SPARK_HOME=/opt/spark \
SPARK_SCALA_VERSION=2.13 \
SPARK_GRAFT_MASTER='local-cluster[2,8,4096]' \
SPARK_GRAFT_EXECUTOR_CP="$CP" \
SPARK_GRAFT_CPUS=16 \
java -Dfile.encoding=UTF-8 -cp "$CP" -Xmx8g graft.Verify "$SF" "$OUT" $ONLY

python3 tools/compare.py "$SF" "$OUT"
