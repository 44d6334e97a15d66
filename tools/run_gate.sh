#!/usr/bin/env bash
# Full local gate: tests + verify-vs-DuckDB at the given SF (default the
# driver's sf0.01) + bench. Mirrors what the round driver runs.
set -euo pipefail
cd "$(dirname "$0")/.."
SF="${1:-sf0.01}"
sbt -batch test
env SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-8}" \
  sbt -batch "runMain graft.Verify /root/testdata/$SF /tmp/gate_$SF"
python3 tools/check_correctness.py "/tmp/gate_$SF" "/root/testdata/$SF"
env SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
  sbt -batch "runMain graft.Bench" | { grep metric || true; }
