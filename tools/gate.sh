#!/bin/bash
# Full local gate: compile, tests, DuckDB-oracle verify at both scale
# factors, benchmark. Mirrors what the round driver checks.
set -e
cd "$(dirname "$0")/.."
echo "== compile =="
sbt -batch compile
echo "== tests =="
SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-8} sbt -batch test
echo "== verify sf0.01 =="
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/gate_sf001"
python3 tools/check.py /root/testdata/sf0.01 /tmp/gate_sf001
echo "== verify sf0.1 =="
sbt -batch "runMain graft.Verify /root/testdata/sf0.1 /tmp/gate_sf01"
python3 tools/check.py /root/testdata/sf0.1 /tmp/gate_sf01
echo "== bench sf0.1 =="
# 32 threads mirrors the round driver's local[32] bench environment
SPARK_GRAFT_CPUS=${SPARK_GRAFT_BENCH_CPUS:-32} SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  sbt -batch "runMain graft.Bench"
echo "== gate PASSED =="
