#!/bin/bash
cd /root/repo
echo "=== [1] sbt test ==="
sbt -batch test 2>&1 | grep -E "Tests:|Suites:|\*\*\*" | tail -3
echo "=== [2] full sf0.01 verify ==="
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/graft_b16_sf001" 2>&1 | tail -1
python3 tools/selfcheck.py /root/testdata/sf0.01 /tmp/graft_b16_sf001 2>&1 | tail -2
echo "=== [3] local5 invariance ==="
SPARK_GRAFT_CPUS=5 sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/graft_b16_l5" 2>&1 | tail -1
python3 tools/selfcheck.py /root/testdata/sf0.01 /tmp/graft_b16_l5 2>&1 | tail -2
echo "=== [4] stacked VerifyThenBench sf0.1 ==="
SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.tools.VerifyThenBench /root/testdata/sf0.1 /tmp/graft_b16_sf01" 2>/dev/null | grep -E "^..metric" | tail -1
echo "=== [5] full sf0.1 DuckDB gate ==="
SELFCHECK_TMP=/tmp/sc_b16 python3 tools/selfcheck.py /root/testdata/sf0.1 /tmp/graft_b16_sf01 2>&1 | tail -2
echo "=== [6] quiet bench anchor 1 ==="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" 2>/dev/null | grep -E "^..metric" | tail -1
echo "=== [7] quiet bench anchor 2 ==="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" 2>/dev/null | grep -E "^..metric" | tail -1
echo "=== battery done ==="
