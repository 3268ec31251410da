#!/bin/bash
cd /root/repo
echo "=== tests ==="
sbt -batch test 2>&1 | grep -E "Tests:|Suites:|\*\*\*" | tail -3
echo "=== sf0.01 full ==="
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/graft_c16_sf001" 2>&1 | tail -1
python3 tools/selfcheck.py /root/testdata/sf0.01 /tmp/graft_c16_sf001 2>&1 | tail -2
echo "=== stacked sf0.1 ==="
SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.tools.VerifyThenBench /root/testdata/sf0.1 /tmp/graft_c16_sf01" 2>/dev/null | grep -E "^..metric" | tail -1
echo "=== sf0.1 gate ==="
SELFCHECK_TMP=/tmp/sc_c16 python3 tools/selfcheck.py /root/testdata/sf0.1 /tmp/graft_c16_sf01 2>&1 | tail -2
echo "=== closing gate done ==="
