#!/bin/bash
# Round-19 CONTINUATION battery (second half of the round: branches/WAP,
# SPJ over transforms, transform-clustered writes, staging sweep,
# generation high-water mark — registry 403 -> 406). Same shape as
# battery_r19.sh; sequential because sbt holds a project lock and
# concurrent heavy DuckDB oracles spill-storm the disk. The sf1 fixture
# at /tmp/graft_sf1 was REGENERATED on this HEAD (the write path gained
# pv claims and transform-clustered distributions this half).
cd /root/repo
echo "=== [1] local5 invariance sf0.01 ==="
SPARK_GRAFT_CPUS=5 sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/graft_b19b_l5" 2>&1 | tail -1
python3 tools/selfcheck.py /root/testdata/sf0.01 /tmp/graft_b19b_l5 2>&1 | tail -1
echo "=== [2] stacked VerifyThenBench sf0.1 ==="
SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.tools.VerifyThenBench /root/testdata/sf0.1 /tmp/graft_b19b_sf01" 2>/dev/null | grep -E '^\{"metric"' | tail -1
echo "=== [3] full sf0.1 DuckDB gate ==="
SELFCHECK_TMP=/tmp/sc_b19b python3 tools/selfcheck.py /root/testdata/sf0.1 /tmp/graft_b19b_sf01 2>&1 | tail -1
echo "=== [4] quiet bench anchor sf0.1 ==="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" 2>/dev/null | grep -E '^\{"metric"' | tail -1
echo "=== [5] archive the cleanest run + derive the BASELINE sentence ==="
python3 tools/pick_bench.py /root/testdata/sf0.1 3
echo "=== [6] sf1 one-pass Verify (full registry) ==="
sbt -batch "runMain graft.Verify /tmp/graft_sf1 /tmp/graft_b19b_sf1" 2>&1 | grep -E "\[verify\].*failed" | head -20
# PIPESTATUS[0], not $? — the pipeline tail (head) always exits 0 and
# would self-certify a failing sweep green (code-review r19)
echo "sf1 verify exit: ${PIPESTATUS[0]}"
echo "=== [7] sf1 DuckDB gate, partitioned batches ==="
python3 tools/sf1_batches.py /tmp/graft_b19b_sf1 /tmp/graft_sf1
echo "=== battery_r19b done ==="
