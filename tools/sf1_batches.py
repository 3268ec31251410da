#!/usr/bin/env python3
"""Partitioned sf1 DuckDB gate: run selfcheck over the sf1 dump in
sequential single-process batches (concurrent heavy-oracle processes
spill-storm the disk), excluding the two documented oracle-infeasible
stress rows (the 0.3-threshold quadratic dbscan oracles)."""
import json, os, subprocess, sys

DUMP = sys.argv[1] if len(sys.argv) > 1 else '/tmp/graft_b17_sf1'
SF = sys.argv[2] if len(sys.argv) > 2 else '/tmp/graft_sf1'
SKIP = {'q_emb_dbscan_persisted', 'q_emb_dbscan_stress'}
B = 32

names = sorted(json.load(open(os.path.join(DUMP, 'oracle_sql.json'))).keys())
names = [n for n in names if n not in SKIP]
total_pass = total_fail = 0
fails = []
for i in range(0, len(names), B):
    batch = names[i:i + B]
    env = dict(os.environ, SELFCHECK_TMP='/tmp/sc_b17_sf1')
    try:
        r = subprocess.run(
            ['python3', 'tools/selfcheck.py', SF, DUMP] + batch,
            env=env, capture_output=True, text=True, timeout=5400)
        tail = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else 'NO OUTPUT'
    except subprocess.TimeoutExpired:
        tail = 'TIMEOUT'
    print(f'[batch {i//B:02d}] {tail}', flush=True)
    if tail.startswith('PASS='):
        p = int(tail.split('PASS=')[1].split()[0])
        f = int(tail.split('FAIL=')[1].split()[0])
        total_pass += p
        total_fail += f
        if f:
            bad = [l for l in r.stdout.splitlines() if '[FAIL]' in l]
            for l in bad:
                print('   ', l, flush=True)
            fails.append((i // B, bad))
    else:
        fails.append((i // B, tail))
print(f'SF1 SWEEP: PASS={total_pass} FAIL={total_fail} '
      f'skipped={len(SKIP)} batches_bad={len(fails)}', flush=True)
