#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
for each query dir in <outDir>, loads the Spark parquet result and the
corresponding oracle SQL (oracle_sql.json) evaluated by DuckDB over the
same testdata tables, sorts columns by name and rows by value, and
compares. Usage: python3 tools/selfcheck.py <sfDir> <outDir> [query...]
"""
import json
import math
import os
import sys

import duckdb


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = repr(v)
            vals.append(str(v))
        out.append(tuple(vals))
    out.sort()
    return [cols[i] for i in order], out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    # Concurrent gate runs (e.g. the sf1 scale battery) must not share
    # spill files or overcommit RAM: SELFCHECK_TMP isolates the spill dir,
    # SELFCHECK_MEM caps this process's DuckDB memory.
    if os.environ.get("SELFCHECK_TMP"):
        os.makedirs(os.environ["SELFCHECK_TMP"], exist_ok=True)
        con.execute(f"SET temp_directory='{os.environ['SELFCHECK_TMP']}'")
    if os.environ.get("SELFCHECK_MEM"):
        con.execute(f"SET memory_limit='{os.environ['SELFCHECK_MEM']}'")
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        # Driver testdata is one file per table; scale fixtures (ScaleAllFixture)
        # are Spark-written directories of part files — glob those.
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)

    n_pass = n_fail = n_noracle = 0
    for name in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir):
            continue
        if only and name not in only:
            continue
        res = con.execute(f"SELECT * FROM read_parquet('{qdir}/*.parquet')")
        got_cols = [d[0] for d in res.description]
        got = res.fetchall()
        if name not in oracles:
            n_noracle += 1
            print(f"  [rows-only] {name}: {len(got)} rows")
            continue
        # Type-lint: DuckDB types whose text rendering can drift from
        # Spark's (HUGEINT from uncast sum(), DECIMAL scale, FLOAT repr)
        # must never appear in an oracle's output schema — cast in the SQL.
        rel = con.sql(oracles[name])
        bad = [(c, str(t)) for c, t in zip(rel.columns, rel.types)
               if str(t) in ("HUGEINT", "UHUGEINT", "FLOAT")
               or str(t).startswith("DECIMAL")]
        if bad:
            n_fail += 1
            print(f"  [FAIL type-lint] {name}: drift-prone oracle column types {bad}")
            continue
        exp_res = con.execute(oracles[name])
        exp_cols = [d[0] for d in exp_res.description]
        exp = exp_res.fetchall()
        gc, gr = canon(got, got_cols)
        ec, er = canon(exp, exp_cols)
        if gc != ec:
            n_fail += 1
            print(f"  [FAIL cols] {name}: spark={gc} duck={ec}")
        elif gr != er:
            n_fail += 1
            print(f"  [FAIL rows] {name}: spark {len(gr)} rows vs duck {len(er)} rows")
            sg, se = set(gr), set(er)
            for d in list(sg - se)[:3]:
                print(f"     spark-only: {d}")
            for d in list(se - sg)[:3]:
                print(f"     duck-only:  {d}")
        else:
            n_pass += 1
            print(f"  [ok] {name}: {len(gr)} rows")
    print(f"PASS={n_pass} FAIL={n_fail} ROWS_ONLY={n_noracle}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
