#!/usr/bin/env python3
"""Local stand-in for the driver's t2 differential check.

Usage: python3 tools/t2_local.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet dump produced by graft.Verify,
runs the paired SQL from oracle_sql.json in DuckDB against views named
after the tables in <sfDir>, and compares (rows, schema names, values)
with columns sorted by name and rows sorted canonically — approximating
the driver's hash compare so mismatches surface before the round ends.

Dev tooling only — the Scala library has no Python dependency.
"""
import json
import math
import sys

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def table_key(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(canon(r[i]) for i in order))
    out.sort()
    return [cols[i] for i in order], out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            gcols = [d[0] for d in got.description]
            grows = got.fetchall()
            exp = con.execute(sql)
            ecols = [d[0] for d in exp.description]
            erows = exp.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        gc, gr = table_key(gcols, grows)
        ec, er = table_key(ecols, erows)
        if gc != ec:
            print(f"FAIL {name}: schema {gc} != {ec}")
            n_fail += 1
        elif gr != er:
            diffs = [
                (a, b) for a, b in zip(gr, er) if a != b
            ][:3]
            print(
                f"FAIL {name}: rows spark={len(gr)} oracle={len(er)}; "
                f"first diffs: {diffs}")
            if len(gr) != len(er):
                only_g = set(gr) - set(er)
                only_e = set(er) - set(gr)
                print(f"  only-spark: {list(only_g)[:2]}")
                print(f"  only-oracle: {list(only_e)[:2]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(gr)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
