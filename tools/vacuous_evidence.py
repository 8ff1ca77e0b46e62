#!/usr/bin/env python3
"""Record the NON-VACUOUS differential evidence for queries that are
declared-empty on the verify fixture (round-11 verdict task 2): runs
the t2 comparison for each declared-vacuous query at a scale factor
where its output is non-empty, and writes VACUOUS_EVIDENCE.json —
so the committed artifacts, not a judge-run, carry the proof that the
cross-engine logic was exercised on real rows.

Usage: python3 tools/vacuous_evidence.py <sfDir> <verifyOutDir> [queries...]
(run graft.Verify for the queries at <sfDir> first)
"""
import json
import sys

import duckdb
import pandas as pd

from t2_local import TABLES, frame_key


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    queries = sys.argv[3:]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    out = {}
    for name in queries:
        got = pd.read_parquet(f"{out_dir}/{name}")
        exp = con.execute(oracle[name]).df()
        gc, gr, _ = frame_key(got, name, "spark")
        ec, er, _ = frame_key(exp, name, "oracle")
        out[name] = {
            "sf_dir": sf_dir,
            "spark_rows": len(gr),
            "oracle_rows": len(er),
            "schema_match": gc == ec,
            "hash_match": gr == er,
            "non_vacuous": len(gr) > 0,
        }
        status = "PASS" if gr == er and gc == ec and gr else "FAIL"
        print(f"{status} {name}: {len(gr)} rows vs {len(er)}")
    with open("VACUOUS_EVIDENCE.json", "w") as f:
        json.dump(out, f, indent=2, sort_keys=True)
    ok = all(v["hash_match"] and v["schema_match"] and v["non_vacuous"]
             for v in out.values())
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
