#!/usr/bin/env python3
"""Compute per-query bench noise bands from committed BENCH_FULL.json history.

Round-14 verdict tasks 2 + 7: the drift tripwire used to compare against a
SINGLE previous artifact, so one anomalously fast committed baseline (the
overnight-fast r13-close record) made 13 honest queries read as a 2x
"regression cluster". This tool walks `git log -- BENCH_FULL.json`, parses
each committed record's per-query minima, and emits BENCH_BANDS.json with,
per query:

  - min / median / max over ALL committed records that carry the query
  - med3: median of the LAST 3 committed records (the tripwire baseline)
  - n: how many records carry the query

Bench.scala reads BENCH_BANDS.json (SPARK_GRAFT_BENCH_BANDS, default the
repo file) and trips a drift only when a query's min-of-N exceeds BOTH
3x med3 AND the historical max — so sub-second queries with documented
+/-2x idle-state swing (q_self_bleu 0.31-0.71s across byte-identical code)
stop consuming drift attention, and one outlier baseline can't fake a
cluster. Queries absent from the bands (new this round) fall back to the
previous-artifact min, as before.

Records that stamped any drift machine_slow are EXCLUDED (round-16): they
measured themselves on a contended host, and one such record in the last-3
window would raise every query's med3 baseline for three rounds.

Usage: python3 tools/bench_bands.py [--repo DIR] [--out BENCH_BANDS.json]
Run it after committing a fresh idle BENCH_FULL record; commit the output.
"""
import argparse
import json
import statistics
import subprocess


def committed_records(repo):
    shas = subprocess.run(
        ["git", "-C", repo, "log", "--format=%H", "--", "BENCH_FULL.json"],
        check=True, capture_output=True, text=True).stdout.split()
    out = []  # newest first
    seen_blobs = set()
    for sha in shas:
        try:
            txt = subprocess.run(
                ["git", "-C", repo, "show", f"{sha}:BENCH_FULL.json"],
                check=True, capture_output=True, text=True).stdout
        except subprocess.CalledProcessError:
            continue  # commit touched the path by deleting it
        if not txt.strip():
            continue
        blob = hash(txt)
        if blob in seen_blobs:  # same artifact re-committed (merge etc.)
            continue
        seen_blobs.add(blob)
        try:
            rec = json.loads(txt)
        except json.JSONDecodeError:
            continue
        qs = rec.get("queries")
        if not (isinstance(qs, dict) and qs):
            continue
        # Round-16 (r15 verdict task 1): a record that stamped ANY of its
        # drifts machine_slow measured itself on a contended host — its
        # minima are inflated and must not enter the bands (the r15-close
        # driver record carried q_mlm_mask_plan at 12x with control_ratio
        # 8.88; letting it into med3 would raise every query's tripwire
        # baseline for three rounds). machine_slow:false drifts are kept:
        # a real code regression's cost is real history.
        drifts = rec.get("drifts") or {}
        slow = [q for q, d in drifts.items()
                if isinstance(d, dict) and d.get("machine_slow")]
        if slow:
            print(f"skipping contended record {sha[:9]} "
                  f"(machine_slow drifts: {', '.join(sorted(slow))})")
            continue
        out.append((sha, qs))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--repo", default=".")
    ap.add_argument("--out", default="BENCH_BANDS.json")
    args = ap.parse_args()
    recs = committed_records(args.repo)
    if not recs:
        raise SystemExit("no committed BENCH_FULL.json records found")
    names = sorted({q for _, qs in recs for q in qs})
    bands = {}
    for q in names:
        vals = [qs[q] for _, qs in recs if q in qs]       # newest first
        last3 = vals[:3]
        bands[q] = {
            "min": round(min(vals), 4),
            "med": round(statistics.median(vals), 4),
            "max": round(max(vals), 4),
            "med3": round(statistics.median(last3), 4),
            "n": len(vals),
        }
    doc = {
        "records": len(recs),
        "newest_sha": recs[0][0],
        "bands": bands,
    }
    with open(args.out, "w") as f:
        json.dump(doc, f, indent=0, sort_keys=True)
        f.write("\n")
    print(f"wrote {args.out}: {len(bands)} queries from {len(recs)} records")


if __name__ == "__main__":
    main()
