#!/usr/bin/env python3
"""Bench outlier self-triage (round-5 verdict ask, landed round 7).

A single contended sweep can inflate unchanged-code queries 3-30x
(rounds 4 and 6 both shipped such artifacts). Instead of shipping the
contaminated number, bench.sh re-measures every bench_diff outlier with
warm TimeQuery reps and this script embeds BOTH numbers in
bench_last.json, adjudicating the recorded per-query time to the min:

  --list NEW [OLD]        print space-separated names of queries whose
                          sweep time exceeds 2x the reference (same
                          reference resolution as bench_diff)
  --embed NEW TIMEQ_LOG   parse "TIMEQ name: 1.234 (n rows), ..." lines,
                          set queries[name] = min(sweep, warm reps),
                          keep the raw pair under a "triage" key, and
                          recompute the headline total
"""
import glob
import json
import re
import sys

from bench_diff import load_queries

TIMEQ = re.compile(r"TIMEQ (\S+): (.*)")
SECS = re.compile(r"([0-9]+\.[0-9]+) \(")


def reference(args):
    if args:
        return args[0]
    try:
        ref = open("tools/bench_ref.txt").read().strip()
        if ref and load_queries(ref):
            return ref
    except OSError:
        pass
    # same fallback chain as bench_diff: newest BENCH_r*.json with a
    # recoverable per-query map — triage must resolve a reference
    # whenever the diff did, or outliers never get re-measured
    for cand in sorted(glob.glob("BENCH_r*.json"), reverse=True):
        if load_queries(cand):
            return cand
    return None


def list_outliers(new_path, rest):
    ref = reference(rest)
    if ref is None:
        return
    new, old = load_queries(new_path), load_queries(ref)
    names = [q for q in sorted(set(new) & set(old))
             if old[q] > 0 and new[q] > 2.0 * old[q]]
    print(" ".join(names))


def embed(new_path, log_path):
    warm = {}
    for line in open(log_path):
        m = TIMEQ.search(line)
        if m:
            reps = [float(s) for s in SECS.findall(m.group(2))]
            if reps:
                warm[m.group(1)] = min(reps)
    lines = open(new_path).read().splitlines()
    detailed = json.loads(lines[0])
    triage = {}
    for q, w in warm.items():
        sweep = detailed["queries"].get(q)
        if sweep is None:
            continue
        triage[q] = {"sweep": sweep, "warm_min": w}
        detailed["queries"][q] = min(sweep, w)
    if not triage:
        return
    detailed["triage"] = triage
    detailed["value"] = sum(v for v in detailed["queries"].values()
                            if v is not None)
    summary = json.loads(lines[1]) if len(lines) > 1 else dict(detailed)
    summary["value"] = detailed["value"]
    summary["n_triaged"] = len(triage)
    with open(new_path, "w") as f:
        f.write(json.dumps(detailed, separators=(",", ":")) + "\n")
        f.write(json.dumps(summary, separators=(",", ":")) + "\n")
    for q, t in sorted(triage.items()):
        print(f"bench_triage: {q} sweep {t['sweep']:.3f}s -> "
              f"warm {t['warm_min']:.3f}s (recorded min)")


def main():
    mode = sys.argv[1]
    if mode == "--list":
        list_outliers(sys.argv[2], sys.argv[3:])
    elif mode == "--embed":
        embed(sys.argv[2], sys.argv[3])
    else:
        sys.exit(f"unknown mode {mode}")


if __name__ == "__main__":
    main()
