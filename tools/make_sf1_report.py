#!/usr/bin/env python3
"""Generate the sf1 (10x) rehearsal report: per-query calib-normalized
ratios of the sf1 sweep vs the same-tree sf0.1 sweep, sorted worst-first,
with superlinear (>10x normalized) flags. Usage:

  python3 tools/make_sf1_report.py <sf01_bench.json> <sf1_bench.json> <out.md> <round_tag>
"""
import json
import re
import sys


def load(path):
    # bench files hold two JSON lines (detail first); take the detail line
    with open(path) as f:
        for line in f:
            line = line.strip()
            if '"queries"' in line:
                d = json.loads(line)
                return d["queries"], d["calib_sec"], d["value"]
    raise SystemExit(f"no detail line in {path}")


def main():
    sf01_path, sf1_path, out_path, tag = sys.argv[1:5]
    q01, c01, t01 = load(sf01_path)
    q1, c1, t1 = load(sf1_path)
    calib_ratio = c1 / c01
    rows = []
    # union of BOTH runs' names: a query present only in the sf1 sweep
    # (added/renamed between runs) must surface as MISSING, not vanish
    for name in sorted(set(q01) | set(q1)):
        a, b = q01.get(name), q1.get(name)
        if a is None or b is None or a is False or b is False:
            rows.append((float("inf"), name, a, b, None))
            continue
        raw = b / a if a > 0 else float("inf")
        norm = raw / calib_ratio
        rows.append((norm, name, a, b, raw))
    rows.sort(reverse=True)
    superlinear = [r for r in rows if r[0] != float("inf") and r[0] > 10.0]
    missing = [r for r in rows if r[4] is None]
    lines = [
        f"# Round-{tag} sf1 (10x) WHOLE-SUITE rehearsal",
        "",
        f"All {len(rows)} registered queries benched at sf0.1 and at the 10x",
        "replica (`graft.ScaleUp` output, /tmp/graft_sf1), min-of-two per",
        "query, ratios divided by the runs' embedded calib ratio "
        f"({c01:.3f}s -> {c1:.3f}s = {calib_ratio:.2f}x box drift).",
        "",
        f"- total: {t01:.1f}s (sf0.1) -> {t1:.1f}s (sf1), "
        f"raw {t1 / t01:.2f}x, calib-normalized {t1 / t01 / calib_ratio:.2f}x"
        " on 10x data",
        f"- superlinear queries (normalized ratio > 10x): {len(superlinear)}",
        f"- failed/missing queries: {len(missing)}",
        "",
        "Worst 25 normalized ratios (everything else is below these):",
        "",
        "| query | sf0.1 | sf1 (10x) | raw | normalized |",
        "| --- | --- | --- | --- | --- |",
    ]
    for norm, name, a, b, raw in rows[:25]:
        if raw is None:
            lines.append(f"| {name} | {a} | {b} | MISSING | MISSING |")
        else:
            lines.append(
                f"| {name} | {a:.2f}s | {b:.2f}s | {raw:.1f}x | {norm:.1f}x |")
    if superlinear:
        lines += ["", "## SUPERLINEAR — needs a fix", ""]
        for norm, name, a, b, raw in superlinear:
            lines.append(f"- {name}: {a:.2f}s -> {b:.2f}s ({norm:.1f}x normalized)")
    lines.append("")
    with open(out_path, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out_path}: {len(superlinear)} superlinear, "
          f"{len(missing)} missing, worst "
          f"{rows[0][1]} {rows[0][0]:.1f}x")


if __name__ == "__main__":
    main()
