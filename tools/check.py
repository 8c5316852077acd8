#!/usr/bin/env python3
"""Dev-loop replica of the driver's t2 correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [overrides.json] [--jobs N]

Reads each <verifyOutDir>/<name> parquet (Spark result), runs the matching
oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB over the sfDir
tables, and compares THROUGH PANDAS, exactly like the driver does:
both relations go through duckdb's .df() (so DuckDB HUGEINT becomes
float64, BLOB becomes bytearray, BIGINT-with-nulls becomes float64),
columns are sorted by name, rows are sorted by all columns with
DataFrame.sort_values (which raises on unhashable cells, e.g. bytearray
— a real driver failure mode), then values are canonicalized to strings.

Round 2 shipped 3 driver-red queries because this script previously
compared via fetchall() (Python ints, bytes hashable) and saw PASS where
the driver's pandas path saw FAIL. Fidelity to the driver > convenience.

--jobs N compares N queries at a time in worker processes (each with its
own DuckDB connection over the same read-only parquet views). Identical
per-query semantics; results print in name order either way. The default
stays serial — parallel mode exists for the sf0.1 gate, whose DuckDB
side is ~10 min serial.
"""
import json
import math
import os
import sys

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df):
    """pandas DataFrame -> sorted list of stringified tuples.

    Mirrors the driver: sort columns by name, sort rows by all columns via
    pandas (raises TypeError on unhashable values, like the driver), then
    stringify. Floats are rounded to 9 places; a HUGEINT that collapsed to
    float64 stringifies with a trailing '.0' and so diverges from an exact
    int64 — the exact divergence the driver sees.
    """
    df = df[sorted(df.columns)]
    if len(df.columns) > 0 and len(df) > 0:
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    out = []
    for row in df.itertuples(index=False, name=None):
        vals = []
        for v in row:
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = round(v, 9)
            vals.append(str(v))
        out.append(tuple(vals))
    return out


def _connect(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


_worker_con = None


def _compare_one(args):
    """Compare one query; returns (name, status, lines). Runs serially or
    inside a worker process — identical logic either way."""
    global _worker_con
    name, sf_dir, out_dir, in_dirs, oracle_sql, ov = args
    if _worker_con is None:
        _worker_con = _connect(sf_dir)
    con = _worker_con
    if not in_dirs:
        return (name, "fail",
                [f"  FAIL  {name}: no Verify output (query threw or never ran)"])
    try:
        s_sql = f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"
        if ov and ov.get("result_where"):
            s_sql += f" WHERE {ov['result_where']}"
        s_df = con.sql(s_sql).df()
        s_rows = canon(s_df)
    except Exception as e:
        return (name, "fail",
                [f"  FAIL  {name}: spark-side pandas canon error: {e}"])
    s_cols = sorted(s_df.columns)
    # an override may carry its own oracle (sf-scale replacement) or be
    # result_where-only — then the SAME filter wraps the base oracle, so
    # both sides of the compare see the identical subset (a filter on
    # the Spark result alone would guarantee a rowcount FAIL); the WEAK
    # rows-only path applies only when NEITHER source has an oracle
    eff_oracle = (ov or {}).get("oracle", oracle_sql)
    if (ov and ov.get("result_where") and "oracle" not in ov
            and oracle_sql is not None):
        eff_oracle = (f"SELECT * FROM ({oracle_sql}) "
                      f"WHERE {ov['result_where']}")
    if eff_oracle is None:
        lines = [f"  WEAK  {name}: rows={len(s_rows)} (no oracle, rows-only)"]
        if len(s_rows) == 0:
            lines.append("        ^^ WARNING: zero rows")
        return (name, "weak", lines)
    try:
        o_df = con.sql(eff_oracle).df()
        o_rows = canon(o_df)
    except Exception as e:
        return (name, "fail", [f"  FAIL  {name}: oracle error: {e}"])
    o_cols = sorted(o_df.columns)
    if o_cols != s_cols:
        return (name, "fail",
                [f"  FAIL  {name}: columns differ spark={s_cols} oracle={o_cols}"])
    if len(s_rows) != len(o_rows):
        return (name, "fail",
                [f"  FAIL  {name}: rowcount spark={len(s_rows)} oracle={len(o_rows)}"])
    diffs = [(a, b) for a, b in zip(s_rows, o_rows) if a != b]
    if diffs:
        return (name, "fail",
                [f"  FAIL  {name}: {len(diffs)}/{len(s_rows)} rows differ; first:",
                 f"        spark : {diffs[0][0]}",
                 f"        oracle: {diffs[0][1]}"])
    tag = " (subset oracle)" if ov else ""
    return (name, "pass", [f"  PASS  {name}: {len(s_rows)} rows{tag}"])


def main(sf_dir, out_dir, overrides_path=None, jobs=1):
    # Optional per-query overrides (tools/sf01_overrides.json): at larger
    # scale factors a few brute-force reference SQLs are quadratic in the
    # corpus (x_dedup_ngram's all-pairs Jaccard alone was ~45 min at
    # sf0.1), which priced the second-sf gate out of routine use. An
    # override swaps in a cheaper-but-independently-sound oracle (shared-
    # shingle candidates + size band, or a deterministic md5-keyed doc
    # subset) and optionally filters the Spark result to the same subset;
    # the full-corpus brute force still runs at sf0.01.
    overrides = json.load(open(overrides_path)) if overrides_path else {}
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    dirs = sorted(
        d for d in os.listdir(out_dir) if os.path.isdir(os.path.join(out_dir, d))
    )
    # Drive the gate from the FULL expected key set (registered queries =
    # oracle keys ∪ dumped dirs): a query that throws inside Verify writes
    # no dir, and iterating dirs alone would silently skip it and still
    # report pass. Extra dirs (stale from a prior run) are also flagged.
    names = sorted(set(dirs) | set(oracle))
    tasks = [(n, sf_dir, out_dir, n in dirs, oracle.get(n), overrides.get(n))
             for n in names]
    if jobs > 1:
        import multiprocessing as mp
        with mp.Pool(jobs) as pool:
            results = pool.map(_compare_one, tasks)
    else:
        results = [_compare_one(t) for t in tasks]
    results.sort(key=lambda r: r[0])
    n_pass = n_fail = n_weak = 0
    for _, status, lines in results:
        for ln in lines:
            print(ln)
        if status == "pass":
            n_pass += 1
        elif status == "weak":
            n_weak += 1
        else:
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_weak} weak (rows-only)")
    return 1 if n_fail else 0


if __name__ == "__main__":
    argv = sys.argv[1:]
    jobs = 1
    if "--jobs" in argv:
        i = argv.index("--jobs")
        jobs = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    sys.exit(main(argv[0], argv[1],
                  argv[2] if len(argv) > 2 else None, jobs))
