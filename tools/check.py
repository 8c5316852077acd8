#!/usr/bin/env python3
"""Dev-loop replica of the driver's t2 correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

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
"""
import json
import math
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


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    import os

    dirs = sorted(
        d for d in os.listdir(out_dir) if os.path.isdir(os.path.join(out_dir, d))
    )
    # Drive the gate from the FULL expected key set (registered queries =
    # oracle keys ∪ dumped dirs): a query that throws inside Verify writes
    # no dir, and iterating dirs alone would silently skip it and still
    # report pass. Extra dirs (stale from a prior run) are also flagged.
    names = sorted(set(dirs) | set(oracle))
    n_pass = n_fail = n_weak = 0
    for name in names:
        if name not in dirs:
            print(f"  FAIL  {name}: no Verify output (query threw or never ran)")
            n_fail += 1
            continue
        try:
            s_df = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"
            ).df()
            s_rows = canon(s_df)
        except Exception as e:
            print(f"  FAIL  {name}: spark-side pandas canon error: {e}")
            n_fail += 1
            continue
        s_cols = sorted(s_df.columns)
        if name not in oracle:
            print(f"  WEAK  {name}: rows={len(s_rows)} (no oracle, rows-only)")
            n_weak += 1
            if len(s_rows) == 0:
                print(f"        ^^ WARNING: zero rows")
            continue
        try:
            o_df = con.sql(oracle[name]).df()
            o_rows = canon(o_df)
        except Exception as e:
            print(f"  FAIL  {name}: oracle error: {e}")
            n_fail += 1
            continue
        o_cols = sorted(o_df.columns)
        if o_cols != s_cols:
            print(f"  FAIL  {name}: columns differ spark={s_cols} oracle={o_cols}")
            n_fail += 1
            continue
        if len(s_rows) != len(o_rows):
            print(f"  FAIL  {name}: rowcount spark={len(s_rows)} oracle={len(o_rows)}")
            n_fail += 1
            continue
        diffs = [(a, b) for a, b in zip(s_rows, o_rows) if a != b]
        if diffs:
            print(f"  FAIL  {name}: {len(diffs)}/{len(s_rows)} rows differ; first:")
            print(f"        spark : {diffs[0][0]}")
            print(f"        oracle: {diffs[0][1]}")
            n_fail += 1
        else:
            print(f"  PASS  {name}: {len(s_rows)} rows")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_weak} weak (rows-only)")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
