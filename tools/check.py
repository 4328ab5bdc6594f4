#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <outDir> [query ...]

Reads <outDir>/oracle_sql.json (written by graft.Verify), runs each oracle
SQL in DuckDB against the parquet tables in <sfDir>, loads the Spark result
parquet from <outDir>/<name>/, normalizes both (columns sorted by name,
rows sorted by all columns), and reports exact/approx equality.
"""
import json
import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) and len(df.columns):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    # unify NaN/None
    return df.reset_index(drop=True)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            want = normalize(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        try:
            got = normalize(
                con.execute(
                    f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"
                ).fetchdf()
            )
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {e}")
            n_fail += 1
            continue
        if list(want.columns) != list(got.columns):
            print(f"FAIL {name}: columns differ\n  oracle={list(want.columns)}\n  spark ={list(got.columns)}")
            n_fail += 1
            continue
        if len(want) != len(got):
            print(f"FAIL {name}: row count differs oracle={len(want)} spark={len(got)}")
            n_fail += 1
            continue
        # Dtype gate: the driver hashes typed values, so an int64 column on
        # one side vs float64/object (e.g. DuckDB HUGEINT from SUM(int)) on
        # the other fails there even when values coerce equal. Both frames
        # come through duckdb.fetchdf, so full-dtype comparison is
        # symmetric — int32 vs int64 or float32 vs float64 must fail here
        # exactly as they would in the driver's typed-value hash.
        dt_w = [str(want[c].dtype) for c in want.columns]
        dt_g = [str(got[c].dtype) for c in got.columns]
        if dt_w != dt_g:
            bad = [
                f"{c}: oracle {want[c].dtype} vs spark {got[c].dtype}"
                for c in want.columns
                if str(want[c].dtype) != str(got[c].dtype)
            ]
            print(f"FAIL {name}: dtype mismatch\n   " + "\n   ".join(bad))
            n_fail += 1
            continue
        diffs = []
        for c in want.columns:
            a, b = want[c], got[c]
            if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
                aa = a.astype(float).to_numpy()
                bb = b.astype(float).to_numpy()
                eq = (aa == bb) | (np.isnan(aa) & np.isnan(bb))
                if not eq.all():
                    d = np.nanmax(np.abs(aa - bb))
                    diffs.append(f"{c}: {int((~eq).sum())} cells differ, max abs diff {d:.3e}")
            else:
                eq = (a == b) | (a.isna() & b.isna())
                if not eq.all():
                    i = int(np.argmax(~eq.to_numpy()))
                    diffs.append(f"{c}: {int((~eq).sum())} cells differ, e.g. row {i}: {a.iloc[i]!r} vs {b.iloc[i]!r}")
        if diffs:
            print(f"FAIL {name}:")
            for d in diffs:
                print(f"   {d}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(want)} rows, {len(want.columns)} cols)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
