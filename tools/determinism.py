#!/usr/bin/env python3
"""Run-to-run determinism gate: set-compare two Verify output dirs.

A query whose output varies across identical runs can pass the oracle
once and fail it the next — this catches nondeterministic orderings,
unseeded sampling, or time-dependent logic before the driver does.

Usage:
    sbt "runMain graft.Verify <sfDir> /tmp/det_a"
    sbt "runMain graft.Verify <sfDir> /tmp/det_b"
    python3 tools/determinism.py /tmp/det_a /tmp/det_b
"""
import os
import sys

import pandas as pd


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)


def main() -> None:
    a_dir, b_dir = sys.argv[1], sys.argv[2]
    diff = []
    names = [p for p in sorted(os.listdir(a_dir))
             if os.path.isdir(os.path.join(a_dir, p))]
    for p in names:
        try:
            a = canon(pd.read_parquet(os.path.join(a_dir, p)))
            b = canon(pd.read_parquet(os.path.join(b_dir, p)))
            if a.equals(b):
                print(f"OK {p}: {len(a)} rows identical")
            else:
                diff.append(p)
                print(f"DIFF {p}: outputs differ across runs")
        except Exception as e:  # missing on one side is also a diff
            diff.append(f"{p}: {e}")
            print(f"DIFF {p}: {e}")
    if diff:
        print("NON-DETERMINISTIC:", ", ".join(diff))
        sys.exit(1)
    print(f"deterministic: all {len(names)} query outputs identical")


if __name__ == "__main__":
    main()
