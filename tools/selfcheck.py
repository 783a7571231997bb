#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Runs each oracle SQL from <outdir>/oracle_sql.json in DuckDB over the
testdata tables and compares against the parquet the Verify main dumped:
columns sorted by name, rows sorted by all columns, exact value compare.

Usage: python3 tools/selfcheck.py <sfdir> <verify_outdir>
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)


def main() -> None:
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))

    ok, bad = [], []
    for name, sql in sorted(oracle.items()):
        try:
            got = pd.read_parquet(f"{outdir}/{name}")
        except Exception as e:
            bad.append((name, f"spark result unreadable: {e}"))
            continue
        try:
            want = con.execute(sql).df()
        except Exception as e:
            bad.append((name, f"oracle sql failed: {e}"))
            continue
        g, w = canon(got), canon(want)
        if list(g.columns) != list(w.columns):
            bad.append((name, f"columns differ: spark={list(g.columns)} oracle={list(w.columns)}"))
            continue
        if len(g) != len(w):
            bad.append((name, f"row count differs: spark={len(g)} oracle={len(w)}"))
            continue
        # Driver hashes stringified values, so int64-vs-float64 drift
        # (e.g. DuckDB HUGEINT sums) is a real mismatch even when values
        # compare equal numerically — check kinds strictly.
        kind_drift = [
            (c, str(g[c].dtype), str(w[c].dtype))
            for c in g.columns
            if {g[c].dtype.kind, w[c].dtype.kind} in ({"i", "f"}, {"u", "f"})
        ]
        if kind_drift:
            bad.append((name, f"dtype drift (int/float hash hazard): {kind_drift}"))
            continue
        try:
            pd.testing.assert_frame_equal(g, w, check_dtype=False, check_exact=True)
            ok.append(name)
        except AssertionError as e:
            msg = str(e).split("\n")[0:3]
            bad.append((name, " | ".join(msg)))
    print(f"OK ({len(ok)}):", ", ".join(ok))
    for name, why in bad:
        print(f"FAIL {name}: {why}")
    # rows-only queries
    import os
    for name in sorted(os.listdir(outdir)):
        p = os.path.join(outdir, name)
        if os.path.isdir(p) and name not in oracle:
            try:
                n = len(pd.read_parquet(p))
                print(f"ROWS-ONLY {name}: {n} rows")
            except Exception as e:
                print(f"ROWS-ONLY {name}: unreadable: {e}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
