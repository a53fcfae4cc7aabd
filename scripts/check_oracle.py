#!/usr/bin/env python3
"""Local pre-validation of SparkEntry oracle SQL (dev tool only — NOT part of
the shipped library; mirrors what the driver's correctness gate does: run
graft.Verify, then each oracleSql in DuckDB over the same parquet, compare).

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>

SPARK_GRAFT_ONLY=k1,k2 restricts the compare to named keys (pairs with the
same env var on graft.Verify for the fast dev loop). The full (unfiltered)
run ALSO enforces the standing invariant that every declared oracle key has
a third-engine block in scripts/third_engine_check.py — a key shipped
without its independent re-derivation fails the gate loudly.
"""
import json
import os
import re
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def third_engine_keys() -> set:
    """Keys covered by scripts/third_engine_check.py (its check("…") calls)."""
    src = open(os.path.join(os.path.dirname(__file__),
                            "third_engine_check.py")).read()
    return set(re.findall(r'check\(\s*"([A-Za-z0-9_]+)"', src))


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    only = {k.strip() for k in os.environ.get("SPARK_GRAFT_ONLY", "").split(",")
            if k.strip()}
    n_ok = n_bad = 0
    if only:
        oracle = {k: v for k, v in oracle.items() if k in only}
    else:
        # full-gate invariant: no declared key without its third-engine block
        missing = sorted(set(oracle) - third_engine_keys())
        for name in missing:
            print(f"FAIL {name}: declared oracle key has NO third-engine block "
                  "in scripts/third_engine_check.py")
        n_bad += len(missing)
    for name, sql in sorted(oracle.items()):
        try:
            got = norm(con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df())
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            n_bad += 1
            continue
        try:
            want = norm(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_bad += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
            n_bad += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
            n_bad += 1
            continue
        try:
            pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                          check_exact=True)
        except AssertionError as e:
            print(f"FAIL {name}: values differ: {str(e)[:400]}")
            n_bad += 1
            continue
        n_ok += 1
        print(f"ok   {name} ({len(got)} rows)")
    print(f"\n{n_ok} ok, {n_bad} failed")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
