#!/usr/bin/env python3
"""Local pre-check that mimics the driver's DuckDB-oracle comparison.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir> [query ...]

Loads each <verifyOutDir>/<name> parquet (Spark result), runs the matching
oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB over views of the
sfDir parquet tables, sorts columns by name and rows by value, and compares
ARROW COLUMN TYPES first (the driver's hash is type-sensitive: an uncast
DuckDB HUGEINT division emits decimal128(38,0) where Spark emits int64 —
identical pylist values, failed hash; this cost round 15 six hash fails),
then cell-by-cell values. NOT part of the shipped library — dev harness only
(uses the driver-side python stack).
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0 vs 0.0 and last-ulp noise the same way a hash of
        # repr would not — we compare exactly but report near-misses
        return v
    return v


def cmp_cell(a, b):
    a, b = norm(a), norm(b)
    if a == b:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if a == b or (math.isclose(a, b, rel_tol=1e-12, abs_tol=1e-12)):
            return "close"  # would FAIL an exact hash — flag it
    return False


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    n_pass = n_fail = n_skip = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        res_dir = Path(out_dir) / name
        if not res_dir.exists():
            print(f"MISSING  {name}: no Spark result dir")
            n_fail += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM '{res_dir}/*.parquet'").fetch_arrow_table()
            want = con.execute(oracle[name]).fetch_arrow_table()
        except Exception as e:
            print(f"ERROR    {name}: {e}")
            n_fail += 1
            continue
        gcols, wcols = sorted(got.column_names), sorted(want.column_names)
        if gcols != wcols:
            print(f"SCHEMA   {name}: spark={gcols} oracle={wcols}")
            n_fail += 1
            continue
        # Arrow TYPE parity — what the driver's type-sensitive hash sees.
        gtypes = {f.name: str(f.type) for f in got.schema}
        wtypes = {f.name: str(f.type) for f in want.schema}
        tdiff = {c: f"spark={gtypes[c]} oracle={wtypes[c]}"
                 for c in gcols if gtypes[c] != wtypes[c]}
        if tdiff:
            print(f"TYPES    {name}: {tdiff} (values may match; hash won't)")
            n_fail += 1
            continue
        grows = sorted([tuple(r[c] for c in gcols) for r in got.to_pylist()],
                       key=repr)
        wrows = sorted([tuple(r[c] for c in wcols) for r in want.to_pylist()],
                       key=repr)
        if len(grows) != len(wrows):
            print(f"ROWS     {name}: spark={len(grows)} oracle={len(wrows)}")
            n_fail += 1
            continue
        bad = close = 0
        first_bad = None
        for gr, wr in zip(grows, wrows):
            for gc, wc in zip(gr, wr):
                r = cmp_cell(gc, wc)
                if r == "close":
                    close += 1
                elif not r:
                    bad += 1
                    if first_bad is None:
                        first_bad = (gr, wr)
        if bad:
            print(f"VALUES   {name}: {bad} mismatched cells; first: "
                  f"spark={first_bad[0]} oracle={first_bad[1]}")
            n_fail += 1
        elif close:
            print(f"CLOSE    {name}: {close} cells differ in last ulps "
                  f"(exact hash would fail)")
            n_fail += 1
        else:
            print(f"PASS     {name}: {len(grows)} rows")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
