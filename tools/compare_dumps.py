#!/usr/bin/env python3
"""Compare two graft Verify dump dirs row-for-row (order-insensitive).

Usage: compare_dumps.py <ref_dir> <new_dir> [query ...]
Exits nonzero and prints a line per mismatching query.
"""
import sys, os
import duckdb

def main():
    ref, new = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    names = sorted(d for d in os.listdir(ref)
                   if os.path.isdir(os.path.join(ref, d)))
    if only:
        names = [n for n in names if n in only]
    bad = 0
    for n in names:
        newdir = os.path.join(new, n)
        if not os.path.isdir(newdir):
            print(f"{n}: MISSING in new dump"); bad += 1; continue
        try:
            con = duckdb.connect()
            a = f"{ref}/{n}/*.parquet"
            b = f"{new}/{n}/*.parquet"
            ca = con.sql(f"select count(*) from '{a}'").fetchone()[0]
            cb = con.sql(f"select count(*) from '{b}'").fetchone()[0]
            diff = con.sql(
                f"select count(*) from ((select * from '{a}' except all select * from '{b}') "
                f"union all (select * from '{b}' except all select * from '{a}'))"
            ).fetchone()[0]
            if ca != cb or diff != 0:
                print(f"{n}: MISMATCH rows {ca} vs {cb}, diff {diff}"); bad += 1
            else:
                print(f"{n}: ok ({ca} rows)")
        except Exception as e:
            print(f"{n}: ERROR {e}"); bad += 1
    sys.exit(1 if bad else 0)

main()
