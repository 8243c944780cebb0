#!/usr/bin/env python3
"""Row-identity diff of two graft.Verify dump trees.

Usage: python3 tools/diff_dumps.py DUMP_A DUMP_B [--only k1,k2]

For every query directory present in DUMP_A, reads both sides' parquet
with DuckDB, canonicalizes (rows sorted by their full cell sequence,
column names and order must match) and compares. Exit 0 iff every
common query matches and no query is missing from DUMP_B.

This is the optimization round's equivalence gate for the ~37
`no_oracle` approximate/index keys the DuckDB oracle cannot check:
a restructured operator must reproduce its pre-change output
row-for-row at the same scale factor.
"""
import sys, os, duckdb

def canon(d, q):
    path = os.path.join(d, q, "*.parquet")
    try:
        rows = duckdb.sql(f"SELECT * FROM '{path}'").fetchall()
        cols = duckdb.sql(f"SELECT * FROM '{path}' LIMIT 0").columns
    except Exception as e:
        return ("ERR", str(e)[:120])
    return (tuple(cols), tuple(sorted(tuple(str(c) for c in r) for r in rows)))

def main():
    a, b = sys.argv[1], sys.argv[2]
    only = None
    if len(sys.argv) > 4 and sys.argv[3] == "--only":
        only = set(sys.argv[4].split(","))
    qs = sorted(d for d in os.listdir(a) if os.path.isdir(os.path.join(a, d)))
    if only:
        qs = [q for q in qs if any(q.startswith(o) for o in only)]
    bad = []
    for q in qs:
        if not os.path.isdir(os.path.join(b, q)):
            bad.append((q, "missing in B"))
            continue
        ca, cb = canon(a, q), canon(b, q)
        if ca != cb:
            detail = "schema" if ca[0] != cb[0] else "rows"
            na = len(ca[1]) if ca[0] != "ERR" else -1
            nb = len(cb[1]) if cb[0] != "ERR" else -1
            bad.append((q, f"{detail} differ (a={na} rows, b={nb} rows)"))
    for q, why in bad:
        print(f"MISMATCH {q}: {why}")
    print(f"{len(qs) - len(bad)}/{len(qs)} queries row-identical")
    sys.exit(1 if bad else 0)

main()
