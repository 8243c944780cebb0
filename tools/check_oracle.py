#!/usr/bin/env python3
"""Local replica of the driver's DuckDB correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each query name in <verifyOutDir>/oracle_sql.json:
  - read the Spark result parquet at <verifyOutDir>/<name>/
  - run the oracle SQL in DuckDB against the sf parquet tables
  - canonicalize both (columns sorted by name, rows sorted, stable float
    formatting) and compare hashes.
Exits nonzero if any query mismatches.
"""
import sys, json, glob, hashlib, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if v is None:
                vals.append("<null>")
            elif isinstance(v, float):
                if math.isnan(v):
                    vals.append("NaN")
                else:
                    vals.append(f"{v:.6g}")
            elif isinstance(v, bool):
                vals.append(str(v).lower())
            elif isinstance(v, list):
                vals.append(json.dumps(v, default=str))
            else:
                vals.append(str(v))
        out.append("\x1f".join(vals))
    out.sort()
    return hashlib.md5("\n".join(out).encode()).hexdigest(), len(out)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = []
    for name in sorted(oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            failures.append((name, "NO SPARK OUTPUT"))
            continue
        try:
            sq = con.execute(
                f"SELECT * FROM read_parquet({files!r})")
            scols = [d[0] for d in sq.description]
            srows = sq.fetchall()
            oq = con.execute(oracle[name])
            ocols = [d[0] for d in oq.description]
            orows = oq.fetchall()
        except Exception as e:
            failures.append((name, f"ERROR {e}"))
            continue
        if sorted(scols) != sorted(ocols):
            failures.append((name, f"SCHEMA spark={sorted(scols)} oracle={sorted(ocols)}"))
            continue
        sh, sn = canon(srows, scols)
        oh, on = canon(orows, ocols)
        if sn != on:
            failures.append((name, f"ROWS spark={sn} oracle={on}"))
        elif sh != oh:
            failures.append((name, f"HASH mismatch ({sn} rows)"))
        else:
            print(f"OK   {name} ({sn} rows)")
    for name, why in failures:
        print(f"FAIL {name}: {why}")
    rowsonly = [k for k in glob.glob(f"{out_dir}/*/") if
                k.rstrip('/').split('/')[-1] not in oracle]
    for k in sorted(rowsonly):
        print(f"NOTE rows-only (no oracle): {k.rstrip('/').split('/')[-1]}")
    print(f"\n{len(oracle) - len(failures)}/{len(oracle)} oracle queries match")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
