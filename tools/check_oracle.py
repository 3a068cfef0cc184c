#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracleSql in
DuckDB (tables = sfDir parquet, named by file stem), load the Verify parquet
output, sort columns by name + rows by value, and diff.

Usage: check_oracle.py <sfDir> <verifyOutDir>
"""
import json, math, sys
import duckdb
import pyarrow.dataset as ds

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 9)
            vals.append(repr(v))
        out.append(tuple(vals))
    out.sort()
    return [cols[i] for i in order], out

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for name in ["region", "nation", "customer", "supplier", "part", "orders",
                 "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            res = con.sql(sql)
            ocols, orows = res.columns, res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_bad += 1
            continue
        try:
            tbl = ds.dataset(f"{out_dir}/{name}").to_table()
            scols = tbl.column_names
            srows = list(zip(*[tbl.column(c).to_pylist() for c in scols])) if scols else []
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {e}")
            n_bad += 1
            continue
        oc, orows_c = canon(orows, ocols)
        sc, srows_c = canon(srows, scols)
        if oc != sc:
            print(f"FAIL {name}: columns differ\n  oracle: {oc}\n  spark:  {sc}")
            n_bad += 1
        elif orows_c != srows_c:
            diff = [(a, b) for a, b in zip(orows_c, srows_c) if a != b][:3]
            print(f"FAIL {name}: rows differ (oracle {len(orows_c)} vs spark {len(srows_c)})")
            for a, b in diff:
                print(f"  oracle: {a}\n  spark:  {b}")
            if len(orows_c) != len(srows_c):
                so, ss = set(orows_c), set(srows_c)
                print(f"  only-oracle: {list(so-ss)[:2]}\n  only-spark: {list(ss-so)[:2]}")
            n_bad += 1
        else:
            print(f"ok   {name} ({len(srows_c)} rows)")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} failed")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
