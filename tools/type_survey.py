#!/usr/bin/env python3
"""One-off survey: for every verify output, print any (column) where the
Spark parquet arrow type differs from the DuckDB oracle arrow type.
Used to calibrate the type-strict gate in compare.py."""
import glob
import json
import os
import sys

import duckdb
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(d for d in os.listdir(out_dir) if os.path.isdir(f"{out_dir}/{d}"))
    n_mismatch = 0
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files or name not in oracle:
            continue
        got = pq.read_table(files[0])
        try:
            exp = con.execute(oracle[name] + " LIMIT 0").fetch_arrow_table()
        except Exception as e:
            print(f"{name}: oracle error {e}")
            continue
        gt = {f.name: str(f.type) for f in got.schema}
        et = {f.name: str(f.type) for f in exp.schema}
        for c in sorted(set(gt) | set(et)):
            if gt.get(c) != et.get(c):
                n_mismatch += 1
                print(f"{name}\t{c}\tspark={gt.get(c)}\tduck={et.get(c)}")
    print(f"-- {n_mismatch} column type mismatches")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
