#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet result (written by graft.Verify),
runs the matching SQL from oracle_sql.json in DuckDB (tables = the sfDir
parquet files registered as views), sorts columns by name and rows by all
columns, and compares values. Exit nonzero on any mismatch.
"""
import json
import math
import sys

import duckdb
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, canon(x)) for k, x in v.items()))
    return v


def type_class(t):
    """Collapse an arrow type to the class the driver's hasher
    distinguishes. Calibrated against CORRECTNESS_r08: queries with
    int32-vs-int64 cross-engine columns pass the driver's hash, while
    int64-vs-decimal128 (DuckDB HUGEINT) columns fail it — so integer
    widths collapse to one class, everything else stays distinct."""
    s = str(t)
    if s.startswith(("int", "uint")):
        return "int"
    if s.startswith("decimal"):
        return s  # exact precision/scale
    if s.startswith("timestamp"):
        return "timestamp"  # tz annotation may differ benignly
    if s.startswith("large_string"):
        return "string"
    if s.startswith(("list", "large_list")):
        return f"list<{type_class(t.value_type)}>"
    return s


def type_mismatches(got, exp):
    gt = {f.name: f.type for f in got.schema}
    et = {f.name: f.type for f in exp.schema}
    return [
        (c, str(gt[c]), str(et[c]))
        for c in sorted(set(gt) & set(et))
        if type_class(gt[c]) != type_class(et[c])
    ]


def rows_of(table):
    cols = sorted(table.column_names)
    data = [table.column(c).to_pylist() for c in cols]
    rows = [tuple(canon(data[i][r]) for i in range(len(cols))) for r in range(table.num_rows)]
    return cols, sorted(rows, key=lambda t: tuple((x is None, str(x)) for x in t))


def eq(a, b):
    if isinstance(a, float) and isinstance(b, float):
        if a == b:
            return True
        return abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b))
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(eq(x, y) for x, y in zip(a, b))
    return a == b


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    import glob
    import os
    results = sorted(d for d in os.listdir(out_dir) if os.path.isdir(f"{out_dir}/{d}"))
    n_exact = n_approx = n_fail = 0
    for name in results:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL  {name}: no parquet output")
            n_fail += 1
            continue
        got = pq.read_table(files[0])
        if name not in oracle:
            print(f"skip  {name}: no oracle ({got.num_rows} rows)")
            continue
        try:
            exp = con.execute(oracle[name]).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        # Type-strict gate (round-8 root cause): DuckDB types an uncast
        # integer SUM as HUGEINT; the driver's hash is type-sensitive
        # and fails even on value-exact results, while value-level
        # canonicalization below is blind to it. The local gate must be
        # strictly harsher than the driver's, so any HUGEINT oracle
        # column, and any cross-engine type-CLASS mismatch, is a FAIL.
        try:
            duck_types = [str(t) for t in con.sql(oracle[name]).types]
        except Exception:
            duck_types = []
        if any(t == "HUGEINT" for t in duck_types):
            print(f"FAIL  {name}: oracle emits HUGEINT column "
                  f"(wrap the SUM in CAST(... AS BIGINT)); types={duck_types}")
            n_fail += 1
            continue
        tm = type_mismatches(got, exp)
        if tm:
            print(f"FAIL  {name}: type-class mismatch (driver hash would "
                  f"fail): {[(c, f'spark={g}', f'duck={e}') for c, g, e in tm]}")
            n_fail += 1
            continue
        gc, gr = rows_of(got)
        ec, er = rows_of(exp)
        if gc != ec:
            print(f"FAIL  {name}: columns differ spark={gc} duck={ec}")
            n_fail += 1
            continue
        if len(gr) != len(er):
            print(f"FAIL  {name}: rowcount spark={len(gr)} duck={len(er)}")
            n_fail += 1
            continue
        exact = gr == er
        approx = exact or all(eq(a, b) for a, b in zip(gr, er))
        if exact:
            n_exact += 1
            print(f"OK    {name}: {len(gr)} rows exact")
        elif approx:
            n_approx += 1
            diffs = [(a, b) for a, b in zip(gr, er) if a != b][:2]
            print(f"WARN  {name}: approx-only match (hash would FAIL); e.g. {diffs}")
        else:
            n_fail += 1
            diffs = [(a, b) for a, b in zip(gr, er) if not eq(a, b)][:3]
            print(f"FAIL  {name}: value mismatch; e.g. {diffs}")
    print(f"\n{n_exact} exact, {n_approx} approx-only, {n_fail} fail")
    return 1 if (n_fail or n_approx) else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
