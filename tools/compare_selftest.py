#!/usr/bin/env python3
"""Red test for compare.py's type-strict gate (round-8 postmortem).

Builds a value-exact but type-divergent fixture — a Spark-style int64
result against an oracle whose uncast SUM comes back as DuckDB
HUGEINT — and asserts compare.main FAILS it. The round-8 gate passed
exactly this shape (value canonicalization is type-blind) while the
driver's type-sensitive hash failed it; this test keeps the local gate
strictly harsher than the driver's. Also asserts the benign case
(int32 vs int64, driver-proven tolerable) still passes.
"""
import contextlib
import io
import json
import os
import shutil
import sys
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import compare


def run_case(sf_dir, spark_type, oracle_sql):
    out = tempfile.mkdtemp(prefix="cmp_selftest_")
    try:
        os.makedirs(f"{out}/probe")
        pq.write_table(
            pa.table({"x": pa.array([1], type=spark_type)}),
            f"{out}/probe/part-0.parquet")
        with open(f"{out}/oracle_sql.json", "w") as f:
            json.dump({"probe": oracle_sql}, f)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            rc = compare.main(sf_dir, out)
        return rc, buf.getvalue()
    finally:
        shutil.rmtree(out)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    # RED: uncast SUM over an integer → HUGEINT, value-identical (1).
    rc, log = run_case(sf_dir, pa.int64(), "SELECT SUM(x) AS x FROM (SELECT 1 AS x)")
    assert rc != 0 and "HUGEINT" in log, f"gate passed a HUGEINT oracle!\n{log}"
    # RED: non-HUGEINT type-class divergence (int vs double), same value.
    rc, log = run_case(sf_dir, pa.int64(), "SELECT CAST(1 AS DOUBLE) AS x")
    assert rc != 0 and "type-class" in log, f"gate passed int-vs-double!\n{log}"
    # GREEN: integer width difference is driver-tolerated (CORRECTNESS_r08
    # passes nine queries with int32-vs-int64 columns).
    rc, log = run_case(sf_dir, pa.int32(), "SELECT CAST(1 AS BIGINT) AS x")
    assert rc == 0, f"gate rejects driver-tolerated int width diff:\n{log}"
    print("compare_selftest: 3/3 (HUGEINT red, type-class red, int-width green)")


if __name__ == "__main__":
    main()
