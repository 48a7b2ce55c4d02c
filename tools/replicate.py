#!/usr/bin/env python3
"""Build the 16x-replicated stress fixture SURVEY.md §6 measures against.

Usage: python3 tools/replicate.py [srcDir] [outDir] [factor]
Defaults: /root/testdata/sf0.1 -> target/scale16, factor 16.

Replication shifts ids by k*10^7 (events by k*10^8) per replica k, so
ids stay unique while every document gains factor-1 exact copies — the
adversarial regime for the dedup pair generators. events.ts must keep
its source parquet timestamp vintage bit-for-bit (NANOS in some
fixture generations, MICROS in others; graft.sources.Tables.events
dispatches on the resolved type), so events go through pyarrow's
type-preserving passthrough, not DuckDB's us-granular parquet writer.
"""
import sys

import duckdb
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
out = sys.argv[2] if len(sys.argv) > 2 else "target/scale16"
factor = int(sys.argv[3]) if len(sys.argv) > 3 else 16

import os
os.makedirs(out, exist_ok=True)
con = duckdb.connect()

# The id shift keeps replica ids unique ONLY while every source id is
# below the shift; on a bigger source the replicas would silently
# collide and corrupt the stress fixture the scaling records measure.
# Fail loudly instead.
for table, col, shift in [
    ("documents", "doc_id", 10_000_000),
    ("embeddings", "vec_id", 10_000_000),
    ("events", "event_id", 100_000_000),
    ("events", "user_id", 10_000_000),
    ("lineitem", "l_orderkey", 10_000_000),
    ("orders", "o_orderkey", 10_000_000),
    ("orders", "o_custkey", 10_000_000),
    ("customer", "c_custkey", 10_000_000),
]:
    mx = con.sql(
        f"SELECT MAX({col}) FROM read_parquet('{src}/{table}.parquet')"
    ).fetchone()[0]
    if mx is not None and mx >= shift:
        sys.exit(
            f"replicate.py: {table}.{col} max {mx} >= shift {shift}; "
            "replica ids would collide — refusing to build the fixture")

con.sql(f"""
COPY (SELECT doc_id + k*10000000 AS doc_id, text, lang, source, n_chars
      FROM read_parquet('{src}/documents.parquet'), range(0, {factor}) t(k))
TO '{out}/documents.parquet' (FORMAT PARQUET)""")
con.sql(f"""
COPY (SELECT vec_id + k*10000000 AS vec_id, embedding, label
      FROM read_parquet('{src}/embeddings.parquet'), range(0, {factor}) t(k))
TO '{out}/embeddings.parquet' (FORMAT PARQUET)""")

# Star-schema replicas (q02/q03 16x stress): every join key shifts by
# the same k*10^7, so each replica is a self-consistent TPC-H slice —
# lineitem⋈orders⋈customer joins land within their replica only, and
# per-group row counts scale exactly 16x.
con.sql(f"""
COPY (SELECT l_orderkey + k*10000000 AS l_orderkey, l_partkey, l_suppkey,
        l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
        l_returnflag, l_linestatus, l_shipdate
      FROM read_parquet('{src}/lineitem.parquet'), range(0, {factor}) t(k))
TO '{out}/lineitem.parquet' (FORMAT PARQUET)""")
con.sql(f"""
COPY (SELECT o_orderkey + k*10000000 AS o_orderkey,
        o_custkey + k*10000000 AS o_custkey,
        o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
      FROM read_parquet('{src}/orders.parquet'), range(0, {factor}) t(k))
TO '{out}/orders.parquet' (FORMAT PARQUET)""")
con.sql(f"""
COPY (SELECT c_custkey + k*10000000 AS c_custkey, c_name, c_nationkey,
        c_acctbal, c_mktsegment
      FROM read_parquet('{src}/customer.parquet'), range(0, {factor}) t(k))
TO '{out}/customer.parquet' (FORMAT PARQUET)""")

# Dimension tables pass through UNREPLICATED: lineitem's l_suppkey /
# l_partkey and customer's c_nationkey are not shifted, so every
# replica's facts reference the same dim rows — the realistic 100 TB
# regime (facts grow, dims don't) and exactly what the broadcast-join
# scaling records need.
for dim in ["supplier", "part", "nation", "region"]:
    con.sql(f"""
COPY (SELECT * FROM read_parquet('{src}/{dim}.parquet'))
TO '{out}/{dim}.parquet' (FORMAT PARQUET)""")

t = pq.read_table(f"{src}/events.parquet")
parts = []
for k in range(factor):
    parts.append(pa.table({
        "event_id": pc.add(t["event_id"], k * 100000000),
        "ts": t["ts"],
        "user_id": pc.add(t["user_id"], k * 10000000),
        "event_type": t["event_type"],
        "value": t["value"],
        "props": t["props"],
    }))
pq.write_table(pa.concat_tables(parts), f"{out}/events.parquet")

for name in ["documents", "embeddings", "events",
             "lineitem", "orders", "customer"]:
    n = con.sql(
        f"SELECT COUNT(*) FROM read_parquet('{out}/{name}.parquet')"
    ).fetchone()[0]
    print(f"{name}: {n} rows")
