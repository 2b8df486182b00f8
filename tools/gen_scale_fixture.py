#!/usr/bin/env python3
"""Scale-growth probe fixture (VERDICT r10 task 3): replicate an
existing sf dir K times with key offsets that preserve join integrity,
so empirical scaling exponents can be measured beyond sf0.1 without
touching the driver's read-only testdata.

Usage: gen_scale_fixture.py <srcSfDir> <outDir> [K=3]

Semantics of the replication (deliberate, documented):
- fact/dim keys shift by copy*stride (stride = max(key)+1), so joins
  resolve exactly as in the source; nation/region stay shared dims.
- l_partkey (the "symbol" of the bars projection) triples -> 3x series.
- documents get a per-copy suffix token (" c1"/" c2"), so copies are
  NEAR-duplicates (MinHash/Jaccard/SimHash pair them) but not EXACT
  fingerprint duplicates -- the crawl-mirror shape dedup pipelines
  exist for.
- embeddings replicate verbatim (3x IVF cell occupancy, exact-dup
  cosine pairs at 1.0 -- the worst case for blocked kernels).
- events replicate with user/event id offsets in the SAME time range
  (3x densier sessions/windows).

This fixture is for PERFORMANCE scaling only; correctness parity stays
pinned at sf0.01 by the oracle gate.
"""
import duckdb
import os
import sys

src, out = sys.argv[1], sys.argv[2]
k = int(sys.argv[3]) if len(sys.argv) > 3 else 3
os.makedirs(out, exist_ok=True)
con = duckdb.connect()


def stride(tbl, col):
    return con.sql(
        f"SELECT max({col})+1 FROM read_parquet('{src}/{tbl}.parquet')"
    ).fetchone()[0]


def gen(tbl, select_sql):
    con.sql(
        f"COPY (SELECT {select_sql} "
        f"FROM read_parquet('{src}/{tbl}.parquet'), "
        f"(SELECT unnest(range({k})) AS i) ORDER BY i) "
        f"TO '{out}/{tbl}.parquet' (FORMAT PARQUET)"
    )
    n = con.sql(f"SELECT count(*) FROM read_parquet('{out}/{tbl}.parquet')").fetchone()[0]
    print(f"{tbl}: {n} rows")


ok = stride("orders", "o_orderkey")
ck = stride("customer", "c_custkey")
pk = stride("part", "p_partkey")
sk = stride("supplier", "s_suppkey")
dk = stride("documents", "doc_id")
vk = stride("embeddings", "vec_id")
ek = stride("events", "event_id")
uk = stride("events", "user_id")

gen("lineitem",
    f"l_orderkey + i*{ok} AS l_orderkey, l_partkey + i*{pk} AS l_partkey, "
    f"l_suppkey + i*{sk} AS l_suppkey, l_linenumber, l_quantity, "
    "l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, "
    "l_shipdate")
gen("orders",
    f"o_orderkey + i*{ok} AS o_orderkey, o_custkey + i*{ck} AS o_custkey, "
    "o_orderstatus, o_totalprice, o_orderdate, o_orderpriority")
gen("customer",
    f"c_custkey + i*{ck} AS c_custkey, c_name, c_nationkey, c_acctbal, "
    "c_mktsegment")
gen("supplier",
    f"s_suppkey + i*{sk} AS s_suppkey, s_name, s_nationkey, s_acctbal")
gen("part",
    f"p_partkey + i*{pk} AS p_partkey, p_name, p_brand, p_type, p_size, "
    "p_retailprice")
gen("events",
    f"event_id + i*{ek} AS event_id, ts, user_id + i*{uk} AS user_id, "
    "event_type, value, props")
gen("documents",
    f"doc_id + i*{dk} AS doc_id, "
    "CASE WHEN i = 0 THEN text ELSE text || ' c' || i END AS text, "
    "lang, source, n_chars")
gen("embeddings",
    f"vec_id + i*{vk} AS vec_id, embedding, label")
# shared dims copy through unchanged
for t in ("nation", "region"):
    con.sql(
        f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet')) "
        f"TO '{out}/{t}.parquet' (FORMAT PARQUET)")
    print(f"{t}: copied")
print(f"done -> {out} (x{k} of {src})")
