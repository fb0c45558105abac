#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""Generate an sf1 (10× sf0.1) table set for the scale gate.

/root/testdata is read-only and the driver only ships sf ≤ 0.1, so the
10× set is DERIVED from sf0.1 deterministically: fact/corpus tables are
replicated 10× with key offsets that preserve FK validity (lineitem and
orders share the orderkey offset); dimension tables stay 1× (exactly how
a TPC-H scale-up behaves). Document texts get a per-replica suffix token
so the corpus is 10 near-dup FAMILIES per text rather than 10 exact
copies of everything (the interesting dedup shape), with ``n_chars``
recomputed to stay consistent; embeddings replicate exactly (id
tie-breaks make every ANN surface deterministic under duplicate
vectors).

Both engines read the SAME parquet output, so every oracle comparison
stays an apples-to-apples mirror at the new scale.

Usage: python tools/make_sf1.py [out_dir]   (default /tmp/sf1)
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
KEY_OFFSET = 10_000_000  # > every sf0.1 key; shared by orders/lineitem
REPLICAS = 10


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    con.execute("SET threads TO 8")

    def copy(select: str, table: str) -> None:
        con.execute(
            f"COPY ({select}) TO '{out_dir}/{table}.parquet' (FORMAT parquet)"
        )
        n = con.sql(f"SELECT count(*) FROM '{out_dir}/{table}.parquet'").fetchone()[0]
        print(f"{table}: {n} rows")

    r = f"range({REPLICAS}) t(r)"
    copy(
        "SELECT doc_id + r * 5000 AS doc_id, "
        " CASE WHEN r = 0 THEN text ELSE text || ' zrep' || r END AS text, "
        " lang, source, "
        " CAST(length(CASE WHEN r = 0 THEN text ELSE text || ' zrep' || r END) AS BIGINT)"
        "  AS n_chars "
        f"FROM '{SRC}/documents.parquet', {r}",
        "documents",
    )
    copy(
        "SELECT vec_id + r * 2000 AS vec_id, embedding, label "
        f"FROM '{SRC}/embeddings.parquet', {r}",
        "embeddings",
    )
    copy(
        f"SELECT l_orderkey + r * {KEY_OFFSET} AS l_orderkey, l_partkey, l_suppkey, "
        " l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, "
        " l_returnflag, l_linestatus, l_shipdate "
        f"FROM '{SRC}/lineitem.parquet', {r}",
        "lineitem",
    )
    copy(
        f"SELECT o_orderkey + r * {KEY_OFFSET} AS o_orderkey, o_custkey, o_orderstatus, "
        " o_totalprice, o_orderdate, o_orderpriority "
        f"FROM '{SRC}/orders.parquet', {r}",
        "orders",
    )
    copy(
        f"SELECT event_id + r * {KEY_OFFSET} AS event_id, ts, user_id, event_type, "
        " value, props "
        f"FROM '{SRC}/events.parquet', {r}",
        "events",
    )
    for dim in ("customer", "supplier", "part", "nation", "region"):
        copy(f"SELECT * FROM '{SRC}/{dim}.parquet'", dim)


if __name__ == "__main__":
    main()
