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

The replica tail is TWENTY distinct tokens, not one: with a 1-token
suffix every replica pair of a family is a near-dup (Jaccard ≈ 0.95) and
the corpus's near-dup PAIR count grows quadratically in the replication
factor — 10× rows became ~50× pairs and the scale gate's ≤15×-per-query
criterion false-alarmed on every pair-producing query. Twenty tail
tokens on EVERY replica (r=0 included — an untailed original vs a tailed
replica halves the union growth) keep cross-replica Jaccard under 0.8 up
to ~178-token base docs (corpus max is 100), so sf1 keeps sf0.1's near-dup DENSITY (only the
oracle-planted copies) and pair outputs scale linearly with rows.

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
    # 20 DOC-UNIQUE tokens: cross-replica Jaccard > 0.8 would need base
    # docs > ~178 tokens (corpus max is 100), so no family pair is a
    # near-dup; and because every token embeds the replica's OWN doc_id,
    # no two documents share a tail shingle — a replica-shared tail
    # (first attempt) acted as 20-token boilerplate and blew candidate
    # pairs up 800x through band collisions
    tail_tokens = ", ".join(f"'z'||(doc_id + r * 5000)||'t{j}'" for j in range(20))
    tail = f"' ' || concat_ws(' ', {tail_tokens})"
    # EVERY replica gets a tail (including r=0): an untailed original
    # against a tailed replica halves the union growth and tips long
    # docs back over the 0.8 threshold
    copy(
        "SELECT doc_id + r * 5000 AS doc_id, "
        f" text || {tail} AS text, "
        " lang, source, "
        f" CAST(length(text || {tail}) AS BIGINT) AS n_chars "
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
