# -*- coding: utf-8 -*-
"""Sequence packing for LLM training-data pipelines.

Training jobs consume fixed-length token sequences; the packing step
assigns every document a position in that stream: (seq_id,
offset_in_seq) for a given token budget per sequence, in deterministic
document order. This is the contiguous-packing form (documents
concatenated in id order, sequence boundary every ``budget`` tokens —
what T5-style span-corruption pipelines and most pretraining loaders do
before splitting/padding).

The core is a corpus-wide prefix sum of token counts. A single
``Window.orderBy(id)`` cumsum would coalesce the whole corpus into ONE
window partition — the classic global-window scale trap — so the prefix
sum is TWO-PHASE:

1. group documents by a coarse ``id // group_size`` key; per-group token
   totals aggregate map-side (one small shuffle);
2. group offsets come from a window over the group-totals table (rows =
   n_docs / group_size — at 10^12 docs and group_size 10^6 that is 10^6
   rows, trivially windowable; nest another level if ever needed);
3. within-group cumsum windows partition by the group key (bounded
   partitions), then add the group offset.

Identical values to the naive global cumsum (integer arithmetic, fixed
order), which is exactly what the DuckDB oracle computes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_GROUP_SIZE = 1_000_000


def pack_sequences(
    df: DataFrame,
    budget_tokens: int = 2048,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_size: int = DEFAULT_GROUP_SIZE,
) -> DataFrame:
    """Assign each document its slot in the packed token stream.

    Output: id, n_tokens, seq_id (the sequence holding the document's
    FIRST token), offset_in_seq, spans_boundary (1 when the document
    crosses into the next sequence — the loader's split/pad decision).
    Mirrored by ``oracles.pack_sequences_sql``.
    """
    toks = F.split(F.col(text_col), " ")
    base = df.select(F.col(id_col), F.size(toks).cast("bigint").alias("n_tokens")).withColumn(
        "_grp", F.floor(F.col(id_col) / group_size)
    )
    group_totals = base.groupBy("_grp").agg(F.sum("n_tokens").alias("_grp_tokens"))
    # the prefix sum runs over GROUP TOTALS only (corpus/group_size rows,
    # not the corpus) — single-partition by design; partitionBy(_grp % 1)
    # (constant 0, but non-foldable so the optimizer can't strip it)
    # keeps the "No Partition Defined" warning out of the logs while real
    # full-table windows elsewhere still warn
    w_groups = (
        Window.partitionBy(F.col("_grp") % 1)
        .orderBy("_grp")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    group_offsets = group_totals.withColumn(
        "_grp_offset", F.coalesce(F.sum("_grp_tokens").over(w_groups), F.lit(0))
    ).select("_grp", "_grp_offset")
    w_in_group = (
        Window.partitionBy("_grp").orderBy(id_col).rowsBetween(Window.unboundedPreceding, -1)
    )
    placed = (
        base.join(group_offsets, "_grp")
        .withColumn(
            "_start",
            F.col("_grp_offset") + F.coalesce(F.sum("n_tokens").over(w_in_group), F.lit(0)),
        )
    )
    end = F.col("_start") + F.col("n_tokens") - 1
    return placed.select(
        F.col(id_col),
        F.col("n_tokens"),
        F.floor(F.col("_start") / budget_tokens).cast("bigint").alias("seq_id"),
        (F.col("_start") % budget_tokens).cast("bigint").alias("offset_in_seq"),
        F.when(
            (F.col("n_tokens") > 0)
            & (F.floor(end / budget_tokens) > F.floor(F.col("_start") / budget_tokens)),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .cast("int")
        .alias("spans_boundary"),
    )


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 256,
    stride_tokens: int = 192,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Token-window chunking (the RAG / long-context windowing step):
    split each document into chunks of ``chunk_tokens`` tokens starting
    every ``stride_tokens`` (overlap = chunk - stride), last partial
    chunk kept; a document shorter than one chunk yields itself whole.
    Entirely ROW-LOCAL (sequence + transform + posexplode — no shuffle,
    embarrassingly parallel at any scale).

    Output: id, chunk_id (0-based), token_start (0-based), chunk_text,
    n_chunk_tokens. Mirrored by ``oracles.chunk_documents_sql``.
    """
    if stride_tokens < 1 or chunk_tokens < 1:
        raise ValueError("chunk_tokens and stride_tokens must be >= 1")
    # pre-bound token array: an inline split referenced inside the
    # transform lambda is re-evaluated per chunk (no CSE in interpreted
    # higher-order lambdas — the shingles_column lesson)
    base = df.select(F.col(id_col), F.split(F.col(text_col), " ").alias("_toks"))
    toks = F.col("_toks")
    n = F.size(toks)
    # starts: 0, stride, 2*stride, ... while start < n (at least one chunk)
    n_chunks = F.greatest(
        F.ceil((n - F.lit(chunk_tokens)) / stride_tokens) + 1, F.lit(1)
    ).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda c: F.struct(
            c.alias("chunk_id"),
            (c * stride_tokens).alias("token_start"),
            F.array_join(F.slice(toks, c * stride_tokens + 1, chunk_tokens), " ").alias(
                "chunk_text"
            ),
            F.least(n - c * stride_tokens, F.lit(chunk_tokens)).alias("n_chunk_tokens"),
        ),
    )
    return base.select(F.col(id_col), F.explode(chunks).alias("ch")).select(
        id_col,
        F.col("ch.chunk_id").cast("int").alias("chunk_id"),
        F.col("ch.token_start").cast("bigint").alias("token_start"),
        F.col("ch.chunk_text").alias("chunk_text"),
        F.col("ch.n_chunk_tokens").cast("bigint").alias("n_chunk_tokens"),
    )


def shard_corpus(
    df: DataFrame,
    n_shards: int = 64,
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Deterministic training-order sharding: every document gets a shard
    id and a within-shard order key, both derived from the first 8 md5 hex
    digits of ``seed ':' id`` — a reproducible global shuffle (training
    runs want documents in hash order, not crawl order, and want the SAME
    order on every re-run) with no engine RNG and no global sort.

    Scale shape: a pure row-local projection. The writer realizes the
    order with ``df.repartition(n_shards, 'shard').sortWithinPartitions(
    'order_key', id)`` — a single range-free shuffle keyed by shard —
    or simply ``partitionBy('shard')`` with per-file sorting; no total
    ordering across shards is ever needed. Changing ``seed`` reshuffles;
    changing ``n_shards`` only reassigns shard ids (order keys are
    independent of the shard count, so resharding is cheap).

    Output: input columns + ``shard`` int + ``order_key`` bigint.
    Cross-engine exact: Spark ``conv(hex, 16, 10)`` and DuckDB
    ``('0x' || hex)::bigint`` agree on the 32-bit value.
    """
    from .sampling import sample_key_column

    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    # the SAME sampling coordinate as operators.sampling (one definition
    # of the md5-hex prefix, one oracle mirror to keep in sync)
    order_key = F.conv(sample_key_column(id_col, seed), 16, 10).cast("bigint")
    return df.withColumn("order_key", order_key).withColumn(
        "shard", (F.col("order_key") % n_shards).cast("int")
    )
