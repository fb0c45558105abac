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
    w_groups = Window.orderBy("_grp").rowsBetween(Window.unboundedPreceding, -1)
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
