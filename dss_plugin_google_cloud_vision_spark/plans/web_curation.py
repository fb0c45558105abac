# -*- coding: utf-8 -*-
"""The full web-corpus curation composition over the round-3 operator
family — the complete pass a pretraining data pipeline runs between crawl
and loader, as ONE lazy Spark plan:

    paragraph corpus → within-doc line dedup (row-local)
                    → Gopher quality gate (row-local)
                    → exact dedup keep-first (md5 hash shuffle)
                    → MinHash-LSH near-dup pairs → CC collapse
                    → sequence packing (two-phase prefix sum)
                    → one-row corpus summary

Every stage is individually oracle-checked elsewhere; the composition is
oracle-checked end-to-end (driver query ``web_curation_pipeline``) against
a single recursive-CTE DuckDB mirror.

Scale shape: the first two stages are pure projections (zero shuffle);
dedup shuffles md5 keys; the LSH chain shuffles band keys and candidate
pairs; the component collapse touches only the pair graph; packing's
prefix sum is the two-phase form (no global window partition). The final
single-row summary is the only driver-bound result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import (
    dedup_by_clusters,
    exact_dedup_keep_first,
    near_dup_pairs,
    within_doc_line_dedup_column,
)
from ..operators.packing import pack_sequences
from ..operators.textstats import gopher_quality_table


def curate_web_corpus(
    corpus: DataFrame,
    min_words: int = 40,
    near_dup_threshold_milli: int = 800,
    budget_tokens: int = 512,
    pack_group_size: int = 64,
) -> DataFrame:
    """corpus(doc_id, text) → one-row summary of the fully curated,
    packed corpus: n_input, n_gated (after line dedup + Gopher gate),
    n_exact, n_final (after near-dup collapse), total_tokens,
    n_sequences, sum_kept_ids (an exactness witness over WHICH documents
    survived, not just how many)."""
    deduped_lines = corpus.select(
        "doc_id", within_doc_line_dedup_column("text").alias("text")
    )
    quality = gopher_quality_table(deduped_lines, min_words=min_words)
    gated = deduped_lines.join(
        quality.filter(F.col("keep") == 1).select("doc_id"), "doc_id", "left_semi"
    )
    # dual consumer (exact-dedup chain + the n_gated summary count):
    # without this the whole paragraph-build → line-dedup → Gopher gate
    # chain executes twice (r6)
    gated = gated.localCheckpoint(eager=False)
    exact = exact_dedup_keep_first(gated, id_col="doc_id", text_col="text")
    exact = exact.localCheckpoint(eager=False)  # dual consumer: pair graph + anti-join
    pairs = near_dup_pairs(
        exact, id_col="doc_id", text_col="text", threshold_milli=near_dup_threshold_milli
    ).select("doc_a", "doc_b")
    final = dedup_by_clusters(exact, pairs, id_col="doc_id")
    final = final.localCheckpoint(eager=False)  # dual consumer: packing + summary
    packed = pack_sequences(
        final, budget_tokens=budget_tokens, group_size=pack_group_size
    )
    counts = final.agg(
        F.count("*").alias("n_final"),
        F.sum(F.size(F.split("text", " "))).cast("bigint").alias("total_tokens"),
        F.sum("doc_id").cast("bigint").alias("sum_kept_ids"),
    )
    seqs = packed.agg((F.max("seq_id") + 1).cast("bigint").alias("n_sequences"))
    n_input = corpus.agg(F.count("*").alias("n_input"))
    n_gated = gated.agg(F.count("*").alias("n_gated"))
    n_exact = exact.agg(F.count("*").alias("n_exact"))
    return (
        n_input.crossJoin(n_gated)
        .crossJoin(n_exact)
        .crossJoin(counts)
        .crossJoin(seqs)
    )
