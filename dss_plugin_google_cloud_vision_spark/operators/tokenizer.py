# -*- coding: utf-8 -*-
"""BPE merge learning — tokenizer-training preparation over a corpus.

Training a byte-pair-encoding tokenizer is a corpus-scale aggregation
problem: count adjacent-symbol pairs across every word occurrence, merge
the most frequent pair everywhere, repeat. The reference plugin has no
tokenizer surface — this is part of the LLM-pipeline layer (the merge
list produced here is the actual artifact a tokenizer trainer ships).

Two design choices make this exact across engines and scalable:

1. **The corpus is touched exactly once.** The first step collapses text
   to the distinct-WORD grain (word, frequency) — the classic BPE trainer
   move — and every merge round runs on that bounded vocabulary table
   (same distinct-grain argument as ``textstats.grouped_exact_quantiles``).
   Pair counts are frequency-weighted integer sums, so shuffle order can
   never flip a result.

2. **Greedy merge = string replace.** A word's symbol sequence is encoded
   with per-symbol bars: ``hello`` → ``|h||e||l||l||o|``; merging pair
   (l, l) rewrites ``|l||l|`` → ``|ll|``. Both Spark's ``replace`` and
   DuckDB's ``replace`` substitute left-to-right and non-overlapping —
   exactly BPE's greedy leftmost-non-overlapping application (``aaaa``
   with merge (a,a) → ``aa aa``, not three overlapping pairs). No arrays,
   no per-row Python, identical semantics in both engines
   (``oracles.bpe_merges_sql``).

Pre-tokenization keeps ASCII ``[A-Za-z0-9']`` runs from the RAW text and
lowercases the extracted words (ASCII-only lowering — engine-identical by
construction; lowering the raw text first would expose cross-engine
Unicode case-mapping differences).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ASCII word runs, extracted before lowercasing (see module docstring).
BPE_WORD_RE = "[A-Za-z0-9']+"


def bpe_word_table(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Collapse the corpus to distinct-word grain: (word, wf, seq) where
    ``wf`` is the total occurrence count and ``seq`` the bar-delimited
    initial (per-character) symbol sequence. The single corpus-sized pass
    of the whole trainer."""
    words = df.select(
        F.explode(F.regexp_extract_all(F.col(text_col), F.lit(BPE_WORD_RE), F.lit(0))).alias(
            "raw"
        )
    ).select(F.lower(F.col("raw")).alias("word"))
    return words.groupBy("word").agg(F.count("*").cast("bigint").alias("wf")).select(
        "word",
        "wf",
        F.regexp_replace(F.col("word"), "(.)", r"|$1|").alias("seq"),
    )


def _pair_counts(words: DataFrame) -> DataFrame:
    """Adjacent-symbol pair counts over the vocabulary table, weighted by
    word frequency (every occurrence of a pair inside a word counts)."""
    syms = words.select(
        "wf", F.regexp_extract_all(F.col("seq"), F.lit(r"\|([^|]+)\|"), F.lit(1)).alias("s")
    ).filter(F.size("s") >= 2)  # sequence(1, 0) is DESCENDING in Spark (CLAUDE.md)
    pairs = syms.select(
        "wf",
        F.explode(
            F.expr("transform(sequence(1, size(s) - 1), i -> struct(s[i-1] AS a, s[i] AS b))")
        ).alias("p"),
    )
    return pairs.groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b")).agg(
        F.sum("wf").cast("bigint").alias("cnt")
    )


def learn_bpe_merges(
    df: DataFrame,
    n_merges: int = 6,
    text_col: str = "text",
) -> DataFrame:
    """Learn the first ``n_merges`` BPE merges of the corpus.

    Each round: integer pair counts at vocabulary grain → the single top
    pair (highest count, ties to lexicographically smallest (left, right)
    — elected via ``min(struct(-cnt, a, b))``, a map-combined aggregation,
    no sort) → one ``replace`` over every word's symbol sequence. Rounds
    are statically unrolled (like ``graph.domain_pagerank``); the
    vocabulary table is ``localCheckpoint``-ed per round so round k+1 does
    not replay round k's plan.

    Output, one row per learned merge: iteration (1-based), merge_left,
    merge_right, merged, pair_count. Corpora that run out of pairs yield
    fewer than ``n_merges`` rows. Mirrored by ``oracles.bpe_merges_sql``.
    """
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    words = bpe_word_table(df, text_col).localCheckpoint(eager=False)
    merge_tables = []
    for it in range(1, n_merges + 1):
        top = _pair_counts(words).agg(
            F.min(F.struct((-F.col("cnt")).alias("ncnt"), "a", "b")).alias("t")
        )
        merge_tables.append(
            top.filter(F.col("t").isNotNull()).select(
                F.lit(it).cast("bigint").alias("iteration"),
                F.col("t.a").alias("merge_left"),
                F.col("t.b").alias("merge_right"),
                F.concat("t.a", "t.b").alias("merged"),
                (-F.col("t.ncnt")).cast("bigint").alias("pair_count"),
            )
        )
        # '\x01' can never occur in a seq (symbols are [a-z0-9'] runs),
        # so a null top pair degrades to a no-op replace
        pattern = F.when(
            F.col("t").isNotNull(),
            F.concat(F.lit("|"), F.col("t.a"), F.lit("||"), F.col("t.b"), F.lit("|")),
        ).otherwise(F.lit("\x01"))
        repl = F.when(
            F.col("t").isNotNull(),
            F.concat(F.lit("|"), F.col("t.a"), F.col("t.b"), F.lit("|")),
        ).otherwise(F.lit("\x01"))
        words = (
            words.crossJoin(F.broadcast(top))
            .select("word", "wf", F.replace(F.col("seq"), pattern, repl).alias("seq"))
            .localCheckpoint(eager=False)
        )
    out = merge_tables[0]
    for t in merge_tables[1:]:
        out = out.unionAll(t)
    return out


def apply_bpe_merges(
    df: DataFrame,
    merges: DataFrame,
    n_merges: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Encode the corpus with a learned merge list — the other half of the
    tokenizer lifecycle (learn once, encode every shard).

    The merge list is NOT collected: step i's single merge row
    (``iteration == i``) is broadcast-crossJoined onto the vocabulary and
    applied with the exact pattern/replacement construction the trainer
    uses, so apply-after-learn is replay-identical to the trainer's own
    working table. Encoding runs at distinct-WORD grain (the bounded
    vocabulary), then per-word BPE token counts join back to the per-doc
    word occurrences — a plain join on ``word`` (Zipf-skewed key; AQE
    skew-join handles the head, same documented stance as
    ``textstats.token_rarity_table``) followed by one map-combined per-doc
    rollup. Nothing corpus-sized is ever broadcast or collected.

    Output per document (docs with zero ASCII words produce no row —
    inner-join semantics, mirrored by the oracle): id, n_words,
    n_bpe_tokens, n_chars (sum of word lengths), compression_milli =
    ``div(n_bpe_tokens * 1000, n_chars)``. Mirrored by
    ``oracles.bpe_encode_sql``.
    """
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    occ = df.select(
        F.col(id_col),
        F.explode(F.regexp_extract_all(F.col(text_col), F.lit(BPE_WORD_RE), F.lit(0))).alias(
            "raw"
        ),
    ).select(id_col, F.lower(F.col("raw")).alias("word"))
    vocab = occ.select("word").distinct().select(
        "word", F.regexp_replace(F.col("word"), "(.)", r"|$1|").alias("seq")
    )
    for it in range(1, n_merges + 1):
        # agg(max) yields exactly one row even when the merge list is
        # shorter than n_merges (null t → the same no-op degrade as the
        # trainer); a bare crossJoin on an empty step table would drop
        # every vocabulary row instead
        step = (
            merges.filter(F.col("iteration") == it)
            .select(
                F.struct(
                    F.col("merge_left").alias("a"), F.col("merge_right").alias("b")
                ).alias("t")
            )
            .agg(F.max("t").alias("t"))
        )
        pattern = F.when(
            F.col("t").isNotNull(),
            F.concat(F.lit("|"), F.col("t.a"), F.lit("||"), F.col("t.b"), F.lit("|")),
        ).otherwise(F.lit("\x01"))
        repl = F.when(
            F.col("t").isNotNull(),
            F.concat(F.lit("|"), F.col("t.a"), F.col("t.b"), F.lit("|")),
        ).otherwise(F.lit("\x01"))
        vocab = (
            vocab.crossJoin(F.broadcast(step))
            .select("word", F.replace(F.col("seq"), pattern, repl).alias("seq"))
            .localCheckpoint(eager=False)
        )
    word_tokens = vocab.select(
        "word",
        F.size(F.regexp_extract_all(F.col("seq"), F.lit(r"\|([^|]+)\|"), F.lit(1)))
        .cast("bigint")
        .alias("n_tokens_word"),
    )
    return (
        occ.join(word_tokens, "word")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("bigint").alias("n_words"),
            F.sum("n_tokens_word").cast("bigint").alias("n_bpe_tokens"),
            F.sum(F.length("word")).cast("bigint").alias("n_chars"),
        )
        .select(
            id_col,
            "n_words",
            "n_bpe_tokens",
            "n_chars",
            F.expr("div(n_bpe_tokens * 1000, n_chars)").cast("bigint").alias(
                "compression_milli"
            ),
        )
    )
