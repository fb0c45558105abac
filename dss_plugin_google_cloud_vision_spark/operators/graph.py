# -*- coding: utf-8 -*-
"""Domain-graph centrality for web-corpus curation.

Common-Crawl-style curation ranks hosts by link-graph centrality (the
public CC project publishes exactly this: host-level webgraph + harmonic/
pagerank centrality) and uses the rank as a crawl-priority / quality
prior. The reference plugin has no graph stage — this is part of the
LLM-pipeline layer, like the dedup/selection families.

Everything is exact integer arithmetic (micro-scaled PageRank with
``div``) so the DuckDB oracle (``oracles.domain_pagerank_sql``) matches
bit-for-bit: integer addition is order-independent, so the shuffle
aggregation order can never flip a result (the CLAUDE.md cross-engine
rule — no doubles anywhere).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def domain_pagerank(
    edges: DataFrame,
    n_iterations: int = 3,
    damping_milli: int = 850,
    scale: int = 1_000_000,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Fixed-iteration integer PageRank over a (src, dst) domain edge list.

    Semantics (deterministic, exactly mirrored by the oracle):
    - edges are deduplicated (multi-links count once);
    - nodes = distinct src ∪ dst; N = node count;
    - pr_0(v) = div(scale, N);
    - pr_{t+1}(v) = div((1000 - damping_milli) * scale, 1000 * N)
      + Σ_{u→v} div(pr_t(u) * damping_milli, 1000 * outdeg(u));
    - dangling mass (nodes with no out-edges) is dropped, not
      redistributed — totals shrink slightly per iteration; ranking is
      what matters and stays deterministic.

    Scale shape: the corpus never appears here — callers aggregate to
    domain grain first, so every table is domain- or edge-grain. Each
    iteration is one shuffle join (pr ⋈ edges on src — pr is
    domain-grain and usually broadcastable; Spark's AQE decides) plus one
    map-combined integer-sum aggregation on dst. k iterations = k joins,
    a statically unrolled plan (k is small: centrality priors converge in
    a handful of rounds). The final full ranking runs on the bounded
    domain table — same distinct-grain argument as
    ``textstats.grouped_exact_quantiles``.

    Output: domain, out_degree, in_degree, pr_micro, rank
    (rank 1 = highest pr_micro, ties by domain ascending).
    """
    if n_iterations < 1:
        raise ValueError(f"n_iterations must be >= 1, got {n_iterations}")
    if not (0 <= damping_milli <= 1000):
        raise ValueError(f"damping_milli must be in [0, 1000], got {damping_milli}")
    e = edges.select(
        F.col(src_col).cast("string").alias("src"),
        F.col(dst_col).cast("string").alias("dst"),
    ).distinct()
    # the loop (and both degree aggregates) re-read the edge list
    e = e.localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src").alias("domain"))
        .unionAll(e.select(F.col("dst").alias("domain")))
        .distinct()
    )
    out_deg = e.groupBy(F.col("src").alias("domain")).agg(
        F.count("*").cast("bigint").alias("out_degree")
    )
    in_deg = e.groupBy(F.col("dst").alias("domain")).agg(
        F.count("*").cast("bigint").alias("in_degree")
    )
    base = (
        nodes.agg(F.count("*").cast("bigint").alias("n"))
        .select(
            "n",
            F.expr(f"div({1000 - damping_milli} * cast({scale} as bigint), 1000 * n)").alias(
                "base_micro"
            ),
            F.expr(f"div(cast({scale} as bigint), n)").alias("pr0_micro"),
        )
    )
    pr = nodes.crossJoin(F.broadcast(base)).select(
        "domain", F.col("pr0_micro").alias("pr_micro")
    )
    # emitters: domain, out_degree — only nodes with out-edges emit mass
    emit = pr  # re-assigned each iteration
    for _ in range(n_iterations):
        contrib = (
            emit.join(out_deg, "domain")
            .select(
                "domain",
                F.expr(f"div(pr_micro * {damping_milli}, 1000 * out_degree)").alias("share"),
            )
            .join(e, F.col("domain") == F.col("src"))
            .groupBy(F.col("dst").alias("domain"))
            .agg(F.sum("share").cast("bigint").alias("in_micro"))
        )
        emit = (
            nodes.join(contrib, "domain", "left")
            .crossJoin(F.broadcast(base))
            .select(
                "domain",
                (F.col("base_micro") + F.coalesce(F.col("in_micro"), F.lit(0)))
                .cast("bigint")
                .alias("pr_micro"),
            )
        )
    ranked = (
        emit.join(out_deg, "domain", "left")
        .join(in_deg, "domain", "left")
        .select(
            "domain",
            F.coalesce(F.col("out_degree"), F.lit(0)).cast("bigint").alias("out_degree"),
            F.coalesce(F.col("in_degree"), F.lit(0)).cast("bigint").alias("in_degree"),
            "pr_micro",
        )
    )
    # full ranking over the bounded domain table; the `% 1` partition key
    # keeps Spark 4.1's EliminateWindowPartitions from stripping the
    # partitioner and warning (same trick as selection.budget_head)
    w = Window.partitionBy(F.col("pr_micro") % 1).orderBy(
        F.col("pr_micro").desc(), F.col("domain")
    )
    return ranked.withColumn("rank", F.row_number().over(w).cast("bigint"))
