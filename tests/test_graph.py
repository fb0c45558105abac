# -*- coding: utf-8 -*-
"""Domain-graph centrality (operators.graph.domain_pagerank) and the
quality-aware cluster-representative election (dedup.cluster_representatives)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from dss_plugin_google_cloud_vision_spark.operators.dedup import cluster_representatives
from dss_plugin_google_cloud_vision_spark.operators.graph import domain_pagerank


def _edges(spark, pairs):
    return spark.createDataFrame([Row(src=s, dst=d) for s, d in pairs])


def _rank(spark, pairs, **kw):
    return {r["domain"]: r for r in domain_pagerank(_edges(spark, pairs), **kw).collect()}


def test_pagerank_cycle_is_fixpoint(spark):
    # 3-cycle: pr0 = 333333; share = (333333*850)//1000 = 283333;
    # pr1 = 50000 + 283333 = 333333 — the integer chain is a fixpoint
    got = _rank(spark, [("a", "b"), ("b", "c"), ("c", "a")], n_iterations=3)
    assert {d: r["pr_micro"] for d, r in got.items()} == {"a": 333333, "b": 333333, "c": 333333}
    # equal scores rank by domain ascending
    assert {d: r["rank"] for d, r in got.items()} == {"a": 1, "b": 2, "c": 3}


def test_pagerank_hand_computed_dag(spark):
    # a->b, a->c, b->c; three exact integer iterations computed by hand
    got = _rank(spark, [("a", "b"), ("a", "c"), ("b", "c")], n_iterations=3)
    assert {d: r["pr_micro"] for d, r in got.items()} == {
        "a": 50000,
        "b": 71250,
        "c": 131812,
    }
    assert {d: (r["out_degree"], r["in_degree"]) for d, r in got.items()} == {
        "a": (2, 0),
        "b": (1, 1),
        "c": (0, 2),
    }
    assert {d: r["rank"] for d, r in got.items()} == {"c": 1, "b": 2, "a": 3}


def test_pagerank_multi_edges_count_once(spark):
    once = _rank(spark, [("a", "b")], n_iterations=2)
    multi = _rank(spark, [("a", "b"), ("a", "b"), ("a", "b")], n_iterations=2)
    assert {d: r["pr_micro"] for d, r in once.items()} == {
        d: r["pr_micro"] for d, r in multi.items()
    }
    assert multi["a"]["out_degree"] == 1


def test_pagerank_sink_only_node_receives_base_plus_mass(spark):
    # dangling node still appears (from dst side) with out_degree 0
    got = _rank(spark, [("a", "b")], n_iterations=1)
    assert set(got) == {"a", "b"}
    assert got["b"]["out_degree"] == 0
    # N=2: base = 150000000//2000 = 75000; a emits (500000*850)//1000
    assert got["a"]["pr_micro"] == 75000
    assert got["b"]["pr_micro"] == 75000 + (500_000 * 850) // 1000


def test_pagerank_param_validation(spark):
    e = _edges(spark, [("a", "b")])
    with pytest.raises(ValueError):
        domain_pagerank(e, n_iterations=0)
    with pytest.raises(ValueError):
        domain_pagerank(e, damping_milli=1001)


# ------------------------------------------------- cluster representatives


def _docs(spark, scores):
    return spark.createDataFrame([Row(doc_id=i, score=s) for i, s in scores.items()])


def test_cluster_representatives_best_score_wins(spark):
    pairs = spark.createDataFrame([Row(doc_a=1, doc_b=2), Row(doc_a=2, doc_b=3)])
    got = {
        r["doc_id"]: r
        for r in cluster_representatives(
            _docs(spark, {1: 5, 2: 9, 3: 9, 4: 7}), pairs, "score"
        ).collect()
    }
    # chain 1~2~3 is one cluster (min label 1); rep = max score, tie -> min id = 2
    assert all(got[i]["cluster_id"] == 1 for i in (1, 2, 3))
    assert all(got[i]["rep_id"] == 2 for i in (1, 2, 3))
    assert all(got[i]["cluster_size"] == 3 for i in (1, 2, 3))
    assert [got[i]["is_rep"] for i in (1, 2, 3)] == [0, 1, 0]
    # untouched doc is its own singleton representative
    assert (got[4]["cluster_id"], got[4]["rep_id"], got[4]["cluster_size"], got[4]["is_rep"]) == (
        4,
        4,
        1,
        1,
    )


def test_cluster_representatives_every_doc_once(spark):
    pairs = spark.createDataFrame([Row(doc_a=1, doc_b=2)])
    out = cluster_representatives(_docs(spark, {1: 1, 2: 2, 3: 3}), pairs, "score")
    rows = out.collect()
    assert sorted(r["doc_id"] for r in rows) == [1, 2, 3]
    # exactly one representative per cluster
    reps = out.groupBy("cluster_id").agg(F.sum("is_rep").alias("n")).collect()
    assert all(r["n"] == 1 for r in reps)
