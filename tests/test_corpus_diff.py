# -*- coding: utf-8 -*-
"""Corpus-level MinHash overlap: hashlib replay of the sketch, shard
mergeability, exact-Jaccard honesty columns, boundary corpora."""

import hashlib

import pytest
from pyspark.sql import functions as F

from dss_plugin_google_cloud_vision_spark.operators.corpus_diff import (
    corpus_minhash,
    corpus_overlap_report,
    corpus_shingles,
    estimate_corpus_overlap,
    merge_corpus_minhash,
)

A = [("w1 w2 w3 w4",), ("w2 w3 w4 w5",), ("short",)]
B = [("w1 w2 w3 w4",), ("x1 x2 x3 x4",)]


def _py_shingles(rows, k=3):
    out = set()
    for (t,) in rows:
        toks = t.split(" ")
        if len(toks) >= k:
            for i in range(len(toks) - k + 1):
                out.add(" ".join(toks[i : i + k]))
        else:
            out.add(t)
    return out


def _py_minhash(rows, n_hashes=12, k=3):
    sh = _py_shingles(rows, k)
    return {
        s: min(hashlib.md5(f"{s}#{x}".encode()).hexdigest() for x in sh)
        for s in range(n_hashes)
    }


@pytest.fixture(scope="module")
def dfs(spark):
    return (
        spark.createDataFrame(A, "text string"),
        spark.createDataFrame(B, "text string"),
    )


def test_corpus_minhash_hashlib_replay(dfs):
    df_a, _ = dfs
    got = {r.slot: r.min_hash for r in corpus_minhash(df_a).collect()}
    assert got == _py_minhash(A)


def test_shingles_short_doc_rule(dfs):
    df_a, _ = dfs
    got = {r.shingle for r in corpus_shingles(df_a).collect()}
    assert got == _py_shingles(A)
    assert "short" in got  # whole text when < k tokens


def test_merge_equals_union_signature(spark, dfs):
    df_a, df_b = dfs
    union_sig = {
        r.slot: r.min_hash
        for r in corpus_minhash(df_a.unionByName(df_b)).collect()
    }
    merged = {
        r.slot: r.min_hash
        for r in merge_corpus_minhash(
            corpus_minhash(df_a), corpus_minhash(df_b)
        ).collect()
    }
    assert merged == union_sig


def test_identical_corpora_full_match(spark, dfs):
    df_a, _ = dfs
    row = corpus_overlap_report(df_a, df_a).collect()[0]
    assert row.matching_slots == row.n_hashes == 12
    assert row.est_jaccard_milli == 1000
    assert row.exact_jaccard_milli == 1000 and row.err_milli == 0


def test_disjoint_corpora_zero_match(spark):
    df_a = spark.createDataFrame([("a1 a2 a3 a4",)], "text string")
    df_b = spark.createDataFrame([("b1 b2 b3 b4",)], "text string")
    row = corpus_overlap_report(df_a, df_b).collect()[0]
    assert row.matching_slots == 0 and row.est_jaccard_milli == 0
    assert row.n_shared == 0 and row.exact_jaccard_milli == 0


def test_exact_columns_match_set_arithmetic(dfs):
    df_a, df_b = dfs
    row = corpus_overlap_report(df_a, df_b).collect()[0]
    sa, sb = _py_shingles(A), _py_shingles(B)
    assert row.n_shingles_a == len(sa)
    assert row.n_shingles_b == len(sb)
    assert row.n_shared == len(sa & sb)
    assert row.exact_jaccard_milli == 1000 * len(sa & sb) // len(sa | sb)
    assert row.err_milli == abs(row.est_jaccard_milli - row.exact_jaccard_milli)


def test_empty_corpus_sketch(spark, dfs):
    df_a, _ = dfs
    empty = spark.createDataFrame([], "text string")
    sig = corpus_minhash(empty).collect()
    assert len(sig) == 12 and all(r.min_hash is None for r in sig)
    est = estimate_corpus_overlap(corpus_minhash(df_a), corpus_minhash(empty)).collect()[0]
    assert est.matching_slots == 0 and est.est_jaccard_milli == 0
    # merging an empty shard is the identity
    merged = {
        r.slot: r.min_hash
        for r in merge_corpus_minhash(corpus_minhash(df_a), corpus_minhash(empty)).collect()
    }
    assert merged == _py_minhash(A)


def test_empty_vs_empty_is_zero_not_null(spark):
    """NULL slots never match (plain equality — the oracle's rule), and
    the 0-shingle union defines exact Jaccard as 0: every column of the
    empty-vs-empty report is a concrete integer, never NULL."""
    empty = spark.createDataFrame([], "text string")
    row = corpus_overlap_report(empty, empty).collect()[0]
    assert row.n_hashes == 12 and row.matching_slots == 0
    assert row.est_jaccard_milli == 0
    assert row.n_shingles_a == 0 and row.n_shingles_b == 0 and row.n_shared == 0
    assert row.exact_jaccard_milli == 0 and row.err_milli == 0


def test_sketch_half_is_bounded_plan(dfs):
    """The estimate-only path (production mode) never shuffles more than
    the k-row signatures: one partial/final agg pair per corpus, a
    broadcast k-row join, no sort-merge join, no distinct over shingles."""
    df_a, df_b = dfs
    est = corpus_overlap_report(df_a, df_b, include_exact=False)
    plan = est._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, plan
