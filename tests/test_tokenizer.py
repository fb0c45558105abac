# -*- coding: utf-8 -*-
"""BPE merge learning (operators.tokenizer.learn_bpe_merges)."""

import pytest
from pyspark.sql import Row

from dss_plugin_google_cloud_vision_spark.operators.tokenizer import (
    bpe_word_table,
    learn_bpe_merges,
)


def _merges(spark, texts, n):
    df = spark.createDataFrame([Row(text=t) for t in texts])
    return [tuple(r) for r in learn_bpe_merges(df, n_merges=n).collect()]


def test_classic_low_lower_lowest(spark):
    # words: low*3, lower*2, lowest, aaaa — hand-computed merge chain.
    # Round 1 ties (l,o)=6 and (o,w)=6 -> lexicographically smallest wins;
    # round 3 ties (a,a)=3 and (low,e)=3 -> (a,a).
    got = _merges(spark, ["low low low lower lower lowest aaaa"], 5)
    assert got == [
        (1, "l", "o", "lo", 6),
        (2, "lo", "w", "low", 6),
        (3, "a", "a", "aa", 3),
        (4, "low", "e", "lowe", 3),
        (5, "lowe", "r", "lower", 2),
    ]


def test_overlapping_pairs_count_but_merge_greedily(spark):
    # 'aaaa': (a,a) appears at 3 (overlapping) positions -> count 3, the
    # classic trainer count; application is greedy non-overlapping, so
    # the merged word is |aa||aa| and round 2 finds (aa,aa) once.
    got = _merges(spark, ["aaaa"], 2)
    assert got == [(1, "a", "a", "aa", 3), (2, "aa", "aa", "aaaa", 1)]


def test_pretokenization_ascii_runs_lowercased(spark):
    rows = {
        r["word"]: (r["wf"], r["seq"])
        for r in bpe_word_table(
            spark.createDataFrame([Row(text="Low, LOW! don't 123 中文")])
        ).collect()
    }
    assert rows == {
        "low": (2, "|l||o||w|"),
        "don't": (1, "|d||o||n||'||t|"),
        "123": (1, "|1||2||3|"),
    }


def test_runs_out_of_pairs(spark):
    # single-char words only: zero adjacent pairs -> zero merges, and the
    # no-op guard keeps later rounds from failing
    assert _merges(spark, ["a b c a b"], 3) == []


def test_merges_are_partitioning_invariant(spark):
    texts = [f"token{i % 7} repeat repeat value{i % 3}" for i in range(40)]
    one = _merges(spark, texts, 4)
    df = spark.createDataFrame([Row(text=t) for t in texts]).repartition(11)
    many = [tuple(r) for r in learn_bpe_merges(df, n_merges=4).collect()]
    assert one == many


def test_n_merges_validation(spark):
    with pytest.raises(ValueError, match="n_merges"):
        learn_bpe_merges(None, n_merges=0)
