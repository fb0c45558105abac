# -*- coding: utf-8 -*-
"""Hashed-feature linear classifier: weight training is replayed with
hashlib in plain python on a tiny corpus (exact match), and the
classifier invariants (separable corpus → perfect self-classification,
deterministic tie-break, dense weight grid, broadcast-only join) are
asserted directly."""

import hashlib

from pyspark.sql import Row
from pyspark.sql import functions as F

from dss_plugin_google_cloud_vision_spark.operators.classifier import (
    CLS_SEED,
    classify_documents,
    train_class_affinity_weights,
)


def _bucket(ngram: str, n_buckets: int, seed: int = CLS_SEED) -> int:
    h = hashlib.md5(f"{seed}:{ngram}".encode()).hexdigest()[:8]
    return int(h, 16) % n_buckets


def _ngrams(text: str) -> list:
    toks = text.split(" ")
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _py_weights(rows, n_buckets, scale=1_000_000, seed=CLS_SEED):
    """Python replay of train_class_affinity_weights."""
    occ = []
    for _id, text, label in rows:
        for ng in _ngrams(text):
            occ.append((label, _bucket(ng, n_buckets, seed)))
    labels = sorted({label for label, _ in occ})
    totals, pairs = {}, {}
    for label, b in occ:
        totals[b] = totals.get(b, 0) + 1
        pairs[(b, label)] = pairs.get((b, label), 0) + 1
    return {
        (b, lab): (pairs.get((b, lab), 0) + 1) * scale // (totals[b] + len(labels))
        for b in totals
        for lab in labels
    }


def _docs(spark, rows):
    return spark.createDataFrame([Row(doc_id=i, text=t, lang=g) for i, t, g in rows])


CORPUS = [
    (0, "aardvark anchovy apple", "a"),
    (1, "apple anchovy", "a"),
    (2, "bison barley bean bean", "b"),
    (3, "barley bison", "b"),
]


def test_weight_table_matches_hashlib_replay(spark):
    rows = CORPUS
    got = {
        (r["bucket"], r["label"]): r["weight_micro"]
        for r in train_class_affinity_weights(_docs(spark, rows), n_buckets=8).collect()
    }
    assert got == _py_weights(rows, n_buckets=8)


def test_weight_grid_is_dense_over_touched_buckets(spark):
    w = train_class_affinity_weights(_docs(spark, CORPUS), n_buckets=16)
    per_bucket = w.groupBy("bucket").count().collect()
    assert all(r["count"] == 2 for r in per_bucket)  # every label present


def test_separable_corpus_self_classifies_perfectly(spark):
    """Disjoint vocabularies per label: every document must predict its
    own label (the affinity weights dominate for the owning class)."""
    rows = [
        (i, " ".join(f"{lab}word{j}" for j in range(6)), lab)
        for i, lab in enumerate(["en", "en", "fr", "fr", "de", "de"])
    ]
    df = _docs(spark, rows)
    w = train_class_affinity_weights(df)
    pred = classify_documents(df, w)
    joined = pred.join(df.select("doc_id", "lang"), "doc_id").collect()
    assert len(joined) == 6
    assert all(r["predicted_label"] == r["lang"] for r in joined)


def test_scores_match_hashlib_replay(spark):
    """End-to-end: per-doc best score equals the python fold over the
    replayed weight table."""
    rows = CORPUS
    df = _docs(spark, rows)
    w = train_class_affinity_weights(df, n_buckets=8)
    got = {r["doc_id"]: r for r in classify_documents(df, w, n_buckets=8).collect()}
    weights = _py_weights(rows, n_buckets=8)
    labels = sorted({g for _, _, g in rows})
    for _id, text, _g in rows:
        scores = {
            lab: sum(weights[(_bucket(ng, 8), lab)] for ng in _ngrams(text))
            for lab in labels
        }
        best = min((-s, lab) for lab, s in scores.items())
        assert got[_id]["predicted_label"] == best[1]
        assert got[_id]["best_score_micro"] == -best[0]
        assert got[_id]["n_ngrams"] == len(_ngrams(text))


def test_exact_tie_breaks_to_smallest_label(spark):
    """Two labels with identical corpora → symmetric weights → every score
    ties → deterministic argmin picks the lexicographically smallest."""
    rows = [(0, "same text here", "zz"), (1, "same text here", "aa")]
    df = _docs(spark, rows)
    w = train_class_affinity_weights(df)
    pred = classify_documents(df, w).collect()
    assert all(r["predicted_label"] == "aa" for r in pred)


def test_inference_join_is_broadcast(spark):
    df = _docs(spark, CORPUS)
    w = train_class_affinity_weights(df)
    plan = (
        classify_documents(df, w)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
