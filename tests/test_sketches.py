# -*- coding: utf-8 -*-
"""Bounded-state sketches: count-min frequency grid + HLL distinct
registers. The load-bearing properties are the sketch guarantees
themselves (never-under-count; mergeability; bounded error) plus the
cross-engine hash arithmetic (hashlib replays of every hash coordinate).
"""

import hashlib

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from dss_plugin_google_cloud_vision_spark.operators.sketches import (
    CM_SEED,
    HLL_RMAX,
    HLL_SEED,
    countmin_estimates,
    countmin_table,
    hll_distinct_estimate,
    hll_register_table,
    hll_rho,
    whitespace_tokens,
)


def _md5_window(salt: str, value: str, start: int, width: int) -> str:
    return hashlib.md5(f"{salt}:{value}".encode()).hexdigest()[start - 1 : start - 1 + width]


def _py_bucket(token: str, salt: str, modulus: int) -> int:
    return int(_md5_window(salt, token, 1, 8), 16) % modulus


def _py_rho(value: str, salt: str) -> int:
    window = int(_md5_window(salt, value, 5, 8), 16)
    if window == 0:
        return HLL_RMAX
    return 32 - window.bit_length() + 1


def _docs(spark, texts):
    return spark.createDataFrame([Row(doc_id=i, text=t) for i, t in enumerate(texts)])


# ------------------------------------------------------------- count-min


def test_countmin_grid_row_sums_equal_token_count(spark):
    """Every grid row sees every token occurrence exactly once, so each
    row's counter sum == total corpus token count."""
    df = _docs(spark, ["a b c a", "b b", "x y z"])
    grid = countmin_table(df, depth=3, width=16, seed=5)
    sums = {
        r["row"]: r["s"]
        for r in grid.groupBy("row").agg(F.sum("cnt").alias("s")).collect()
    }
    assert sums == {0: 9, 1: 9, 2: 9}


def test_countmin_cells_match_hashlib_replay(spark):
    """The grid is exactly what a python replay of the md5 bucketing
    produces — the cross-engine hash coordinate is real."""
    texts = ["red green blue red", "green green"]
    df = _docs(spark, texts)
    depth, width, seed = 2, 8, 5
    grid = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in countmin_table(df, depth=depth, width=width, seed=seed).collect()
    }
    expected = {}
    for text in texts:
        for tok in text.split(" "):
            for row in range(depth):
                key = (row, _py_bucket(tok, f"{seed}:{row}", width))
                expected[key] = expected.get(key, 0) + 1
    assert grid == expected


def test_countmin_never_undercounts(spark):
    """The defining guarantee: estimate >= true count for every token,
    even with a tiny grid forcing collisions."""
    texts = [" ".join(f"tok{i % 13}" for i in range(30)) for _ in range(4)]
    df = _docs(spark, texts)
    sketch = countmin_table(df, depth=2, width=4, seed=3)
    exact = whitespace_tokens(df).groupBy("token").count()
    est = countmin_estimates(exact, sketch, depth=2, width=4, seed=3)
    rows = est.collect()
    assert len(rows) == 13
    assert all(r["cm_estimate"] >= r["count"] for r in rows)
    # with width=4 << 13 distinct tokens, collisions MUST overcount somewhere
    assert any(r["cm_estimate"] > r["count"] for r in rows)


def test_countmin_exact_when_no_collisions(spark):
    """A wide grid over few distinct tokens estimates exactly (depth=4
    independent chances to dodge every collision)."""
    df = _docs(spark, ["alpha beta alpha", "beta gamma"])
    sketch = countmin_table(df)  # defaults: 4 x 256
    probes = whitespace_tokens(df).groupBy("token").count()
    est = countmin_estimates(probes, sketch)
    assert {(r["token"], r["cm_estimate"]) for r in est.collect()} == {
        ("alpha", 2),
        ("beta", 2),
        ("gamma", 1),
    }


def test_countmin_estimate_zero_for_absent_token(spark):
    df = _docs(spark, ["a b"])
    sketch = countmin_table(df, depth=2, width=64, seed=9)
    probes = spark.createDataFrame([Row(token="never-seen-zzz")])
    est = countmin_estimates(probes, sketch, depth=2, width=64, seed=9)
    assert est.head()["cm_estimate"] == 0


def test_countmin_estimates_join_is_broadcast(spark):
    df = _docs(spark, ["a b c"])
    sketch = countmin_table(df)
    probes = whitespace_tokens(df).distinct()
    est = countmin_estimates(probes, sketch)
    plan = est._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_countmin_validates_dims(spark):
    df = _docs(spark, ["a"])
    with pytest.raises(ValueError):
        countmin_table(df, depth=0)


def test_countmin_probe_rows_preserved_and_cnt_column_ok(spark):
    """Estimation is row-for-row: duplicate probe rows survive, and a
    probe column named 'cnt' (the natural exact-count alias) is fine —
    the internals never group on or collide with probe columns."""
    df = _docs(spark, ["a b a"])
    sketch = countmin_table(df, depth=2, width=8, seed=3)
    probes = spark.createDataFrame(
        [Row(token="a", cnt=2), Row(token="a", cnt=2), Row(token="b", cnt=1)]
    )
    rows = countmin_estimates(probes, sketch, depth=2, width=8, seed=3).collect()
    assert sorted((r["token"], r["cnt"], r["cm_estimate"]) for r in rows) == [
        ("a", 2, 2),
        ("a", 2, 2),
        ("b", 1, 1),
    ]


def test_countmin_rejects_internal_name_collision(spark):
    df = _docs(spark, ["a"])
    sketch = countmin_table(df)
    probes = spark.createDataFrame([Row(token="a", _cm_cnt_0=1)])
    with pytest.raises(ValueError):
        countmin_estimates(probes, sketch)


def test_countmin_depth_one(spark):
    df = _docs(spark, ["a b a"])
    sketch = countmin_table(df, depth=1, width=64, seed=3)
    probes = spark.createDataFrame([Row(token="a")])
    assert (
        countmin_estimates(probes, sketch, depth=1, width=64, seed=3).head()[
            "cm_estimate"
        ]
        == 2
    )


# ------------------------------------------------------------------ HLL


def test_hll_rho_matches_hashlib_bit_count(spark):
    """rho computed on the hex STRING == 1 + leading-zero-bits of the
    32-bit hash window computed in python."""
    values = [f"val{i}" for i in range(200)]
    df = spark.createDataFrame([Row(v=v) for v in values])
    got = {
        r["v"]: r["rho"]
        for r in df.select("v", hll_rho(F.col("v"), str(HLL_SEED)).alias("rho")).collect()
    }
    for v in values:
        assert got[v] == _py_rho(v, str(HLL_SEED)), v
    assert min(got.values()) >= 1 and max(got.values()) <= HLL_RMAX


def test_hll_registers_match_hashlib_replay(spark):
    values = [f"item-{i}" for i in range(500)]
    df = spark.createDataFrame([Row(v=v) for v in values])
    regs = {
        r["bucket"]: r["register"]
        for r in hll_register_table(df, "v", log2m=4, seed=HLL_SEED).collect()
    }
    expected = {}
    for v in values:
        b = int(_md5_window(str(HLL_SEED), v, 1, 4), 16) % 16
        expected[b] = max(expected.get(b, 0), _py_rho(v, str(HLL_SEED)))
    assert regs == expected


def test_hll_registers_merge_across_shards(spark):
    """union-then-max of per-shard register tables == whole-corpus table:
    the property that makes the sketch a 1000-executor / N-run merge."""
    all_vals = [f"row{i}" for i in range(400)]
    full = spark.createDataFrame([Row(v=v) for v in all_vals])
    shard_a = spark.createDataFrame([Row(v=v) for v in all_vals[:150]])
    shard_b = spark.createDataFrame([Row(v=v) for v in all_vals[100:]])  # overlap on purpose
    merged = (
        hll_register_table(shard_a, "v")
        .unionByName(hll_register_table(shard_b, "v"))
        .groupBy("bucket")
        .agg(F.max("register").alias("register"))
    )
    whole = hll_register_table(full, "v")
    assert sorted(merged.collect()) == sorted(whole.collect())


def test_hll_estimate_duplicates_do_not_move_it(spark):
    """The sketch counts DISTINCT values: replicating every row 5x leaves
    the register table (hence the estimate) identical."""
    vals = [f"u{i}" for i in range(300)]
    once = spark.createDataFrame([Row(v=v) for v in vals])
    five = spark.createDataFrame([Row(v=v) for v in vals for _ in range(5)])
    est1 = hll_distinct_estimate(once, "v").head()
    est5 = hll_distinct_estimate(five, "v").head()
    assert est1["hll_estimate"] == est5["hll_estimate"]
    assert est1["exact_distinct"] == est5["exact_distinct"] == 300


def test_hll_estimate_error_bounded(spark):
    """Raw HLL with m=64 has ~13% standard error; assert a generous 3-sigma
    bound on a 2000-distinct corpus (fixed hashes → deterministic)."""
    df = spark.createDataFrame([Row(v=f"doc-{i}") for i in range(2000)])
    row = hll_distinct_estimate(df, "v").head()
    assert row["exact_distinct"] == 2000
    assert row["err_milli"] < 400, row
    # sum_pow consistency: registers_set <= m and sum_pow >= m (every
    # register contributes at least 1 << (RMAX - RMAX) ... missing ones 2^RMAX)
    assert row["registers_set"] <= row["m"]
    assert row["hll_estimate"] > 0


def test_hll_empty_corpus_degrades_not_nulls(spark):
    """Zero rows: all registers missing → sum_pow = m * 2^RMAX and the raw
    estimate ~= alpha * m / 1000; err_milli is NULL (exact = 0)."""
    empty = spark.createDataFrame([], "v string")
    row = hll_distinct_estimate(empty, "v").head()
    assert row["registers_set"] == 0
    assert row["sum_pow"] == 64 * (1 << HLL_RMAX)
    assert row["hll_estimate"] == 709 * 64 // 1000
    assert row["exact_distinct"] == 0 and row["err_milli"] is None


def test_hll_validates_log2m(spark):
    df = spark.createDataFrame([Row(v="x")])
    with pytest.raises(ValueError):
        hll_register_table(df, "v", log2m=17)
    with pytest.raises(ValueError):
        hll_register_table(df, "v", log2m=0)


def test_hll_estimator_rejects_overflowing_log2m(spark):
    """The estimator numerator alpha*m^2*2^33 leaves int64 at log2m=11 —
    refused up front (register tables alone may still go to 16)."""
    from dss_plugin_google_cloud_vision_spark.operators.sketches import (
        hll_estimate_from_registers,
    )

    regs = spark.createDataFrame([Row(bucket=0, register=1)])
    with pytest.raises(ValueError, match="int64"):
        hll_estimate_from_registers(regs, log2m=11)
    hll_estimate_from_registers(regs, log2m=10).head()  # boundary OK


def test_hll_estimator_fails_on_unmerged_ledger(spark):
    """An unmerged multi-wave ledger (duplicate buckets, count > m) must
    fail the job — not silently return a negative/garbage estimate."""
    from dss_plugin_google_cloud_vision_spark.operators.sketches import (
        hll_estimate_from_registers,
    )

    # 3 waves × 64 buckets = 192 rows > m=64
    ledger = spark.createDataFrame(
        [Row(bucket=b, register=1 + (w % 3)) for w in range(3) for b in range(64)]
    )
    with pytest.raises(Exception, match="registers_set exceeds m"):
        hll_estimate_from_registers(ledger, log2m=6).head()
