# -*- coding: utf-8 -*-
"""Corpus subsampling operators for training-mixture construction:
deterministic hash sampling and per-group quotas.

Training-data pipelines rarely keep everything they crawl: mixtures are
built by sampling strata (languages, sources) at different rates and by
capping the contribution of any single host/domain so one giant site
cannot dominate the corpus (the Common Crawl curation rule). Both
operators here are deterministic pure functions of the data — re-running
the pipeline reproduces the same subsample bit-for-bit, and DuckDB mirrors
them exactly (no engine RNG anywhere).

The reference plugin has no sampling surface (it is a per-row API
enricher); these are engine additions in the spirit of SURVEY.md §2's
training-pipeline charter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Width of the md5 prefix used as the sampling coordinate. 8 hex digits =
# 32 uniform bits — plenty for per-mille rates with negligible bias.
_SAMPLE_HEX_DIGITS = 8
_SAMPLE_SPACE = 16**_SAMPLE_HEX_DIGITS


def sample_threshold_hex(rate_milli: int) -> str:
    """The inclusive-exclusive hex threshold for ``rate_milli``/1000
    sampling: a row is kept iff the first 8 md5 hex digits of its sampling
    key compare lexicographically BELOW this string. Lexicographic order
    on fixed-width lowercase hex equals numeric order, and md5 is
    identical in Spark and DuckDB — so the comparison is cross-engine
    exact with no numeric conversion at all."""
    if not 0 <= rate_milli <= 1000:
        raise ValueError(f"rate_milli must be in [0, 1000], got {rate_milli}")
    if rate_milli == 1000:
        # 'g' sorts above every hex digit: keep-everything threshold
        return "g"
    return format((_SAMPLE_SPACE * rate_milli) // 1000, f"0{_SAMPLE_HEX_DIGITS}x")


def sample_key_column(id_col: str = "doc_id", seed: int = 42) -> Column:
    """First 8 md5 hex digits of ``seed ':' id`` — the deterministic
    sampling coordinate. Salting with the seed decorrelates independent
    samples drawn from the same corpus."""
    return F.substring(
        F.md5(F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string"))),
        1,
        _SAMPLE_HEX_DIGITS,
    )


def deterministic_sample(
    df: DataFrame,
    rate_milli: int,
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Keep ~``rate_milli``/1000 of rows, deterministically: a row-local
    filter on the md5 sampling coordinate — zero shuffles, no RNG state,
    reproducible across runs, partitionings, and engines. Composable:
    different seeds give independent samples; the same seed at a higher
    rate yields a SUPERSET of the lower-rate sample (nested samples, the
    property train/validation carve-outs need)."""
    return df.filter(sample_key_column(id_col, seed) < F.lit(sample_threshold_hex(rate_milli)))


def stratified_sample(
    df: DataFrame,
    rates_milli: dict,
    strata_col: str = "lang",
    id_col: str = "doc_id",
    seed: int = 42,
    default_rate_milli: int = 0,
) -> DataFrame:
    """Per-stratum deterministic sampling (the training-mixture builder):
    ``rates_milli`` maps stratum value → keep rate in milli; strata absent
    from the map keep ``default_rate_milli``. Still one row-local filter —
    the rate lookup is a literal CASE chain, no join, no shuffle."""
    expr: Column = F.lit(sample_threshold_hex(default_rate_milli))
    for value, rate in sorted(rates_milli.items()):
        expr = F.when(
            F.col(strata_col) == F.lit(value), F.lit(sample_threshold_hex(rate))
        ).otherwise(expr)
    return df.filter(sample_key_column(id_col, seed) < expr)


def cap_per_group(
    df: DataFrame,
    group_col: str = "source",
    cap: int = 100,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-group quota (the per-host/per-domain crawl-curation cap): keep
    at most ``cap`` rows per group, preferring the LOWEST sampling
    coordinate (md5 of the id) so the survivors are a uniform random —
    but deterministic — subset of each group, not a crawl-order prefix.

    Scale shape: one ``row_number`` window partitioned by the group key.
    Each group sorts only its own rows; a pathological mega-host makes a
    big partition, which is exactly the row_number case AQE cannot split —
    for corpora where one host exceeds executor memory, run
    ``deterministic_sample`` first to knock the giants down (cheap,
    row-local) and then apply the exact cap. Output adds nothing: the
    input columns pass through unchanged."""
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        sample_key_column(id_col, seed=0), F.col(id_col)
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= cap)
        .drop("_rn")
    )
