"""Deterministic sampling for training-data curation.

``F.rand`` is partition-layout-dependent (same seed, different rows on a
different cluster size) — useless for resumable, auditable pipelines. The
engine samples by CONTENT HASH: a document is in the sample iff the
md5-derived uniform of its key is below the rate. Properties a curation
pipeline needs and gets for free:

- reproducible anywhere (any partitioning, any engine — DuckDB-oracle-
  checkable; same recipe as the rest of the engine's portable hashing)
- stable under appends: adding documents never changes the verdict on
  existing ones (per-key decision, no global state)
- nested rates are supersets: ``rate=0.1`` sample ⊂ ``rate=0.2`` sample,
  so a pipeline can cheaply down-scale a sample without resampling.

Scale shape: one codegen'd filter — no shuffle, no driver state. The
stratified form computes its rate per stratum from a literal map (tiny,
broadcast-free) — still a pure filter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SAMPLE_DENOM = 1 << 30


def _hash_u01(key: Column, seed: int) -> Column:
    """Portable uniform [0,1): 60-bit md5 prefix of "seed:key" scaled.
    (DuckDB twin: ('0x'||substr(md5(...),1,15))::BIGINT % 2^30 / 2^30.)"""
    h = F.conv(F.substring(F.md5(F.concat(F.lit(f"{seed}:"), key.cast("string"))), 1, 15), 16, 10).cast("long")
    return F.pmod(h, F.lit(_SAMPLE_DENOM)) / float(_SAMPLE_DENOM)


def hash_sample(df: DataFrame, key_col: str, rate: float, seed: int = 17) -> DataFrame:
    """Deterministic ``rate``-fraction sample keyed on ``key_col``."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0,1], got {rate}")
    return df.filter(_hash_u01(F.col(key_col), seed) < rate)


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    seed: int = 17,
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. lang-balanced corpus
    curation: keep 50% of 'en', 10% of everything else). Rates are exact
    in expectation per stratum; the decision stays per-key stable."""
    for s, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for stratum {s!r} must be in [0,1], got {r}")
    rate = F.lit(float(default_rate))
    for s, r in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == s, F.lit(float(r))).otherwise(rate)
    return df.filter(_hash_u01(F.col(key_col), seed) < rate)
