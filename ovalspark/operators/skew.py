"""Skew handling — salted join for hot keys.

The north-rule scenario: a handful of doc_id ranges are orders of
magnitude hotter than the rest (the generator's ``hot_shard_factor``
models this). AQE's skew-join splits oversized partitions at runtime for
sort-merge joins, but (a) it only kicks in past size thresholds and
(b) does nothing for hot keys in aggregations. This module provides the
explicit construction:

``salted_join(big, small, key, n_salts)``: every *big*-side row gets a
random-but-deterministic salt in [0, n_salts); the *small* side is
replicated n_salts times; the join key becomes (key, salt). A key with
10^8 occurrences now lands on n_salts reducers instead of one. The
small-side replication cost is n_salts × |small| — use for dim-like
sides, pair with ``broadcast`` when the replicated side still fits.

(The two-phase salted aggregation lives in ``operators.uniqueness``.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
    salt_seed: int = 11,
) -> DataFrame:
    """Skew-resistant equi-join on ``key``. Result columns = big's ∪
    small's (like ``big.join(small, key, how)``); salt columns are
    internal and dropped.

    The salt is xxhash64 over EVERY big-side column (row content), not
    ``monotonically_increasing_id`` — content-derived salts are stable
    across runs, partitionings, and parallelism levels, so repeated runs
    produce identical salt assignment (resume-friendly). Byte-identical
    duplicate rows share a salt; that only matters if one key's rows are
    ALSO mostly duplicates, in which case salting can't help anyway.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how}")
    b = big.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in big.columns], F.lit(salt_seed)), F.lit(n_salts)).cast("int"),
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("_salt")
    s = small.select("*", salts)
    return b.join(s, [key, "_salt"], how).drop("_salt")
