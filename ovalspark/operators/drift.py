"""Distribution-drift tests — KS on span counts, chi-square on kind mix.

The generator's span-count law is oval's truncated-exponential size sampler
(``internal/pattern/pattern.go:22-71`` in /root/reference) whose closed-form
CDF is ``F(x) = 2(1 - 2^-x)`` on [0,1) (pattern.go:50). A partition whose
span-count distribution drifts from that law (DIST_DRIFT) is flagged by a
per-partition Kolmogorov–Smirnov statistic against the discretized CDF;
the categorical ``kind`` mix (70/15/10/5) is checked per partition with a
chi-square statistic.

Scale shape:
- Both tests consume per-partition *histograms*, not raw samples: span
  counts take at most (max_spans - min_spans + 1) distinct values and kind
  takes 4, so the groupBy reduces each partition to a handful of rows
  before any Python runs. The KS statistic itself runs in a vectorized
  ``applyInPandas`` over those tiny histogram groups (SURVEY §4 custom
  work #4); chi-square stays in pure column expressions.
- No driver-side collection; output is one row per partition.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ovalspark.functions.spans import KIND_CUM_PCT, KINDS


def _model_cdf(k: float, min_spans: int, max_spans: int) -> float:
    """P(n_spans <= k) under the generator's law: n = min + floor(x*W),
    x ~ F(x)=2(1-2^-x) on [0,1), W = max-min+1."""
    width = max_spans - min_spans + 1
    x = (math.floor(k) - min_spans + 1) / width
    x = min(max(x, 0.0), 1.0)
    return 2.0 * (1.0 - 2.0 ** (-x)) if x < 1.0 else 1.0


def ks_drift(
    docs: DataFrame,
    min_spans: int,
    max_spans: int,
    threshold: float | None = None,
) -> DataFrame:
    """Per-partition KS statistic of size(spans) vs the model CDF.

    Returns (partition_id, n_docs, ks_stat, drifted). The ECDF is exact:
    built from the full per-partition histogram, not a sample.

    ``threshold=None`` (default) uses the sample-size-dependent KS
    critical value ``1.63/sqrt(n)`` (α≈0.01) — a fixed threshold
    false-positives on small partitions and under-detects on huge ones.
    """
    hist = (
        docs.select("partition_id", F.size("spans").alias("n_spans"))
        .groupBy("partition_id", "n_spans")
        .agg(F.count("*").alias("cnt"))
    )

    # NOTE: the closure must be self-contained (no references to module
    # globals) so it cloudpickles by value — executors then don't need the
    # ovalspark package on their PYTHONPATH.
    width = max_spans - min_spans + 1

    def ks(pdf: pd.DataFrame) -> pd.DataFrame:
        import math as _math

        def model_cdf(k: float) -> float:
            x = (_math.floor(k) - min_spans + 1) / width
            x = min(max(x, 0.0), 1.0)
            return 2.0 * (1.0 - 2.0 ** (-x)) if x < 1.0 else 1.0

        pdf = pdf.sort_values("n_spans")
        total = int(pdf["cnt"].sum())
        ecdf = pdf["cnt"].cumsum() / total
        model = pdf["n_spans"].map(model_cdf)
        d = float((ecdf - model).abs().max())
        return pd.DataFrame(
            {
                "partition_id": [int(pdf["partition_id"].iloc[0])],
                "n_docs": [total],
                "ks_stat": [d],
            }
        )

    out = hist.groupBy("partition_id").applyInPandas(
        ks, "partition_id int, n_docs long, ks_stat double"
    )
    crit = F.lit(threshold) if threshold is not None else 1.63 / F.sqrt(F.col("n_docs"))
    return out.withColumn("drifted", F.col("ks_stat") > crit)


def chi_square_drift(docs: DataFrame, threshold: float = 30.0) -> DataFrame:
    """Per-partition chi-square of the span-kind histogram against the
    generator's categorical weights. Pure column expressions: the explode
    is narrow, the groupBy reduces to (n_partitions × 4) rows.

    Returns (partition_id, n_spans, chi2, drifted).
    """
    probs = {}
    lo = 0
    for kind, hi in zip(KINDS, KIND_CUM_PCT):
        probs[kind] = (hi - lo) / 100.0
        lo = hi

    obs = (
        docs.select("partition_id", F.explode("spans").alias("s"))
        .select("partition_id", F.col("s.kind").alias("kind"))
        .groupBy("partition_id", "kind")
        .agg(F.count("*").alias("obs"))
    )
    totals = obs.groupBy("partition_id").agg(F.sum("obs").alias("total"))
    p_expr = F.create_map(*[x for k, p in probs.items() for x in (F.lit(k), F.lit(p))])
    contrib = (
        obs.join(totals, "partition_id")
        .withColumn("exp", F.col("total") * p_expr[F.col("kind")])
        .withColumn("term", (F.col("obs") - F.col("exp")) ** 2 / F.col("exp"))
    )
    out = contrib.groupBy("partition_id").agg(
        F.max("total").alias("n_spans"), F.sum("term").alias("chi2")
    )
    return out.withColumn("drifted", F.col("chi2") > threshold)


def check_distribution(
    docs: DataFrame,
    min_spans: int,
    max_spans: int,
    ks_threshold: float | None = None,
    chi2_threshold: float = 30.0,
) -> DataFrame:
    """Drift results as violation rows (common schema) — DIST_DRIFT per
    drifted partition, so distribution checks compose into a
    ValidationPlan next to the row-level constraints (FIXTURES.md §4)."""
    ks = ks_drift(docs, min_spans, max_spans, ks_threshold).filter(F.col("drifted"))
    chi = chi_square_drift(docs, chi2_threshold).filter(F.col("drifted"))
    k = ks.select(
        "partition_id",
        F.lit(None).cast("string").alias("doc_id"),
        F.lit(None).cast("int").alias("span_idx"),
        F.lit("span_count_distribution").alias("field"),
        F.lit("F(x)=2(1-2^-x)").alias("expected"),
        F.format_string("ks=%.4f", F.col("ks_stat")).alias("actual"),
        F.lit("DIST_DRIFT").alias("violation_class"),
        F.lit(None).cast("int").alias("writer_id"),
        F.lit(None).cast("timestamp").alias("written_at"),
    )
    c = chi.select(
        "partition_id",
        F.lit(None).cast("string").alias("doc_id"),
        F.lit(None).cast("int").alias("span_idx"),
        F.lit("kind_distribution").alias("field"),
        F.lit("70/15/10/5").alias("expected"),
        F.format_string("chi2=%.2f", F.col("chi2")).alias("actual"),
        F.lit("DIST_DRIFT").alias("violation_class"),
        F.lit(None).cast("int").alias("writer_id"),
        F.lit(None).cast("timestamp").alias("written_at"),
    )
    return k.unionByName(c)
