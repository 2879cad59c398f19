"""Structured Streaming wrappers — continuous validation of appended data.

The reference has NO stream processing: oval's "continuous" checking is a
bounded wall-clock loop of randomized ops (/root/reference/internal/
runner/runner.go:190). These wrappers are the engine's extension of that
idea to an actually-streaming table: newly appended document files are
validated micro-batch by micro-batch.

- ``validate_stream``: readStream over the documents location →
  ``foreachBatch`` running the SAME batch validators (span-sequence +
  existence-phantom side) → violations appended to a sink. Exactly-once
  per micro-batch comes from the streaming checkpoint; the validators are
  deterministic, so replays rewrite identical violations.
- ``monotonic_generation_stream``: a custom STATEFUL operator via
  ``applyInPandasWithState``: per doc_id, the generation embedded in
  arriving rows must never decrease across micro-batches — the streaming
  form of oval's WriteCount-must-advance invariant
  (/root/reference/internal/runner/worker.go:84, pattern.go:152-157).
"""

from __future__ import annotations

from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DOCS_SCHEMA = (
    "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>, "
    "generation int, writer_id int, written_at timestamp, partition_id int"
)


def validate_stream(
    spark: SparkSession,
    docs_path: str,
    catalog: DataFrame,
    out_path: str,
    checkpoint_dir: str,
    n_assets: int | None = None,
    trigger_once: bool = True,
    mode: str = "spans",
):
    """Start a streaming query that validates every appended docs file.

    Returns the StreamingQuery; caller drives it (processAllAvailable for
    tests, awaitTermination in production). Violations are appended as
    parquet at ``out_path``.

    ``mode="spans"`` runs the span-sequence validator per micro-batch.
    ``mode="fused"`` runs the single-pass ``validate_all`` (operators/
    fused.py) against the catalog SEMI-SCOPED to the batch's doc_ids —
    adding SIZE/PHANTOM/DUP(within-batch) to the span checks from the
    same one scan. Corpus-GLOBAL classes are out of reach of any
    micro-batch and are excluded loudly rather than emitted wrong:
    LOST_DOC cannot fire against a semi-scoped catalog (a batch not
    containing doc X says nothing about X being lost), and per-partition
    COUNT_MISMATCH would report partial counts whenever a partition
    spans micro-batches. Those two remain the batch pass's job (or an
    end-of-stream reconciliation over the accumulated sink).
    """
    from ovalspark.functions import spans as sp
    from ovalspark.operators import validate_spans
    from ovalspark.operators.fused import validate_all

    na = n_assets if n_assets is not None else sp.DEFAULT_N_ASSETS
    if mode not in ("spans", "fused"):
        raise ValueError(f"mode must be spans|fused, got {mode!r}")
    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", "64")
        .parquet(docs_path)
    )

    def run_batch(batch: DataFrame, epoch_id: int) -> None:
        if mode == "fused":
            batch = batch.localCheckpoint()  # feeds the join twice (scope + validate)
            cat_b = catalog.join(batch.select("doc_id").distinct(), "doc_id", "left_semi")
            v = validate_all(batch, cat_b, na).filter(
                ~F.col("violation_class").isin("LOST_DOC", "COUNT_MISMATCH")
            )
        else:
            v = validate_spans(batch, catalog, na)
        v.withColumn("epoch_id", F.lit(epoch_id)).write.mode("append").parquet(out_path)

    writer = stream.writeStream.foreachBatch(run_batch).option("checkpointLocation", checkpoint_dir)
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def dedup_stream(
    docs_stream: DataFrame,
    text_col: str = "text",
    time_col: str = "written_at",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup on ingest — the stream counterpart of
    ``dedup.exact_duplicates``: md5 content fingerprint; one copy of each
    distinct payload within the watermark survives (the first PROCESSED
    copy — within a single micro-batch the survivor is unspecified, across
    batches earlier batches win). ``dropDuplicatesWithinWatermark`` bounds
    the dedup state by event time (a plain dropDuplicates keeps EVERY
    fingerprint forever — unbounded state, the classic streaming-dedup
    failure at scale)."""
    fp = docs_stream.withColumn("_fp", F.md5(F.col(text_col)))
    return fp.withWatermark(time_col, watermark).dropDuplicatesWithinWatermark(["_fp"]).drop("_fp")


def windowed_violation_counts(
    violations_stream: DataFrame,
    time_col: str = "written_at",
    window_dur: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Event-time windowed violation-rate aggregation with a watermark —
    the monitoring surface over a violations stream (e.g. the sink
    ``validate_stream`` appends to, re-read as a stream): per
    (time window, violation_class) counts.

    The watermark BOUNDS STATE (windows older than max_event_time -
    watermark are finalized and their state dropped) and defines the
    late-data contract: an event arriving after its window finalized is
    dropped, not double-counted — with ``outputMode("append")`` each
    window emits exactly once, when the watermark passes its end. Without
    the watermark this aggregation would keep every window ever seen in
    state forever (the unbounded-state failure at scale).
    """
    return (
        violations_stream.withWatermark(time_col, watermark)
        .groupBy(
            F.window(time_col, window_dur).alias("w"),
            "violation_class",
        )
        .agg(F.count("*").alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "violation_class",
            "n",
        )
    )


MONO_OUT_SCHEMA = "doc_id string, prev_generation int, generation int, violation_class string"
MONO_STATE_SCHEMA = "max_generation int"


def monotonic_generation_stream(docs_stream: DataFrame):
    """Stateful stream transform: emit a STALE_GENERATION row whenever a
    doc arrives with a generation lower than the max previously seen for
    that doc_id (state = one int per key, no timeout)."""

    def step(key: tuple, pdfs, state: GroupState):
        max_seen = state.get[0] if state.exists else None
        out = []
        for pdf in pdfs:
            for g in pdf["generation"]:
                g = int(g)
                if max_seen is not None and g < max_seen:
                    out.append((key[0], max_seen, g, "STALE_GENERATION"))
                max_seen = g if max_seen is None else max(max_seen, g)
        state.update((int(max_seen),))
        if out:
            yield pd.DataFrame(out, columns=["doc_id", "prev_generation", "generation", "violation_class"])

    return (
        docs_stream.select("doc_id", "generation")
        .groupBy("doc_id")
        .applyInPandasWithState(step, MONO_OUT_SCHEMA, MONO_STATE_SCHEMA, "append", GroupStateTimeout.NoTimeout)
    )


def windowed_distribution_drift(
    docs_stream: DataFrame,
    min_spans: int,
    max_spans: int,
    time_col: str = "written_at",
    window_dur: str = "10 minutes",
    watermark: str = "30 minutes",
    chi2_threshold: float = 30.0,
) -> DataFrame:
    """Event-time windowed DIST_DRIFT: the batch KS + chi-square tests
    (``operators/drift.py``) re-expressed for a document stream — per
    window, is the span-count distribution still the generator's
    truncated-exponential law and the kind mix still 70/15/10/5?

    Streaming shape: Structured Streaming allows ONE stateful aggregation
    per query, so both tests ride a single watermarked groupBy(window)
    whose aggregates are conditional sums — the span-count histogram
    (bounded support: max_spans-min_spans+1 values, counted per doc with
    ``size(spans) == v``) and the kind histogram (4 lanes, counted per
    doc with ``size(filter(spans, kind==k))`` — no explode, the stream
    stays one row per doc). KS and chi-square then derive from those
    sums with flat post-aggregation expressions: the ECDF is a running
    sum over ≤16 histogram lanes and the KS statistic a ``greatest``
    over their |ECDF − model-CDF| gaps (model CDF values are driver-side
    literals — the law is closed-form), so no applyInPandas and no
    second aggregation. State is watermark-bounded; each window emits
    once in append mode.

    Returns (window_start, window_end, n_docs, n_spans, ks_stat,
    ks_drifted, chi2, chi2_drifted). KS uses the 1.63/sqrt(n) critical
    value (α≈0.01), matching the batch default.
    """
    import math

    from ovalspark.functions.spans import KIND_CUM_PCT, KINDS

    width = max_spans - min_spans + 1

    def model_cdf(k: int) -> float:
        x = (k - min_spans + 1) / width
        x = min(max(x, 0.0), 1.0)
        return 2.0 * (1.0 - 2.0 ** (-x)) if x < 1.0 else 1.0

    n_sp = F.size("spans")
    aggs = [F.count("*").alias("n_docs"), F.sum(n_sp).alias("n_spans")]
    support = list(range(min_spans, max_spans + 1))
    for v in support:
        aggs.append(F.sum((n_sp == v).cast("long")).alias(f"_c{v}"))
    for k in KINDS:
        aggs.append(
            F.sum(F.size(F.filter("spans", lambda s: s["kind"] == k))).alias(f"_k{k}")
        )
    agg = (
        docs_stream.withWatermark(time_col, watermark)
        .groupBy(F.window(time_col, window_dur).alias("w"))
        .agg(*aggs)
    )

    # KS: running ECDF over the bounded support vs closed-form model CDF
    cum = F.lit(0).cast("long")
    gaps = []
    for v in support:
        cum = cum + F.col(f"_c{v}")
        gaps.append(F.abs(cum / F.col("n_docs") - F.lit(model_cdf(v))))
    ks = F.greatest(*gaps) if len(gaps) > 1 else gaps[0]

    # chi-square over the 4 kind lanes vs the generator's categorical law
    probs, lo = {}, 0
    for k, hi in zip(KINDS, KIND_CUM_PCT):
        probs[k] = (hi - lo) / 100.0
        lo = hi
    chi2 = F.lit(0.0)
    for k in KINDS:
        exp = F.col("n_spans") * F.lit(probs[k])
        diff = F.col(f"_k{k}") - exp
        # diff*diff, not **2: POWER() rounding differs across engines and
        # the DuckDB oracle twin (q55) must reproduce these doubles bit-
        # for-bit with the same IEEE mul/div/add sequence
        chi2 = chi2 + F.when(exp > 0, diff * diff / exp).otherwise(F.lit(0.0))

    return agg.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        "n_docs",
        "n_spans",
        ks.alias("ks_stat"),
        (ks > 1.63 / F.sqrt(F.col("n_docs"))).alias("ks_drifted"),
        chi2.alias("chi2"),
        (chi2 > F.lit(chi2_threshold)).alias("chi2_drifted"),
    )
