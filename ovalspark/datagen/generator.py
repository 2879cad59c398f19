"""Seeded synthetic generator for the interleaved-documents table and its
expected-state catalog.

Re-expresses oval's workload machinery as deterministic table generation:

- key-space sharding: doc ids are dense within disjoint per-(runner, writer)
  ranges, ``id = (runner_id << 32) | (writer_idx << 24) + seq`` — exactly
  oval's ``keyIDOffset`` layout (``internal/runner/runner.go:117-124``,
  ``internal/object/object.go:13-19,57-69``). Each (runner, writer) pair is
  one ``partition_id`` shard with an order-preserving, disjoint key range.
- span-count sampling: truncated-exponential inverse transform, oval's
  ``DecideSize`` (``internal/pattern/pattern.go:22-71``).
- existence set: a seeded subset of the keyspace has ``exists=false``
  (deleted / never written) — oval's ``ExistingObjectIDs``
  (``internal/object/object.go:27-33,76-91``).
- generation: per-doc write count ≥ 1 (``internal/object/object.go:23``).
- writer ids: ``(start_writer_id + writer_index) % 0x10000``
  (``internal/runner/runner.go:110-115,23``).

Everything is derived from ``spark.range`` + hash-based uniforms, so the
same spec + seed produces the identical table at any parallelism, any
cluster size, any partitioning — the property that makes checkpoint/resume
byte-identical and lets a 10^12-doc table be generated without ever
materializing driver-side state.

A ``hot_shard_factor`` > 1 makes shard (runner 0, writer 0) that many times
denser than the rest — the deliberately skewed doc_id range used to exercise
salting / AQE skew handling (north_rule).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ovalspark.functions import spans as sp


@dataclass(frozen=True)
class GenSpec:
    """Deterministic generation spec (the ExecutionContext analog,
    ``internal/runner/runner.go:26-35`` — minus mutable state, which
    lives in the generated catalog instead)."""

    n_runners: int = 1
    n_writers: int = 4          # workers per runner (numWorker)
    docs_per_writer: int = 256  # numObj / numWorker
    min_spans: int = 1
    max_spans: int = 16
    delete_fraction: float = 0.2   # share of keyspace with exists=false
    max_generation: int = 8
    start_writer_id: int = 7      # oval randomizes; we pin for determinism
    hot_shard_factor: int = 1     # >1 → shard (0,0) is skewed
    n_assets: int = sp.DEFAULT_N_ASSETS
    seed: int = 42

    def __post_init__(self):
        if self.n_writers < 1 or self.n_writers >= 256:
            raise ValueError("n_writers must be in [1, 256) (oval root.go:170-173)")
        if self.docs_per_writer * max(1, self.hot_shard_factor) > (1 << 24):
            raise ValueError("docs_per_writer must fit in 24 bits (oval root.go:175-178)")
        if self.n_runners < 1 or self.n_runners >= 256:
            raise ValueError("n_runners must be in [1, 256) — ids must fit the 40-bit key space (spans.MAX_DOC_ID)")

    @property
    def n_shards(self) -> int:
        return self.n_runners * self.n_writers


def generate_catalog(spark: SparkSession, spec: GenSpec) -> DataFrame:
    """Expected-state catalog: one row per keyspace slot.

    Schema: (doc_id string, exists boolean, generation int, n_spans int,
    writer_id int, partition_id int). The full keyspace is covered —
    including docs that must NOT exist — mirroring oval's dense
    pre-allocated ObjectList (``internal/object/object.go:57-69``).
    """
    per_shard = [
        spec.docs_per_writer * (spec.hot_shard_factor if (r == 0 and w == 0) else 1)
        for r in range(spec.n_runners)
        for w in range(spec.n_writers)
    ]
    offsets = [0]
    for n in per_shard:
        offsets.append(offsets[-1] + n)
    total = offsets[-1]

    df = spark.range(0, total, numPartitions=max(spec.n_shards, spark.sparkContext.defaultParallelism))
    # global row index -> (shard, seq) via the cumulative offsets
    shard = F.lit(len(per_shard) - 1)
    for s in range(len(per_shard) - 2, -1, -1):
        shard = F.when(F.col("id") < offsets[s + 1], F.lit(s)).otherwise(shard)
    df = df.withColumn("partition_id", shard.cast("int"))
    seq_off = F.element_at(F.array(*[F.lit(o) for o in offsets[:-1]]), F.col("partition_id") + 1)
    df = df.withColumn("seq", (F.col("id") - seq_off).cast("long"))

    runner = (F.col("partition_id") / spec.n_writers).cast("long")
    writer_idx = F.pmod(F.col("partition_id"), F.lit(spec.n_writers)).cast("long")
    obj_id = F.shiftleft(runner, 32) + F.shiftleft(writer_idx, 24) + F.col("seq")

    doc_id = sp.doc_key(obj_id)
    u_exist = sp.u01(doc_id, seed=spec.seed * 31 + 1)
    u_gen = sp.u01(doc_id, seed=spec.seed * 31 + 2)
    u_size = sp.u01(doc_id, seed=spec.seed * 31 + 3)

    return df.select(
        doc_id.alias("doc_id"),
        (u_exist >= spec.delete_fraction).alias("exists"),
        (1 + F.floor(u_gen * spec.max_generation)).cast("int").alias("generation"),
        sp.n_spans_from_u01(u_size, spec.min_spans, spec.max_spans).alias("n_spans"),
        F.pmod(F.lit(spec.start_writer_id) + writer_idx, F.lit(0x10000)).cast("int").alias("writer_id"),
        F.col("partition_id"),
    )


def generate_documents(catalog: DataFrame, spec: GenSpec) -> DataFrame:
    """Materialize the actual documents table from the catalog: only
    ``exists=true`` rows, each with its full deterministic spans array
    (the PUT side — oval ``pattern.Generate`` + ``worker.Put``,
    ``internal/runner/worker.go:77-119``).

    Schema: (doc_id, spans array<struct<kind,text,media_ref,offset>>,
    generation, writer_id, written_at, partition_id).
    """
    base_ts = F.to_timestamp(F.lit("2025-01-01 00:00:00"))
    return (
        catalog.filter(F.col("exists"))
        .select(
            "doc_id",
            sp.expected_spans(
                F.col("doc_id"), F.col("generation"), F.col("writer_id"), F.col("n_spans"), spec.n_assets
            ).alias("spans"),
            "generation",
            "writer_id",
            F.timestamp_add(
                "SECOND", F.pmod(F.xxhash64("doc_id", F.lit(spec.seed * 31 + 4)), F.lit(86400)), base_ts
            ).alias("written_at"),
            "partition_id",
        )
    )


def generate_assets(spark: SparkSession, spec: GenSpec) -> DataFrame:
    """Asset catalog — the referential target of ``spans.media_ref``.
    Covers the full id space the generator draws from, so a clean table
    has zero dangling refs; corruption points outside it."""
    return spark.range(0, spec.n_assets).select(
        F.format_string("asset-%06x", F.col("id")).alias("asset_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod(F.xxhash64(F.col("id"), F.lit(spec.seed)), F.lit(3)) + 1).cast("int"),
        ).alias("media_type"),
    )


def catalog_from_flat(flat_docs: DataFrame, spec: GenSpec, n_partitions: int = 8) -> DataFrame:
    """Derive an expected-state catalog from a flat external corpus
    (e.g. the driver's ``documents.parquet``: one int64 id + text per row)
    — the ingest path: every external id becomes a keyspace slot with
    deterministic generation/span-count/writer, so the span validator can
    run over real-table ids. All rows exist (the corpus IS the existence
    set)."""
    doc_id = sp.doc_key(F.col("doc_id").cast("long"))
    u_gen = sp.u01(doc_id, seed=spec.seed * 31 + 2)
    u_size = sp.u01(doc_id, seed=spec.seed * 31 + 3)
    return flat_docs.select(
        doc_id.alias("doc_id"),
        F.lit(True).alias("exists"),
        (1 + F.floor(u_gen * spec.max_generation)).cast("int").alias("generation"),
        sp.n_spans_from_u01(u_size, spec.min_spans, spec.max_spans).alias("n_spans"),
        F.pmod(F.xxhash64(doc_id, F.lit(spec.seed)), F.lit(256)).cast("int").alias("writer_id"),
        F.pmod(F.col("doc_id").cast("long"), F.lit(n_partitions)).cast("int").alias("partition_id"),
    )


def generate_documents_flat(catalog: DataFrame, spec: GenSpec) -> DataFrame:
    """Codegen twin of ``generate_documents`` (shuffle-assembled).

    ``generate_documents`` builds each spans array with
    ``transform(sequence(...))`` — Catalyst evaluates HOF lambdas
    interpreted. This variant derives every span as a FLAT row
    (posexplode → whole-stage-codegen span expressions) and reassembles
    arrays with sort_array+collect_list, at the cost of one shuffle.

    Measured at 2.6M docs / 12M spans on local[32]: HOF 4.1s vs flat
    6.4s — the shuffle outweighs interpretation when the per-doc
    expression is evaluated once per doc (unlike the validator, where
    per-field references re-expanded it and flat won 10×). Prefer the
    HOF generator by default; use this one when span counts are large
    enough that interpretation dominates (wide max_spans), or when the
    downstream layout wants the flat span rows anyway. Produces identical
    rows (asserted by tests).
    """
    base_ts = F.to_timestamp(F.lit("2025-01-01 00:00:00"))
    rows = catalog.filter(F.col("exists")).select(
        "doc_id",
        "generation",
        "writer_id",
        "partition_id",
        F.posexplode(F.sequence(F.lit(0), F.col("n_spans") - 1)).alias("i", "_"),
    )
    doc_id, gen, wid, i = F.col("doc_id"), F.col("generation"), F.col("writer_id"), F.col("i")
    kind = sp.span_kind(doc_id, i)
    span = F.struct(
        kind.alias("kind"),
        sp.span_text(doc_id, gen, wid, i).alias("text"),
        sp.span_media_ref(doc_id, i, kind, spec.n_assets).alias("media_ref"),
        (i * sp.SPAN_UNIT).cast("int").alias("offset"),
    )
    flat = rows.select("doc_id", "generation", "writer_id", "partition_id", i.alias("i"), span.alias("span"))
    assembled = (
        flat.groupBy("doc_id", "generation", "writer_id", "partition_id")
        .agg(F.sort_array(F.collect_list(F.struct(F.col("i"), F.col("span")))).alias("_isp"))
        .select(
            "doc_id",
            F.transform(F.col("_isp"), lambda x: x["span"]).alias("spans"),
            "generation",
            "writer_id",
            F.timestamp_add(
                "SECOND", F.pmod(F.xxhash64("doc_id", F.lit(spec.seed * 31 + 4)), F.lit(86400)), base_ts
            ).alias("written_at"),
            "partition_id",
        )
    )
    # docs with zero expected spans (n_spans >= 1 by construction, but an
    # external catalog may carry 0) get empty arrays via an anti-join-free
    # union of the n_spans==0 slice
    empties = catalog.filter(F.col("exists") & (F.col("n_spans") <= 0)).select(
        "doc_id",
        F.array().cast("array<struct<kind:string,text:string,media_ref:string,offset:int>>").alias("spans"),
        "generation",
        "writer_id",
        F.timestamp_add(
            "SECOND", F.pmod(F.xxhash64("doc_id", F.lit(spec.seed * 31 + 4)), F.lit(86400)), base_ts
        ).alias("written_at"),
        "partition_id",
    )
    return assembled.unionByName(empties)
