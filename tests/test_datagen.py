"""Generator determinism + golden span fixtures.

Mirror of the reference's golden-byte unit tests
(`/root/reference/internal/pattern/pattern_test.go:30-200`): instead of
asserting exact bytes of a 256-byte unit, assert the exact span structs of
known documents, plus sampler-bound properties (pattern_test.go:202-255
analog).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from ovalspark.datagen import GenSpec, generate_catalog, generate_documents
from ovalspark.functions import spans as sp


def test_doc_key_codec_roundtrip(spark):
    df = spark.range(0, 1000, 37).select(
        F.col("id"), sp.doc_key(F.col("id")).alias("key")
    ).withColumn("back", sp.parse_doc_key(F.col("key")))
    assert df.filter((F.col("id") != F.col("back")) | (F.length("key") != 12)).count() == 0


def test_key_format_golden(spark):
    row = spark.range(300, 301).select(sp.doc_key(F.col("id")).alias("k")).first()
    assert row.k == "ov000000012c"  # %010x of 300, oval object.go:48-50 analog


def test_span_text_layout_golden(spark, small_world):
    """Fixed-width layout: every segment parseable and consistent."""
    _, _, docs, _ = small_world
    s = docs.select("doc_id", "generation", "writer_id", F.posexplode("spans").alias("i", "s"))
    seg = sp.text_segments(F.col("s.text"))
    bad = s.filter(
        (F.length("s.text") != sp.TEXT_LEN)
        | (seg["key"] != F.col("doc_id"))
        | (seg["generation"] != F.format_string("%08x", F.col("generation").cast("long")))
        | (seg["writer_id"] != F.format_string("%04x", F.col("writer_id").cast("long")))
        | (seg["offset"] != F.format_string("%08x", (F.col("i") * sp.SPAN_UNIT).cast("long")))
        | (F.col("s.offset") != F.col("i") * sp.SPAN_UNIT)
    )
    assert bad.count() == 0


def test_generator_deterministic_across_parallelism(spark):
    """Same spec+seed at different partition counts → identical tables
    (the property underpinning byte-identical resume, north_rule)."""
    spec = GenSpec(n_runners=1, n_writers=2, docs_per_writer=100, max_spans=6)
    a = generate_documents(generate_catalog(spark, spec), spec)
    b = generate_documents(generate_catalog(spark, spec).repartition(17), spec)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_span_count_bounds(spark, small_world):
    spec, cat, _, _ = small_world
    mn, mx = cat.select(F.min("n_spans"), F.max("n_spans")).first()
    assert mn >= spec.min_spans and mx <= spec.max_spans


def test_span_count_distribution_shape(spark):
    """Truncated-exp: small span counts must dominate (f(x)=2^(1-x) is
    decreasing) — the DecideSize distribution property."""
    spec = GenSpec(n_runners=1, n_writers=4, docs_per_writer=2000, min_spans=1, max_spans=10)
    cat = generate_catalog(spark, spec)
    hist = dict(cat.groupBy("n_spans").count().collect())
    assert hist[1] > hist[10] * 1.5


def test_keyspace_sharding_disjoint(spark, small_world):
    """Each (runner,writer) shard owns a disjoint, order-preserving id
    range (oval runner.go:117-124)."""
    _, cat, _, _ = small_world
    ids = cat.select(sp.parse_doc_key(F.col("doc_id")).alias("id"), "partition_id")
    ranges = ids.groupBy("partition_id").agg(F.min("id").alias("lo"), F.max("id").alias("hi")).collect()
    sorted_r = sorted([(r.lo, r.hi) for r in ranges])
    for (lo1, hi1), (lo2, _) in zip(sorted_r, sorted_r[1:]):
        assert hi1 < lo2
    # id layout: runner<<32 | writer<<24 + seq
    assert sorted_r[0][0] == 0
    assert sorted_r[1][0] == 1 << 24
    assert sorted_r[2][0] == 1 << 32


def test_hot_shard_skew(spark):
    spec = GenSpec(n_runners=1, n_writers=4, docs_per_writer=100, hot_shard_factor=5)
    cat = generate_catalog(spark, spec)
    counts = dict(cat.groupBy("partition_id").count().collect())
    assert counts[0] == 500 and counts[1] == 100


def test_invalid_specs():
    with pytest.raises(ValueError):
        GenSpec(n_writers=0)
    with pytest.raises(ValueError):
        GenSpec(n_writers=256)
    with pytest.raises(ValueError):
        GenSpec(docs_per_writer=(1 << 24) + 1)


def test_flat_generator_identical_to_hof(spark):
    """generate_documents_flat (codegen bulk path) must produce exactly
    the rows of generate_documents (HOF path)."""
    from ovalspark.datagen import generate_documents_flat

    spec = GenSpec(n_runners=1, n_writers=2, docs_per_writer=150, max_spans=7)
    cat = generate_catalog(spark, spec)
    a = generate_documents(cat, spec)
    b = generate_documents_flat(cat, spec)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
