"""Span-sequence validation — the engine's core operator.

Reproduces oval's read-back verification (``internal/pattern/pattern.go:
118-180`` in /root/reference): for every document that the catalog says
exists, regenerate the expected spans array from the catalog row and
compare the actual array element-by-element, field-by-field:

- struct ``kind``          — deterministic f(doc_id, idx)
- struct ``media_ref``     — deterministic f(doc_id, idx, kind)       (bucket-field analog, :140-143)
- struct ``offset``        — must equal idx*256                        (:159-164)
- text header ``key``      — must equal doc_id                         (:145-150)
- text header ``generation`` — must equal catalog generation (stale-read
  detection, ``README.md:39``)                                         (:152-157)
- text header ``writer_id``  — must equal catalog writer               (:166-170)
- text header ``offset``   — embedded copy of idx*256                  (:96,102)
- text ``body``            — deterministic ramp analog                 (:109-114)

Like oval, ALL mismatching fields of a span are reported, not just the
first (:174-177), and the recorded-but-never-validated timestamp
(written_at, :172) is carried into violation rows for forensics only.

A size check precedes the element-wise pass: ``size(spans) != n_spans`` is
the short-read analog (:123-127); the element-wise comparison then covers
only the overlapping prefix, exactly as a short read in oval aborts before
the missing units are compared.

Scale notes: the whole comparison is ``transform``/``filter``/``flatten``
over the spans array — a narrow, shuffle-free map evaluated in whole-stage
codegen. The only shuffle is the docs⋈catalog equi-join on doc_id; pass
``broadcast_catalog=True`` when the catalog fits in executor memory, and
the join vanishes into a broadcast hash join. Rows only explode into the
violations table when a violation actually exists, so the output is
proportional to corruption, not to data volume.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ovalspark.functions import spans as sp

VIOLATION_SCHEMA = StructType(
    [
        StructField("partition_id", IntegerType()),
        StructField("doc_id", StringType()),
        StructField("span_idx", IntegerType()),
        StructField("field", StringType()),
        StructField("expected", StringType()),
        StructField("actual", StringType()),
        StructField("violation_class", StringType()),
        StructField("writer_id", IntegerType()),
        StructField("written_at", TimestampType()),
    ]
)

# field -> violation class (FIXTURES.md §4 taxonomy)
FIELD_CLASS = {
    "kind": "WRONG_KIND",
    "media_ref": "WRONG_MEDIA_REF",
    "offset": "OFFSET_DISORDER",
    "key": "WRONG_TEXT",
    "body": "WRONG_TEXT",
    "generation": "STALE_GENERATION",
    "writer_id": "WRONG_WRITER",
}


def _field_viol(field: str, expected: Column, actual: Column) -> Column:
    """One span-field check → violation struct or null (accumulated, like
    oval's errSub chain at pattern.go:139-177)."""
    return F.when(
        ~expected.eqNullSafe(actual),
        F.struct(
            F.lit(field).alias("field"),
            expected.cast("string").alias("expected"),
            actual.cast("string").alias("actual"),
        ),
    )


def _span_violations(doc_id: Column, generation: Column, writer_id: Column, i: Column, span: Column, n_assets: int) -> Column:
    """array<struct<field,expected,actual>> of every mismatching field of
    span ``i`` (empty array if the span is clean)."""
    exp_kind = sp.span_kind(doc_id, i)
    seg = sp.text_segments(span["text"])
    checks = F.array(
        _field_viol("kind", exp_kind, span["kind"]),
        _field_viol("media_ref", sp.span_media_ref(doc_id, i, exp_kind, n_assets), span["media_ref"]),
        _field_viol("offset", (i * sp.SPAN_UNIT).cast("int"), span["offset"]),
        _field_viol("key", doc_id, seg["key"]),
        _field_viol("generation", F.format_string("%08x", generation.cast("long")), seg["generation"]),
        _field_viol("writer_id", F.format_string("%04x", writer_id.cast("long")), seg["writer_id"]),
        _field_viol("offset_text", F.format_string("%08x", (i * sp.SPAN_UNIT).cast("long")), seg["offset"]),
        _field_viol("body", sp.span_body(doc_id, i), seg["body"]),
    )
    return F.filter(checks, lambda c: c.isNotNull())


def validate_spans(
    docs: DataFrame,
    catalog: DataFrame,
    n_assets: int = sp.DEFAULT_N_ASSETS,
    broadcast_catalog: bool = False,
) -> DataFrame:
    """Validate every existing document's spans against the catalog.

    Returns a violations DataFrame with VIOLATION_SCHEMA columns. Size
    mismatches yield one SIZE_MISMATCH row; field mismatches yield one row
    per (span, field).
    """
    cat = catalog.filter(F.col("exists")).select("doc_id", "generation", "n_spans", "writer_id")
    if broadcast_catalog:
        cat = F.broadcast(cat)
    j = docs.alias("d").join(cat.alias("c"), "doc_id")

    n_actual = F.size("d.spans")
    n_expected = F.col("c.n_spans")
    common = F.least(n_actual, n_expected)

    # per-span violation arrays over the common prefix, flattened with idx
    per_span = F.when(
        common > 0,
        F.transform(
            F.sequence(F.lit(0), common - 1),
            lambda i: F.struct(
                i.cast("int").alias("span_idx"),
                _span_violations(
                    F.col("doc_id"), F.col("c.generation"), F.col("c.writer_id"), i, F.element_at("d.spans", i + 1), n_assets
                ).alias("viols"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<span_idx:int,viols:array<struct<field:string,expected:string,actual:string>>>>"))

    size_viol = F.when(
        n_actual != n_expected,
        F.array(
            F.struct(
                F.lit(None).cast("int").alias("span_idx"),
                F.array(
                    F.struct(
                        F.lit("n_spans").alias("field"),
                        n_expected.cast("string").alias("expected"),
                        n_actual.cast("string").alias("actual"),
                    )
                ).alias("viols"),
            )
        ),
    ).otherwise(F.array().cast("array<struct<span_idx:int,viols:array<struct<field:string,expected:string,actual:string>>>>"))

    annotated = j.select(
        "partition_id",
        "doc_id",
        F.col("c.writer_id").alias("writer_id"),
        "written_at",
        F.filter(F.concat(size_viol, per_span), lambda e: F.size(e["viols"]) > 0).alias("sv"),
    )

    # Only documents with at least one violation survive the filter —
    # the explode is proportional to corruption, not table size.
    flat = (
        annotated.filter(F.size("sv") > 0)
        .select("partition_id", "doc_id", "writer_id", "written_at", F.explode("sv").alias("s"))
        .select(
            "partition_id",
            "doc_id",
            F.col("s.span_idx").alias("span_idx"),
            F.explode("s.viols").alias("v"),
            "writer_id",
            "written_at",
        )
    )

    cls = F.when(F.col("v.field") == "n_spans", F.lit("SIZE_MISMATCH"))
    for fld, c in FIELD_CLASS.items():
        cls = cls.when(F.col("v.field") == fld, F.lit(c))
    cls = cls.otherwise(F.lit("OFFSET_DISORDER"))  # offset_text

    return flat.select(
        "partition_id",
        "doc_id",
        "span_idx",
        F.col("v.field").alias("field"),
        F.col("v.expected").alias("expected"),
        F.col("v.actual").alias("actual"),
        cls.alias("violation_class"),
        "writer_id",
        "written_at",
    )
