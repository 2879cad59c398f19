"""Seeded corruption injector with golden expected-violations output.

The test-strategy analog of oval's corruption demo (``README.md:87-127`` in
/root/reference — a manually corrupted object caught by ``pattern.Valid``)
and of its golden-byte unit tests (``internal/pattern/pattern_test.go``):
each fault class below maps to exactly one reference check (see
FIXTURES.md §4), and because victims and mutations are hash-derived, the
injector can emit the EXACT violation rows the validator must produce —
the oracle for the corruption-injection pytest suite.

Victim selection: each existing doc draws u = u01(doc_id, inject_seed);
fault classes own disjoint sub-intervals of [0,1), so each victim gets
exactly one fault and selection is independent of partitioning/ordering.

All mutations are pure column expressions over the spans array.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ovalspark.datagen.generator import GenSpec
from ovalspark.functions import spans as sp

# injection order is fixed — it defines the interval layout
FAULT_CLASSES = (
    "WRONG_TEXT",
    "WRONG_KIND",
    "WRONG_MEDIA_REF",
    "OFFSET_DISORDER",
    "STALE_GENERATION",
    "WRONG_WRITER",
    "SIZE_MISMATCH",
    "LOST_DOC",
    "DUP_DOC_ID",
)

_CORRUPT_BODY = "z" * sp.BODY_LEN
_BAD_REF = "asset-zzzzzz"  # outside the hex id space → always dangling


def _replace_segment(text: Column, start_1b: int, length: int, new: Column) -> Column:
    """Overwrite text[start:start+len) (1-based) keeping total width."""
    return F.concat(
        F.substring(text, 1, start_1b - 1),
        new,
        F.substring(text, start_1b + length, sp.TEXT_LEN),
    )


def _restruct(s: Column, kind=None, text=None, media_ref=None, offset=None) -> Column:
    return F.struct(
        (kind if kind is not None else s["kind"]).alias("kind"),
        (text if text is not None else s["text"]).alias("text"),
        (media_ref if media_ref is not None else s["media_ref"]).alias("media_ref"),
        (offset if offset is not None else s["offset"]).cast("int").alias("offset"),
    )


def inject_faults(
    docs: DataFrame,
    catalog: DataFrame,
    spec: GenSpec,
    fractions: dict[str, float],
    phantom_fraction: float = 0.0,
    inject_seed: int = 777,
) -> tuple[DataFrame, DataFrame]:
    """Return (corrupted_docs, expected_violations).

    ``fractions`` maps fault class -> share of existing docs to corrupt;
    ``phantom_fraction`` is the share of non-existing catalog slots to
    materialize as phantoms. expected_violations matches
    ``operators.spans.VIOLATION_SCHEMA``.
    """
    unknown = set(fractions) - set(FAULT_CLASSES)
    if unknown:
        raise ValueError(f"unknown fault classes: {unknown}")

    u = sp.u01(F.col("doc_id"), seed=inject_seed)
    lo = 0.0
    fault = F.lit(None).cast("string")
    for cls in FAULT_CLASSES:
        frac = fractions.get(cls, 0.0)
        if frac > 0:
            fault = F.when((u >= lo) & (u < lo + frac), F.lit(cls)).otherwise(fault)
            lo += frac
    if lo > 1.0:
        raise ValueError("fault fractions sum past 1.0")

    n = F.size("spans")
    # span-level target index; OFFSET_DISORDER swaps (t, t+1) so its t is
    # drawn from [0, n-2] and the fault needs n >= 2
    t_any = F.pmod(F.xxhash64("doc_id", F.lit(inject_seed + 1)), n).cast("int")
    t_pair = F.pmod(F.xxhash64("doc_id", F.lit(inject_seed + 1)), n - 1).cast("int")

    d = docs.withColumn("_fault", fault).withColumn("_n", n)
    # eligibility downgrades: ineligible victims stay clean
    d = d.withColumn(
        "_fault",
        F.when((F.col("_fault") == "OFFSET_DISORDER") & (F.col("_n") < 2), F.lit(None)).otherwise(F.col("_fault")),
    )
    d = d.withColumn(
        "_t",
        F.when(F.col("_fault") == "OFFSET_DISORDER", t_pair).otherwise(t_any),
    )

    doc_id, gen, wid, t = F.col("doc_id"), F.col("generation"), F.col("writer_id"), F.col("_t")

    stale_gen_seg = F.format_string("%08x", (gen - 1).cast("long"))
    wrong_wid_seg = F.format_string("%04x", F.pmod(wid + 1, F.lit(0x10000)).cast("long"))

    def mutate(s: Column, i: Column) -> Column:
        flip_kind = F.when(s["kind"] == "text", F.lit("image")).otherwise(F.lit("text"))
        return (
            F.when(
                (F.col("_fault") == "WRONG_TEXT") & (i == t),
                _restruct(s, text=_replace_segment(s["text"], 37, sp.BODY_LEN, F.lit(_CORRUPT_BODY))),
            )
            .when((F.col("_fault") == "WRONG_KIND") & (i == t), _restruct(s, kind=flip_kind))
            .when((F.col("_fault") == "WRONG_MEDIA_REF") & (i == t), _restruct(s, media_ref=F.lit(_BAD_REF)))
            .when(
                (F.col("_fault") == "OFFSET_DISORDER") & (i == t),
                _restruct(s, offset=(t + 1) * sp.SPAN_UNIT),
            )
            .when(
                (F.col("_fault") == "OFFSET_DISORDER") & (i == t + 1),
                _restruct(s, offset=t * sp.SPAN_UNIT),
            )
            .when(
                F.col("_fault") == "STALE_GENERATION",
                _restruct(s, text=_replace_segment(s["text"], 14, 8, stale_gen_seg)),
            )
            .when(
                F.col("_fault") == "WRONG_WRITER",
                _restruct(s, text=_replace_segment(s["text"], 23, 4, wrong_wid_seg)),
            )
            .otherwise(s)
        )

    mutated = d.withColumn("spans", F.transform("spans", mutate))
    mutated = mutated.withColumn(
        "spans",
        F.when(F.col("_fault") == "SIZE_MISMATCH", F.slice("spans", 1, F.greatest(F.col("_n") - 1, F.lit(0))))
        .otherwise(F.col("spans")),
    )
    # LOST_DOC: drop the row entirely (object lost by the store)
    corrupted = mutated.filter((F.col("_fault").isNull()) | (F.col("_fault") != "LOST_DOC"))
    # DUP_DOC_ID: append a second copy
    dups = mutated.filter(F.col("_fault") == "DUP_DOC_ID")
    corrupted = corrupted.unionByName(dups)

    corrupted = corrupted.drop("_fault", "_n", "_t")

    # PHANTOM_DOC: materialize docs the catalog says must not exist
    phantoms = None
    if phantom_fraction > 0:
        ph = catalog.filter(~F.col("exists")).filter(
            sp.u01(F.col("doc_id"), seed=inject_seed + 2) < phantom_fraction
        )
        phantoms = ph.select(
            "doc_id",
            sp.expected_spans(F.col("doc_id"), F.col("generation"), F.col("writer_id"), F.col("n_spans"), spec.n_assets).alias("spans"),
            "generation",
            "writer_id",
            F.to_timestamp(F.lit("2025-06-01 00:00:00")).alias("written_at"),
            "partition_id",
        )
        corrupted = corrupted.unionByName(phantoms.select(*corrupted.columns))

    expected = _expected_violations(d, phantoms)
    return corrupted, expected


def _viol(span_idx: Column, field: str, expected: Column, actual: Column, cls: str) -> Column:
    return F.struct(
        span_idx.cast("int").alias("span_idx"),
        F.lit(field).alias("field"),
        expected.cast("string").alias("expected"),
        actual.cast("string").alias("actual"),
        F.lit(cls).alias("violation_class"),
    )


def _expected_violations(d: DataFrame, phantoms: DataFrame | None) -> DataFrame:
    """Golden violation rows for every injected fault (VIOLATION_SCHEMA)."""
    doc_id, gen, wid, t, n = F.col("doc_id"), F.col("generation"), F.col("writer_id"), F.col("_t"), F.col("_n")
    null_i = F.lit(None).cast("int")

    span_seq = F.sequence(F.lit(0), n - 1)
    stale_rows = F.transform(
        span_seq,
        lambda i: _viol(
            i,
            "generation",
            F.format_string("%08x", gen.cast("long")),
            F.format_string("%08x", (gen - 1).cast("long")),
            "STALE_GENERATION",
        ),
    )
    writer_rows = F.transform(
        span_seq,
        lambda i: _viol(
            i,
            "writer_id",
            F.format_string("%04x", wid.cast("long")),
            F.format_string("%04x", F.pmod(wid + 1, F.lit(0x10000)).cast("long")),
            "WRONG_WRITER",
        ),
    )
    kind_at_t = sp.span_kind(doc_id, t)
    viols = (
        F.when(
            F.col("_fault") == "WRONG_TEXT",
            F.array(_viol(t, "body", sp.span_body(doc_id, t), F.lit(_CORRUPT_BODY), "WRONG_TEXT")),
        )
        .when(
            F.col("_fault") == "WRONG_KIND",
            F.array(
                _viol(
                    t,
                    "kind",
                    kind_at_t,
                    F.when(kind_at_t == "text", F.lit("image")).otherwise(F.lit("text")),
                    "WRONG_KIND",
                )
            ),
        )
        .when(
            F.col("_fault") == "WRONG_MEDIA_REF",
            F.array(
                _viol(
                    t,
                    "media_ref",
                    sp.span_media_ref(doc_id, t, kind_at_t),
                    F.lit(_BAD_REF),
                    "WRONG_MEDIA_REF",
                )
            ),
        )
        .when(
            F.col("_fault") == "OFFSET_DISORDER",
            F.array(
                _viol(t, "offset", (t * sp.SPAN_UNIT), ((t + 1) * sp.SPAN_UNIT), "OFFSET_DISORDER"),
                _viol(t + 1, "offset", ((t + 1) * sp.SPAN_UNIT), (t * sp.SPAN_UNIT), "OFFSET_DISORDER"),
            ),
        )
        .when(F.col("_fault") == "STALE_GENERATION", stale_rows)
        .when(F.col("_fault") == "WRONG_WRITER", writer_rows)
        .when(
            F.col("_fault") == "SIZE_MISMATCH",
            F.array(_viol(null_i, "n_spans", n, n - 1, "SIZE_MISMATCH")),
        )
        .when(
            F.col("_fault") == "LOST_DOC",
            F.array(_viol(null_i, "existence", F.lit("present"), F.lit("missing"), "LOST_DOC")),
        )
        .when(
            F.col("_fault") == "DUP_DOC_ID",
            F.array(_viol(null_i, "doc_id", F.lit("1"), F.lit("2"), "DUP_DOC_ID")),
        )
    )

    ev = (
        d.filter(F.col("_fault").isNotNull())
        .select(
            "partition_id",
            "doc_id",
            "writer_id",
            "written_at",
            "_fault",
            F.explode(viols).alias("v"),
        )
        .select(
            "partition_id",
            "doc_id",
            F.col("v.span_idx").alias("span_idx"),
            F.col("v.field").alias("field"),
            F.col("v.expected").alias("expected"),
            F.col("v.actual").alias("actual"),
            F.col("v.violation_class").alias("violation_class"),
            # forensics: LOST docs have no surviving row → null written_at,
            # matching check_existence's output
            F.col("writer_id"),
            F.when(F.col("_fault").isin("LOST_DOC", "DUP_DOC_ID"), F.lit(None).cast("timestamp"))
            .otherwise(F.col("written_at"))
            .alias("written_at"),
        )
        .withColumn(
            "writer_id",
            F.when(F.col("violation_class") == "DUP_DOC_ID", F.lit(None).cast("int")).otherwise(F.col("writer_id")),
        )
    )
    if phantoms is not None:
        ph_rows = phantoms.select(
            "partition_id",
            "doc_id",
            F.lit(None).cast("int").alias("span_idx"),
            F.lit("existence").alias("field"),
            F.lit("missing").alias("expected"),
            F.lit("present").alias("actual"),
            F.lit("PHANTOM_DOC").alias("violation_class"),
            "writer_id",
            "written_at",
        )
        ev = ev.unionByName(ph_rows)
    return ev
