"""Deterministic span derivation — the single source of truth for what a
document's ``spans`` array MUST contain.

This is the engine's analog of oval's pattern generator
(``internal/pattern/pattern.go:73-116`` in /root/reference): there, every
256-byte data unit embeds a fixed-width header (bucket[0:16), key[16:28),
writeCount[28:32) LE, offset[32:36) LE, workerID[36:40) LE, timestamp
[40:48), then a deterministic byte ramp). Here, every span's ``text``
payload embeds a fixed-width ASCII header followed by a deterministic hex
body, so validation can regenerate the expected content of any document
from just its catalog row ``(doc_id, generation, n_spans, writer_id)`` and
compare field-by-field — exactly like oval's ``Valid``
(``internal/pattern/pattern.go:118-180``) regenerates and compares each
unit.

Span ``text`` layout (fixed-width, 68 chars — the "data unit" analog)::

    [ 0:12)  doc_id            ("ov" + 10 hex)   — key check       (pattern.go:145-150)
    [12]     '|'
    [13:21)  generation %08x                     — writeCount check (pattern.go:152-157)
    [21]     '|'
    [22:26)  writer_id %04x                      — workerID check   (pattern.go:166-170)
    [26]     '|'
    [27:35)  offset %08x  (== span_idx * 256)    — offset check     (pattern.go:159-164)
    [35]     '|'
    [36:68)  body: 32 hex chars = f(doc_id, span_idx)  — ramp analog (pattern.go:109-114)

The struct-level ``offset`` column must equal ``span_idx * SPAN_UNIT``
(oval's ``offsetInObject = unitCount*dataUnitSize``, pattern.go:84).
``kind`` and ``media_ref`` are deterministic functions of (doc_id,
span_idx), so corruption of either is detectable without any stored
expectation.

Everything below is pure Catalyst column expressions — zero Python UDFs —
so expected-content regeneration runs inside whole-stage codegen on
executors at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SPAN_UNIT = 256  # offset stride per span (oval dataUnitSize, pattern.go:18)
KINDS = ("text", "image", "audio", "video")
KIND_CUM_PCT = (70, 85, 95, 100)  # categorical weights over KINDS
BODY_LEN = 32
TEXT_LEN = 12 + 1 + 8 + 1 + 4 + 1 + 8 + 1 + BODY_LEN  # 68

# Domain-separation seeds for the hash-derived fields. Arbitrary but fixed:
# changing any of these is a format version bump.
_SEED_KIND = 1013904223
_SEED_BODY = 1664525
_SEED_ASSET = 22695477

DEFAULT_N_ASSETS = 1 << 16


MAX_DOC_ID = (1 << 40) - 1  # 10 hex digits — the fixed-width key contract


def hexpad(col: Column, width: int) -> Column:
    """Lowercase zero-padded hex: the ``format_string("%0Nx")`` twin
    WITHOUT java.util.Formatter (which re-parses its pattern per call).
    Every clean span pays this on the validator fast path; swapping it in
    measured ~9% off the whole validator (BASELINE.md round 2). ``hex`` of
    a negative long is two's-complement 16 digits, exactly like %x.

    NOTE: ``lpad`` also TRUNCATES values longer than ``width`` (keeps the
    leftmost chars) — callers that need over-width inputs to fail instead
    must guard the range themselves (see ``doc_key``)."""
    return F.lpad(F.lower(F.hex(col)), width, "0")


def doc_key(id_col: Column) -> Column:
    """int64 doc id -> 12-char key ``"ov" + %010x`` (oval key codec,
    ``internal/object/object.go:48-50``; MaxKeyLength=12 at :13-19).

    Contract: ids must fit in 40 bits (``MAX_DOC_ID``) — enforced here
    with ``raise_error`` because ``hexpad`` (lpad) would otherwise
    silently TRUNCATE an 11+-digit hex id to its leftmost digits,
    producing colliding 12-char keys. ``GenSpec`` also enforces the bound
    structurally (runner<8 bits, writer<8 bits, seq<24 bits); this guard
    makes out-of-contract callers fail loudly instead."""
    return F.concat(
        F.lit("ov"),
        hexpad(
            F.when(
                (id_col >= 0) & (id_col <= MAX_DOC_ID), id_col
            ).otherwise(F.raise_error(F.concat(F.lit("doc id out of 40-bit key range: "), id_col.cast("string")))),
            10,
        ),
    )


def parse_doc_key(key_col: Column) -> Column:
    """12-char key -> int64 id (oval ``internal/object/object.go:52-55``)."""
    return F.conv(F.substring(key_col, 3, 10), 16, 10).cast("long")


def u01(*cols: Column, seed: int) -> Column:
    """Deterministic uniform [0,1) from column values — the engine's
    reproducible replacement for oval's rand draws. xxhash64 keeps this
    JVM-side and stable across partitionings (unlike ``F.rand``)."""
    return F.pmod(F.xxhash64(*cols, F.lit(seed)), F.lit(1 << 30)).cast("double") / float(1 << 30)


def n_spans_from_u01(u: Column, min_spans: int, max_spans: int) -> Column:
    """Truncated-exponential span-count sampler.

    Inverse-transform sampling of density f(x) = 2^(1-x) on [0,1):
    ``x = -log2(1 - 0.5*u)`` — the exact closed form of oval's size
    sampler (``internal/pattern/pattern.go:22-71``; CDF F(x)=2(1-2^-x)
    at :50), with the [min,max] quantization mapped from 256-byte
    multiples to whole span counts.
    """
    if min_spans < 1 or max_spans < min_spans:
        raise ValueError(f"invalid span bounds [{min_spans}, {max_spans}]")
    x = -F.log2(1.0 - 0.5 * u)  # in [0, 1)
    n = F.lit(min_spans) + F.floor(x * (max_spans - min_spans + 1)).cast("int")
    return F.least(n, F.lit(max_spans))


def span_kind(doc_id: Column, span_idx: Column) -> Column:
    """Categorical kind per (doc_id, span_idx): 70% text, 15% image,
    10% audio, 5% video."""
    bucket = F.pmod(F.xxhash64(doc_id, span_idx, F.lit(_SEED_KIND)), F.lit(100))
    expr = F.lit(KINDS[-1])
    # build the when-chain from the last threshold backwards
    for kind, hi in zip(reversed(KINDS[:-1]), reversed(KIND_CUM_PCT[:-1])):
        expr = F.when(bucket < hi, F.lit(kind)).otherwise(expr)
    return expr


def span_media_ref(doc_id: Column, span_idx: Column, kind: Column, n_assets: int = DEFAULT_N_ASSETS) -> Column:
    """Referential pointer into the asset catalog for media spans; null
    for text spans (the bucket-name-in-unit analog, pattern.go:140-143:
    a field whose expected value is knowable from context)."""
    ref = F.concat(F.lit("asset-"), hexpad(F.pmod(F.xxhash64(doc_id, span_idx, F.lit(_SEED_ASSET)), F.lit(n_assets)), 6))
    return F.when(kind != "text", ref)


def span_body(doc_id: Column, span_idx: Column) -> Column:
    """32-hex-char deterministic body — the byte-ramp analog
    (pattern.go:109-114). Function of (doc_id, span_idx) only, like the
    ramp is a function of the byte index only."""
    return F.concat(
        hexpad(F.xxhash64(doc_id, span_idx, F.lit(_SEED_BODY)), 16),
        hexpad(F.xxhash64(doc_id, span_idx, F.lit(_SEED_BODY + 1)), 16),
    )


def span_text(doc_id: Column, generation: Column, writer_id: Column, span_idx: Column) -> Column:
    """The full 68-char span payload (header + body) — see module doc.
    Built from concat + hexpad, not format_string: the validator evaluates
    this once per span on its fast path; dropping Formatter's per-call
    pattern parse measured ~9% on the whole validator (BASELINE.md)."""
    return F.concat_ws(
        "|",
        doc_id,
        hexpad(generation.cast("long"), 8),
        hexpad(writer_id.cast("long"), 4),
        hexpad((span_idx * SPAN_UNIT).cast("long"), 8),
        span_body(doc_id, span_idx),
    )


def _span_struct(doc_id: Column, generation: Column, writer_id: Column, i: Column, n_assets: int) -> Column:
    kind = span_kind(doc_id, i)
    return F.struct(
        kind.alias("kind"),
        span_text(doc_id, generation, writer_id, i).alias("text"),
        span_media_ref(doc_id, i, kind, n_assets).alias("media_ref"),
        (i * SPAN_UNIT).cast("int").alias("offset"),
    )


def expected_spans(
    doc_id: Column,
    generation: Column,
    writer_id: Column,
    n_spans: Column,
    n_assets: int = DEFAULT_N_ASSETS,
) -> Column:
    """Regenerate the full expected ``spans`` array for a document from its
    catalog row — the engine's ``pattern.Generate`` (pattern.go:73-92).
    Pure ``sequence`` + ``transform``: evaluated columnar, JVM-side.
    """
    idx = F.sequence(F.lit(0), n_spans.cast("int") - 1)
    return F.when(
        n_spans > 0,
        F.transform(idx, lambda i: _span_struct(doc_id, generation, writer_id, i, n_assets)),
    ).otherwise(F.array().cast(f"array<struct<kind:string,text:string,media_ref:string,offset:int>>"))


def text_segments(text: Column) -> dict[str, Column]:
    """Slice a span's text payload into its header fields + body
    (validator side — the field extraction of pattern.go:136-180).
    1-based ``substring`` positions per the layout in the module doc."""
    return {
        "key": F.substring(text, 1, 12),
        "generation": F.substring(text, 14, 8),
        "writer_id": F.substring(text, 23, 4),
        "offset": F.substring(text, 28, 8),
        "body": F.substring(text, 37, BODY_LEN),
    }
