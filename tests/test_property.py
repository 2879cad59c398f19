"""Property-based tests (hypothesis) — the engine's version of the
reference's table-driven sampler/codec tests
(/root/reference/internal/pattern/pattern_test.go:202-255,
internal/object/object.go key codec). Pure-python properties run
per-example; Spark-backed properties run on small batches."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from ovalspark.cli import parse_fault_mix, parse_span_range


# --- sampler law (closed form, no Spark needed) -----------------------------


def n_spans_py(u: float, mn: int, mx: int) -> int:
    """Python mirror of functions.spans.n_spans_from_u01."""
    x = -math.log2(1.0 - 0.5 * u)
    return min(mn + math.floor(x * (mx - mn + 1)), mx)


@given(
    u=st.floats(min_value=0.0, max_value=1.0, exclude_max=True),
    mn=st.integers(1, 50),
    width=st.integers(0, 50),
)
def test_sampler_bounds(u, mn, width):
    mx = mn + width
    n = n_spans_py(u, mn, mx)
    assert mn <= n <= mx


@given(mn=st.integers(1, 20), width=st.integers(1, 30))
def test_sampler_monotone_in_u(mn, width):
    mx = mn + width
    last = 0
    for k in range(0, 100):
        n = n_spans_py(k / 100.0, mn, mx)
        assert n >= last
        last = n


# --- CLI parsers ------------------------------------------------------------


@given(lo=st.integers(1, 10**6), width=st.integers(0, 10**6))
def test_span_range_roundtrip(lo, width):
    assert parse_span_range(f"{lo}-{lo + width}") == (lo, lo + width)


@given(
    st.dictionaries(
        st.sampled_from(["WRONG_TEXT", "WRONG_KIND", "LOST_DOC", "DUP_DOC_ID"]),
        st.floats(0.0, 1.0, allow_nan=False),
        max_size=4,
    )
)
def test_fault_mix_roundtrip(d):
    s = ",".join(f"{k}={v}" for k, v in d.items())
    assert parse_fault_mix(s) == d


# --- key codec + sharding over Spark (batched examples) ---------------------


@settings(max_examples=10, deadline=None)
@given(st.lists(st.integers(0, (1 << 40) - 1), min_size=1, max_size=50, unique=True))
def test_key_codec_roundtrip_property(spark, ids):
    """Ids within MAX_DOC_ID (the documented 40-bit contract — hypothesis
    originally found that 2^40+ ids silently produce 13-char keys)."""
    import pyspark.sql.functions as F

    from ovalspark.functions import spans as sp

    df = spark.createDataFrame([(i,) for i in ids], "id long")
    got = df.select(
        "id", sp.parse_doc_key(sp.doc_key(F.col("id"))).alias("back"), F.length(sp.doc_key(F.col("id"))).alias("l")
    ).collect()
    assert all(r.id == r.back and r.l == 12 for r in got)
