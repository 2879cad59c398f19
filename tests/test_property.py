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


# --- append-schema gate (pure python: the gate only reads df.schema) --------


_TYPE_POOL = ["string", "bigint", "int", "double", "float", "boolean", "date"]

# the sound widenings the gate accepts (mirrors snapshots._SAFE_PROMOTIONS)
_PROMOTIONS = {("int", "bigint"), ("float", "double")}


def _schema_of(cols):
    # constructed directly (no StructType.fromDDL) so the gate property
    # runs session-free — it is pure metadata logic
    from pyspark.sql import types as T

    atom = {
        "string": T.StringType(),
        "bigint": T.LongType(),
        "int": T.IntegerType(),
        "double": T.DoubleType(),
        "float": T.FloatType(),
        "boolean": T.BooleanType(),
        "date": T.DateType(),
    }
    return T.StructType([T.StructField(n, atom[t]) for n, t in cols])




def _manifest_for(cols):
    import json as _json

    s = _schema_of(cols)
    return {"schema_ddl": s.simpleString(), "schema_json": s.json()}


@settings(max_examples=200, deadline=None)
@given(data=st.data())
def test_append_schema_gate_property(data):
    """For any committed schema: identical and additive appends pass;
    dropping, retyping, or reordering a committed column raises — the
    full decision table of round-6 additive evolution, explored over
    random schemas."""
    import pytest as _pytest

    from ovalspark.sources.snapshots import SchemaMismatchError, _check_append_schema

    names = data.draw(
        st.lists(
            st.text("abcdefgh", min_size=1, max_size=6), min_size=1, max_size=5, unique=True
        )
    )
    committed = [(n, data.draw(st.sampled_from(_TYPE_POOL))) for n in names]
    m = _manifest_for(committed)

    _check_append_schema("/t", m, _schema_of(committed))  # identical: passes

    extra_names = data.draw(
        st.lists(
            st.text("ijklmnop", min_size=1, max_size=6), min_size=1, max_size=3, unique=True
        )
    )
    extras = [(n, data.draw(st.sampled_from(_TYPE_POOL))) for n in extra_names]
    _check_append_schema("/t", m, _schema_of(committed + extras))  # additive: passes

    drop_i = data.draw(st.integers(0, len(committed) - 1))
    dropped = committed[:drop_i] + committed[drop_i + 1 :]
    if dropped:
        with _pytest.raises(SchemaMismatchError):
            _check_append_schema("/t", m, _schema_of(dropped))
    else:
        # dropping the only column = empty append schema: also rejected
        with _pytest.raises(SchemaMismatchError):
            _check_append_schema("/t", m, _schema_of([("zz", "string")] if committed[0][0] != "zz" else [("yy", "string")]))

    re_i = data.draw(st.integers(0, len(committed) - 1))
    old_t = committed[re_i][1]
    new_t = data.draw(st.sampled_from([t for t in _TYPE_POOL if t != old_t]))
    retyped = list(committed)
    retyped[re_i] = (retyped[re_i][0], new_t)
    if (old_t, new_t) in _PROMOTIONS:
        # int→bigint / float→double are sound widenings: accepted
        _check_append_schema("/t", m, _schema_of(retyped))
    else:
        # every other retype — including the NARROWING inverses
        # (bigint→int, double→float) — still raises
        with _pytest.raises(SchemaMismatchError):
            _check_append_schema("/t", m, _schema_of(retyped))

    # promoting EVERY promotable column at once (plus an additive tail)
    # is still one sound append
    promoted_all = [
        (n, {"int": "bigint", "float": "double"}.get(t, t)) for n, t in committed
    ]
    _check_append_schema("/t", m, _schema_of(promoted_all + extras))

    reordered = list(reversed(committed))
    if reordered != committed:  # names are unique, so 2+ columns differ
        with _pytest.raises(SchemaMismatchError):
            _check_append_schema("/t", m, _schema_of(reordered))
