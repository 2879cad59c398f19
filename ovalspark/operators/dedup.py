"""Deduplication operators for large-scale text corpora.

Five strategies, all DataFrame-native, ordered by cost:

- exact:       md5-fingerprint hash-groupBy (one shuffle of 16-byte keys)
- minhash+LSH: word-shingles → n minhashes (array exprs, no explode) →
               banded signatures → bucket self-join → true Jaccard verify
- simhash:     64-bit near-dup fingerprint via a vectorized pandas UDF
               (Arrow-batched; the per-token bit-vote is numpy)
- n-gram Jaccard: exact verification on candidate pairs (array_intersect)
- embedding cosine: see ovalspark.operators.similarity (near_duplicates)

Scale notes: candidate generation NEVER does a full cross join — pairs
come from LSH band buckets (minhash) or identical fingerprints (exact,
simhash). The band self-join is an equi-join on band hash, salted by
Spark's AQE if a band is hot. Minhash uses md5-derived hash families so
results are engine-portable (DuckDB-oracle-checkable), at the cost of a
little JVM md5 time versus xxhash64.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _h64(col: Column, salt: int) -> Column:
    """Portable 60-bit hash: first 15 hex chars of md5 (identical in
    DuckDB: ('0x' || substr(md5(x),1,15))::BIGINT)."""
    return F.conv(F.substring(F.md5(F.concat(F.lit(f"{salt}:"), col)), 1, 15), 16, 10).cast("long")


def exact_duplicates(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Groups of byte-identical texts: (fingerprint, cnt, min_id)."""
    return (
        df.select(F.md5(F.col(text_col)).alias("fingerprint"), F.col(id_col))
        .groupBy("fingerprint")
        .agg(F.count("*").alias("cnt"), F.min(id_col).alias("min_id"))
        .filter(F.col("cnt") > 1)
    )


def word_shingles_from_words(words: Column, n: int = 2) -> Column:
    """Distinct word n-gram shingles from an ALREADY-SPLIT words array
    column (no explode). Materialize the split as its own column before
    calling — the shingle lambda references the words array per element,
    and a non-trivial subexpression inside a HOF lambda body re-evaluates
    per element (BASELINE.md trap #7; inlining the split measured ~35%
    slower at sf0.1: 0.19 vs 0.13 s warm).

    Built as n-1 chained ``zip_with`` over shifted slices rather than
    ``transform(sequence(...), i -> element_at(words, i+j))``: zip_with
    walks the slice pair linearly while the indexed form pays per-element
    array indexing through the interpreter — measured 5.8× at sf0.1
    (shingle pass 1.65 → 0.28 s warm; full 4-hash minhash job 1.77 →
    0.51 s). Output values and order are identical (first-occurrence
    order preserved by array_distinct in both forms)."""
    k = F.greatest(F.size(words) - (n - 1), F.lit(0))
    grams = F.slice(words, 1, k)
    for j in range(1, n):
        grams = F.zip_with(
            grams, F.slice(words, 1 + j, k), lambda a, b: F.concat_ws(" ", a, b)
        )
    grams = F.when(k > 0, grams).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(grams)


def word_shingles(text_col: Column, n: int = 2) -> Column:
    """Convenience single-expression form (splits inline). Job code should
    materialize the split first and use ``word_shingles_from_words`` —
    see its docstring for the per-element re-evaluation trap."""
    return word_shingles_from_words(F.split(text_col, " "), n)


_MH_P = (1 << 31) - 1  # Mersenne prime for the universal hash family


def _mh_coeffs(k: int) -> tuple[int, int]:
    """Fixed (a_k, b_k) for the k-th universal hash h_k(x) = (a*x+b) mod p.
    One md5 per shingle feeds ALL n_hashes components — 12× less hashing
    than one md5 per (shingle, k)."""
    a = (k * 2654435761 + 1) % _MH_P or 1
    b = (k * 40503 + 17) % _MH_P
    return a, b


def minhash_base(shingles: Column) -> Column:
    """Base-hash array: 60-bit md5 prefix mod p per shingle (portable:
    identical in DuckDB as ('0x' || substr(md5(x),1,15))::BIGINT %
    2147483647). Materialize this ONCE as its own column, then derive all
    n_hashes components from it with ``minhash_from_base`` — embedding it
    inline in every component expression makes each one its own md5 pass
    over the shingle array (HOFs are interpreted; no cross-expression
    CSE is guaranteed)."""
    return F.transform(
        shingles,
        lambda s: F.pmod(F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long"), F.lit(_MH_P)),
    )


def minhash_from_base(base: Column, n_hashes: int = 12) -> list[Column]:
    """n_hashes minhash components from a stored base-hash array column:
    one affine map + array_min each — the md5 work was paid once in
    ``minhash_base``. Measured ~15% off the signature job at sf0.1
    (0.41 → 0.34 s warm) vs the single-expression form."""
    out = []
    for k in range(n_hashes):
        a, b = _mh_coeffs(k)
        out.append(
            F.array_min(F.transform(base, lambda h: F.pmod(F.lit(a) * h + F.lit(b), F.lit(_MH_P)))).alias(f"mh{k}")
        )
    return out


def minhash_signature(shingles: Column, n_hashes: int = 12) -> list[Column]:
    """Single-expression convenience form (base inlined per component) —
    prefer the two-step ``minhash_base`` + ``minhash_from_base`` in jobs;
    values are identical (tested)."""
    return minhash_from_base(minhash_base(shingles), n_hashes)


def minhash_signatures_flat(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 12,
    shingle_n: int = 2,
) -> DataFrame:
    """Codegen twin of ``minhash_signature``: explode shingles to flat rows
    (whole-stage-codegen md5 + universal-hash expressions, one per shingle
    occurrence) and take per-doc MIN via hash aggregation (map-side partial
    combine, so the shuffle carries one row per (doc, 12 longs)).

    The HOF form evaluates its ``transform`` lambdas interpreted; this one
    trades that for an explode + shuffle. Measured at sf0.1 (see
    BASELINE.md) to decide the default. Values are identical (same hash
    family); returns (id_col, mh0..mh{n-1})."""
    sh = (
        df.select(F.col(id_col), F.split(F.col(text_col), " ").alias("_w"))
        .filter(F.size("_w") >= shingle_n)  # == nonempty shingles, no double eval
        .select(id_col, word_shingles_from_words(F.col("_w"), shingle_n).alias("_sh"))
    )
    ex = sh.select(id_col, F.explode("_sh").alias("_s"))
    base = F.pmod(F.conv(F.substring(F.md5(F.col("_s")), 1, 15), 16, 10).cast("long"), F.lit(_MH_P))
    aggs = []
    for k in range(n_hashes):
        a, b = _mh_coeffs(k)
        aggs.append(F.min(F.pmod(F.lit(a) * F.col("_h") + F.lit(b), F.lit(_MH_P))).alias(f"mh{k}"))
    return ex.select(id_col, base.alias("_h")).groupBy(id_col).agg(*aggs)


def minhash_duplicates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 12,
    bands: int = 4,
    jaccard_threshold: float = 0.7,
    shingle_n: int = 2,
    materialize: bool = True,
) -> DataFrame:
    """Near-duplicate pairs via MinHash-LSH with exact Jaccard verify.

    Returns (id_a, id_b, jaccard) with id_a < id_b, one row per pair (pairs
    colliding in several bands are deduplicated).

    ``materialize`` (default on) localCheckpoints the signature table
    before the band self-join: the shingle+minhash lineage feeds FOUR plan
    subtrees (band join left/right + two shingle join-backs), and without
    materialization Catalyst re-evaluates the dominant shingling cost in
    each — measured ~2× end-to-end at sf0.1. At real scale signatures are
    a stored column and this step is the one-off job that writes it.
    """
    rows_per_band = n_hashes // bands
    # filter on the INPUT word count, not size(_sh): a filter on the
    # computed column pushes below the projection and evaluates the whole
    # interpreted shingle expression twice (measured 2.25 → 0.64 s for
    # the 4-hash signature job at sf1). n-gram shingles are nonempty
    # exactly when len(words) ≥ shingle_n.
    sig = df.select(
        F.col(id_col).alias("_id"),
        F.split(F.col(text_col), " ").alias("_w"),
    ).filter(F.size("_w") >= shingle_n).select(
        "_id",
        word_shingles_from_words(F.col("_w"), shingle_n).alias("_sh"),
    )
    sig = sig.withColumn("_hb", minhash_base(F.col("_sh")))
    sig = sig.select("_id", "_sh", *minhash_from_base(F.col("_hb"), n_hashes))
    if materialize:
        sig = sig.localCheckpoint()
    band_cols = [
        F.md5(F.concat_ws(",", F.lit(b), *[F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)])).alias(
            f"band{b}"
        )
        for b in range(bands)
    ]
    # long-form bands + ONE self-join (not one join per band — that would
    # recompute the shingle/minhash pipeline 2×bands times). The band join
    # and pair dedup shuffle ONLY (band, id, |shingles|) — the heavy
    # shingle arrays are joined back afterwards, so no wide rows cross
    # the big shuffles. Carrying the set SIZE (one int) through the band
    # phase lets the size prefilter run on the RAW band collisions:
    # i ≤ min(a,b) ⇒ jaccard ≤ min/max, so jaccard ≥ t requires
    # min ≥ t·max (real arithmetic; the +1 slack over integer sizes makes
    # the bound immune to double rounding at any threshold — it can only
    # ADMIT an extra pair for the exact filter to reject, never drop a
    # passing one). Pairs that cannot pass are gone BEFORE the dedup
    # shuffle and the two array-attach joins (19% of candidates at sf1 —
    # wall-flat there, where the fixed stage floor dominates, but the
    # right shape at scale: near-threshold corpora with skewed doc
    # lengths prune far more, and everything pruned skips a shuffle AND
    # two join probes; output proven identical).
    banded = sig.select(
        "_id", F.size("_sh").alias("_sz"), F.explode(F.array(*band_cols)).alias("_band")
    )
    left = banded.select("_band", F.col("_id").alias("id_a"), F.col("_sz").alias("sz_a"))
    right = banded.select("_band", F.col("_id").alias("id_b"), F.col("_sz").alias("sz_b"))
    size_ok = (F.least("sz_a", "sz_b") + F.lit(1)) > F.lit(jaccard_threshold) * F.greatest(
        "sz_a", "sz_b"
    )
    pairs = (
        left.join(right, "_band")
        .filter((F.col("id_a") < F.col("id_b")) & size_ok)
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    # (tried and reverted: identical-projection joins renamed after the
    # join to trigger ReuseExchange on the two broadcast builds — AQE
    # did not reuse them and wall time was unchanged at sf1)
    sh = sig.select("_id", "_sh")
    pairs = pairs.join(sh.select(F.col("_id").alias("id_a"), F.col("_sh").alias("sh_a")), "id_a").join(
        sh.select(F.col("_id").alias("id_b"), F.col("_sh").alias("sh_b")), "id_b"
    )
    # |A∪B| = |A|+|B|−|A∩B| exactly (both arrays are array_distinct
    # output), so one hash-set pass (intersect) replaces two — the
    # DOUBLE value i/(a+b−i) is the same division of the same integers
    # as i/|union|, so oracle hashes are unchanged.
    sa, sb = F.size("sh_a"), F.size("sh_b")
    i = F.size(F.array_intersect("sh_a", "sh_b"))
    jac = (i / (sa + sb - i)).alias("jaccard")
    return pairs.select("id_a", "id_b", jac).filter(F.col("jaccard") >= jaccard_threshold)


def ngram_jaccard_pairs(
    df: DataFrame,
    candidate_pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 2,
) -> DataFrame:
    """Exact n-gram Jaccard for an arbitrary candidate-pair table
    (columns id_a, id_b). Join-fetch both shingle sets, compute in arrays.
    """
    sh = df.select(F.col(id_col).alias("_id"), F.split(F.col(text_col), " ").alias("_w")).select(
        "_id", word_shingles_from_words(F.col("_w"), shingle_n).alias("_sh")
    )
    a = sh.select(F.col("_id").alias("id_a"), F.col("_sh").alias("sh_a"))
    b = sh.select(F.col("_id").alias("id_b"), F.col("_sh").alias("sh_b"))
    # |A∪B| = |A|+|B|−|A∩B| for distinct arrays: one hash-set pass
    # instead of two, same integers, same double (see minhash_duplicates)
    i = F.size(F.array_intersect("sh_a", "sh_b"))
    return (
        candidate_pairs.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            (i / (F.size("sh_a") + F.size("sh_b") - i)).alias("jaccard"),
        )
    )


def simhash_fingerprints(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """64-bit SimHash per document via a vectorized pandas UDF.

    The per-batch computation is numpy: token → stable 64-bit hash
    (python's hashlib md5, same per-token hash everywhere), bits vote
    ±1 weighted by term frequency, fingerprint = sign vector. Near-dups
    are docs whose fingerprints differ in ≤ k bits (Hamming); group by
    fingerprint prefix bands to find candidates without a cross join.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def simhash(texts: pd.Series) -> pd.Series:
        import hashlib

        import numpy as np

        shifts = np.arange(64, dtype=np.uint64)
        # memoize token -> pre-expanded ±1 bit row; vocabularies are
        # Zipf-distributed so the hit rate makes md5 cost ~vocab-sized,
        # not corpus-sized
        bitrows: dict[str, "np.ndarray"] = {}

        def row(tok: str):
            r = bitrows.get(tok)
            if r is None:
                h = np.uint64(int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "big"))
                r = np.where(((h >> shifts) & np.uint64(1)) == 1, 1, -1).astype(np.int32)
                bitrows[tok] = r
            return r

        out = np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            if not t:
                continue
            votes = np.zeros(64, dtype=np.int64)
            for tok in t.split(" "):
                votes += row(tok)
            fp = int(((votes > 0).astype(np.uint64) << shifts).sum(dtype=np.uint64))
            out[i] = fp - (1 << 64) if fp >= (1 << 63) else fp
        return pd.Series(out)

    return df.select(F.col(id_col).alias("id"), simhash(F.col(text_col)).alias("simhash"))


def simhash_fingerprints_flat(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """64-bit SimHash per document — pure JVM/codegen twin of
    ``simhash_fingerprints`` (bit-identical output; tests assert it).

    Shape: explode tokens (TF-weighted — every occurrence votes, like the
    UDF's per-token loop), md5 each occurrence ONCE, rebuild the 64-bit
    hash from two 32-hex-digit ``conv`` halves (one 16-digit conv would
    overflow signed long), then ONE hash aggregation per doc computing
    the token count plus 16 SWAR bit-population sums: lane k's sum packs
    the set-bit counts of bits k, k+16, k+32, k+48 as four 16-bit
    counters in one long (mask 0x0001000100010001), so the aggregation
    carries 17 longs instead of 65. vote_b > 0 ⇔ 2·set_b > n; bit 63 is
    added as long MIN_VALUE for exact two's-complement wrap. Lane
    counters bound doc length at 65535 tokens — enforced loudly with
    raise_error, never silently wrapped.

    Measured at sf0.1/local[32] (BASELINE.md round 3): warm 1.25-1.33 s
    vs the pandas UDF's 0.33-0.39 s — the UDF's cross-row token
    memoization (Zipf vocab) beats per-occurrence JVM md5, so the UDF
    stays the default; this form exists for Python-worker-free
    deployments and as the q41 oracle's structural twin (the 64-sum
    variant without SWAR packing measured 2.1 s).
    """
    nonempty = df.filter(F.col(text_col).isNotNull() & (F.col(text_col) != ""))
    h_hex = F.md5(F.col("_t"))
    hi = F.conv(F.substring(h_hex, 1, 8), 16, 10).cast("long")
    lo = F.conv(F.substring(h_hex, 9, 8), 16, 10).cast("long")
    toks = nonempty.select(
        F.col(id_col).alias("id"), F.explode(F.split(F.col(text_col), " ")).alias("_t")
    ).select("id", F.shiftleft(hi, 32).bitwiseOR(lo).alias("_h"))
    return _swar_votes_to_fingerprints(toks, df, id_col, text_col)


def simhash_fingerprints_joined(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_vocab: bool = True,
) -> DataFrame:
    """64-bit SimHash, md5 paid once per DISTINCT token, (token → bits)
    joined back to occurrences, then the same 17-long SWAR aggregation
    as the flat form. Bit-identical to both other impls (tests assert).

    MEASURED VERDICT (BASELINE.md round 5, the round-4 "revisit with a
    realistic corpus" follow-up): this shape LOSES to the pandas UDF
    even on a 185k-distinct-token heavy-tail fixture — 3.1 s broadcast /
    9.4 s shuffled vs 1.6 s UDF and 2.2 s flat at 200k docs × 40 tokens,
    local[32]. Token md5 is too cheap for the saved hashing to repay an
    extra pass over the exploded occurrences (the vocab distinct) plus a
    join; the Zipf head also skews the shuffled join's key. Kept because
    it is the only JVM-side shape whose HASH cost is vocabulary-sized —
    the regime where it could win is expensive per-token transforms
    (long tokens, normalization, lookups), not plain md5.
    ``broadcast_vocab=False`` for vocabularies too large to broadcast
    (at which point prefer ``flat``)."""
    nonempty = df.filter(F.col(text_col).isNotNull() & (F.col(text_col) != ""))
    occ = nonempty.select(
        F.col(id_col).alias("id"), F.explode(F.split(F.col(text_col), " ")).alias("_t")
    )
    h_hex = F.md5(F.col("_t"))
    hi = F.conv(F.substring(h_hex, 1, 8), 16, 10).cast("long")
    lo = F.conv(F.substring(h_hex, 9, 8), 16, 10).cast("long")
    vocab = occ.select("_t").distinct().select(
        "_t", F.shiftleft(hi, 32).bitwiseOR(lo).alias("_h")
    )
    if broadcast_vocab:
        vocab = F.broadcast(vocab)
    toks = occ.join(vocab, "_t").select("id", "_h")
    return _swar_votes_to_fingerprints(toks, df, id_col, text_col)


def _swar_votes_to_fingerprints(
    toks: DataFrame, df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Shared tail of the JVM SimHash forms: ONE hash aggregation over
    (id, _h) token rows computing the token count plus 16 SWAR
    bit-population sums (docstring of ``simhash_fingerprints_flat``),
    then the majority-vote fingerprint and the empty-doc reattach."""
    lane_mask = 0x0001000100010001
    aggs = [F.count("*").alias("_n")]
    for k in range(16):
        aggs.append(
            F.sum(F.shiftrightunsigned(F.col("_h"), k).bitwiseAND(F.lit(lane_mask))).alias(f"_s{k}")
        )
    agg = toks.groupBy("id").agg(*aggs)
    n = F.when(
        F.col("_n") < F.lit(1 << 16), F.col("_n")
    ).otherwise(F.raise_error(F.concat(F.lit("doc exceeds 65535 tokens (SWAR lane bound): "), F.col("id"))))

    def set_count(b: int):
        return F.shiftrightunsigned(F.col(f"_s{b % 16}"), 16 * (b // 16)).bitwiseAND(F.lit(0xFFFF))

    fp = F.lit(0).cast("long")
    for b in range(63):
        fp = fp + (set_count(b) * 2 > n).cast("long") * F.lit(1 << b)
    fp = fp + (set_count(63) * 2 > n).cast("long") * F.lit(-(1 << 63))
    out = agg.select("id", fp.alias("simhash"))
    # the UDF maps empty/null text to fingerprint 0; explode emits no
    # groups for them, so reattach (narrow column-pruned second scan —
    # empty docs are rare to nonexistent in a real corpus)
    empties = (
        df.filter(F.col(text_col).isNull() | (F.col(text_col) == ""))
        .select(F.col(id_col).alias("id"), F.lit(0).cast("long").alias("simhash"))
    )
    return out.unionByName(empties)


def simhash_near_duplicates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    impl: str = "udf",
    materialize: bool = True,
) -> DataFrame:
    """Candidate pairs from 16-bit fingerprint bands (4 bands → any pair
    within Hamming ≤ 3 shares at least one exact band), verified by exact
    Hamming distance via bit_count(xor).

    ``impl="udf"`` (default) computes fingerprints with the vectorized
    pandas UDF — MEASURED 3.5× faster than the flat JVM form at sf0.1
    (0.33 vs 1.25 s warm, BASELINE.md round 3) because it memoizes
    token→bit-row across rows while the JVM form pays md5 per token
    occurrence. ``impl="joined"`` pays md5 once per DISTINCT token and
    joins the bits back — MEASURED SLOWER than the UDF even at a
    185k-distinct-token heavy-tail fixture (BASELINE.md round 5: the
    round-4 "real vocabulary" hypothesis is refuted; md5 is too cheap to
    repay the extra pass + join), kept for expensive per-token transform
    regimes. ``impl="flat"`` is the pure-codegen SWAR form for
    Python-worker-free deployments — the right JVM default.
    All three produce identical bits (tests/test_pipeline_ops.py).
    """
    fp_fn = {
        "udf": simhash_fingerprints,
        "flat": simhash_fingerprints_flat,
        "joined": simhash_fingerprints_joined,
    }[impl]
    fp = fp_fn(df, id_col, text_col)
    if materialize:
        # the fingerprint lineage feeds BOTH band-join sides — trap #2
        # (BASELINE.md): unmaterialized, the pandas UDF re-runs per
        # subtree and even inverts the verify-first win below. Measured
        # four ways at sf0.1 (round 5): lazy 1.11/1.35 s (old/new order)
        # vs materialized 0.76/0.64 s — checkpoint + verify-first is the
        # plan. At real scale fingerprints are a stored column anyway.
        fp = fp.localCheckpoint()
    # band value carries the band index so bands only collide with the
    # SAME band of other docs; one exploded self-join (not 4)
    bands = fp.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.shiftright(F.col("simhash"), 16 * b).bitwiseAND(F.lit(0xFFFF)) + F.lit(b * 65536)
                    for b in range(4)
                ]
            )
        ).alias("_band"),
    )
    left = bands.select("_band", F.col("id").alias("id_a"), F.col("simhash").alias("fp_a"))
    right = bands.select("_band", F.col("id").alias("id_b"), F.col("simhash").alias("fp_b"))
    # verify-BEFORE-dedupe: the hamming check is a flat codegen expression
    # on the join output, so filtering first means the dropDuplicates
    # shuffle carries only confirmed near-dups instead of every band
    # collision — measured 1.5× at sf0.1 (0.49→0.32 s pair stage,
    # identical pairs), and structurally load-bearing at web scale where
    # boilerplate bands collide massively
    ham = F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
    return (
        left.join(right, "_band")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_a", "id_b"])
        .select("id_a", "id_b", "hamming")
    )
