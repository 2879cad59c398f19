"""Text analysis operators for training-data pipelines.

All pure ``pyspark.sql.functions`` column expressions (JVM-side,
whole-stage codegen) and — deliberately — expressible in portable ANSI-ish
SQL so every one of them is DuckDB-oracle-checkable. No regex dialects are
relied on beyond simple character classes.

- token counting: whitespace tokens + a BPE-ish sub-word piece estimate
- quality scoring: length / punctuation ratio / stopword ratio / mean
  token length, combined into a [0,1] score
- language ID: stopword-marker scoring over a tiny per-language lexicon
  (n-gram-heuristic class of detector)
- fingerprinting: normalized md5 + a positional rolling hash
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny marker lexicons; ASCII-only so they behave identically everywhere
LANG_MARKERS = {
    "en": ("the", "and", "of", "is"),
    "es": ("el", "la", "que", "los"),
    "de": ("der", "die", "und", "ist"),
    "fr": ("le", "la", "les", "est"),
}

STOPWORDS = ("the", "a", "of", "and", "is", "to", "in", "that", "it", "on")


def tokens(text: Column) -> Column:
    return F.split(text, " ")


def token_count(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens(text))


def subword_piece_estimate(text: Column, chars_per_piece: float = 3.5) -> Column:
    """BPE-ish token estimate: pieces ≈ ceil(len/3.5) — the standard
    heuristic when no tokenizer is loadable; deterministic and portable."""
    return F.ceil(F.length(text) / chars_per_piece).cast("long")


# GPT-2-style pre-tokenization classes, restricted to constructs RE2 and
# Java regex treat identically (no lookarounds): letter runs, digit runs,
# single punctuation marks.
BPE_PRETOKEN_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"


_ALNUM_SPACE = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789 "


def regex_token_count(text: Column, pattern: str = BPE_PRETOKEN_RE) -> Column:
    """BPE-ish regex pre-token count (the whitespace counter's partner):
    counts letter runs + digit runs + punctuation marks, the unit a BPE
    tokenizer would further split. Portable: DuckDB regexp_extract_all
    yields identical matches for this pattern class.

    For the default pattern the count is computed WITHOUT materializing
    the match array: the alternation's branches are disjoint consuming
    classes, so total matches = maximal letter runs + maximal digit runs
    + non-alnum-non-space chars. Runs come from ``size(split(t, run))−1``
    (split's separators ARE the greedy runs; limit −1 keeps edge
    empties, so size is always separators+1) and the punct count from a
    codegen ``translate`` delete of the 63 ASCII alnum+space chars —
    everything else, including tabs/newlines/unicode, is exactly the
    ``[^a-zA-Z0-9 ]`` class. NULL text stays NULL on both paths.
    Measured 1.11 → 0.46 s over 50k sf1 docs with zero value drift
    (tests assert equality on edge strings and the corpus)."""
    if pattern == BPE_PRETOKEN_RE:
        letter_runs = F.size(F.split(text, "[a-zA-Z]+")) - 1
        digit_runs = F.size(F.split(text, "[0-9]+")) - 1
        punct = F.length(F.translate(text, _ALNUM_SPACE, ""))
        return (letter_runs + digit_runs + punct).cast("long")
    return F.size(F.regexp_extract_all(text, F.lit(pattern), F.lit(0))).cast("long")


def stopword_ratio(text: Column) -> Column:
    toks = tokens(text)
    hits = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    return hits / F.greatest(F.size(toks), F.lit(1))


def punct_ratio(text: Column) -> Column:
    """Share of non-alphanumeric, non-space characters."""
    stripped = F.regexp_replace(text, "[a-zA-Z0-9 ]", "")
    return F.length(stripped) / F.greatest(F.length(text), F.lit(1))


def mean_token_len(text: Column) -> Column:
    toks = tokens(text)
    return (F.length(text) - (F.size(toks) - 1)) / F.greatest(F.size(toks), F.lit(1))


def quality_score(text: Column) -> Column:
    """[0,1] heuristic quality: long enough, low punctuation noise, sane
    stopword density, sane mean token length. Weights are arbitrary but
    fixed; the value is a *ranking* signal, not a probability."""
    length_ok = F.least(F.length(text) / F.lit(200.0), F.lit(1.0))
    punct_ok = F.lit(1.0) - F.least(punct_ratio(text) * 5.0, F.lit(1.0))
    sw = stopword_ratio(text)
    sw_ok = F.lit(1.0) - F.least(F.abs(sw - 0.08) * 4.0, F.lit(1.0))
    mtl = mean_token_len(text)
    mtl_ok = F.lit(1.0) - F.least(F.abs(mtl - 5.0) / 5.0, F.lit(1.0))
    return (0.3 * length_ok + 0.3 * punct_ok + 0.2 * sw_ok + 0.2 * mtl_ok).alias("quality")


def lang_scores(text: Column) -> dict[str, Column]:
    """Marker-hit count per language over the token set."""
    toks = tokens(F.lower(text))
    return {
        lang: F.size(F.filter(toks, lambda t: t.isin(*markers)))
        for lang, markers in LANG_MARKERS.items()
    }


def predict_lang(text: Column) -> Column:
    """argmax over marker scores; 'und' (undetermined) when all zero.
    Deterministic tie-break: language name order."""
    scores = lang_scores(text)
    best = F.greatest(*scores.values())
    expr = F.lit("und")
    for lang in sorted(LANG_MARKERS, reverse=True):
        expr = F.when((scores[lang] == best) & (best > 0), F.lit(lang)).otherwise(expr)
    return expr


def fingerprint(text: Column) -> Column:
    """Normalized content fingerprint: md5 of lowercased,
    whitespace-collapsed text."""
    return F.md5(F.regexp_replace(F.lower(F.trim(text)), " +", " "))


def rolling_hash(text: Column, mod: int = (1 << 61) - 1) -> Column:
    """Positional rolling hash: sum_i (i+1) * h(token_i) mod 2^61-1,
    with h = 52-bit md5 prefix (13 hex chars — small enough that
    (i+1)*h never overflows int64 for texts up to ~2000 tokens).
    Order-sensitive (anagram texts differ), incremental-friendly, and
    portable SQL."""
    toks = tokens(text)
    # two-arg transform (element, index): the interpreter hands each token
    # straight to the lambda. The indexed form — transform(sequence(...),
    # i -> element_at(toks, i+1)) — re-resolves the toks expression per
    # element (trap #7) and pays per-element array indexing: measured 2.5×
    # slower at sf0.1 (0.95 vs 0.38 s warm), identical values.
    terms = F.transform(
        toks,
        lambda x, i: F.pmod(
            (i + 1) * F.conv(F.substring(F.md5(x), 1, 13), 16, 10).cast("long"),
            F.lit(mod),
        ),
    )
    return F.aggregate(terms, F.lit(0).cast("long"), lambda acc, t: F.pmod(acc + t, F.lit(mod)))


def token_frequencies(df: DataFrame, text_col: str = "text", k: int = 50) -> DataFrame:
    """Exact top-k tokens by corpus frequency: explode → hash-aggregate
    (map-side partial combine, so the shuffle carries one row per distinct
    token per task) → TakeOrdered. The vocabulary is Zipf-shaped, so the
    partial combine collapses most of the volume before the shuffle;
    deterministic tie-break on the token itself."""
    return (
        df.select(F.explode(tokens(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.desc("freq"), "token")
        .limit(k)
    )


def text_profile(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-document profile with every signal above."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col),
        token_count(t).alias("n_tokens"),
        subword_piece_estimate(t).alias("n_pieces"),
        F.length(t).alias("n_chars"),
        F.round(stopword_ratio(t), 6).alias("stopword_ratio"),
        F.round(punct_ratio(t), 6).alias("punct_ratio"),
        F.round(quality_score(t), 6).alias("quality"),
        predict_lang(t).alias("pred_lang"),
        fingerprint(t).alias("fingerprint"),
    )
