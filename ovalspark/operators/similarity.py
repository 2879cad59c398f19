"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: the exactness baseline. Float dot products via
  ``F.zip_with`` + ``F.aggregate`` — single-layer HOFs, one narrow pass +
  a top-k (TakeOrdered, no full sort).
- LSH-bucketed ANN: random-hyperplane signatures, bucket/hamming candidate
  filter, exact re-rank inside buckets.
- IVF: deterministic centroid pick (TakeOrdered on a content hash — NOT a
  global window), nearest-centroid assignment, probe only nprobe lists.

Cross-engine exactness (the DuckDB-oracle contract): every ranking value
is derived from THREE exact integer sums over the quantized components
``q_i = floor(x_i * 1e6)``:

    dot = Σ a_i·b_i     n2a = Σ a_i²     n2b = Σ b_i²
    cos_q = floor( dot / (sqrt(n2a) · sqrt(n2b)) · 1e12 )

Every step is deterministic IEEE-754 (the sums are exact below 2^53 even
in a DOUBLE-summing engine; int→double, sqrt, ·, / are correctly rounded;
floor is exact), so Spark and DuckDB produce identical BIGINTs. Hyperplane
signs come from md5 (derivable in any engine); a signature bit is the sign
of an exact integer projection Σ sign_pd·q_d.

Physical shape (the part that survives 100 TB): the per-row work is ONE
``posexplode`` over the vector and ONE hash aggregation computing dot, n2
and every signature projection together — whole-stage codegen end to end,
with map-side partial combine so the shuffle carries one row per vector.
The previous form nested the quantization HOFs (a transform whose lambda
referenced an aggregate): Catalyst evaluates lambda-body subtrees per
element, which measured **34× slower** than the float HOF baseline at
200k×64 (BASELINE.md round 2); the flat form measured 3× FASTER than it.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

Q_SCALE = 1_000_000  # component quantization
COS_SCALE = 1_000_000_000_000  # quantized cosine ≈ cos * 1e12


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def quant_py(vec: list[float], scale: int = Q_SCALE) -> list[int]:
    """Driver-side quantized components for constant query vectors."""
    return [math.floor(float(x) * scale) for x in vec]


def quant(vec: Column, scale: int = Q_SCALE) -> Column:
    """Quantized int64 components of a float vector (single-layer HOF —
    fine for candidate-only verification; hot paths use the flat pass)."""
    return F.transform(vec, lambda x: F.floor(x.cast("double") * scale).cast("long"))


def cos_q_expr(dot: Column, n2a: Column, n2b: Column) -> Column:
    """floor(dot / (sqrt(n2a)·sqrt(n2b)) · 1e12) — engine-exact, see
    module doc. Inputs are exact integer sums (as long or double <2^53)."""
    denom = F.sqrt(n2a.cast("double")) * F.sqrt(n2b.cast("double"))
    return F.floor(dot.cast("double") / denom * COS_SCALE).cast("long")


def pair_cos_q(qa: Column, n2a: Column, qb: Column, n2b: Column) -> Column:
    """Quantized cosine of two stored quantized-component arrays — used on
    CANDIDATE pairs only (tiny), so the single-layer zip_with is fine."""
    dot = F.aggregate(F.zip_with(qa, qb, lambda x, y: x * y), F.lit(0).cast("long"), lambda a, v: a + v)
    return cos_q_expr(dot, n2a, n2b)


def hyperplane_signs(n_bits: int, dims: int, seed: int = 7) -> list[list[int]]:
    """Deterministic ±1 hyperplane matrix derived from md5 (portable: any
    engine or language reproduces it). signs[p][d] = +1 iff the first byte
    of md5("seed:p:d") is even. Tiny (n_bits×dims ints) — embedded as
    literals, never shuffled or broadcast."""
    return [
        [
            1 if hashlib.md5(f"{seed}:{p}:{d}".encode()).digest()[0] % 2 == 0 else -1
            for d in range(dims)
        ]
        for p in range(n_bits)
    ]


def hyperplane_signature_py(vec: list[float], dims: int, n_bits: int = 16, seed: int = 7) -> int:
    """Driver-side signature for constant query vectors: bit p is the sign
    of the exact integer projection Σ_d signs[p][d]·floor(vec_d·1e6)."""
    signs = hyperplane_signs(n_bits, dims, seed)
    qi = quant_py(vec)
    sig = 0
    for p in range(n_bits):
        if sum(s * v for s, v in zip(signs[p], qi)) > 0:
            sig |= 1 << p
    return sig


# When dims × n_bits × n_seeds exceeds this, embedding_scores switches
# the signature projections from inline ±1 literals (one element_at(array)
# map + SUM per (seed, bit) in the single aggregation — fastest at toy
# dims, but the expression tree carries dims×n_bits×seeds literals: at
# real embedding dims (768–1536) × 16 bits × 3 seeds that is ~50k literal
# nodes and stops being a plan) to a broadcast-joined (seed, bit, idx,
# sign) table against the exploded components — plan size O(1) in dims
# and n_bits, the same escape hatch _assign_join gives the centroids.
INLINE_SIGN_LIMIT = 4096


def _scores_via_sign_join(
    ex: DataFrame,
    id_col: str,
    sig_seeds: list[int],
    n_bits: int,
    dims: int,
    multi: bool,
    query: list[float] | None,
    centroids: list[list[int]] | None,
) -> DataFrame:
    """EVERY embedding_scores output (n2, dot, dot_c*, q, sig[_j]) from ONE
    scan of the exploded-quantized frame via a broadcast sign table —
    exact-integer identical to the inline-literal form (both compute the
    same Σ sign_pd·q_d; the bit is its sign) — asserted by
    tests/test_pipeline_ops.py equivalence.

    Shape: one broadcast hash join (the sign table is n_seeds×n_bits×dims
    rows — ~70k at 1536×16×3, built driver-side once; query / centroid
    component values ride the SAME table as extra columns), then three
    key-partitioned aggregations with map-side combine: (id, seed, bit) →
    (id, seed) → (id). The non-signature SUMS (n2, dot, dot_c) are
    computed on lane (_j=0, _p=0) only — each vector component appears
    exactly once there — so folding them in costs conditional expressions,
    not extra rows. (``q`` is NOT folded: a collect_list in this
    aggregation demotes the whole dims×n_bits-row aggregate from codegen
    HashAggregate to ObjectHashAggregate — measured 2.7× slower at 768
    dims — while ``q`` is just a projection of the source, attached by
    the caller with a cheap column-pruned join.) The SUM fold is the
    point: computing them in a SEPARATE
    aggregation over ``ex`` would reference ``ex`` from two plan subtrees
    and scan+explode+quantize the source twice (plus an (id)⋈(id) join to
    glue the halves) — double input I/O at exactly the real-dims scale
    this path exists for."""
    spark = ex.sparkSession
    qv = quant_py(query) if query is not None else None
    cents = centroids or []
    rows = []
    for j, sd in enumerate(sig_seeds):
        signs = hyperplane_signs(n_bits, dims, sd)
        for p in range(n_bits):
            for i, s in enumerate(signs[p]):
                rows.append(
                    (j, p, i, s, qv[i] if qv is not None else None)
                    + tuple(c[i] for c in cents)
                )
    c_cols = "".join(f", _c{k} long" for k in range(len(cents)))
    tbl = spark.createDataFrame(rows, f"_j int, _p int, _i int, _sign int, _qv long{c_cols}")

    lane0 = (F.col("_j") == 0) & (F.col("_p") == 0)
    lvl1_aggs = [
        F.sum(F.col("_q") * F.col("_sign")).alias("_proj"),
        F.sum(F.when(lane0, F.col("_q") * F.col("_q"))).alias("_n2"),
    ]
    if query is not None:
        lvl1_aggs.append(F.sum(F.when(lane0, F.col("_q") * F.col("_qv"))).alias("_dot"))
    for k in range(len(cents)):
        lvl1_aggs.append(F.sum(F.when(lane0, F.col("_q") * F.col(f"_c{k}"))).alias(f"_dc{k}"))
    lvl1 = ex.join(F.broadcast(tbl), "_i").groupBy(id_col, "_j", "_p").agg(*lvl1_aggs)

    carry1 = [F.max("_n2").alias("_n2")]
    carry2 = [F.max("_n2").alias("n2")]
    if query is not None:
        carry1.append(F.max("_dot").alias("_dot"))
        carry2.append(F.max("_dot").alias("dot"))
    for k in range(len(cents)):
        carry1.append(F.max(f"_dc{k}").alias(f"_dc{k}"))
        carry2.append(F.max(f"_dc{k}").alias(f"dot_c{k}"))
    sig = lvl1.groupBy(id_col, "_j").agg(
        F.sum(
            F.when(F.col("_proj") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), _p)"))
            .otherwise(F.lit(0).cast("long"))
        ).alias("_sig"),
        *carry1,
    )
    out = sig.groupBy(id_col).agg(
        *carry2,
        *[
            F.max(F.when(F.col("_j") == j, F.col("_sig"))).alias(
                f"sig_{j}" if multi else "sig"
            )
            for j in range(len(sig_seeds))
        ],
    )
    return out


def embedding_scores(
    df: DataFrame,
    query: list[float] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bits: int = 0,
    seed: int = 7,
    keep_quant: bool = False,
    centroids: list[list[int]] | None = None,
    dims: int | None = None,
    validate_dims: bool = False,
    seeds: list[int] | None = None,
    sig_join: bool | None = None,
) -> DataFrame:
    """The ONE flat pass every quantized operator shares: posexplode the
    vector, quantize per component, and hash-aggregate per vector id —

    - ``n2``: Σ q_i² (always)
    - ``dot``: Σ q_i·query_q_i (when a query vector is given)
    - ``sig``: the n_bits hyperplane signature (when n_bits > 0) — each bit
      is the sign of one more SUM in the same aggregation. With
      ``seeds=[s0, s1, ...]`` one signature per seed comes out of the SAME
      pass as ``sig_0, sig_1, ...`` (multi-seed candidate recall).
      ``sig_join`` picks the physical form: inline ±1 literals (None/auto
      up to ``INLINE_SIGN_LIMIT`` = dims×n_bits×seeds) or the broadcast
      sign-table join (``_scores_via_sign_join``) past it — bit-identical
      outputs, plan size O(1) in dims×n_bits for the join form, which is
      what survives real embedding dims (768–1536).
    - ``dot_c{k}``: Σ q_i·centroid_k_i per centroid (when given) — the IVF
      assignment scores, again in the same aggregation
    - ``q``: the quantized component array itself (when ``keep_quant`` —
      reassembled for candidate-pair verification)

    Map-side partial combine collapses the exploded rows before the
    shuffle, so the shuffle carries one row per vector regardless of dims.

    CONTRACT: vectors must be non-empty and share one fixed dimensionality.
    An empty/all-null array emits no posexplode rows, so the vector
    silently VANISHES from every downstream ranking; a wrong-length vector
    gets a mis-sized signature. Pass ``dims`` when the caller knows it
    (skips the probe job); ``validate_dims=True`` adds a raise_error guard
    so malformed vectors fail loudly instead of disappearing. When
    ``dims`` is not given and signatures are requested, dims is probed
    from an arbitrary first row.
    """
    sig_seeds = seeds if seeds is not None else [seed]
    if n_bits > 0 and dims is None:  # dims only needed for the sign matrix
        dims_src = df.select(F.size(vec_col).alias("d")).first()
        dims = int(dims_src.d) if dims_src else 0
    if validate_dims:
        want = dims
        if want is None and query is not None:
            want = len(query)
        if want is None and centroids:
            want = len(centroids[0])
        if want is None:
            raise ValueError("validate_dims=True needs dims (explicit, query or centroids)")
        bad = F.size(F.col(vec_col)) != F.lit(want)
        df = df.withColumn(
            vec_col,
            F.when(
                ~bad, F.col(vec_col)
            ).otherwise(
                F.raise_error(
                    F.concat(
                        F.lit(f"embedding dims != {want} for id "),
                        F.col(id_col).cast("string"),
                        F.lit(": size="),
                        F.size(F.col(vec_col)).cast("string"),
                    )
                )
            ),
        )
    use_sig_join = sig_join
    if use_sig_join is None:
        use_sig_join = n_bits > 0 and dims * n_bits * len(sig_seeds) > INLINE_SIGN_LIMIT
    ex = _exploded_quant(df, id_col, vec_col)
    if n_bits > 0 and use_sig_join:
        # all sums from one scan of ex (see _scores_via_sign_join); q via
        # a column-pruned projection join — measured 0.97 s vs 2.62 s for
        # collect_list inside the joined aggregation at dims=768
        out = _scores_via_sign_join(
            ex, id_col, sig_seeds, n_bits, dims, seeds is not None, query, centroids
        )
        if keep_quant:
            out = out.join(df.select(id_col, quant(F.col(vec_col)).alias("q")), id_col)
        return out
    aggs = [F.sum(F.col("_q") * F.col("_q")).alias("n2")]
    if query is not None:
        qlit = F.element_at(F.array(*[F.lit(v) for v in quant_py(query)]), F.col("_i") + 1)
        aggs.append(F.sum(F.col("_q") * qlit).alias("dot"))
    if n_bits > 0:
        for j, sd in enumerate(sig_seeds):
            signs = hyperplane_signs(n_bits, dims, sd)
            for p in range(n_bits):
                smap = F.element_at(F.array(*[F.lit(v) for v in signs[p]]), F.col("_i") + 1)
                aggs.append(F.sum(F.col("_q") * smap).alias(f"_proj{j}_{p}"))
    if centroids is not None:
        for k, c in enumerate(centroids):
            cmap = F.element_at(F.array(*[F.lit(v) for v in c]), F.col("_i") + 1)
            aggs.append(F.sum(F.col("_q") * cmap).alias(f"dot_c{k}"))
    if keep_quant:
        aggs.append(_collect_quant())
    out = ex.groupBy(id_col).agg(*aggs)
    if n_bits > 0:
        drop_cols = []
        for j in range(len(sig_seeds)):
            sig = F.lit(0).cast("long")
            for p in range(n_bits):
                sig = sig + (F.col(f"_proj{j}_{p}") > 0).cast("long") * (1 << p)
            name = "sig" if seeds is None else f"sig_{j}"
            out = out.withColumn(name, sig)
            drop_cols += [f"_proj{j}_{p}" for p in range(n_bits)]
        out = out.drop(*drop_cols)
    return out


def _query_n2(query: list[float]) -> int:
    return sum(v * v for v in quant_py(query))


def _exploded_quant(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(id, _i, _q): the vector posexploded and quantized — THE shared
    entry to every flat-aggregation pass (embedding_scores and the IVF
    join-assignment path). One definition: the quantizer recipe and the
    inline-vs-join equivalence both depend on it."""
    return df.select(
        F.col(id_col),
        F.posexplode(vec_col).alias("_i", "_x"),
    ).select(
        id_col,
        "_i",
        F.floor(F.col("_x").cast("double") * Q_SCALE).cast("long").alias("_q"),
    )


def _collect_quant() -> Column:
    """Reassemble the quantized component array inside a groupBy(id) agg."""
    return F.transform(F.sort_array(F.collect_list(F.struct("_i", "_q"))), lambda s: s["_q"]).alias("q")


def cosine_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by float cosine to a constant query vector. orderBy+limit
    compiles to TakeOrdered — per-partition heaps, no global sort."""
    q = F.array(*[F.lit(float(x)) for x in query])
    scored = df.select(F.col(id_col), cosine(F.col(vec_col), q).alias("cos_sim"))
    return scored.orderBy(F.desc("cos_sim"), id_col).limit(k)


def cosine_topk_q(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k by engine-exact quantized cosine (cos·1e12 as BIGINT) — the
    DuckDB-oracle-checked twin of ``cosine_topk``; rankings agree up to
    quantization ties. One flat pass + TakeOrdered."""
    s = embedding_scores(df, query, id_col, vec_col)
    return (
        s.select(F.col(id_col), cos_q_expr(F.col("dot"), F.col("n2"), F.lit(_query_n2(query))).alias("cos_q"))
        .orderBy(F.desc("cos_q"), id_col)
        .limit(k)
    )


def int_dot_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = Q_SCALE,
) -> DataFrame:
    """Top-k by integer-quantized dot product: floor(x·1e6) per component,
    BIGINT products — bit-identical in any engine (the oracle variant).
    Ranking matches exact dot product up to quantization error."""
    qi = [int(math.floor(x * scale)) for x in query]
    q = F.array(*[F.lit(v) for v in qi])
    vi = F.transform(F.col(vec_col), lambda x: F.floor(x.cast("double") * scale).cast("long"))
    dot = F.aggregate(F.zip_with(vi, q, lambda x, y: x * y), F.lit(0).cast("long"), lambda a, v: a + v)
    return df.select(F.col(id_col), dot.alias("dot_q")).orderBy(F.desc("dot_q"), id_col).limit(k)


def ann_lsh_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bits: int = 12,
    max_hamming: int = 2,
    seed: int = 7,
) -> DataFrame:
    """Approximate top-k: restrict the quantized-cosine re-rank to vectors
    whose hyperplane signature is within ``max_hamming`` bits of the
    query's (a driver-computed constant → one codegen'd bit_count
    predicate). Signature projections, n2 and the query dot all come out
    of the single flat aggregation pass. At scale use ``ann_lsh_persist``
    + ``ann_lsh_topk_stored``: the signature becomes a stored column and
    a probe reads only the band-matching partitions (exact-equivalent to
    this one-shot form whenever max_hamming < bands)."""
    qsig = hyperplane_signature_py(query, len(query), n_bits, seed)
    s = embedding_scores(df, query, id_col, vec_col, n_bits=n_bits, seed=seed, dims=len(query))
    cands = s.filter(F.bit_count(F.col("sig").bitwiseXOR(F.lit(qsig))) <= max_hamming)
    return (
        cands.select(F.col(id_col), cos_q_expr(F.col("dot"), F.col("n2"), F.lit(_query_n2(query))).alias("cos_q"))
        .orderBy(F.desc("cos_q"), id_col)
        .limit(k)
    )


def near_duplicates_cosine(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bits: int = 16,
    seed: int = 7,
    dims: int | None = None,
    seeds: list[int] | None = None,
) -> DataFrame:
    """Embedding near-dup pairs: exact-signature bucket self-join (vectors
    this similar almost surely share all n_bits), quantized-cosine verify
    on the candidates only. Returns (id_a, id_b, cos_q), id_a < id_b,
    cos_q ≈ cos·1e12.

    Recall knobs: fewer ``n_bits`` = bigger buckets = higher recall and
    more candidates; ``seeds=[s0, s1, ...]`` unions candidates from one
    independent signature per seed (all from the SAME flat pass), so a
    true pair split by an unlucky hyperplane in one signature is caught
    by another — recall is monotonically ≥ the single-seed run. Candidate
    self-joins ship only (sig, id) per seed; pairs are deduped BEFORE the
    one verify join, so each pair pays the exact-cosine check once.
    """
    multi = seeds is not None and len(seeds) > 1
    use_seeds = seeds if seeds is not None else [seed]
    s = embedding_scores(
        df, None, id_col, vec_col, n_bits=n_bits,
        seed=use_seeds[0], seeds=use_seeds if multi else None,
        keep_quant=True, dims=dims,
    ).localCheckpoint()  # signatures feed self-joins: materialize once (perf trap #2)
    thr = int(threshold * COS_SCALE)

    def pairs_for(sig_col: str) -> DataFrame:
        a = s.select(F.col(sig_col).alias("_s"), F.col(id_col).alias("id_a"))
        b = s.select(F.col(sig_col).alias("_s"), F.col(id_col).alias("id_b"))
        return a.join(b, "_s").filter(F.col("id_a") < F.col("id_b")).select("id_a", "id_b")

    if multi:
        cand = pairs_for("sig_0")
        for j in range(1, len(use_seeds)):
            cand = cand.unionByName(pairs_for(f"sig_{j}"))
        cand = cand.distinct()
    else:
        cand = pairs_for("sig")
    qa = s.select(F.col(id_col).alias("id_a"), F.col("q").alias("q_a"), F.col("n2").alias("n2_a"))
    qb = s.select(F.col(id_col).alias("id_b"), F.col("q").alias("q_b"), F.col("n2").alias("n2_b"))
    return (
        cand.join(qa, "id_a")
        .join(qb, "id_b")
        .select(
            "id_a", "id_b",
            pair_cos_q(F.col("q_a"), F.col("n2_a"), F.col("q_b"), F.col("n2_b")).alias("cos_q"),
        )
        .filter(F.col("cos_q") >= thr)
    )


def _rank_hash(id_col: Column, seed: int) -> Column:
    """Portable deterministic rank for sampling: 60-bit md5 prefix of
    "id:seed" — identical in DuckDB as ('0x'||substr(md5(...),1,15))::BIGINT."""
    return F.conv(
        F.substring(F.md5(F.concat(id_col.cast("string"), F.lit(f":{seed}"))), 1, 15), 16, 10
    ).cast("long")


def ann_lsh_persist(
    df: DataFrame,
    root: str,
    n_bits: int = 16,
    bands: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
    dims: int | None = None,
) -> None:
    """Materialize the LSH index ``ann_lsh_topk``'s docstring promises:
    ``<root>/vectors`` — (id, sig, n2, q) for hamming-filter + exact
    re-rank from STORED data; ``<root>/bands`` — the banded signature in
    long form (one row per (band_idx, band_val, id)), PARTITIONED BY
    (band_idx, band_val) so a query probes exactly ``bands`` partition
    directories. Size bands so band_val's arity stays in the thousands
    (n_bits/bands bits per band → 2^(n_bits/bands) directories per band).
    """
    if n_bits % bands:
        raise ValueError(f"bands={bands} must divide n_bits={n_bits}")
    rb = n_bits // bands
    s = embedding_scores(
        df, None, id_col, vec_col, n_bits=n_bits, seed=seed, keep_quant=True, dims=dims
    ).localCheckpoint()  # feeds two writes; don't run the scoring pass twice
    s.select(id_col, "sig", "n2", "q").write.mode("overwrite").parquet(f"{root}/vectors")
    banded = s.select(
        id_col,
        F.posexplode(
            F.array(*[F.shiftrightunsigned(F.col("sig"), b * rb).bitwiseAND(F.lit((1 << rb) - 1)) for b in range(bands)])
        ).alias("band_idx", "band_val"),
    )
    (
        banded.repartition("band_idx", "band_val")
        .write.mode("overwrite")
        .partitionBy("band_idx", "band_val")
        .parquet(f"{root}/bands")
    )


def ann_lsh_topk_stored(
    spark,
    root: str,
    query: list[float],
    k: int = 10,
    n_bits: int = 16,
    bands: int = 4,
    max_hamming: int = 2,
    seed: int = 7,
    id_col: str = "vec_id",
    probe_hamming: int = 0,
) -> DataFrame:
    """Probe a persisted LSH index (``ann_lsh_persist``): read the
    partition directories matching the query signature's band values
    (partition pruning — the scan's PartitionFilters carry
    (band_idx, band_val)), hamming-filter the collided candidates against
    the stored signature, exact quantized-cosine re-rank from the stored
    components. The original vector table is never touched.

    ``probe_hamming`` is multi-probe LSH (the public Lv et al. idea re-
    expressed over the partitioned layout): besides each band's exact
    value, also probe every band value within hamming ``probe_hamming``
    of it — recall rises with NO extra stored data, only more partition
    directories read (per band: 1 → 1 + C(rb,1) [+ C(rb,2)] for
    probe_hamming 0/1/2, rb = n_bits/bands bits per band).

    Exact-equivalent to the one-shot ``ann_lsh_topk`` whenever
    ``max_hamming < bands × (probe_hamming + 1)``: pigeonhole — a
    signature within total hamming h of the query has SOME band carrying
    at most floor(h/bands) of those flips, and that band's value is
    within ``probe_hamming`` of the query's once floor(h/bands) ≤
    probe_hamming. At probe_hamming=0 this is the old ``< bands`` bound;
    probe_hamming=1 with 4 bands makes hamming-7 filtering lossless.
    Beyond the bound it is genuinely approximate (documented recall/cost
    trade, like every banded LSH)."""
    if n_bits % bands:
        raise ValueError(f"bands={bands} must divide n_bits={n_bits}")
    if not 0 <= probe_hamming <= 2:
        raise ValueError(f"probe_hamming must be 0, 1 or 2, got {probe_hamming}")
    rb = n_bits // bands
    qsig = hyperplane_signature_py(query, len(query), n_bits, seed)
    cond = None
    for b in range(bands):
        v = (qsig >> (b * rb)) & ((1 << rb) - 1)
        vals = {v}
        if probe_hamming >= 1:
            vals |= {v ^ (1 << i) for i in range(rb)}
        if probe_hamming >= 2:
            vals |= {v ^ (1 << i) ^ (1 << j) for i in range(rb) for j in range(i + 1, rb)}
        c = (F.col("band_idx") == b) & (F.col("band_val").isin(sorted(vals)))
        cond = c if cond is None else (cond | c)
    cand_ids = spark.read.parquet(f"{root}/bands").filter(cond).select(id_col).distinct()
    vecs = spark.read.parquet(f"{root}/vectors").join(cand_ids, id_col)
    vecs = vecs.filter(F.bit_count(F.col("sig").bitwiseXOR(F.lit(qsig))) <= max_hamming)
    qarr = F.array(*[F.lit(v) for v in quant_py(query)])
    dot = F.aggregate(
        F.zip_with("q", qarr, lambda x, y: x * y), F.lit(0).cast("long"), lambda a, v: a + v
    )
    return (
        vecs.select(F.col(id_col), cos_q_expr(dot, F.col("n2"), F.lit(_query_n2(query))).alias("cos_q"))
        .orderBy(F.desc("cos_q"), id_col)
        .limit(k)
    )


# When n_lists exceeds this, ivf_assign/ivf_topk switch from inline
# centroid literals (n_lists×dims literals + n_lists SUMs in ONE
# aggregation — fastest, but the expression tree grows past codegen
# comfort at real IVF scale) to a broadcast-joined centroid-component
# table (plan size O(1) in n_lists; same FLOPs, done in join+agg rows).
INLINE_CENTROID_LIMIT = 64


def _pick_centroids(
    df: DataFrame, n_lists: int, id_col: str, vec_col: str, seed: int
) -> tuple[DataFrame, list[tuple[int, list[int], int]]]:
    """Deterministic centroid pick: the n_lists rows with the lowest
    md5-derived rank hash (a seeded uniform sample — no iterative k-means
    needed for a partitioning that balances list sizes).

    ``orderBy(hash).limit(n)`` compiles to TakeOrdered (per-partition
    heaps); the row_number window runs over the n_lists winners only,
    NEVER the full table. Returns (centroids(list_id, q, n2) DF, and the
    collected [(list_id, qvec, n2)] — n_lists rows, the one documented
    driver-side collect in this module)."""
    picked = (
        df.select(F.col(id_col), F.col(vec_col), _rank_hash(F.col(id_col), seed).alias("_rk"))
        .orderBy("_rk", id_col)
        .limit(n_lists)
    )
    w = Window.orderBy("_rk", id_col)
    cents_rows = picked.select(
        (F.row_number().over(w) - 1).alias("list_id"),
        quant(F.col(vec_col)).alias("q"),
    ).withColumn(
        "n2", F.aggregate(F.transform("q", lambda v: v * v), F.lit(0).cast("long"), lambda a, v: a + v)
    )
    cent_local = sorted((int(r.list_id), list(r.q), int(r.n2)) for r in cents_rows.collect())
    return cents_rows, cent_local


def _rank_lists(cent_local: list[tuple[int, list[int], int]], query: list[float]) -> list[int]:
    """List ids ordered by centroid-vs-query quantized cosine, best first —
    driver-side over n_lists rows (tiny)."""
    qq = quant_py(query)
    qn2 = _query_n2(query)
    ranked = sorted(
        (
            -math.floor(
                sum(a * b for a, b in zip(cv, qq)) / (math.sqrt(n2) * math.sqrt(qn2)) * COS_SCALE
            ),
            lid,
        )
        for lid, cv, n2 in cent_local
    )
    return [lid for _, lid in ranked]


def _assign_inline(
    df: DataFrame,
    cent_local: list[tuple[int, list[int], int]],
    query: list[float] | None,
    id_col: str,
    vec_col: str,
    keep_quant: bool,
) -> DataFrame:
    """(id, list_id, n2[, dot][, q]) via inline centroid literals — one
    flat aggregation, n_lists extra SUMs per exploded row."""
    cvecs = [qv for _, qv, _ in cent_local]
    cn2 = [n2 for _, _, n2 in cent_local]
    s = embedding_scores(df, query, id_col, vec_col, centroids=cvecs, keep_quant=keep_quant)
    # argmax over quantized cosines; exact integer/rounded-double math, so
    # the tie-break (lowest list_id) is deterministic cross-run
    best = F.array_max(
        F.array(
            *[
                F.struct(
                    cos_q_expr(F.col(f"dot_c{k}"), F.col("n2"), F.lit(cn2[k])).alias("sim"),
                    F.lit(-k).alias("neg_list_id"),
                )
                for k in range(len(cvecs))
            ]
        )
    )
    keep = [F.col(id_col), (-best["neg_list_id"]).cast("int").alias("list_id"), F.col("n2")]
    if query is not None:
        keep.append(F.col("dot"))
    if keep_quant:
        keep.append(F.col("q"))
    return s.select(*keep)


def _assign_join(
    df: DataFrame,
    cent_local: list[tuple[int, list[int], int]],
    query: list[float] | None,
    id_col: str,
    vec_col: str,
    keep_quant: bool,
) -> DataFrame:
    """Same output as ``_assign_inline`` but the centroids live in a
    broadcast (list_id, idx, cval) table joined against the exploded
    components — plan size O(1) in n_lists, so it survives thousands of
    lists where the literal expression tree would hit codegen limits.
    Same total multiply-adds; two key-partitioned aggregations instead of
    one (map-side combine collapses the dims×n_lists join output before
    each shuffle)."""
    spark = df.sparkSession
    cn2_by_list = {lid: n2 for lid, _, n2 in cent_local}
    cent_tbl = spark.createDataFrame(
        [(lid, i, v) for lid, cv, _ in cent_local for i, v in enumerate(cv)],
        "list_id int, _i int, cval long",
    )
    ex = _exploded_quant(df, id_col, vec_col)
    per_id_aggs = [F.sum(F.col("_q") * F.col("_q")).alias("n2")]
    if query is not None:
        qlit = F.element_at(F.array(*[F.lit(v) for v in quant_py(query)]), F.col("_i") + 1)
        per_id_aggs.append(F.sum(F.col("_q") * qlit).alias("dot"))
    if keep_quant:
        per_id_aggs.append(_collect_quant())
    per_id = ex.groupBy(id_col).agg(*per_id_aggs)
    dots = (
        ex.join(F.broadcast(cent_tbl), "_i")
        .groupBy(id_col, "list_id")
        .agg(F.sum(F.col("_q") * F.col("cval")).alias("dot_c"))
    )
    # centroid n2 by list: O(n_lists) literals, not O(n_lists×dims)
    cn2_arr = F.array(*[F.lit(cn2_by_list[lid]) for lid in sorted(cn2_by_list)])
    scored = dots.join(per_id.select(id_col, "n2"), id_col).withColumn(
        "sim", cos_q_expr(F.col("dot_c"), F.col("n2"), F.element_at(cn2_arr, F.col("list_id") + 1))
    )
    best = (
        scored.groupBy(id_col)
        .agg(F.max(F.struct(F.col("sim"), (-F.col("list_id")).alias("neg_list_id"))).alias("_m"))
        .select(id_col, (-F.col("_m.neg_list_id")).cast("int").alias("list_id"))
    )
    return best.join(per_id, id_col)


def _refine_centroids_once(
    df: DataFrame,
    cent_local: list[tuple[int, list[int], int]],
    id_col: str,
    vec_col: str,
    centroid_join: bool | None,
) -> list[tuple[int, list[int], int]]:
    """One Lloyd iteration, DataFrame-native: assign every vector to its
    nearest current centroid (the existing inline/join path), then the new
    centroid is the per-list per-component mean — computed as exact
    integer floor(Σq / n) from ONE groupBy(list_id, _i) over the exploded
    frame (sums of |q|≤1e6 components stay < 2^63 up to ~9e12 rows per
    list). The n_lists×dims mean rows are collected to the driver — the
    same order of driver-side data as the centroid table itself (the one
    documented collect in this module). A list that lost all members keeps
    its previous centroid, so n_lists never shrinks and the pick stays
    deterministic."""
    use_join = centroid_join if centroid_join is not None else len(cent_local) > INLINE_CENTROID_LIMIT
    assign = _assign_join if use_join else _assign_inline
    assigned = assign(df, cent_local, None, id_col, vec_col, keep_quant=False).select(
        id_col, "list_id"
    )
    sums = (
        _exploded_quant(df, id_col, vec_col)
        .join(assigned, id_col)
        .groupBy("list_id", "_i")
        .agg(F.sum("_q").alias("_s"), F.count("*").alias("_c"))
    )
    dims = len(cent_local[0][1])
    by_list: dict[int, list[int]] = {}
    for r in sums.collect():
        by_list.setdefault(int(r["list_id"]), [0] * dims)[int(r["_i"])] = int(r["_s"]) // int(r["_c"])
    out = []
    for lid, old_q, _ in cent_local:
        q = by_list.get(lid, old_q)
        out.append((lid, q, sum(v * v for v in q)))
    return out


def ivf_assign(
    df: DataFrame,
    n_lists: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 13,
    keep_quant: bool = False,
    centroid_join: bool | None = None,
    refine_iters: int = 0,
) -> tuple[DataFrame, DataFrame]:
    """IVF coarse quantizer: pick n_lists centroids deterministically,
    assign every vector to its nearest centroid by quantized cosine.
    Returns (centroids(list_id, q, n2), assigned(id, list_id, n2[, q])).

    ``centroid_join=None`` (auto) uses inline centroid literals up to
    ``INLINE_CENTROID_LIMIT`` lists (fastest; measured round 2) and the
    broadcast-joined centroid table beyond (plan size O(1) in n_lists —
    the literal form is n_lists×dims literals in one expression tree,
    which stops being a plan at real IVF scale). ``keep_quant`` carries
    the quantized component array into the assignment — what
    ``ivf_persist`` stores so probes re-rank without the original table.

    ``refine_iters=N`` runs N Lloyd rounds (assign → per-list mean →
    re-assign) before the final assignment: a seeded uniform sample is an
    unbiased but unrefined quantizer, and on CLUSTERED embedding
    distributions (the realistic case) unlucky picks skew list sizes and
    nprobe recall; each refinement round moves centroids toward their
    members' mean, balancing lists (tested: strict skew reduction +
    recall ≥ unrefined on a clustered fixture). Everything stays
    deterministic: exact integer means, seeded pick, default 0 keeps the
    round-3 behavior (q46's oracle twin)."""
    cents_rows, cent_local = _pick_centroids(df, n_lists, id_col, vec_col, seed)
    for _ in range(refine_iters):
        cent_local = _refine_centroids_once(df, cent_local, id_col, vec_col, centroid_join)
    if refine_iters:
        cents_rows = df.sparkSession.createDataFrame(
            cent_local, "list_id int, q array<bigint>, n2 bigint"
        )
    use_join = centroid_join if centroid_join is not None else len(cent_local) > INLINE_CENTROID_LIMIT
    assign = _assign_join if use_join else _assign_inline
    return cents_rows, assign(df, cent_local, None, id_col, vec_col, keep_quant)


def ivf_persist(
    df: DataFrame,
    root: str,
    n_lists: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 13,
    centroid_join: bool | None = None,
    refine_iters: int = 0,
) -> None:
    """Materialize the IVF index: ``<root>/centroids`` (n_lists rows) and
    ``<root>/assigned`` — (id, n2, q) PARTITIONED BY list_id, so a probe
    of nprobe lists is partition PRUNING at the file listing, never a scan
    of the other n_lists-nprobe partitions. This is the at-scale shape
    oval models with prefix-scoped LIST (never scan what you can prune,
    ``internal/s3client/s3client.go:253-275``): assignment cost is paid
    once per corpus, probes touch only the data they rank."""
    cents_rows, assigned = ivf_assign(
        df, n_lists, id_col, vec_col, seed, keep_quant=True, centroid_join=centroid_join,
        refine_iters=refine_iters,
    )
    cents_rows.write.mode("overwrite").parquet(f"{root}/centroids")
    (
        assigned.repartition("list_id")
        .write.mode("overwrite")
        .partitionBy("list_id")
        .parquet(f"{root}/assigned")
    )


def ivf_topk_assigned(
    spark,
    root: str,
    query: list[float],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
) -> DataFrame:
    """Probe a persisted IVF index (``ivf_persist``): rank lists against
    the query driver-side from the tiny centroids table, read ONLY the
    nprobe matching partitions of the assigned table (partition pruning —
    the plan's PartitionFilters carry list_id, asserted by
    tests/test_plan_shape.py), re-rank by exact quantized cosine from the
    STORED (q, n2) — the original vector table is never touched."""
    cents = spark.read.parquet(f"{root}/centroids")
    cent_local = sorted((int(r.list_id), list(r.q), int(r.n2)) for r in cents.collect())
    probe = _rank_lists(cent_local, query)[:nprobe]
    qn2 = _query_n2(query)
    qarr = F.array(*[F.lit(v) for v in quant_py(query)])
    cand = spark.read.parquet(f"{root}/assigned").filter(
        F.col("list_id").isin(*[int(x) for x in probe])
    )
    dot = F.aggregate(
        F.zip_with("q", qarr, lambda x, y: x * y), F.lit(0).cast("long"), lambda a, v: a + v
    )
    return (
        cand.select(F.col(id_col), cos_q_expr(dot, F.col("n2"), F.lit(qn2)).alias("cos_q"))
        .orderBy(F.desc("cos_q"), id_col)
        .limit(k)
    )


def ivf_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    n_lists: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 13,
    centroid_join: bool | None = None,
) -> DataFrame:
    """Single-shot IVF approximate top-k (assignment + probe in one job):
    rank centroids by quantized cosine to the query, keep only vectors
    assigned to the nprobe nearest lists, quantized-cosine re-rank.
    For repeated queries over one corpus use ``ivf_persist`` +
    ``ivf_topk_assigned`` — assignment there is paid once and each probe
    is partition pruning instead of a full-corpus assignment pass."""
    _, cent_local = _pick_centroids(df, n_lists, id_col, vec_col, seed)
    probe = set(_rank_lists(cent_local, query)[:nprobe])
    use_join = centroid_join if centroid_join is not None else len(cent_local) > INLINE_CENTROID_LIMIT
    assign = _assign_join if use_join else _assign_inline
    s = assign(df, cent_local, query, id_col, vec_col, keep_quant=False)
    qn2 = _query_n2(query)
    return (
        s.filter(F.col("list_id").isin(*[int(x) for x in probe]))
        .select(F.col(id_col), cos_q_expr(F.col("dot"), F.col("n2"), F.lit(qn2)).alias("cos_q"))
        .orderBy(F.desc("cos_q"), id_col)
        .limit(k)
    )
