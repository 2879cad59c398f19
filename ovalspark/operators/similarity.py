"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: the exactness baseline. Dot products via
  ``F.zip_with`` + ``F.aggregate`` — pure columnar JVM math, one narrow
  pass + a top-k (TakeOrdered, no full sort).
- LSH-bucketed ANN: random-hyperplane signatures, bucket/hamming candidate
  filter, exact re-rank inside buckets. The scale path: candidate count
  drops exponentially with signature bits while recall is tunable.
- IVF: deterministic centroid pick (TakeOrdered on a content hash — NOT a
  global window), broadcast centroids, nearest-centroid assignment, probe
  only nprobe lists at query time.

Cross-engine exactness (the DuckDB-oracle contract): every *ranking* value
in the oracle-checked operators is computed over the QUANTIZED UNIT vector
``u_i = floor( q_i / sqrt(sum q^2) * 1e6 )`` where ``q_i = floor(x_i*1e6)``
is an exact int64. Each step is deterministic IEEE-754: int→double is exact
below 2^53, sqrt and division are correctly rounded, and integer dot
products of the results stay below 2^53 so even a DOUBLE-summing engine
(DuckDB's list_sum) reproduces them bit-exactly. Hyperplane signs come from
md5 (not xxhash64) so the "random" planes are derivable in any engine.

The float-valued ``cosine``/``cosine_topk`` remain for users who want the
real number; rankings agree with the quantized twin up to ~1e-6 ties.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

Q_SCALE = 1_000_000  # component quantization — also the unit-vector scale
COS_SCALE = Q_SCALE * Q_SCALE  # quantized cosine ≈ cos * 1e12


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def quantized_unit(vec: Column, scale: int = Q_SCALE) -> Column:
    """Engine-exact quantized unit vector (array<long>) — see module doc.

    u_i = floor( q_i / sqrt(sum_j q_j^2) * scale ),  q_i = floor(x_i*scale).
    Every arithmetic step is deterministic IEEE-754, so Spark and DuckDB
    produce identical integers for identical input floats.
    """
    qi = F.transform(vec, lambda x: F.floor(x.cast("double") * scale).cast("long"))
    n2 = F.aggregate(F.transform(qi, lambda v: v * v), F.lit(0).cast("long"), lambda a, v: a + v)
    nrm = F.sqrt(n2.cast("double"))
    return F.transform(qi, lambda v: F.floor(v.cast("double") / nrm * scale).cast("long"))


def quantized_unit_py(vec: list[float], scale: int = Q_SCALE) -> list[int]:
    """Driver-side twin of ``quantized_unit`` for constant query vectors —
    same arithmetic, so literals it produces match the column expression."""
    import math

    qi = [math.floor(float(x) * scale) for x in vec]
    nrm = math.sqrt(float(sum(v * v for v in qi)))
    return [math.floor(v / nrm * scale) for v in qi]


def int_dot(a: Column, b: Column) -> Column:
    """Exact int64 dot product of two array<long> columns."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("long"), lambda acc, v: acc + v)


def cosine_q(a_vec: Column, b_unit: Column) -> Column:
    """Quantized cosine (≈ cos·1e12) of a raw float vector against a
    precomputed quantized unit vector — engine-exact int64."""
    return int_dot(quantized_unit(a_vec), b_unit)


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
    quantization ties. Same TakeOrdered physical shape."""
    qu = F.array(*[F.lit(v) for v in quantized_unit_py(query)])
    scored = df.select(F.col(id_col), cosine_q(F.col(vec_col), qu).alias("cos_q"))
    return scored.orderBy(F.desc("cos_q"), id_col).limit(k)


def int_dot_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = Q_SCALE,
) -> DataFrame:
    """Top-k by integer-quantized dot product: floor(x*1e6) per component,
    BIGINT products — bit-identical in any engine (the oracle variant).
    Ranking matches exact dot product up to quantization error."""
    qi = [int(__import__("math").floor(x * scale)) for x in query]
    q = F.array(*[F.lit(v) for v in qi])
    vi = F.transform(F.col(vec_col), lambda x: F.floor(x.cast("double") * scale).cast("long"))
    dot = F.aggregate(F.zip_with(vi, q, lambda x, y: x * y), F.lit(0).cast("long"), lambda a, v: a + v)
    return df.select(F.col(id_col), dot.alias("dot_q")).orderBy(F.desc("dot_q"), id_col).limit(k)


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


def hyperplane_signature_q(vec: Column, dims: int, n_bits: int = 16, seed: int = 7) -> Column:
    """Random-hyperplane LSH signature as a long, computed over the exact
    quantized int components so the sign of each projection — and therefore
    the signature — is engine-exact (no float-accumulation-order hazard).

    bit p = 1  iff  sum_d signs[p][d] * floor(vec[d]*1e6) > 0.
    """
    signs = hyperplane_signs(n_bits, dims, seed)
    qi = F.transform(vec, lambda x: F.floor(x.cast("double") * Q_SCALE).cast("long"))
    sig = F.lit(0).cast("long")
    for p in range(n_bits):
        s = F.array(*[F.lit(v) for v in signs[p]])
        proj = int_dot(qi, s)
        sig = sig + (proj > 0).cast("long") * (1 << p)
    return sig


def hyperplane_signature_py(vec: list[float], dims: int, n_bits: int = 16, seed: int = 7) -> int:
    """Driver-side twin of ``hyperplane_signature_q`` for query vectors."""
    import math

    signs = hyperplane_signs(n_bits, dims, seed)
    qi = [math.floor(float(x) * Q_SCALE) for x in vec]
    sig = 0
    for p in range(n_bits):
        if sum(s * v for s, v in zip(signs[p], qi)) > 0:
            sig |= 1 << p
    return sig


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
    """Approximate top-k: restrict the exact quantized-cosine re-rank to
    vectors whose hyperplane signature is within ``max_hamming`` bits of
    the query's. The query signature is a driver-computed constant, so the
    candidate filter is one codegen'd bit_count predicate per row. At scale
    the row signature is precomputed once (a stored column) and the filter
    becomes a bucket join on banded signature prefixes."""
    dims = len(query)
    qsig = hyperplane_signature_py(query, dims, n_bits, seed)
    qu = F.array(*[F.lit(v) for v in quantized_unit_py(query)])
    sig = hyperplane_signature_q(F.col(vec_col), dims, n_bits, seed)
    cands = df.select(F.col(id_col), F.col(vec_col), sig.alias("sig")).filter(
        F.bit_count(F.col("sig").bitwiseXOR(F.lit(qsig))) <= max_hamming
    )
    return (
        cands.select(F.col(id_col), cosine_q(F.col(vec_col), qu).alias("cos_q"))
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
) -> DataFrame:
    """Embedding near-dup pairs: exact-signature bucket self-join (vectors
    this similar almost surely share all n_bits — the recall/cost tradeoff
    is n_bits; multiple seeds would raise recall), quantized-cosine verify.
    Returns (id_a, id_b, cos_q) with id_a < id_b; cos_q ≈ cos·1e12."""
    if dims is None:
        first = df.select(F.size(vec_col).alias("d")).first()
        dims = int(first.d) if first else 0
    sig = df.select(
        F.col(id_col).alias("_id"),
        quantized_unit(F.col(vec_col)).alias("_u"),
        hyperplane_signature_q(F.col(vec_col), dims, n_bits, seed).alias("_sig"),
    )
    a = sig.select(F.col("_sig"), F.col("_id").alias("id_a"), F.col("_u").alias("u_a"))
    b = sig.select(F.col("_sig"), F.col("_id").alias("id_b"), F.col("_u").alias("u_b"))
    pairs = a.join(b, "_sig").filter(F.col("id_a") < F.col("id_b"))
    thr = int(threshold * COS_SCALE)
    return pairs.select("id_a", "id_b", int_dot(F.col("u_a"), F.col("u_b")).alias("cos_q")).filter(
        F.col("cos_q") >= thr
    )


def _rank_hash(id_col: Column, seed: int) -> Column:
    """Portable deterministic rank for sampling: 60-bit md5 prefix of
    "id:seed" — identical in DuckDB as ('0x'||substr(md5(...),1,15))::BIGINT."""
    return F.conv(
        F.substring(F.md5(F.concat(id_col.cast("string"), F.lit(f":{seed}"))), 1, 15), 16, 10
    ).cast("long")


def ivf_assign(
    df: DataFrame,
    n_lists: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 13,
) -> tuple[DataFrame, DataFrame]:
    """IVF coarse quantizer: pick n_lists centroid vectors deterministically
    (the rows whose md5-derived rank hash is lowest — a seeded uniform
    sample; no iterative k-means needed for a partitioning that balances
    list sizes), assign every vector to its nearest centroid by quantized
    cosine. Returns (centroids(list_id, centroid), assigned(df + list_id)).

    Scale shape: the centroid pick is ``orderBy(hash).limit(n)`` —
    TakeOrdered with per-partition heaps, NEVER a global single-task window
    (only the n_lists winners ever meet in one place, and the subsequent
    row_number window runs over those n_lists rows, not the table).
    Centroids are tiny and broadcast; assignment is one narrow pass with
    n_lists dot products per row (argmax via array_max of structs). At
    query time only nprobe lists are scanned — the classic inverted-file
    layout, with the assignment stored as a partition column so list probes
    become partition pruning.
    """
    picked = (
        df.select(F.col(id_col), F.col(vec_col), _rank_hash(F.col(id_col), seed).alias("_rk"))
        .orderBy("_rk", id_col)
        .limit(n_lists)
    )
    # list_id by rank among the n_lists winners — window over n_lists rows
    w = Window.orderBy("_rk", id_col)
    cents = picked.select(
        (F.row_number().over(w) - 1).alias("list_id"),
        quantized_unit(F.col(vec_col)).alias("centroid_u"),
    )
    cent_arr = F.broadcast(
        cents.groupBy().agg(F.sort_array(F.collect_list(F.struct("list_id", "centroid_u"))).alias("cents"))
    )
    u = quantized_unit(F.col(vec_col))
    scored = df.crossJoin(cent_arr).select(
        F.col(id_col),
        F.col(vec_col),
        F.array_max(
            F.transform(
                F.col("cents"),
                lambda c: F.struct(
                    int_dot(u, c["centroid_u"]).alias("sim"),
                    (-c["list_id"]).alias("neg_list_id"),  # tie-break: lowest list_id wins
                ),
            )
        ).alias("_best"),
    ).select(id_col, vec_col, (-F.col("_best.neg_list_id")).cast("int").alias("list_id"))
    return cents, scored


def ivf_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    n_lists: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 13,
) -> DataFrame:
    """IVF approximate top-k: rank centroids by quantized cosine to the
    query, scan only the nprobe nearest lists, exact quantized-cosine
    re-rank inside them. Single-query demonstration form; at scale the
    assignment is precomputed once (``ivf_assign``) and persisted
    partitioned by list_id so a probe is partition pruning, not a scan."""
    qu = F.array(*[F.lit(v) for v in quantized_unit_py(query)])
    cents, assigned = ivf_assign(df, n_lists, id_col, vec_col, seed)
    probe = (
        cents.select("list_id", int_dot(F.col("centroid_u"), qu).alias("sim"))
        .orderBy(F.desc("sim"), "list_id")
        .limit(nprobe)
        .select("list_id")
    )
    cands = assigned.join(F.broadcast(probe), "list_id")
    return (
        cands.select(F.col(id_col), cosine_q(F.col(vec_col), qu).alias("cos_q"))
        .orderBy(F.desc("cos_q"), id_col)
        .limit(k)
    )
