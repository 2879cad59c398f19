"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: the exactness baseline. Dot products via
  ``F.zip_with`` + ``F.aggregate`` — pure columnar JVM math, one narrow
  pass + a top-k (TakeOrdered, no full sort).
- LSH-bucketed ANN: random-hyperplane signatures (hyperplane components
  derived from xxhash64, so the "random" planes are deterministic and need
  no driver-side state or broadcast), bucket equi-join, exact re-rank
  inside buckets. The scale path: candidate count drops exponentially
  with signature bits while recall is tunable via multiple tables.
- integer-quantized dot product: floor(x*1e6) BIGINT math — bit-exact
  across engines, used for the DuckDB-oracle-checked variant.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql.window import Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine to a constant query vector. orderBy+limit
    compiles to TakeOrdered — per-partition heaps, no global sort."""
    q = F.array(*[F.lit(float(x)) for x in query])
    scored = df.select(F.col(id_col), cosine(F.col(vec_col), q).alias("cos_sim"))
    return scored.orderBy(F.desc("cos_sim"), id_col).limit(k)


def int_dot_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1_000_000,
) -> DataFrame:
    """Top-k by integer-quantized dot product: floor(x*1e6) per component,
    BIGINT products — bit-identical in any engine (the oracle variant).
    Ranking matches exact dot product up to quantization error."""
    qi = [int(__import__("math").floor(x * scale)) for x in query]
    q = F.array(*[F.lit(v) for v in qi])
    vi = F.transform(F.col(vec_col), lambda x: F.floor(x.cast("double") * scale).cast("long"))
    dot = F.aggregate(F.zip_with(vi, q, lambda x, y: x * y), F.lit(0).cast("long"), lambda a, v: a + v)
    return df.select(F.col(id_col), dot.alias("dot_q")).orderBy(F.desc("dot_q"), id_col).limit(k)


def hyperplane_signature(vec: Column, n_bits: int = 16, seed: int = 7) -> Column:
    """Deterministic random-hyperplane LSH signature as a long.

    Plane p's component for dimension d is ±1 chosen by xxhash64(p, d,
    seed) — no materialized plane matrix, identical on every executor.
    bit p = 1 iff sum_d (±1 * vec[d]) > 0.
    """
    bits = [
        (
            F.aggregate(
                F.zip_with(
                    vec,
                    F.sequence(F.lit(0), F.size(vec) - 1),
                    lambda x, d: F.when(F.pmod(F.xxhash64(F.lit(p), d, F.lit(seed)), F.lit(2)) == 0, x).otherwise(-x),
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            > 0
        ).cast("long")
        * (1 << p)
        for p in range(n_bits)
    ]
    sig = bits[0]
    for b in bits[1:]:
        sig = sig + b
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
    """Approximate top-k: restrict exact cosine to vectors whose hyperplane
    signature is within ``max_hamming`` bits of the query's, then re-rank.
    At scale the signature is precomputed once (a column in the table) and
    the candidate filter is a bucket join instead of bit_count — this
    single-query form shows the operator shape."""
    q = F.array(*[F.lit(float(x)) for x in query])
    sig = hyperplane_signature(F.col(vec_col), n_bits, seed)
    qsig = hyperplane_signature(q, n_bits, seed)
    cands = df.select(F.col(id_col), F.col(vec_col), sig.alias("sig"), qsig.alias("qsig")).filter(
        F.bit_count(F.col("sig").bitwiseXOR(F.col("qsig"))) <= max_hamming
    )
    return (
        cands.select(F.col(id_col), cosine(F.col(vec_col), q).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), id_col)
        .limit(k)
    )


def near_duplicates_cosine(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bits: int = 16,
    seed: int = 7,
) -> DataFrame:
    """Embedding near-dup pairs: exact-signature bucket self-join (vectors
    this similar almost surely share all n_bits), exact cosine verify.
    Returns (id_a, id_b, cos_sim) with id_a < id_b."""
    sig = df.select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"), hyperplane_signature(F.col(vec_col), n_bits, seed).alias("_sig")
    )
    a = sig.select(F.col("_sig"), F.col("_id").alias("id_a"), F.col("_v").alias("v_a"))
    b = sig.select(F.col("_sig"), F.col("_id").alias("id_b"), F.col("_v").alias("v_b"))
    pairs = a.join(b, "_sig").filter(F.col("id_a") < F.col("id_b"))
    return pairs.select("id_a", "id_b", cosine(F.col("v_a"), F.col("v_b")).alias("cos_sim")).filter(
        F.col("cos_sim") >= threshold
    )


def ivf_assign(
    df: DataFrame,
    n_lists: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 13,
) -> tuple[DataFrame, DataFrame]:
    """IVF coarse quantizer: pick n_lists centroid vectors
    deterministically (the rows whose xxhash64(id) ranks lowest — a seeded
    uniform sample, no iterative k-means needed for a partitioning that
    balances list sizes), assign every vector to its nearest centroid by
    cosine. Returns (centroids(list_id, centroid), assigned(df + list_id)).

    Scale shape: centroids are tiny and broadcast; assignment is one
    narrow pass computing n_lists dot products per row (argmax via
    array of structs + array_max). At query time only nprobe lists are
    scanned — the classic inverted-file ANN layout, with the assignment
    stored as a partition column so list probes become partition pruning.
    """
    w = Window.orderBy(F.xxhash64(F.col(id_col), F.lit(seed)))
    cents = (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= n_lists)
        .select((F.col("_rk") - 1).alias("list_id"), F.col(vec_col).alias("centroid"))
    )
    cent_arr = F.broadcast(cents.groupBy().agg(
        F.sort_array(F.collect_list(F.struct("list_id", "centroid"))).alias("cents")
    ))
    scored = df.crossJoin(cent_arr).select(
        F.col(id_col),
        F.col(vec_col),
        F.array_max(
            F.transform(
                F.col("cents"),
                lambda c: F.struct(
                    cosine(F.col(vec_col), c["centroid"]).alias("sim"), c["list_id"].alias("list_id")
                ),
            )
        )["list_id"].alias("list_id"),
    )
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
    """IVF approximate top-k: rank centroids by similarity to the query,
    scan only the nprobe nearest lists, exact cosine re-rank inside them.
    Single-query demonstration form; at scale the assignment is
    precomputed once (``ivf_assign``) and persisted partitioned by
    list_id so a probe is partition pruning, not a scan."""
    q = F.array(*[F.lit(float(x)) for x in query])
    cents, assigned = ivf_assign(df, n_lists, id_col, vec_col, seed)
    probe = (
        cents.select("list_id", cosine(F.col("centroid"), q).alias("sim"))
        .orderBy(F.desc("sim"), "list_id")
        .limit(nprobe)
        .select("list_id")
    )
    cands = assigned.join(F.broadcast(probe), "list_id")
    return (
        cands.select(F.col(id_col), cosine(F.col(vec_col), q).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), id_col)
        .limit(k)
    )
