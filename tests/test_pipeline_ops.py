"""Training-data pipeline operators: dedup, text analysis, similarity —
semantic tests on small controlled inputs (the DuckDB-oracle gate covers
cross-engine value equality; these cover behavior)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from ovalspark.operators.dedup import (
    exact_duplicates,
    minhash_duplicates,
    ngram_jaccard_pairs,
    simhash_fingerprints,
    simhash_near_duplicates,
    word_shingles,
)
from ovalspark.operators.similarity import (
    ann_lsh_topk,
    cosine_topk,
    int_dot_topk,
    near_duplicates_cosine,
)
from ovalspark.operators.text import predict_lang, quality_score, rolling_hash, text_profile


@pytest.fixture(scope="module")
def corpus(spark):
    base = "the quick brown fox jumps over the lazy dog and runs far away today"
    rows = [
        ("d1", base),
        ("d2", base),  # exact dup of d1
        ("d3", base.replace("lazy", "sleepy")),  # near dup (1 word)
        ("d4", "completely different text about spark query engines and shuffles here"),
        ("d5", "der hund und die katze ist der beste freund und das ist gut"),
        ("d6", "el gato que vive en la casa de los vecinos es muy bonito"),
    ]
    return spark.createDataFrame(rows, "doc_id string, text string").cache()


def test_exact_duplicates(corpus):
    dups = exact_duplicates(corpus).collect()
    assert len(dups) == 1 and dups[0].cnt == 2 and dups[0].min_id == "d1"


def test_minhash_finds_near_dups(corpus):
    pairs = {(r.id_a, r.id_b): r.jaccard for r in minhash_duplicates(corpus, jaccard_threshold=0.5).collect()}
    assert ("d1", "d2") in pairs and pairs[("d1", "d2")] == 1.0
    assert ("d1", "d3") in pairs and 0.5 < pairs[("d1", "d3")] < 1.0
    assert not any("d4" in p for p in pairs)


def test_ngram_jaccard_on_candidates(spark, corpus):
    cand = spark.createDataFrame([("d1", "d3"), ("d1", "d4")], "id_a string, id_b string")
    j = {(r.id_a, r.id_b): r.jaccard for r in ngram_jaccard_pairs(corpus, cand).collect()}
    assert j[("d1", "d3")] > 0.5 and j[("d1", "d4")] < 0.1


def test_simhash_near_dups(corpus):
    fps = {r.id: r.simhash for r in simhash_fingerprints(corpus).collect()}
    assert fps["d1"] == fps["d2"]
    pairs = {(r.id_a, r.id_b): r.hamming for r in simhash_near_duplicates(corpus, max_hamming=10).collect()}
    assert pairs[("d1", "d2")] == 0
    assert ("d1", "d3") in pairs  # near dup within a few bits


def test_simhash_flat_matches_udf(spark, corpus):
    """The SWAR JVM form and the pandas UDF must agree bit-for-bit,
    including the empty/null-text → fingerprint 0 edge."""
    from ovalspark.operators.dedup import simhash_fingerprints_flat

    edge = corpus.unionByName(
        spark.createDataFrame([("d7", ""), ("d8", None)], "doc_id string, text string")
    )
    from ovalspark.operators.dedup import simhash_fingerprints_joined

    udf = {r.id: r.simhash for r in simhash_fingerprints(edge).collect()}
    flat = {r.id: r.simhash for r in simhash_fingerprints_flat(edge).collect()}
    joined = {r.id: r.simhash for r in simhash_fingerprints_joined(edge).collect()}
    assert udf == flat == joined
    assert flat["d7"] == 0 and flat["d8"] == 0
    # all impls drive the same candidate pairs through the band join
    u = set((r.id_a, r.id_b) for r in simhash_near_duplicates(corpus, max_hamming=10, impl="udf").collect())
    f = set((r.id_a, r.id_b) for r in simhash_near_duplicates(corpus, max_hamming=10, impl="flat").collect())
    j = set((r.id_a, r.id_b) for r in simhash_near_duplicates(corpus, max_hamming=10, impl="joined").collect())
    assert u == f == j


def test_word_shingles_edgecases(spark):
    df = spark.createDataFrame([("one",), ("a b",), ("",)], "text string")
    got = df.select(word_shingles(F.col("text")).alias("sh")).collect()
    assert [len(r.sh) for r in got] == [0, 1, 0]


def test_cosine_and_int_dot_agree(spark):
    vecs = [(i, [float(i == j) * 2 + 0.1 * j for j in range(4)]) for i in range(20)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    q = vecs[3][1]
    exact = [r.vec_id for r in cosine_topk(df, q, k=1).collect()]
    assert exact == [3]
    dot = [r.vec_id for r in int_dot_topk(df, q, k=3).collect()]
    assert dot[0] == 3  # self has max dot with itself here


def test_ann_lsh_recall_vs_bruteforce(spark, small_world):
    """ANN top-10 must overlap heavily with exact top-10 on random-ish
    vectors derived from the generated world."""
    spec, _, docs, _ = small_world
    emb = docs.limit(200).select(
        F.col("doc_id").alias("vec_id"),
        F.transform(F.sequence(F.lit(0), F.lit(15)), lambda i: (F.pmod(F.xxhash64("doc_id", i), F.lit(1000)) / 500.0 - 1.0).cast("float")).alias("embedding"),
    ).cache()
    q = emb.first().embedding
    exact = [r.vec_id for r in cosine_topk(emb, list(q), k=10, id_col="vec_id").collect()]
    approx = [r.vec_id for r in ann_lsh_topk(emb, list(q), k=10, id_col="vec_id", n_bits=8, max_hamming=3).collect()]
    assert exact[0] == approx[0]  # the query vector itself
    assert len(set(exact) & set(approx)) >= 5


def test_near_duplicates_cosine(spark):
    rows = [(1, [1.0, 0.0, 0.0, 0.0]), (2, [0.999, 0.001, 0.0, 0.0]), (3, [0.0, 1.0, 0.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = near_duplicates_cosine(df, threshold=0.95, n_bits=8).collect()
    assert [(r.id_a, r.id_b) for r in pairs] == [(1, 2)]


def test_text_profile_and_lang(corpus):
    prof = {r.doc_id: r for r in text_profile(corpus).collect()}
    assert prof["d1"].n_tokens == 14
    assert prof["d1"].fingerprint == prof["d2"].fingerprint
    assert prof["d5"].pred_lang == "de" and prof["d6"].pred_lang == "es"
    assert prof["d1"].pred_lang == "en"
    assert all(0.0 <= r.quality <= 1.0 for r in prof.values())


def test_rolling_hash_order_sensitive(spark):
    df = spark.createDataFrame([("a b c",), ("c b a",), ("a b c",)], "text string")
    h = [r.rh for r in df.select(rolling_hash(F.col("text")).alias("rh")).collect()]
    assert h[0] == h[2] and h[0] != h[1]


def test_ivf_topk_recall(spark, small_world):
    """IVF with nprobe=4/16 lists recalls most of the exact top-10 and
    always finds the query vector itself."""
    from ovalspark.operators.similarity import ivf_assign, ivf_topk

    _, _, docs, _ = small_world
    emb = docs.limit(300).select(
        F.col("doc_id").alias("vec_id"),
        F.transform(F.sequence(F.lit(0), F.lit(15)), lambda i: (F.pmod(F.xxhash64("doc_id", i), F.lit(1000)) / 500.0 - 1.0).cast("float")).alias("embedding"),
    ).cache()
    cents, assigned = ivf_assign(emb, n_lists=16)
    assert cents.count() == 16
    assert assigned.count() == emb.count()
    sizes = [r["count"] for r in assigned.groupBy("list_id").count().collect()]
    assert max(sizes) < emb.count() * 0.5  # no degenerate single list

    q = emb.first().embedding
    from ovalspark.operators.similarity import cosine_topk
    exact = [r.vec_id for r in cosine_topk(emb, list(q), k=10, id_col="vec_id").collect()]
    approx = [r.vec_id for r in ivf_topk(emb, list(q), k=10, n_lists=16, nprobe=6).collect()]
    assert approx[0] == exact[0]
    assert len(set(exact) & set(approx)) >= 4


def _hash_embeddings(docs, n: int, dims: int = 16):
    return docs.limit(n).select(
        F.col("doc_id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dims - 1)),
            lambda i: (F.pmod(F.xxhash64("doc_id", i), F.lit(1000)) / 500.0 - 1.0).cast("float"),
        ).alias("embedding"),
    )


def test_multi_seed_near_dup_recall(spark):
    """Multi-seed signatures must recall at least as many true near-dup
    pairs as single-seed, and strictly more on this fixture: 60 planted
    pairs at cos≈0.997, where one 16-bit signature splits ~1/3 of the
    pairs (per-bit disagreement ≈ angle/π ≈ 2.5%, so P(all 16 agree) ≈
    0.66) and three independent seeds recover nearly all of them."""
    import numpy as np

    from ovalspark.operators.similarity import near_duplicates_cosine

    rng = np.random.default_rng(7)
    base = rng.normal(size=(60, 24))
    noisy = base + rng.normal(scale=0.08, size=base.shape)
    rows = [(f"v{i:03d}", base[i].tolist()) for i in range(60)] + [
        (f"w{i:03d}", noisy[i].tolist()) for i in range(60)
    ]
    df = spark.createDataFrame(rows, "vec_id string, embedding array<float>").cache()
    truth = {(f"v{i:03d}", f"w{i:03d}") for i in range(60)}

    def found(seeds):
        pairs = near_duplicates_cosine(df, threshold=0.95, n_bits=16, dims=24, seeds=seeds)
        return {(r.id_a, r.id_b) for r in pairs.collect()} & truth

    single = found([7])
    multi = found([7, 101, 202])
    assert single <= multi  # monotone: seed-7 candidates are a subset
    assert len(multi) > len(single)  # strict gain on this fixture
    assert len(multi) >= 50  # near-full recall with 3 seeds


def test_ivf_join_path_matches_inline(spark, small_world):
    """The broadcast-joined centroid path (the plan-size-safe form for
    n_lists past INLINE_CENTROID_LIMIT) must produce the identical
    assignment and the identical top-k as the inline-literal form."""
    from ovalspark.operators.similarity import ivf_assign, ivf_topk

    _, _, docs, _ = small_world
    emb = _hash_embeddings(docs, 300).cache()
    _, ai = ivf_assign(emb, n_lists=16, centroid_join=False)
    _, aj = ivf_assign(emb, n_lists=16, centroid_join=True)
    ai, aj = ai.select("vec_id", "list_id", "n2"), aj.select("vec_id", "list_id", "n2")
    assert ai.exceptAll(aj).count() == 0 and aj.exceptAll(ai).count() == 0

    q = list(emb.first().embedding)
    t_in = [(r.vec_id, r.cos_q) for r in ivf_topk(emb, q, k=10, n_lists=16, nprobe=6, centroid_join=False).collect()]
    t_jn = [(r.vec_id, r.cos_q) for r in ivf_topk(emb, q, k=10, n_lists=16, nprobe=6, centroid_join=True).collect()]
    assert t_in == t_jn


def test_ivf_persisted_probe(spark, tmp_path, small_world):
    """ivf_persist + ivf_topk_assigned: same ranking as the one-shot
    ivf_topk, from ONLY the probed partitions (pruning is asserted by
    test_plan_shape; correctness here)."""
    from ovalspark.operators.similarity import ivf_persist, ivf_topk, ivf_topk_assigned

    _, _, docs, _ = small_world
    emb = _hash_embeddings(docs, 300).cache()
    root = str(tmp_path / "ivf")
    ivf_persist(emb, root, n_lists=16)
    q = list(emb.first().embedding)
    one_shot = [(r.vec_id, r.cos_q) for r in ivf_topk(emb, q, k=10, n_lists=16, nprobe=6).collect()]
    probed = [(r.vec_id, r.cos_q) for r in ivf_topk_assigned(spark, root, q, k=10, nprobe=6).collect()]
    assert probed == one_shot


def test_lsh_stored_probe_matches_one_shot(spark, tmp_path, small_world):
    """ann_lsh_persist + ann_lsh_topk_stored must return exactly the
    one-shot ann_lsh_topk ranking when max_hamming < bands (pigeonhole:
    any signature within hamming h agrees exactly on ≥1 of bands > h
    bands, so band collision loses no candidate)."""
    from ovalspark.operators.similarity import ann_lsh_persist, ann_lsh_topk, ann_lsh_topk_stored

    _, _, docs, _ = small_world
    emb = _hash_embeddings(docs, 400).cache()
    root = str(tmp_path / "lsh")
    ann_lsh_persist(emb, root, n_bits=16, bands=4, dims=16)
    q = list(emb.first().embedding)
    one_shot = [(r.vec_id, r.cos_q) for r in ann_lsh_topk(emb, q, k=10, n_bits=16, max_hamming=2).collect()]
    stored = [(r.vec_id, r.cos_q) for r in ann_lsh_topk_stored(spark, root, q, k=10, n_bits=16, bands=4, max_hamming=2).collect()]
    assert stored == one_shot
    assert len(stored) > 0

    # multi-probe extends the lossless bound: at max_hamming=5 ≥ bands the
    # plain probe may drop candidates (a hamming-5 signature can differ in
    # every band), but probe_hamming=1 makes it exact out to
    # bands×(probe_hamming+1)-1 = 7 — the stored probe must again equal
    # the unbanded one-shot, and must never return LESS than plain probing
    one5 = [(r.vec_id, r.cos_q) for r in ann_lsh_topk(emb, q, k=10, n_bits=16, max_hamming=5).collect()]
    multi5 = [(r.vec_id, r.cos_q) for r in ann_lsh_topk_stored(
        spark, root, q, k=10, n_bits=16, bands=4, max_hamming=5, probe_hamming=1).collect()]
    assert multi5 == one5
    # (no subset claim vs the plain probe: both lists are top-k TRUNCATED,
    # so the richer candidate set can legitimately push an item past k)


def test_ivf_recall_at_256_lists(spark, small_world):
    """Real-IVF-scale shape: n_lists=256 forces the join path (auto) —
    the inline form would be 256×16 literals in one expression tree.
    Recall vs exact top-10 must hold with nprobe=32."""
    from ovalspark.operators.similarity import INLINE_CENTROID_LIMIT, cosine_topk, ivf_topk

    _, _, docs, _ = small_world
    assert 256 > INLINE_CENTROID_LIMIT
    emb = _hash_embeddings(docs, 800).cache()
    q = list(emb.first().embedding)
    exact = [r.vec_id for r in cosine_topk(emb, q, k=10).collect()]
    approx = [r.vec_id for r in ivf_topk(emb, q, k=10, n_lists=256, nprobe=32).collect()]
    assert approx[0] == exact[0]  # the query vector itself
    assert len(set(exact) & set(approx)) >= 5


def test_connected_components_transitive_groups(spark):
    """A~B, B~C must collapse into ONE group with the min id as canonical;
    a long path exercises multi-round convergence."""
    from ovalspark.operators.components import (
        connected_components,
        dedup_keep_canonical,
        duplicate_groups,
    )

    pairs = spark.createDataFrame(
        [("b", "a"), ("b", "c"), ("d", "e"), ("p1", "p2"), ("p2", "p3"), ("p3", "p4"), ("p4", "p5"), ("p5", "p6")],
        "id_a string, id_b string",
    )
    cc = {r.node: r.component for r in connected_components(pairs).collect()}
    assert cc["a"] == cc["b"] == cc["c"] == "a"
    assert cc["d"] == cc["e"] == "d"
    assert all(cc[f"p{i}"] == "p1" for i in range(1, 7))  # 5-hop chain converges

    groups = {r.component: (r.n_members, list(r.members)) for r in duplicate_groups(pairs).collect()}
    assert groups["a"] == (3, ["a", "b", "c"])
    assert groups["d"] == (2, ["d", "e"])
    assert groups["p1"][0] == 6

    docs = spark.createDataFrame(
        [(x,) for x in ["a", "b", "c", "d", "e", "z"]], "doc_id string"
    )
    kept = sorted(r.doc_id for r in dedup_keep_canonical(docs, pairs).collect())
    assert kept == ["a", "d", "z"]  # one canonical per group + untouched doc


def test_duplicate_groups_member_cap(spark):
    """A boilerplate mega-cluster must not materialize its whole member
    list in one aggregation row: max_members caps the reported array
    (first N in sort order, selected BEFORE collect) while n_members
    stays exact; small groups are reported in full and not flagged."""
    from ovalspark.operators.components import duplicate_groups

    # one 500-member star + one 2-member pair
    pairs = spark.createDataFrame(
        [("m0000", f"m{i:04d}") for i in range(1, 500)] + [("x1", "x2")],
        "id_a string, id_b string",
    ).repartition(8)

    capped = {
        r.component: r for r in duplicate_groups(pairs, max_members=10).collect()
    }
    big = capped["m0000"]
    assert big.n_members == 500  # exact despite the cap
    assert list(big.members) == [f"m{i:04d}" for i in range(10)]  # first 10, sorted
    assert big.members_truncated
    small = capped["x1"]
    assert (small.n_members, list(small.members), small.members_truncated) == (
        2,
        ["x1", "x2"],
        False,
    )

    # include_members=False: pure hash aggregation, no arrays at all
    counts_only = duplicate_groups(pairs, include_members=False)
    assert counts_only.columns == ["component", "n_members"]
    assert {r.component: r.n_members for r in counts_only.collect()} == {
        "m0000": 500,
        "x1": 2,
    }

    import pytest as _pytest

    with _pytest.raises(ValueError, match="max_members"):
        duplicate_groups(pairs, max_members=0)
    # validation must fire even when include_members=False short-circuits
    # the cap path (the cap is then meaningless — fail loudly, not ignore)
    with _pytest.raises(ValueError, match="max_members"):
        duplicate_groups(pairs, max_members=0, include_members=False)
    # ...and a VALID cap with include_members=False is equally conflicting
    with _pytest.raises(ValueError, match="include_members"):
        duplicate_groups(pairs, max_members=10, include_members=False)
    # salt_partitions=0 would pmod-by-zero into NULL salts — every row in
    # ONE window partition, the exact straggler the salting prevents
    with _pytest.raises(ValueError, match="salt_partitions"):
        duplicate_groups(pairs, max_members=10, salt_partitions=0)
    with _pytest.raises(ValueError, match="salt_partitions"):
        duplicate_groups(pairs, max_members=10, salt_partitions=-4)


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # normalize to min-of-component labels
    comp = {}
    for n in list(parent):
        comp.setdefault(find(n), []).append(n)
    return {n: root for root, ns in comp.items() for n in ns}


def test_star_contraction_matches_propagation_and_union_find(spark):
    """Large-star/small-star must produce the identical
    (node → component-min) labeling as plain propagation AND a driver-side
    union-find, on seeded random graphs of varying density."""
    import random

    from ovalspark.operators.components import connected_components, connected_components_star

    rng = random.Random(11)
    for n_nodes, n_edges in ((30, 20), (60, 90), (40, 40)):
        edges = [
            (f"n{rng.randrange(n_nodes):03d}", f"n{rng.randrange(n_nodes):03d}")
            for _ in range(n_edges)
        ]
        # keep self-pairs (a==b): they carry no edge but their node must
        # still be labeled a singleton by BOTH algorithms
        truth = _union_find(edges)
        df = spark.createDataFrame(edges, "id_a string, id_b string")
        star = {r.node: r.component for r in connected_components_star(df).collect()}
        prop = {r.node: r.component for r in connected_components(df, max_iterations=60).collect()}
        assert star == truth
        assert prop == truth


def test_duplicate_groups_cap_sort_is_salted_not_single_task(spark):
    """The capped path must never sort a whole component in one task: the
    only row_number window in the plan partitions by (component, _salt) —
    a mega-cluster's sort spreads over salt_partitions tasks — and no
    window partitions by component alone."""
    import re

    from ovalspark.operators.components import duplicate_groups

    pairs = spark.createDataFrame(
        [("m0000", f"m{i:04d}") for i in range(1, 500)], "id_a string, id_b string"
    )
    df = duplicate_groups(pairs, max_members=10, salt_partitions=16)
    plan = df._jdf.queryExecution().executedPlan().toString()
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs, plan  # the rank window is present...
    assert all("_salt" in s for s in specs), specs  # ...and every spec is salted

    # and the salted path is value-identical to the spec (first-10 sorted)
    row = df.collect()[0]
    assert row.n_members == 500
    assert list(row.members) == [f"m{i:04d}" for i in range(10)]
    assert row.members_truncated


def test_star_contraction_converges_round_one_on_stable_stars(spark):
    """An input that is already a stable star set must confirm convergence
    on iteration 1 (the fingerprint seed from the initial edges makes the
    early-exit reachable even with max_iterations=1)."""
    from ovalspark.operators.components import connected_components_star

    # two perfect stars rooted at their minima — already converged shape
    pairs = spark.createDataFrame(
        [("a0", "a1"), ("a0", "a2"), ("b0", "b1")], "id_a string, id_b string"
    )
    star = {
        r.node: r.component
        for r in connected_components_star(pairs, max_iterations=1).collect()
    }
    assert star == {"a0": "a0", "a1": "a0", "a2": "a0", "b0": "b0", "b1": "b0"}


def test_star_contraction_handles_long_chain(spark):
    """A 200-node path has diameter 199: plain propagation raises at its
    default 20-round budget (loud, per the round-3 convergence guard),
    while star contraction converges in O(log n) rounds."""
    import pytest as _pytest

    from ovalspark.operators.components import connected_components, connected_components_star

    pairs = spark.createDataFrame(
        [(f"c{i:04d}", f"c{i + 1:04d}") for i in range(199)], "id_a string, id_b string"
    )
    with _pytest.raises(RuntimeError, match="converge"):
        connected_components(pairs).collect()
    star = {r.node: r.component for r in connected_components_star(pairs).collect()}
    assert set(star.values()) == {"c0000"}
    assert len(star) == 200


def test_hash_sampling_deterministic_nested_stable(spark):
    """Content-hash sampling: partition-layout independent, nested rates
    are supersets, append-stable (old verdicts never change)."""
    from ovalspark.operators.sampling import hash_sample, stratified_sample

    df = spark.range(0, 2000).select(F.col("id").cast("string").alias("doc_id"))
    s20 = {r.doc_id for r in hash_sample(df, "doc_id", 0.2).collect()}
    s20_repart = {r.doc_id for r in hash_sample(df.repartition(13), "doc_id", 0.2).collect()}
    assert s20 == s20_repart  # layout-independent
    s10 = {r.doc_id for r in hash_sample(df, "doc_id", 0.1).collect()}
    assert s10 <= s20  # nested rates are supersets
    assert 0.05 < len(s10) / 2000 < 0.15 and 0.15 < len(s20) / 2000 < 0.25
    bigger = spark.range(0, 4000).select(F.col("id").cast("string").alias("doc_id"))
    s20b = {r.doc_id for r in hash_sample(bigger, "doc_id", 0.2).collect()}
    assert s20 == {x for x in s20b if int(x) < 2000}  # append-stable

    strat = spark.createDataFrame(
        [(str(i), "en" if i % 2 else "de") for i in range(2000)], "doc_id string, lang string"
    )
    out = stratified_sample(strat, "doc_id", "lang", {"en": 0.5}, default_rate=0.05)
    by_lang = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert 0.4 < by_lang["en"] / 1000 < 0.6
    assert by_lang.get("de", 0) / 1000 < 0.12


def test_token_frequencies_topk(spark):
    from ovalspark.operators.text import token_frequencies

    df = spark.createDataFrame(
        [("a a a b b c",), ("a b d",)], "text string"
    )
    top = [(r.token, r.freq) for r in token_frequencies(df, "text", k=3).collect()]
    assert top == [("a", 4), ("b", 3), ("c", 1)]  # freq desc, token tie-break


def test_signature_join_matches_inline(spark, small_world, tmp_path):
    """The broadcast sign-table signature path (plan-size-safe past
    INLINE_SIGN_LIMIT) must produce bit-identical signatures to the
    inline-literal form — single- and multi-seed, with and without the
    other aggregates in the pass."""
    from ovalspark.operators.similarity import embedding_scores

    _, _, docs, _ = small_world
    emb = _hash_embeddings(docs, 200, dims=16).cache()

    a = embedding_scores(emb, n_bits=12, dims=16, sig_join=False)
    b = embedding_scores(emb, n_bits=12, dims=16, sig_join=True)
    cols = ["vec_id", "n2", "sig"]
    assert a.select(cols).exceptAll(b.select(cols)).count() == 0
    assert b.select(cols).exceptAll(a.select(cols)).count() == 0

    q = list(emb.first().embedding)
    am = embedding_scores(emb, q, n_bits=8, dims=16, seeds=[3, 9], sig_join=False)
    bm = embedding_scores(emb, q, n_bits=8, dims=16, seeds=[3, 9], sig_join=True)
    cols = ["vec_id", "n2", "dot", "sig_0", "sig_1"]
    assert am.select(cols).exceptAll(bm.select(cols)).count() == 0
    assert bm.select(cols).exceptAll(am.select(cols)).count() == 0

    # keep_quant rides the same fold; q arrays must match the inline form
    aq = {r.vec_id: list(r.q) for r in embedding_scores(emb, n_bits=8, dims=16, sig_join=False, keep_quant=True).collect()}
    bq = {r.vec_id: list(r.q) for r in embedding_scores(emb, n_bits=8, dims=16, sig_join=True, keep_quant=True).collect()}
    assert aq == bq

    # the fold is the point: every SUM rides one scan of the exploded
    # source (a separate agg would scan+explode twice). keep_quant adds
    # exactly one more scan — the cheap column-pruned q projection, NOT a
    # second explode (collect_list inside the joined agg measured 2.7×
    # slower: it demotes the whole aggregate out of codegen). Count scans
    # on a parquet-backed frame — cache/AQE plan strings repeat
    # InMemoryTableScan text and miscount.
    emb.write.mode("overwrite").parquet(str(tmp_path / "sigscan"))
    pq = spark.read.parquet(str(tmp_path / "sigscan"))

    def n_scans(**kw):
        plan = (
            embedding_scores(pq, q, n_bits=8, dims=16, seeds=[3, 9], sig_join=True, **kw)
            ._jdf.queryExecution().executedPlan().toString()
        )
        return plan.count("Scan parquet"), plan.count("posexplode")

    assert n_scans() == (1, 1)
    scans, explodes = n_scans(keep_quant=True)
    assert (scans, explodes) == (2, 1)  # q projection scan, still ONE explode


def test_signature_join_at_real_dims(spark, small_world):
    """dims=768 × 16 bits: auto-switch must pick the join path, the run
    must be green, the signatures must match the driver-side reference
    bit-for-bit, and the plan must stay O(1) in dims (no dims-sized
    literal arrays in the aggregate expressions)."""
    from ovalspark.operators.similarity import (
        INLINE_SIGN_LIMIT,
        embedding_scores,
        hyperplane_signature_py,
    )

    _, _, docs, _ = small_world
    dims, n_bits = 768, 16
    assert dims * n_bits > INLINE_SIGN_LIMIT  # auto picks the join form
    emb = _hash_embeddings(docs, 20, dims=dims).cache()

    s = embedding_scores(emb, n_bits=n_bits, dims=dims)  # sig_join=None → auto
    plan = s._jdf.queryExecution().optimizedPlan().toString()
    # the inline form would embed dims×n_bits ±1 literals; the join form's
    # plan must not grow with dims — a coarse but effective ceiling
    assert len(plan) < 200_000

    got = {r.vec_id: r.sig for r in s.collect()}
    ref = {
        r.vec_id: hyperplane_signature_py(list(r.embedding), dims, n_bits, seed=7)
        for r in emb.collect()
    }
    assert got == ref


def test_near_duplicates_cosine_sig_join_auto(spark):
    """near_duplicates_cosine at high dims (auto join path) still verifies
    candidates exactly: the planted near-identical pair survives."""
    import math

    dims = 512
    base = [math.sin(0.1 * i) for i in range(dims)]
    near = list(base)
    near[0] += 1e-4
    far = [math.cos(0.3 * i + 1.0) for i in range(dims)]
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], "vec_id long, embedding array<float>"
    )
    pairs = near_duplicates_cosine(df, threshold=0.95, n_bits=16, dims=dims).collect()
    assert [(r.id_a, r.id_b) for r in pairs] == [(1, 2)]


def _clustered_embeddings(spark, dims=16, n_clusters=24, per=30):
    """Deterministic clustered fixture: md5-derived cluster directions with
    small per-point noise — the realistic (non-uniform) embedding shape
    where an unrefined seeded-sample quantizer skews list sizes."""
    import hashlib

    def h(s):
        return (int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % 2000) / 1000.0 - 1.0

    rows = []
    for c in range(n_clusters):
        center = [h(f"C{c}:{i}") for i in range(dims)]
        for p in range(per):
            rows.append(
                (c * per + p, [float(center[i] + 0.08 * h(f"{c}:{p}:{i}")) for i in range(dims)])
            )
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_ivf_refinement_improves_balance_and_recall(spark, tmp_path):
    """refine_iters (Lloyd rounds, exact-integer means): on clustered data
    the refined quantizer must strictly reduce list-size skew and must not
    lose recall — at n_lists=64 (inline path, nprobe=1: measured 0.62 →
    0.76) and n_lists=256 (broadcast-join path, nprobe=8: 0.98 → 1.00).
    Fully deterministic fixture + seeded pick → stable numbers."""
    from ovalspark.operators.similarity import cosine_topk_q, ivf_persist, ivf_topk_assigned

    df = _clustered_embeddings(spark).cache()
    df.count()
    queries = [
        list(r.embedding) for r in df.filter(F.col("vec_id").isin(5, 95, 305, 515, 665)).collect()
    ]
    exact = [{r.vec_id for r in cosine_topk_q(df, q, k=10).collect()} for q in queries]

    def run(n_lists, nprobe, refine_iters, centroid_join):
        root = str(tmp_path / f"ivf_{n_lists}_{refine_iters}")
        ivf_persist(
            df, root, n_lists=n_lists, refine_iters=refine_iters, centroid_join=centroid_join
        )
        sizes = [
            r["n"]
            for r in spark.read.parquet(f"{root}/assigned")
            .groupBy("list_id")
            .agg(F.count("*").alias("n"))
            .collect()
        ]
        recall = sum(
            len({r.vec_id for r in ivf_topk_assigned(spark, root, q, k=10, nprobe=nprobe).collect()} & ex)
            for q, ex in zip(queries, exact)
        ) / (10 * len(queries))
        return max(sizes), sum(s * s for s in sizes), recall

    max0, sq0, rec0 = run(64, 1, 0, None)
    max2, sq2, rec2 = run(64, 1, 2, None)
    assert max2 < max0 and sq2 < sq0  # strict balance gain
    assert rec2 > rec0  # measured 0.76 vs 0.62

    max0, sq0, rec0 = run(256, 8, 0, True)
    max2, sq2, rec2 = run(256, 8, 2, True)
    assert max2 < max0 and sq2 < sq0
    assert rec2 >= rec0  # measured 1.00 vs 0.98


def test_regex_token_count_run_form_matches_extract_all(spark):
    """The default-pattern fast path (split-run counts + translate) must
    equal the literal regexp_extract_all count on every string class the
    alternation distinguishes: runs, unicode/control punct, empties,
    NULLs, digit-letter boundaries."""
    from ovalspark.operators.text import BPE_PRETOKEN_RE, regex_token_count
    from pyspark.sql import functions as F

    rows = [
        ("a",), ("abc def",), ("abc1def",), ("123",), ("a1b2c3",),
        ("",), (None,), ("...",), ("a.b,c;d",), ("tab\there",),
        ("new\nline",), ("unicode é ü 漢字",), ("  spaces  ",),
        ("x" * 500 + "!" * 50,), ("9a9a9a",), ("!leading",), ("trailing!",),
    ]
    df = spark.createDataFrame(rows, "text string")
    fast = regex_token_count(F.col("text"))
    slow = F.size(F.regexp_extract_all(F.col("text"), F.lit(BPE_PRETOKEN_RE), F.lit(0))).cast("long")
    got = df.select(fast.alias("fast"), slow.alias("slow")).collect()
    for r in got:
        assert r["fast"] == r["slow"], (r["fast"], r["slow"])
    # a non-default pattern still takes the literal path
    other = df.where("text IS NOT NULL").select(
        regex_token_count(F.col("text"), "[a-z]+").alias("n")
    ).collect()
    assert all(r["n"] is not None for r in other)
