"""Connected components over near-duplicate pair edges — dedup GROUPS.

A real training-data dedup pipeline does not stop at candidate pairs:
transitive near-duplicates (A~B, B~C) must collapse into ONE group so one
canonical document survives. The reference has no analog (oval's keyspace
is duplicate-free by construction, ``internal/object/object.go:57-69``);
this is a pipeline-extension operator in the spirit of SURVEY.md §6.

Algorithm: hash-min label propagation (the standard Spark formulation of
connected components, cf. the large-star/small-star family of Kiveris et
al., "Connected Components in MapReduce and Beyond", SoCC'14): every node
starts labeled with itself; each round, every node adopts the minimum
label in its closed neighborhood; repeat until no label changes. Rounds
needed = O(diameter) for plain propagation — near-dup clusters are tiny
and dense (diameter ≤ ~3), so 2-4 rounds in practice; ``max_iterations``
bounds adversarial chains.

Scale shape per round: one shuffle on node id for the (labels ⋈ edges)
join + one groupBy(node).min(label) — both key-partitioned by node id,
AQE-coalesced. Labels are ``localCheckpoint``ed per round: iterative
self-referencing plans otherwise re-expand the whole previous round's
lineage (the engine's measured trap #3, BASELINE.md). Convergence check
is one small count per round — the only driver-side data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 20,
) -> DataFrame:
    """(node, component) for every node appearing in ``pairs``; component =
    the minimum node id reachable through the pair graph (deterministic
    canonical representative, independent of partitioning/iteration order).

    Raises ``RuntimeError`` if labels are still changing after
    ``max_iterations`` rounds: plain min-label propagation needs
    O(diameter) rounds, so an adversarial duplicate CHAIN longer than the
    budget would otherwise silently return a graph split into several
    components — and ``dedup_keep_canonical`` would then keep multiple
    "canonical" docs with no signal to the caller. Near-dup clusters are
    dense (diameter ≤ ~3); hitting this means either raise the budget or
    switch to a large-star/small-star contraction (O(log n) rounds).
    """
    # undirected: symmetrize once; nodes = both endpoints
    edges = (
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(pairs.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("u").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("component"))
        .localCheckpoint()
    )
    for _ in range(max_iterations):
        # min label over the closed neighborhood {node} ∪ neighbors(node)
        neighbor_lbl = (
            edges.join(labels.withColumnRenamed("node", "v"), "v")
            .select(F.col("u").alias("node"), "component")
        )
        new_labels = (
            labels.unionByName(neighbor_lbl)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} rounds "
            f"({changed} labels still changing): graph diameter exceeds the "
            "iteration budget — raise max_iterations or use star contraction"
        )
    return labels


def connected_components_star(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 50,
) -> DataFrame:
    """(node, component) via alternating large-star/small-star contraction
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14) — converges in O(log n) rounds regardless of graph DIAMETER,
    where plain min-label propagation (``connected_components``) needs
    O(diameter) rounds and raises on chains longer than its budget.

    Use this for adversarial/unknown shapes (long duplicate chains from
    e.g. content drift A≈B≈C≈…); keep plain propagation for the typical
    dense near-dup clusters (diameter ≤ ~3 — fewer shuffles per round).
    Both return the identical (node, min-reachable-id) labeling (tested
    against a driver-side union-find on random graphs).

    Per round: large-star hangs every node's LARGER neighbors under its
    neighborhood minimum (keeps every component's minimum reachable),
    then small-star re-points the smaller-or-equal neighbors at it.
    Each phase is one groupBy(node).min + one re-join — key-partitioned
    shuffles, AQE-coalesced; edges are localCheckpoint'ed per round
    (iterative-lineage trap, BASELINE.md).
    """
    # all endpoint nodes, INCLUDING ones appearing only in self-pairs
    # (u==v) — those contribute no edge but must still be labeled, like
    # plain propagation labels them (singleton components)
    all_nodes = (
        pairs.select(F.col(src).alias("node"))
        .unionByName(pairs.select(F.col(dst).alias("node")))
        .distinct()
        .localCheckpoint()
    )
    edges = (
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .select(
            F.greatest("u", "v").alias("u"),  # directed large → small
            F.least("u", "v").alias("v"),
        )
        .distinct()
        .localCheckpoint()
    )
    def _fingerprint(e: DataFrame) -> tuple:
        # modulus 2^20 keeps the ANSI-mode SUM overflow-free out to ~2^43
        # edges (mean summand 2^19 vs the 2^63 long ceiling) — 2^40 would
        # raise ARITHMETIC_OVERFLOW at ~1.7e7 edges, exactly the mega-
        # cluster graphs this operator targets; a fingerprint collision
        # only costs one redundant exceptAll confirm, never a wrong stop
        s = e.agg(
            F.count("*"),
            F.sum(F.pmod(F.xxhash64(F.col("u").cast("string"), F.col("v").cast("string")), F.lit(1 << 20))),
        ).first()
        return (s[0], s[1])

    # seed from the INITIAL edge set so an input that is already a stable
    # star set can confirm convergence on iteration 1 (a None seed made
    # the early-exit unreachable with max_iterations=1)
    prev_fingerprint: tuple = _fingerprint(edges)
    for _ in range(max_iterations):
        # large-star: m(u) = min(Γ(u) ∪ {u}) over the SYMMETRIC
        # neighborhood; emit (v, m(u)) for every larger neighbor v of u
        sym = edges.unionByName(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = sym.groupBy("u").agg(F.min("v").alias("_mn"))
        mins = mins.select("u", F.least("_mn", F.col("u")).alias("m"))
        ls = (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        # small-star: on the large→small edge set, m(u) = min(out(u) ∪ {u});
        # re-point every out-neighbor and u itself at m
        mins2 = ls.groupBy("u").agg(F.min("v").alias("m"))
        ss = (
            ls.join(mins2, "u")
            .filter(F.col("v") != F.col("m"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionByName(mins2.select("u", F.col("m").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint()
        )
        # converged when the edge set is a stable set of stars. The exact
        # check (exceptAll) is a full two-sided shuffle compare — pay it
        # ONLY when a cheap monotone fingerprint (count + content hashsum,
        # one scan of the already-checkpointed ss, no join) says the sets
        # might be equal; a spurious fingerprint match just costs that one
        # confirm, never a wrong early stop.
        fingerprint = _fingerprint(ss)
        changed = 1
        if fingerprint == prev_fingerprint:
            changed = ss.exceptAll(edges).limit(1).count()
        prev_fingerprint = fingerprint
        edges = ss
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components_star did not converge in {max_iterations} "
            "rounds — O(log n) bound exceeded; the graph is larger than the budget allows"
        )
    # edges now: every non-root points at its component root (the min id);
    # roots and edge-less singleton nodes label themselves
    labels = edges.select(F.col("u").alias("node"), F.col("v").alias("component"))
    singles = all_nodes.join(labels, "node", "left_anti").select(
        "node", F.col("node").alias("component")
    )
    return labels.unionByName(singles)


def _cc(pairs: DataFrame, src: str, dst: str, algorithm: str) -> DataFrame:
    if algorithm == "label":
        return connected_components(pairs, src, dst)
    if algorithm == "star":
        return connected_components_star(pairs, src, dst)
    raise ValueError(f"algorithm must be label|star, got {algorithm!r}")


def duplicate_groups(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    algorithm: str = "label",
    max_members: int | None = None,
    include_members: bool = True,
    salt_partitions: int = 64,
) -> DataFrame:
    """Collapse near-dup pairs into groups: (component, n_members, members
    [, members_truncated]) — one row per transitive duplicate cluster,
    members sorted for deterministic output. The input is any (id_a, id_b)
    candidate-pair table (minhash/simhash/embedding near-dups).
    ``algorithm="star"`` switches to O(log n) star contraction for
    long-chain graphs.

    Web corpora routinely contain boilerplate mega-clusters (10⁶–10⁷
    near-identical docs); an unbounded ``collect_list`` builds that whole
    cluster as ONE array in one aggregation row — task OOM. ``max_members``
    caps the reported array (the FIRST ``max_members`` member ids in sort
    order, selected by a salted two-phase top-N BEFORE any collect, so no
    task ever materializes — or even SORTS — more than ``salt_partitions``
    ×cap rows of any one component) while ``n_members`` stays exact and
    ``members_truncated`` flags capped rows.
    ``include_members=False`` skips member arrays entirely — one
    hash aggregation, nothing collected."""
    # validate BEFORE the include_members early return: an invalid cap —
    # or a cap combined with include_members=False, which would be
    # silently meaningless — must fail loudly, not be ignored
    if max_members is not None and max_members < 1:
        raise ValueError(f"max_members must be >= 1, got {max_members}")
    # salt_partitions < 1 would be silent data corruption, not just slow:
    # pmod(x, 0) yields NULL, collapsing every row into one window
    # partition — the exact single-task straggler the salting prevents
    if salt_partitions < 1:
        raise ValueError(f"salt_partitions must be >= 1, got {salt_partitions}")
    if max_members is not None and not include_members:
        raise ValueError(
            "max_members requires include_members=True (with no member "
            "arrays there is nothing to cap)"
        )
    cc = _cc(pairs, src, dst, algorithm)
    if not include_members:
        return cc.groupBy("component").agg(F.count("*").alias("n_members"))
    if max_members is None:
        return cc.groupBy("component").agg(
            F.count("*").alias("n_members"),
            F.sort_array(F.collect_list("node")).alias("members"),
        )
    # Two-phase salted top-(cap): a single row_number window over
    # partitionBy(component) routes an entire 10⁷-member boilerplate
    # cluster through ONE task's external sort — no OOM (rows spill) but
    # a straggler at exactly the input that motivated the cap. Phase 1
    # ranks within (component, salt) — the mega-cluster's sort spreads
    # over ``salt_partitions`` tasks — and keeps at most cap rows per
    # salt; phase 2 merges the ≤ salt_partitions×cap survivors per
    # component (640 rows at cap=10, S=64) and slices the global first
    # cap, so every collected array is bounded by construction. The
    # exact n_members comes from a separate count aggregation (map-side
    # partial combine, fully parallel) joined back on component — a
    # one-row-per-component join, negligible next to either phase.
    salted = cc.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col("node").cast("string")), F.lit(salt_partitions))
    )
    w1 = Window.partitionBy("component", "_salt").orderBy("node")
    local_top = salted.withColumn("_rk", F.row_number().over(w1)).filter(
        F.col("_rk") <= max_members
    )
    merged = local_top.groupBy("component").agg(
        F.slice(F.sort_array(F.collect_list("node")), 1, max_members).alias("members")
    )
    counts = cc.groupBy("component").agg(F.count("*").alias("n_members"))
    return counts.join(merged, "component").select(
        "component",
        "n_members",
        "members",
        (F.col("n_members") > max_members).alias("members_truncated"),
    )


def dedup_keep_canonical(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
    algorithm: str = "label",
) -> DataFrame:
    """Filter ``docs`` to one canonical row per duplicate group (the
    minimum id — the component label itself) plus every document that is
    in no group. Anti-join against the non-canonical members: output size
    = |docs| - (group members - groups), one broadcast-or-shuffle anti-join."""
    cc = _cc(pairs, src, dst, algorithm)
    losers = cc.filter(F.col("node") != F.col("component")).select(F.col("node").alias(id_col))
    return docs.join(losers, id_col, "left_anti")
