"""Physical-plan regression tests — the shapes that matter at 100 TB.

These pin the executed plan, not just results: a revert to a shuffling
join or an interpreted validator would pass every semantic test and still
be 10-100× slower at scale (both happened during development — see
BASELINE.md's diagnosis trail)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from ovalspark.datagen import GenSpec, generate_catalog, generate_documents
from ovalspark.operators import validate_spans
from ovalspark.sources import CATALOG_DDL, DOCS_DDL, register_bucketed, write_bucketed


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """docs⋈catalog on co-bucketed tables must not shuffle (the Iceberg
    SPJ equivalent; disjoint key ranges, oval runner.go:117-124)."""
    spec = GenSpec(n_runners=1, n_writers=2, docs_per_writer=200, max_spans=6)
    cat = generate_catalog(spark, spec)
    docs = generate_documents(cat, spec)
    wh = str(tmp_path / "wh")
    write_bucketed(docs, "t_docs", wh, n_buckets=8)
    write_bucketed(cat, "t_cat", wh, n_buckets=8)
    bdocs = register_bucketed(spark, "t_docs", f"{wh}/t_docs", DOCS_DDL, 8)
    bcat = register_bucketed(spark, "t_cat", f"{wh}/t_cat", CATALOG_DDL, 8)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(validate_spans(bdocs, bcat))
        # no shuffle anywhere: the join consumes co-located buckets
        assert "Exchange hashpartitioning" not in plan, plan
        assert "ShuffleExchange" not in plan, plan
        assert validate_spans(bdocs, bcat).count() == 0  # and it's still correct
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_validator_is_codegen_not_interpreted(spark, small_world, tmp_path):
    """The span validator's scan→join→explode→filter pipeline must be in
    WholeStageCodegen spans; array-HOF lambdas (interpreted eval) were a
    measured ~10× regression. Materialize inputs first so the generator's
    own transform(sequence(...)) doesn't appear in the inspected plan."""
    spec, cat0, docs0, _ = small_world
    docs0.write.parquet(str(tmp_path / "d"))
    cat0.write.parquet(str(tmp_path / "c"))
    docs = spark.read.parquet(str(tmp_path / "d"))
    cat = spark.read.parquet(str(tmp_path / "c"))
    plan = _plan(validate_spans(docs, cat, spec.n_assets))
    assert "Generate posexplode" in plan
    # the old shape — per-span transform(sequence(...)) lambdas — ran in
    # interpreted mode; its reappearance would be the regression
    assert "transform(sequence(" not in plan
    # the clean-span fast path is a Filter directly over the explode
    assert "Filter" in plan


def test_column_pruning_reaches_scan(spark, tmp_path):
    """A 2-column projection over a wide table must read 2 columns."""
    spec = GenSpec(n_runners=1, n_writers=2, docs_per_writer=50)
    docs = generate_documents(generate_catalog(spark, spec), spec)
    p = str(tmp_path / "docs.parquet")
    docs.write.parquet(p)
    plan = _plan(spark.read.parquet(p).select("doc_id", "generation"))
    assert "ReadSchema: struct<doc_id:string,generation:int>" in plan, plan


def test_filter_pushdown_reaches_scan(spark, tmp_path):
    spec = GenSpec(n_runners=1, n_writers=2, docs_per_writer=50)
    docs = generate_documents(generate_catalog(spark, spec), spec)
    p = str(tmp_path / "docs.parquet")
    docs.write.partitionBy("partition_id").parquet(p)
    df = spark.read.parquet(p).filter(F.col("partition_id") == 1).filter(F.col("generation") > 2)
    plan = _plan(df.select("doc_id"))
    assert "PushedFilters: [IsNotNull(generation), GreaterThan(generation,2)]" in plan, plan
    # partition pruning: shown via PartitionFilters on the scan node
    assert "PartitionFilters: [isnotnull(partition_id" in plan, plan


def test_delete_discovery_scan_pushes_predicate_down(spark, tmp_path):
    """snapshot_delete's affected-file discovery (the EXACT frame the
    delete runs, via _delete_discovery_frame) must reach the parquet
    scan as PushedFilters — a coalesce-wrapped predicate empties them
    (measured), costing a full decode of every file at discovery time."""
    from ovalspark.sources.snapshots import (
        _abs_path,
        _delete_discovery_frame,
        load_manifest,
        snapshot_write,
    )

    df = spark.range(2000).selectExpr("id as v", "cast(id as string) as doc_id")
    root = str(tmp_path / "del_plan_tbl")
    sid = snapshot_write(df.repartitionByRange(4, "v"), root)
    paths = [_abs_path(root, f["path"]) for f in load_manifest(root, sid)["files"]]
    plan = _plan(_delete_discovery_frame(spark, paths, F.col("v") >= 1500))
    assert "PushedFilters: [IsNotNull(v), GreaterThanOrEqual(v,1500)]" in plan, plan


def test_broadcast_join_when_requested(spark, small_world):
    spec, cat, docs, _ = small_world
    plan = _plan(validate_spans(docs, cat, spec.n_assets, broadcast_catalog=True))
    assert "BroadcastHashJoin" in plan


def test_bucketed_write_is_one_file_per_bucket(spark, tmp_path):
    """Regression: bucketBy WITHOUT a matching repartition writes
    tasks × buckets files (measured ~12k 66KB files for 64 buckets); the
    read side then pays ~12k file opens — a near-serial cost that capped
    scan scaling at 0.26 efficiency 8→32. One file per bucket is the
    multipart/file-sizing contract (oval s3client.go:164-236 analog)."""
    import glob

    spec = GenSpec(n_runners=1, n_writers=4, docs_per_writer=300, max_spans=6)
    docs = generate_documents(generate_catalog(spark, spec), spec)
    wh = str(tmp_path / "wh")
    write_bucketed(docs, "t_onefile", wh, n_buckets=8)
    files = [f for f in glob.glob(f"{wh}/t_onefile/part-*") if f.endswith(".parquet")]
    assert len(files) == 8, sorted(files)


def test_ivf_centroid_pick_is_takeordered(spark, small_world):
    """IVF centroid selection must be TakeOrdered (per-partition heaps over
    n_lists winners), NEVER an unpartitioned global-sort window — the old
    Window.orderBy(hash) shape funneled the whole table into one task."""
    from ovalspark.operators.similarity import ivf_assign

    _, _, docs, _ = small_world
    emb = docs.select(
        F.col("doc_id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(15)),
            lambda i: (F.pmod(F.xxhash64("doc_id", i), F.lit(1000)) / 500.0 - 1.0).cast("float"),
        ).alias("embedding"),
    )
    cents, assigned = ivf_assign(emb, n_lists=8)
    plan = _plan(cents)
    assert "TakeOrderedAndProject" in plan, plan
    # the window (list_id numbering) must run over the 8 winners only —
    # downstream of the TakeOrdered, never over the full table
    assert plan.index("Window") < plan.index("TakeOrderedAndProject"), plan
    # and no full-table single-partition exchange feeding a global sort
    head = plan[plan.index("TakeOrderedAndProject") :]
    assert "Exchange SinglePartition" not in head, plan


def test_ivf_probe_is_partition_pruned(spark, tmp_path, small_world):
    """Probing a persisted IVF index must be partition PRUNING: the scan's
    PartitionFilters carry the list_id IN (...) predicate, so only nprobe
    of n_lists partition directories are listed/read — oval's
    prefix-scoped LIST re-expressed (s3client.go:253-275: never scan what
    you can prune)."""
    from ovalspark.operators.similarity import ivf_persist, ivf_topk_assigned

    _, _, docs, _ = small_world
    emb = docs.limit(200).select(
        F.col("doc_id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(15)),
            lambda i: (F.pmod(F.xxhash64("doc_id", i), F.lit(1000)) / 500.0 - 1.0).cast("float"),
        ).alias("embedding"),
    )
    root = str(tmp_path / "ivf")
    ivf_persist(emb, root, n_lists=8)
    q = list(emb.first().embedding)
    plan = _plan(ivf_topk_assigned(spark, root, q, k=5, nprobe=2))
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and "list_id" in pf[0] and " IN (" in pf[0], plan
    # and the re-rank never touches the original vector table: the only
    # scans are the persisted assigned partitions
    assert "embedding" not in plan, plan


def test_lsh_probe_is_partition_pruned(spark, tmp_path, small_world):
    """Probing a persisted LSH index reads only the band-matching
    partitions: PartitionFilters carry (band_idx, band_val)."""
    from ovalspark.operators.similarity import ann_lsh_persist, ann_lsh_topk_stored

    _, _, docs, _ = small_world
    emb = docs.limit(150).select(
        F.col("doc_id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(15)),
            lambda i: (F.pmod(F.xxhash64("doc_id", i), F.lit(1000)) / 500.0 - 1.0).cast("float"),
        ).alias("embedding"),
    )
    root = str(tmp_path / "lsh")
    ann_lsh_persist(emb, root, n_bits=16, bands=4, dims=16)
    q = list(emb.first().embedding)
    plan = _plan(ann_lsh_topk_stored(spark, root, q, k=5, n_bits=16, bands=4))
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln and "band_idx" in ln]
    assert pf and "band_val" in pf[0], plan


def test_salted_uniqueness_two_phase(spark, small_world):
    """Salted path must contain the two-phase aggregate (partial on
    (key, salt), final on key)."""
    from ovalspark.operators.uniqueness import duplicate_doc_ids

    _, _, docs, _ = small_world
    plan = _plan(duplicate_doc_ids(docs, n_salts=8))
    assert plan.count("HashAggregate") >= 4  # partial+final × 2 phases
