"""The ovalspark_snapshots Python Data Source — batch + streaming.

The format is the Spark-native front door to the snapshot layer: batch
reads must be value-identical to ``snapshot_read`` (including schema
evolution's NULL-fill), Spark's pushed filters must reach two-level
manifest pruning (proven BEHAVIORALLY: a non-overlapping segment's
metadata is removed from disk and the filtered read still succeeds —
planning in a subprocess makes monkeypatch instrumentation unobservable
here), and the stream must deliver every appended row exactly once
across restarts from the engine's own checkpoint, advancing silently
over delete/replace commits (append feed, not CDC).
"""

import os

import pytest

from ovalspark.sources import snapshots as sn
from ovalspark.sources import register_snapshot_source
from ovalspark.sources.snapshots import (
    merge_segments,
    snapshot_delete,
    snapshot_read,
    snapshot_write,
)

SPILL = 4


@pytest.fixture
def low_spill(monkeypatch):
    monkeypatch.setattr(sn, "_SEGMENT_SPILL_ENTRIES", SPILL)


def _slice(spark, lo, hi):
    return (
        spark.range(lo, hi)
        .selectExpr("cast(id as string) as doc_id", "id as v")
        .repartition(2)
    )


def _rows(df):
    return sorted((r["doc_id"], r["v"]) for r in df.select("doc_id", "v").collect())


def test_batch_read_matches_snapshot_read_on_evolved_segmented_table(
    spark, tmp_path, low_spill
):
    """Format read == snapshot_read on a table that exercises both
    storage complications at once: segmented manifests AND an additive
    schema evolution mid-chain (pre-evolution files must NULL-fill)."""
    import pyspark.sql.functions as F

    root = str(tmp_path / "ds_tbl")
    for i in range(4):
        snapshot_write(_slice(spark, i * 10, (i + 1) * 10), root, mode="append" if i else "overwrite")
    snapshot_write(
        _slice(spark, 40, 50).withColumn("batch_tag", F.lit("b5")), root, mode="append"
    )

    register_snapshot_source(spark)
    got = spark.read.format("ovalspark_snapshots").option("path", root).load()
    want = snapshot_read(spark, root)
    assert got.schema == want.schema
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    # NULL-fill contract: evolved column absent from the first 40 rows
    assert got.filter("batch_tag IS NULL").count() == 40
    assert got.filter("batch_tag = 'b5'").count() == 10

    # time travel option == snapshot_read at that id
    tt = (
        spark.read.format("ovalspark_snapshots")
        .option("path", root)
        .option("snapshot_id", 2)
        .load()
    )
    assert _rows(tt) == _rows(snapshot_read(spark, root, 2))


def _load(spark, root, **opts):
    r = spark.read.format("ovalspark_snapshots").option("path", root)
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_pushed_filters_reach_segment_pruning(spark, tmp_path, low_spill):
    """Behavioral proof the DSv2 pushdown wires into two-level pruning:
    build a range-disjoint segmented chain, then REMOVE a segment file
    whose folded bounds are disjoint from the filter. A pushdown-enabled
    filtered read plans without ever opening that segment — it succeeds;
    a full read must expand everything — it fails. Values of the
    filtered read match the raw filter applied to snapshot_read taken
    BEFORE the removal. (Planning runs in a subprocess, so this disk-level
    proof is the only observable instrumentation.)"""
    root = str(tmp_path / "ds_prune_tbl")
    for i in range(8):
        snapshot_write(_slice(spark, i * 10, (i + 1) * 10), root, mode="append" if i else "overwrite")
    raw = sn._load_manifest_raw(root)
    refs = raw["file_segments"]
    assert len(refs) >= 2
    want = [r for r in _rows(snapshot_read(spark, root)) if 71 <= r[1] <= 72]

    # the filter range [71, 72] lives in the inline tail (newest rows):
    # every segment is prunable — remove the newest segment's metadata
    victim = max(refs, key=lambda r: r["col_stats"]["v"]["min"])
    seg_path = os.path.join(sn._manifest_dir(root), victim["loc"])
    hidden = seg_path + ".hidden"
    os.rename(seg_path, hidden)
    sn._SEGMENT_CACHE.clear()
    try:
        register_snapshot_source(spark)
        got = _load(spark, root, pushdown="true").filter("v >= 71 and v <= 72")
        assert _rows(got) == want  # planned + read without the segment
        with pytest.raises(Exception):  # the full read must need it
            _load(spark, root).count()
    finally:
        os.rename(hidden, seg_path)
    assert _load(spark, root).count() == 80


def test_default_reader_immune_to_scan_cache_reuse(spark, tmp_path, low_spill):
    """The reason pushdown is opt-in: Spark 4.1 caches a Python source's
    planned partitions per load() and only re-plans for queries that push
    filters. The DEFAULT reader never prunes, so the hazardous sequence —
    filtered query, then UNFILTERED query on the same load() — stays
    correct; and with pushdown on, one-load()-per-query (this repo's
    pattern everywhere) gives pruned + correct results for each."""
    root = str(tmp_path / "ds_cache_tbl")
    for i in range(8):
        snapshot_write(_slice(spark, i * 10, (i + 1) * 10), root, mode="append" if i else "overwrite")
    register_snapshot_source(spark)
    df = _load(spark, root)  # default reader, shared across queries
    assert df.filter("v >= 71 and v <= 72").count() == 2
    assert df.count() == 80  # unfiltered after filtered: full listing
    assert df.filter("v < 5").count() == 5
    # pushdown path, fresh load per query: correct and pruned every time
    assert _load(spark, root, pushdown="true").filter("v >= 75").count() == 5
    assert _load(spark, root, pushdown="true").filter("v >= 35").count() == 45
    assert _load(spark, root, pushdown="true").count() == 80


def test_explicit_prune_option_is_load_scoped_and_cache_safe(spark, tmp_path, low_spill):
    """option('prune', 'col:lo:hi') — the cache-safe pruning form: fixed
    at load() time, so every query on the load (filtered or not) sees
    the same pruned superset. Disk-level proof as for pushdown: a
    disjoint segment's metadata can be absent and the pruned load still
    plans; and unfiltered counts on the SAME load stay consistent."""
    root = str(tmp_path / "ds_popt_tbl")
    for i in range(8):
        snapshot_write(_slice(spark, i * 10, (i + 1) * 10), root, mode="append" if i else "overwrite")
    register_snapshot_source(spark)
    refs = sn._load_manifest_raw(root)["file_segments"]
    victim = min(refs, key=lambda r: r["col_stats"]["v"]["min"])  # oldest era
    seg_path = os.path.join(sn._manifest_dir(root), victim["loc"])
    os.rename(seg_path, seg_path + ".hidden")
    sn._SEGMENT_CACHE.clear()
    try:
        df = _load(spark, root, prune="v:71:72")
        got = df.filter("v between 71 and 72")
        assert _rows(got) == [(str(v), v) for v in (71, 72)]
        # unfiltered on the same load: the SAME pruned superset — never
        # the full table, never a stale narrower listing
        n = df.count()
        assert got.count() <= n < 80
        assert df.count() == n  # stable across repeated actions
    finally:
        os.rename(seg_path + ".hidden", seg_path)
    # malformed spec: the loud ValueError surfaces through Spark's
    # planning-subprocess wrapper, message intact
    with pytest.raises(Exception, match="col:lo:hi"):
        _load(spark, root, prune="malformed").count()


def test_stream_errors_clearly_when_retention_outran_it(spark, tmp_path, low_spill):
    """A stream resuming behind retention must fail with the diagnosis
    (expired snapshot + which knob), not an unexplained file error."""
    from ovalspark.sources.snapshots import expire_snapshots

    root = str(tmp_path / "ds_ret_tbl")
    out, ck = str(tmp_path / "sink_ret"), str(tmp_path / "ck_ret")
    for i in range(3):
        snapshot_write(_slice(spark, i * 10, (i + 1) * 10), root, mode="append" if i else "overwrite")
    register_snapshot_source(spark)

    def run_once():
        q = (
            spark.readStream.format("ovalspark_snapshots")
            .option("path", root)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()  # checkpoint now at snapshot 3
    for i in range(3, 6):
        snapshot_write(_slice(spark, i * 10, (i + 1) * 10), root, mode="append")
    expire_snapshots(root, keep_last=1)  # commits 4..5 expired, 6 kept
    with pytest.raises(Exception, match="expired before the stream|retention"):
        run_once()


def test_stream_exactly_once_across_restart_and_deletes(spark, tmp_path, low_spill):
    """The offset protocol: a run consumes the existing commits, a
    restart from the engine checkpoint consumes exactly the NEW appends
    — delete and metadata-merge commits advance the offset emitting
    nothing, and no row is ever delivered twice (parquet sink +
    checkpoint = the engine's exactly-once contract)."""
    root = str(tmp_path / "ds_stream_tbl")
    out = str(tmp_path / "sink")
    ck = str(tmp_path / "ck")
    for i in range(3):
        snapshot_write(_slice(spark, i * 10, (i + 1) * 10), root, mode="append" if i else "overwrite")

    register_snapshot_source(spark)

    def run_once():
        q = (
            spark.readStream.format("ovalspark_snapshots")
            .option("path", root)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    got = _rows(spark.read.parquet(out))
    assert got == _rows(snapshot_read(spark, root))

    # advance the table: append, delete (rewrites files — must NOT
    # re-emit survivors), metadata merge, append
    snapshot_write(_slice(spark, 30, 40), root, mode="append")
    snapshot_delete(spark, root, "v % 10 = 3")
    merge_segments(root, target_entries=2 * SPILL)
    snapshot_write(_slice(spark, 40, 50), root, mode="append")

    run_once()
    got = _rows(spark.read.parquet(out))
    # append feed: every appended row exactly once; deletes don't retract
    assert got == sorted((str(v), v) for v in range(50))
    assert len(got) == len(set(got))


def test_stream_after_id_skips_history(spark, tmp_path, low_spill):
    """after_id = the tail's resume contract in stream form: only
    commits past it are delivered."""
    root = str(tmp_path / "ds_after_tbl")
    for i in range(4):
        snapshot_write(_slice(spark, i * 10, (i + 1) * 10), root, mode="append" if i else "overwrite")
    register_snapshot_source(spark)
    out, ck = str(tmp_path / "sink2"), str(tmp_path / "ck2")
    q = (
        spark.readStream.format("ovalspark_snapshots")
        .option("path", root)
        .option("after_id", 2)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert _rows(spark.read.parquet(out)) == sorted((str(v), v) for v in range(20, 40))


def test_windowed_drift_over_the_snapshot_feed(spark, tmp_path, low_spill, small_world):
    """The composition the format exists for: a watermarked streaming
    validator (windowed DIST_DRIFT, q55's operator) consuming table
    commits THROUGH the stream — results row-identical to the batch form
    over snapshot_read of the same table. A law-conforming commit's
    window must not flag; an all-video 1-span commit's window must."""
    import datetime as dt

    import pyspark.sql.functions as F

    from ovalspark.streaming.validate_stream import windowed_distribution_drift

    spec, _, docs, _ = small_world
    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    clean = docs.select("spans", F.lit(t0 + dt.timedelta(minutes=3)).alias("written_at"))
    skewed = docs.limit(100).select(
        F.transform(
            F.slice("spans", 1, 1), lambda s: s.withField("kind", F.lit("video"))
        ).alias("spans"),
        F.lit(t0 + dt.timedelta(minutes=23)).alias("written_at"),
    )
    pusher = docs.limit(1).select(
        "spans", F.lit(t0 + dt.timedelta(minutes=90)).alias("written_at")
    )
    root = str(tmp_path / "drift_tbl")
    snapshot_write(clean.repartition(2), root)
    snapshot_write(skewed.repartition(2), root, mode="append")
    snapshot_write(pusher.repartition(1), root, mode="append")

    register_snapshot_source(spark)
    out, ck = str(tmp_path / "drift_out"), str(tmp_path / "drift_ck")

    def run_once():
        stream = spark.readStream.format("ovalspark_snapshots").option("path", root).load()
        q = (
            windowed_distribution_drift(
                stream, spec.min_spans, spec.max_spans, window_dur="10 minutes", watermark="30 minutes"
            )
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # two runs: a Python source executes availableNow as one micro-batch
    # (engine fallback), and append-mode windows emit during a batch that
    # STARTS with the watermark already past their end — run 1 advances
    # the watermark to pusher-30min (checkpointed), a later commit gives
    # run 2 a data batch that evicts the finalized windows
    run_once()
    snapshot_write(
        docs.limit(1).select(
            "spans", F.lit(t0 + dt.timedelta(minutes=95)).alias("written_at")
        ).repartition(1),
        root,
        mode="append",
    )
    run_once()
    got = {r.window_start.minute: r for r in spark.read.parquet(out).collect()}
    assert set(got) == {0, 20}
    assert not got[0].ks_drifted and not got[0].chi2_drifted
    assert got[20].ks_drifted and got[20].chi2_drifted

    # bit-exact vs the BATCH form over the same table (watermark is a
    # no-op on batch frames; batch emits the unfinalized window too)
    batch = windowed_distribution_drift(
        snapshot_read(spark, root), spec.min_spans, spec.max_spans,
        window_dur="10 minutes", watermark="30 minutes",
    )
    brows = {r.window_start.minute: r for r in batch.collect()}
    for m, r in got.items():
        assert brows[m] == r


def test_stream_sink_commits_each_batch_as_snapshot(spark, tmp_path, low_spill):
    """writeStream INTO a snapshot table: a snapshot→snapshot pipeline
    over two availableNow runs — every batch is one append commit whose
    manifest records its stream_batch_id, the destination is a normal
    table (time travel, history, reads), and a restart moves exactly the
    new source commits across, no row twice."""
    from ovalspark.sources.snapshots import snapshot_history

    src, dst, ck = (str(tmp_path / d) for d in ("src", "dst", "ck"))
    for i in range(3):
        snapshot_write(_slice(spark, i * 10, (i + 1) * 10), src, mode="append" if i else "overwrite")
    register_snapshot_source(spark)

    def run_once():
        q = (
            spark.readStream.format("ovalspark_snapshots")
            .option("path", src)
            .load()
            .writeStream.format("ovalspark_snapshots")
            .option("path", dst)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    assert _rows(snapshot_read(spark, dst)) == sorted((str(v), v) for v in range(30))
    m1 = sn._load_manifest_raw(dst)
    assert m1["properties"]["stream_batch_id"] == 0

    snapshot_write(_slice(spark, 30, 40), src, mode="append")
    run_once()
    assert _rows(snapshot_read(spark, dst)) == sorted((str(v), v) for v in range(40))
    # destination is a first-class table: history shows the two appends
    ops = [r["operation"] for r in snapshot_history(spark, dst).collect()]
    assert ops.count("append") == 2
    # and it reads back through the format too (round trip)
    assert _load(spark, dst).count() == 40


def test_stream_sink_replay_is_idempotent_and_discards_restaged_files(
    spark, tmp_path, low_spill
):
    """The crash window the batch-id ledger closes: the engine replays a
    batch whose sink commit already landed (crash between sink commit
    and offset-log write). A direct writer-level replay with re-staged
    files must commit nothing and remove the replay's staging dirs."""
    import glob as _glob

    import pyarrow as pa

    from ovalspark.sources.stream_source import _SnapshotStreamWriter

    dst = str(tmp_path / "dst2")
    snapshot_write(_slice(spark, 0, 10), dst)
    schema = snapshot_read(spark, dst).schema
    w = _SnapshotStreamWriter(dst, schema, False, None)

    def staged_batch(lo, hi):
        batch = pa.RecordBatch.from_pydict(
            {"doc_id": [str(v) for v in range(lo, hi)], "v": list(range(lo, hi))}
        )
        return w.write(iter([batch]))

    # a real commit advances the table and records the ledger
    msg = staged_batch(10, 20)
    w.commit([msg], 7)
    assert snapshot_read(spark, dst).count() == 20
    assert sn._load_manifest_raw(dst)["properties"]["stream_batch_id"] == 7
    # replay of batch 7: nothing commits, the re-staged dir is removed
    sid_before = sn.current_snapshot_id(dst)
    replay = staged_batch(10, 20)
    w.commit([replay], 7)
    assert sn.current_snapshot_id(dst) == sid_before
    assert not os.path.exists(replay.dir)
    assert snapshot_read(spark, dst).count() == 20
    # an empty batch commits nothing but a LATER batch proceeds
    w.commit([], 8)
    assert sn.current_snapshot_id(dst) == sid_before
    w.commit([staged_batch(20, 25)], 9)
    assert snapshot_read(spark, dst).count() == 25
    # no stray staging dirs remain beyond committed ones
    for d in _glob.glob(os.path.join(dst, "data", "snap-st-*")):
        assert _glob.glob(os.path.join(d, "*.parquet"))


@pytest.mark.slow
def test_stream_sink_sigkill_mid_pipeline_resumes_exactly_once(spark, tmp_path, low_spill):
    """The north-rule crash scenario for the sink: a REAL child process
    runs the snapshot→snapshot pipeline on a short trigger while this
    process keeps committing source appends; the child is SIGKILLed
    mid-flight (committed batches, in-flight batch, unlogged offsets all
    possible), then the pipeline resumes from the engine checkpoint in
    THIS process. The destination must hold every source row exactly
    once and its stream_batch_id ledger must be strictly increasing —
    the replay window between sink commit and offset log is exactly what
    the per-table ledger closes."""
    import signal
    import subprocess
    import sys
    import time

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    src, dst, ck = (str(tmp_path / d) for d in ("src", "dst", "ck"))
    snapshot_write(_slice(spark, 0, 10), src)

    child_code = f"""
import sys
sys.path.insert(0, {repo!r})
from ovalspark.session import get_spark
from ovalspark.sources import register_snapshot_source
spark = get_spark(master="local[4]", shuffle_partitions=4)
register_snapshot_source(spark)
q = (spark.readStream.format("ovalspark_snapshots").option("path", {src!r}).load()
     .writeStream.format("ovalspark_snapshots").option("path", {dst!r})
     .option("checkpointLocation", {ck!r})
     .trigger(processingTime="200 milliseconds").start())
q.awaitTermination()
"""
    child = subprocess.Popen(
        [sys.executable, "-c", child_code],
        cwd=repo,
        env={**os.environ, "PYTHONPATH": repo},
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
    )
    try:
        # keep the source moving while the child streams; kill once the
        # destination has committed at least two stream batches
        killed = False
        deadline = time.time() + 180
        i = 1
        while time.time() < deadline and not killed:
            snapshot_write(_slice(spark, i * 10, (i + 1) * 10), src, mode="append")
            i += 1
            cur = sn.current_snapshot_id(dst)
            if cur is not None and cur >= 2:
                os.kill(child.pid, signal.SIGKILL)
                child.wait(timeout=60)
                killed = True
            else:
                time.sleep(0.5)
        assert killed, "destination never reached two commits before the deadline"
    finally:
        if child.poll() is None:
            child.kill()
            child.wait(timeout=60)

    n_src_rows = i * 10
    register_snapshot_source(spark)

    def drain():
        q = (
            spark.readStream.format("ovalspark_snapshots")
            .option("path", src)
            .load()
            .writeStream.format("ovalspark_snapshots")
            .option("path", dst)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    # twice: a Python source's availableNow is single-batch, and a run
    # that begins with the crash's UNCOMMITTED batch replays only that
    # batch's WAL range (the engine's own fallback caveat) — the second
    # run drains everything committed since
    drain()
    drain()
    got = _rows(snapshot_read(spark, dst))
    assert got == sorted((str(v), v) for v in range(n_src_rows))  # exactly once
    # the ledger is strictly increasing across the crash boundary
    ids, s = [], sn.current_snapshot_id(dst)
    while s:
        m = sn._load_manifest_raw(dst, s)
        b = (m.get("properties") or {}).get("stream_batch_id")
        if b is not None:
            ids.append(int(b))
        s = m["parent_id"]
    ids.reverse()
    assert ids == sorted(set(ids)), ids


def test_stream_sink_complete_mode_overwrites(spark, tmp_path, low_spill):
    """outputMode('complete') maps to overwrite commits: the destination
    holds exactly the aggregate's current state, re-runnable."""
    src, dst, ck = (str(tmp_path / d) for d in ("src3", "dst3", "ck3"))
    for i in range(3):
        snapshot_write(_slice(spark, i * 10, (i + 1) * 10), src, mode="append" if i else "overwrite")
    register_snapshot_source(spark)
    q = (
        spark.readStream.format("ovalspark_snapshots")
        .option("path", src)
        .load()
        .groupBy()
        .sum("v")
        .writeStream.format("ovalspark_snapshots")
        .option("path", dst)
        .option("checkpointLocation", ck)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = snapshot_read(spark, dst).collect()
    assert len(got) == 1 and got[0][0] == sum(range(30))
    assert sn._load_manifest_raw(dst)["operation"] == "overwrite"


def test_empty_table_and_delete_only_batch_plan_cleanly(spark, tmp_path, low_spill):
    """Zero-file plans: Spark's Python runner calls read(None) when
    partitions() returns an empty sequence, so an empty table (all rows
    deleted) and a delete-only micro-batch must plan a sentinel
    partition instead — batch count 0, stream advances emitting
    nothing."""
    root = str(tmp_path / "ds_empty_tbl")
    snapshot_write(_slice(spark, 0, 10), root)
    snapshot_delete(spark, root, "v >= 0")  # table now holds zero files
    register_snapshot_source(spark)
    df = _load(spark, root)
    assert df.count() == 0
    assert [f.name for f in df.schema.fields] == ["doc_id", "v"]
    assert _load(spark, root, prune="v:3:4").count() == 0

    # stream: first run consumes the append; the DELETE-ONLY second run
    # must advance the offset with an empty batch, not crash
    out, ck = str(tmp_path / "sink_e"), str(tmp_path / "ck_e")

    def run_once():
        q = (
            spark.readStream.format("ovalspark_snapshots")
            .option("path", root)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    snapshot_write(_slice(spark, 10, 20), root, mode="append")
    run_once()
    # append feed: commit 1's rows are in the feed even though the
    # delete removed them from table state
    assert _rows(spark.read.parquet(out)) == sorted((str(v), v) for v in range(20))
    snapshot_delete(spark, root, "v >= 10")  # a delete-only commit
    run_once()
    assert len(_rows(spark.read.parquet(out))) == 20  # advanced, emitted nothing
    # and the offset really advanced past the delete: a later append is
    # the ONLY thing the next run delivers
    snapshot_write(_slice(spark, 20, 25), root, mode="append")
    run_once()
    assert len(_rows(spark.read.parquet(out))) == 25


def test_stream_follows_a_live_writer(spark, tmp_path, low_spill):
    """The living form: a processingTime stream is consuming while a
    writer thread commits appends — every committed row arrives exactly
    once without restarts (latestOffset polls CURRENT between
    micro-batches; commit atomicity means a torn commit is never an
    offset)."""
    import threading
    import time

    root = str(tmp_path / "ds_live_tbl")
    out, ck = str(tmp_path / "sink_live"), str(tmp_path / "ck_live")
    snapshot_write(_slice(spark, 0, 10), root)
    register_snapshot_source(spark)

    def writer():
        for i in range(1, 5):
            time.sleep(0.8)
            snapshot_write(_slice(spark, i * 10, (i + 1) * 10), root, mode="append")

    w = threading.Thread(target=writer)
    q = (
        spark.readStream.format("ovalspark_snapshots")
        .option("path", root)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(processingTime="300 milliseconds")
        .start()
    )
    w.start()
    w.join()
    deadline = time.time() + 60
    while time.time() < deadline:
        try:
            if spark.read.parquet(out).count() == 50:
                break
        except Exception:
            pass  # sink dir not yet created
        time.sleep(0.5)
    q.stop()
    q.awaitTermination(60)
    assert _rows(spark.read.parquet(out)) == sorted((str(v), v) for v in range(50))


def test_stream_overwrite_emits_new_generation(spark, tmp_path, low_spill):
    """An overwrite is a new table generation: the stream emits its full
    contents (the old generation's rows are a previous feed era)."""
    root = str(tmp_path / "ds_ow_tbl")
    snapshot_write(_slice(spark, 0, 10), root)
    register_snapshot_source(spark)
    out, ck = str(tmp_path / "sink3"), str(tmp_path / "ck3")

    def run_once():
        q = (
            spark.readStream.format("ovalspark_snapshots")
            .option("path", root)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    snapshot_write(_slice(spark, 100, 105), root, mode="overwrite")
    run_once()
    got = _rows(spark.read.parquet(out))
    assert got == sorted((str(v), v) for v in list(range(10)) + list(range(100, 105)))


# ---------------------------------------------------------------------------
# durable stream-sink ledger (stream_ledger.json)


def _staged(w, lo, hi):
    import pyarrow as pa

    batch = pa.RecordBatch.from_pydict(
        {"doc_id": [str(v) for v in range(lo, hi)], "v": list(range(lo, hi))}
    )
    return w.write(iter([batch]))


def test_ledger_survives_retention_expiry_no_double_commit(spark, tmp_path, low_spill):
    """Round-7's one remaining exactly-once hole: retention expires the
    manifests that carried stream_batch_id, then the engine replays the
    last batch. The manifest walk is blind past the expiry — the ledger
    FILE must still identify the replay and commit nothing."""
    from ovalspark.sources.snapshots import expire_snapshots
    from ovalspark.sources.stream_source import _SnapshotStreamWriter

    dst = str(tmp_path / "ledger_exp")
    snapshot_write(_slice(spark, 0, 10), dst)
    schema = snapshot_read(spark, dst).schema
    w = _SnapshotStreamWriter(dst, schema, False, None)
    w.commit([_staged(w, 10, 20)], 3)
    stream_sid = sn.current_snapshot_id(dst)

    # interleaved non-stream commits bury the stream commit, then
    # retention expires everything at or below it
    for i in range(3):
        snapshot_write(_slice(spark, 100 + i * 10, 110 + i * 10), dst, mode="append")
    expire_snapshots(dst, keep_last=2, do_vacuum=False)
    with pytest.raises(FileNotFoundError):
        sn._load_manifest_raw(dst, stream_sid)  # the walk alone is blind now

    rows_before = snapshot_read(spark, dst).count()
    sid_before = sn.current_snapshot_id(dst)
    replay = _staged(w, 10, 20)
    w.commit([replay], 3)  # replayed batch
    assert sn.current_snapshot_id(dst) == sid_before  # no double-commit
    assert snapshot_read(spark, dst).count() == rows_before
    assert not os.path.exists(replay.dir)
    # and the NEXT batch proceeds normally
    w.commit([_staged(w, 200, 205)], 4)
    assert snapshot_read(spark, dst).count() == rows_before + 5


def test_fresh_checkpoint_refused_not_silently_discarded(spark, tmp_path, low_spill):
    """A new query on a fresh checkpoint restarts batch ids at 0; the old
    behavior silently discarded every batch with id <= the table ledger —
    silent data loss. The sink must refuse with the epoch remedy, and an
    explicit epoch bump must start a fresh sequence with replay
    protection intact inside the new epoch."""
    from ovalspark.sources.stream_source import _SnapshotStreamWriter

    dst = str(tmp_path / "ledger_fresh")
    snapshot_write(_slice(spark, 0, 10), dst)
    schema = snapshot_read(spark, dst).schema
    w0 = _SnapshotStreamWriter(dst, schema, False, None)
    w0.commit([_staged(w0, 10, 20)], 5)

    # fresh checkpoint, same epoch: batch 0 < ledger 5 -> refuse loudly
    fresh = _SnapshotStreamWriter(dst, schema, False, None)
    with pytest.raises(ValueError, match="ledger_epoch"):
        fresh.commit([_staged(fresh, 20, 25)], 0)

    # deliberate epoch bump: batch 0 commits, replay of (1, 0) discards
    w1 = _SnapshotStreamWriter(dst, schema, False, None, epoch=1)
    w1.commit([_staged(w1, 20, 25)], 0)
    assert snapshot_read(spark, dst).count() == 25
    sid = sn.current_snapshot_id(dst)
    replay = _staged(w1, 20, 25)
    w1.commit([replay], 0)
    assert sn.current_snapshot_id(dst) == sid
    assert not os.path.exists(replay.dir)

    # a stale writer from the superseded epoch raises instead of racing
    with pytest.raises(ValueError, match="epoch"):
        w0.commit([_staged(w0, 30, 35)], 6)


def test_ledger_walk_amortized_over_interleaved_commits(spark, tmp_path, low_spill, monkeypatch):
    """Round-7 defect #1: each micro-batch walked manifests from CURRENT
    back to the last stream commit — O(interleaved commits) PER BATCH.
    With checked_through in the ledger, each interleaved commit is
    examined once ever: a second batch after k interleaved commits loads
    O(k) manifests, and a replay right after it loads O(1)."""
    from ovalspark.sources.stream_source import _SnapshotStreamWriter

    dst = str(tmp_path / "ledger_walk")
    snapshot_write(_slice(spark, 0, 10), dst)
    schema = snapshot_read(spark, dst).schema
    w = _SnapshotStreamWriter(dst, schema, False, None)
    w.commit([_staged(w, 10, 20)], 0)

    for i in range(6):  # interleaved non-stream commits
        snapshot_write(_slice(spark, 100 + i * 10, 105 + i * 10), dst, mode="append")

    loads = {"n": 0}
    real = sn._load_manifest_raw

    def counting(root, snapshot_id=None):
        loads["n"] += 1
        return real(root, snapshot_id)

    monkeypatch.setattr(sn, "_load_manifest_raw", counting)
    best, cur = w._last_stream_state()
    assert best == (0, 0)
    first_walk = loads["n"]
    assert first_walk <= 7  # the 6 interleaved + at most the stream commit

    # committing batch 1 advances checked_through to its own snapshot
    loads["n"] = 0
    monkeypatch.setattr(sn, "_load_manifest_raw", real)
    w.commit([_staged(w, 20, 25)], 1)
    monkeypatch.setattr(sn, "_load_manifest_raw", counting)
    loads["n"] = 0
    best, cur = w._last_stream_state()
    assert best == (0, 1)
    assert loads["n"] <= 1  # nothing above checked_through but CURRENT itself


# ---------------------------------------------------------------------------
# CDC feed (.option("cdc", "true"))


def _drain_cdc(spark, root, sink):
    register_snapshot_source(spark)
    q = (
        spark.readStream.format("ovalspark_snapshots")
        .option("path", root)
        .option("cdc", "true")
        .load()
        .writeStream.format("parquet")
        .option("path", f"{sink}/out")
        .option("checkpointLocation", f"{sink}/ck")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.read.parquet(f"{sink}/out")


def _fold_mirror(feed):
    """Fold a CDC feed into table state: keep each doc's newest event,
    drop it if that event is a delete. Key-delete semantics over the
    library's doc_id-keyed data model."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    # newest commit wins; within ONE commit insert beats delete (an
    # overwrite retracts the old generation and inserts the new in the
    # same commit — a re-inserted key's new row must survive the fold)
    w = Window.partitionBy("doc_id").orderBy(
        F.col("_commit_id").desc(), F.col("_op").desc()
    )
    return (
        feed.withColumn("_rank", F.row_number().over(w))
        .filter("_rank = 1 AND _op = 'insert'")
        .drop("_rank", "_op", "_commit_id")
    )


def test_cdc_mirror_converges_through_delete_compact_overwrite(spark, tmp_path, low_spill):
    """The round-7 'Missing #3' scenario: a mirror built purely from the
    feed. History: 3 appends, a Column-predicate delete, a compaction
    (layout only), an overwrite (truncate-and-load), one more append.
    The folded mirror must hash-match snapshot_read at CURRENT; the
    compaction must contribute ZERO events (a re-emitted survivor would
    double rows)."""
    from pyspark.sql import functions as F

    from ovalspark.sources.snapshots import snapshot_compact

    root = str(tmp_path / "cdc_src")
    snapshot_write(_slice(spark, 0, 20), root)
    snapshot_write(_slice(spark, 20, 40), root, mode="append")
    snapshot_write(_slice(spark, 40, 60), root, mode="append")
    snapshot_delete(spark, root, F.col("v") % 3 == 0)  # Column pred -> sidecar
    snapshot_compact(spark, root, target_file_mb=64)
    snapshot_write(_slice(spark, 100, 130), root)  # overwrite: truncate-and-load
    snapshot_write(_slice(spark, 130, 140), root, mode="append")

    feed = _drain_cdc(spark, root, str(tmp_path / "cdc_sink"))
    assert set(feed.columns) == {"doc_id", "v", "_op", "_commit_id"}
    # compaction (commit 5) emitted nothing
    assert feed.filter("_commit_id = 5").count() == 0
    # the delete commit emitted key-only retractions: doc_id set, v NULL
    dels = feed.filter("_commit_id = 4")
    assert dels.count() == 20  # v in 0..59, v % 3 == 0
    assert dels.filter("_op != 'delete' OR v IS NOT NULL").count() == 0
    # the overwrite retracted the whole surviving parent generation
    assert feed.filter("_commit_id = 6 AND _op = 'delete'").count() == 40
    assert feed.filter("_commit_id = 6 AND _op = 'insert'").count() == 30

    mirror = _rows(_fold_mirror(feed))
    truth = _rows(snapshot_read(spark, root))
    assert mirror == truth  # exact convergence, 40 rows
    assert len(truth) == 40


def test_cdc_default_mode_unchanged_and_batch_refused(spark, tmp_path, low_spill):
    """Default (append-feed) behavior must stay byte-identical — no _op
    column, deletes emit nothing; and the cdc option on a BATCH read
    refuses with guidance."""
    from pyspark.sql.utils import AnalysisException

    root = str(tmp_path / "cdc_default")
    snapshot_write(_slice(spark, 0, 10), root)
    snapshot_delete(spark, root, "v < 3")
    register_snapshot_source(spark)

    sink = str(tmp_path / "cdc_default_sink")
    q = (
        spark.readStream.format("ovalspark_snapshots")
        .option("path", root)
        .load()
        .writeStream.format("parquet")
        .option("path", f"{sink}/out")
        .option("checkpointLocation", f"{sink}/ck")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.read.parquet(f"{sink}/out")
    assert set(got.columns) == {"doc_id", "v"}
    assert got.count() == 10  # append feed: the delete retracts nothing

    with pytest.raises(Exception, match="cdc.*STREAMING|STREAMING.*cdc"):
        spark.read.format("ovalspark_snapshots").option("path", root).option(
            "cdc", "true"
        ).load().collect()


def test_cdc_refuses_sql_string_delete_loudly(spark, tmp_path, low_spill):
    """A SQL-string delete records no deleted-docs sidecar: the CDC feed
    must fail with a diagnosis naming the commit and the remedy, never
    silently skip a retraction."""
    root = str(tmp_path / "cdc_sqldel")
    snapshot_write(_slice(spark, 0, 10), root)
    snapshot_delete(spark, root, "v < 5")  # SQL string -> no sidecar
    register_snapshot_source(spark)
    sink = str(tmp_path / "cdc_sqldel_sink")
    q = (
        spark.readStream.format("ovalspark_snapshots")
        .option("path", root)
        .option("cdc", "true")
        .load()
        .writeStream.format("parquet")
        .option("path", f"{sink}/out")
        .option("checkpointLocation", f"{sink}/ck")
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="Column-predicate|sidecar"):
        q.awaitTermination(300)


def test_pushdown_cache_hazard_still_present_flip_optin_when_fixed(
    spark, tmp_path, low_spill
):
    """REGRESSION CANARY for the documented Spark 4.1 partition-cache
    hazard that makes pushdown opt-in: violating the one-load()-per-query
    rule on purpose — a filtered query, then an UNFILTERED query on the
    SAME pushdown load() — must today be served the cached PRUNED
    listing (an undercount). When a Spark upgrade re-plans unfiltered
    queries correctly, this test FAILS: that is the signal to flip
    pushdown to default-on and retire the usage rule (see
    _PruningBatchReader's docstring)."""
    root = str(tmp_path / "ds_hazard_tbl")
    for i in range(8):
        snapshot_write(_slice(spark, i * 10, (i + 1) * 10), root, mode="append" if i else "overwrite")
    register_snapshot_source(spark)
    df = _load(spark, root, pushdown="true")  # ONE load, reused: the violation
    assert df.filter("v >= 71 and v <= 72").count() == 2  # pruned, correct
    stale = df.count()  # unfiltered on the same load
    assert stale < 80, (
        "Spark re-planned the unfiltered query on a cached pushdown load - "
        "the 4.1 partition-cache hazard is gone; make pushdown the default "
        "and drop the one-load()-per-query rule"
    )
    # a FRESH load stays correct — the hazard is load-scoped, not global
    assert _load(spark, root, pushdown="true").count() == 80


def test_catchup_span_plans_with_one_manifest_load_per_commit(
    spark, tmp_path, low_spill, monkeypatch
):
    """Round-7 'wrong' #8: a k-commit catch-up (stream resuming after
    downtime) loaded ~3 manifests per commit (one directly + two inside
    each manifest_diff). Consecutive commits share their parent dict
    now: the span must plan with k+1 loads and the SAME file set."""
    from ovalspark.sources.stream_source import _SnapshotStreamReader

    root = str(tmp_path / "catchup_tbl")
    k = 20
    for i in range(k):
        snapshot_write(_slice(spark, i * 10, (i + 1) * 10), root, mode="append" if i else "overwrite")

    expected = []
    for sid in range(2, k + 1):
        expected.extend(sn.manifest_diff(root, sid - 1, sid))
    expected.extend(sn.manifest_diff(root, None, 1))

    loads = {"n": 0}
    real = sn._load_manifest_raw

    def counting(r, snapshot_id=None):
        loads["n"] += 1
        return real(r, snapshot_id)

    monkeypatch.setattr(sn, "_load_manifest_raw", counting)
    reader = _SnapshotStreamReader(root, 0, snapshot_read(spark, root).schema)
    parts = reader.partitions({"snapshot_id": 0}, {"snapshot_id": k})
    assert loads["n"] <= k + 1
    assert sorted(p.path for p in parts) == sorted(expected)
