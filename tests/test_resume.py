"""Checkpoint/resume: interrupted-then-resumed must produce byte-identical
violation output to an uninterrupted run (north_rule; oval save/load +
SIGINT scenarios, /root/reference/README.md:200-236, Makefile:76-81)."""

from __future__ import annotations

import glob
import json
import os
import shutil

import pytest

from ovalspark.datagen import inject_faults
from ovalspark.plans import Manifest, default_plan, run_plan
from ovalspark.plans.runner import ValidationFailure


def _read_canonical(out_dir: str) -> dict[str, bytes]:
    """partition-dir -> concatenated sorted-file bytes (names excluded)."""
    out = {}
    for pdir in sorted(glob.glob(f"{out_dir}/*/partition_id=*")):
        key = os.path.relpath(pdir, out_dir)
        files = sorted(f for f in glob.glob(f"{pdir}/part-*") if not f.endswith(".crc"))
        out[key] = b"".join(open(f, "rb").read() for f in files)
    return out


@pytest.fixture(scope="module")
def world(small_world):
    spec, cat, docs, assets = small_world
    fr = {c: 0.02 for c in ("WRONG_KIND", "STALE_GENERATION", "SIZE_MISMATCH", "LOST_DOC", "DUP_DOC_ID", "WRONG_MEDIA_REF")}
    bad, _ = inject_faults(docs, cat, spec, fr, phantom_fraction=0.03)
    return spec, cat, bad.cache(), assets


def test_full_run_and_verdicts(world, tmp_path):
    spec, cat, bad, assets = world
    plan = default_plan(spec.n_assets, broadcast_catalog=True)
    res = run_plan(plan, bad, cat, assets, str(tmp_path / "out"), str(tmp_path / "manifest.json"))
    assert not res.passed
    assert set(res.verdicts) == set(range(spec.n_shards))
    assert res.totals["span_sequence"]["violations"] > 0
    assert res.totals["existence"]["violations"] > 0
    assert res.totals["uniqueness"]["violations"] > 0
    assert res.totals["referential"]["violations"] > 0


def test_observed_metrics_in_manifest(world, tmp_path):
    """Live df.observe counters (A1 / oval stat.go analog) land in the
    manifest per constraint and agree with the written-output counts."""
    spec, cat, bad, assets = world
    plan = default_plan(spec.n_assets, broadcast_catalog=True)
    out, man = str(tmp_path / "out"), str(tmp_path / "manifest.json")
    res = run_plan(plan, bad, cat, assets, out, man)
    m = json.load(open(man))
    for name, totals in res.totals.items():
        obs = m["constraints"][name]["observed"]
        assert obs["violations_found"] == totals["violations"]
        assert obs["rows_scanned"] == totals["rows"]
        assert obs["rows_scanned"] > 0


def test_rerun_is_noop(world, tmp_path):
    """Re-running a completed run skips everything (idempotent /start, O8)."""
    spec, cat, bad, assets = world
    plan = default_plan(spec.n_assets, broadcast_catalog=True)
    out, man = str(tmp_path / "out"), str(tmp_path / "manifest.json")
    run_plan(plan, bad, cat, assets, out, man)
    m1 = json.load(open(man))
    snap = _read_canonical(out)
    res2 = run_plan(plan, bad, cat, assets, out, man)
    assert json.load(open(man)) == m1
    assert _read_canonical(out) == snap
    assert not res2.passed


def test_resume_partition_level_byte_identical(world, tmp_path):
    """Kill-after-k-partitions: drop partitions 2,3 from the manifest and
    delete their outputs; resume must regenerate them byte-identically."""
    spec, cat, bad, assets = world
    plan = default_plan(spec.n_assets, broadcast_catalog=True)
    out_a, man_a = str(tmp_path / "a"), str(tmp_path / "ma.json")
    run_plan(plan, bad, cat, assets, out_a, man_a)
    golden = _read_canonical(out_a)

    # simulate interrupted run: copy outputs, then erase partitions >= 2
    out_b, man_b = str(tmp_path / "b"), str(tmp_path / "mb.json")
    shutil.copytree(out_a, out_b)
    m = Manifest.load_or_create(man_a)
    m.path = man_b
    for rec in m.constraints.values():
        for pid in list(rec["partitions"]):
            if int(pid) >= 2:
                del rec["partitions"][pid]
    m.save()
    for pdir in glob.glob(f"{out_b}/*/partition_id=*"):
        if int(pdir.rsplit("=", 1)[1]) >= 2:
            shutil.rmtree(pdir)

    res = run_plan(plan, bad, cat, assets, out_b, man_b)
    assert _read_canonical(out_b) == golden
    assert not res.passed


def test_resume_after_fail_fast(world, tmp_path):
    """Constraint-level interruption: fail_fast aborts at the first dirty
    constraint; resuming without it completes the rest and the combined
    output equals an uninterrupted run."""
    spec, cat, bad, assets = world
    plan = default_plan(spec.n_assets, broadcast_catalog=True)
    out_a, man_a = str(tmp_path / "a"), str(tmp_path / "ma.json")
    run_plan(plan, bad, cat, assets, out_a, man_a)
    golden = _read_canonical(out_a)

    out_b, man_b = str(tmp_path / "b"), str(tmp_path / "mb.json")
    with pytest.raises(ValidationFailure):
        run_plan(plan, bad, cat, assets, out_b, man_b, fail_fast=True)
    partial = _read_canonical(out_b)
    assert set(partial) < set(golden)  # strictly fewer outputs written
    run_plan(plan, bad, cat, assets, out_b, man_b)
    assert _read_canonical(out_b) == golden


def test_constraint_version_bump_invalidates(world, tmp_path):
    spec, cat, bad, assets = world
    plan = default_plan(spec.n_assets, broadcast_catalog=True)
    out, man = str(tmp_path / "out"), str(tmp_path / "m.json")
    run_plan(plan, bad, cat, assets, out, man)
    m = Manifest.load_or_create(man)
    assert m.done_partitions("span_sequence", "1") == set(range(spec.n_shards))
    assert m.done_partitions("span_sequence", "2") == set()  # new version → redo

def test_parquet_sink_matches_json(world, tmp_path):
    """The parquet violation sink must record the same totals/verdicts as
    json, and be byte-deterministic across identical runs (the resume
    byte-identity bar applies to both formats)."""
    import glob
    import hashlib

    spec, cat, bad, assets = world
    plan = default_plan(spec.n_assets, broadcast_catalog=True)
    rj = run_plan(plan, bad, cat, assets, str(tmp_path / "oj"), str(tmp_path / "mj.json"))
    rp = run_plan(plan, bad, cat, assets, str(tmp_path / "op"), str(tmp_path / "mp.json"), sink_format="parquet")
    assert rp.totals == rj.totals
    assert rp.verdicts == rj.verdicts

    rp2 = run_plan(plan, bad, cat, assets, str(tmp_path / "op2"), str(tmp_path / "mp2.json"), sink_format="parquet")
    assert rp2.totals == rp.totals

    def digest(root):
        # key by (constraint/partition dir, part index): parquet file
        # names embed a per-write UUID, the BYTES are what must match
        out = {}
        for p in sorted(glob.glob(f"{root}/**/part-*", recursive=True)):
            rel = p.split(str(tmp_path))[1].split("/", 2)[2]
            d, base = rel.rsplit("/", 1)
            out[f"{d}/{base.split('-')[1]}"] = hashlib.md5(open(p, "rb").read()).hexdigest()
        return out

    assert digest(str(tmp_path / "op")) == digest(str(tmp_path / "op2"))
