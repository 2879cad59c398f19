"""Table doctor: ONE idempotent maintenance entrypoint.

A long-lived table accumulates independent kinds of debt — pending
merge-on-read filters (read amplification), appends breaking a sorted
layout (dead pruning), small-file debris (per-file open cost), and
fragmented manifest segments (metadata bloat). Each has its own
maintenance op with its own trigger, and the ops have ORDERING
constraints (everything refuses to run over pending filters; compaction
destroys clustering). ``diagnose`` inspects PURE METADATA (one raw
manifest read + O(segment refs) expansions, zero data files opened) and
returns the ordered treatment plan with reasons; ``heal`` executes it.
Running ``heal`` twice converges: the second ``diagnose`` returns [].

This is the operational analog of oval's one-command workload loop
(`/root/reference/cmd/root.go`: a single invocation drives every
phase): a scheduler points one cron entry at ``maintain --heal`` per
table instead of encoding op selection and ordering itself.

Deliberate limits, documented rather than guessed at:
- a table with a DECLARED sort layout never gets bin-pack compaction
  (plain repartition would destroy the clustering that layout paid
  for); small-but-disjoint sorted files are left to the next full
  ``sort_rewrite``, whose file sizing owns that tradeoff
- z-ordered tables get no incremental layout repair (no single-key run
  structure); the dirty-layout finding is skipped
- retention (``expire_snapshots``) is POLICY, not hygiene — it deletes
  readable history, so the doctor never runs it implicitly
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import SparkSession

from ovalspark.sources import snapshots as _sn
from ovalspark.sources.snapshots import (
    _layout_dirty_entries,
    _load_manifest_raw,
    cluster_incremental,
    current_snapshot_id,
    materialize_deletes,
    merge_segments,
    snapshot_compact,
)


def diagnose(
    root: str,
    compact_target_mb: int = 128,
    segment_target_entries: int | None = None,
    snapshot_id: int | None = None,
    spark: SparkSession | None = None,
) -> list[dict[str, Any]]:
    """The table's ordered treatment plan, from metadata alone. Each
    finding: ``{"op", "reason", ...metrics}``, in safe execution order
    (materialize → cluster → compact → merge_segments).

    ``spark`` (optional): when the table carries a constraint contract,
    also run ``audit_constraints`` and surface any debt as a
    REPORT-ONLY finding (``op='audit_constraints'``, ``actionable:
    False``) — constraint debt is data the doctor must never "fix" by
    itself (the fixes are human decisions: rollback, targeted deletes,
    or explicit contract changes). Without ``spark`` the audit is
    skipped; the metadata findings are unchanged either way."""
    if current_snapshot_id(root) is None:
        raise FileNotFoundError(f"no committed snapshot at {root}")
    m_raw = _load_manifest_raw(root, snapshot_id)
    findings: list[dict[str, Any]] = []

    audit: list[dict[str, Any]] = []
    if spark is not None and m_raw.get("constraints"):
        from ovalspark.sources.constraints import audit_constraints

        _, detail = audit_constraints(spark, root, snapshot_id=m_raw["snapshot_id"])
        bad = [r for r in detail["rows"] if r["violated_rows"]]
        if bad:
            audit.append(
                {
                    "op": "audit_constraints",
                    "actionable": False,
                    "reason": f"{len(bad)} constraint(s) violated by live data — "
                    "contract debt is reported, never auto-fixed (the fixes are "
                    "decisions: rollback, targeted delete, or a contract change)",
                    "violations": {
                        r["constraint"]: r["violated_rows"] for r in bad
                    },
                }
            )

    filters = m_raw.get("row_filters") or []
    if filters:
        findings.append(
            {
                "op": "materialize_deletes",
                "reason": f"{len(filters)} pending merge-on-read filter(s): every "
                f"pre-scope read pays their anti-joins, and compaction/clustering/"
                f"segment-merge refuse to run until they fold",
                "pending_filters": len(filters),
            }
        )
        # everything below inspects the PHYSICAL layout, which
        # materialization is about to rewrite — re-diagnose after
        return findings + audit

    sort_by = m_raw.get("sort_by")
    if sort_by:
        dirty = _layout_dirty_entries(root, m_raw, list(sort_by)[0])
        if dirty is not None:
            findings.append(
                {
                    "op": "cluster_incremental",
                    "reason": f"{len(dirty)} file(s) break the declared "
                    f"sort_by={list(sort_by)} layout: point/range prunes scan "
                    f"them all; an O(delta) merge restores O(selected) plans",
                    "dirty_files": len(dirty),
                    "dirty_bytes": sum(fe["bytes"] for fe in dirty),
                }
            )
    elif not m_raw.get("zorder"):
        threshold = compact_target_mb * 1024 * 1024
        small = [f for f in m_raw["files"] if f["bytes"] < threshold]
        # inline entries only: spilled segments hold settled history, and
        # expanding them here would make diagnose O(inventory)
        if len(small) >= 2:
            findings.append(
                {
                    "op": "compact",
                    "reason": f"{len(small)} file(s) under {compact_target_mb} MB: "
                    f"per-file open/footer cost dominates scans as the append "
                    f"tail accumulates",
                    "small_files": len(small),
                    "small_bytes": sum(f["bytes"] for f in small),
                }
            )

    target = (
        int(segment_target_entries)
        if segment_target_entries is not None
        else 8 * _sn._SEGMENT_SPILL_ENTRIES
    )
    refs = m_raw.get("file_segments") or []
    fragmented = [r for r in refs if r["n_files"] < target // 2]
    if len(fragmented) >= 2:
        findings.append(
            {
                "op": "merge_segments",
                "reason": f"{len(fragmented)} manifest segment(s) under "
                f"{target // 2} entries: metadata expansion pays one read per "
                f"fragment instead of per {target}-entry segment",
                "fragmented_segments": len(fragmented),
            }
        )
    return findings + audit


def heal(
    spark: SparkSession,
    root: str,
    guard=None,
    compact_target_mb: int = 128,
    segment_target_entries: int | None = None,
    max_rounds: int = 4,
) -> list[dict[str, Any]]:
    """Execute ``diagnose``'s plan until the table is healthy (pending
    filters hide the physical findings, so materialization triggers one
    re-diagnose — ``max_rounds`` bounds the loop regardless). Returns
    the executed findings, each annotated with the snapshot id its op
    committed (or ``None`` when the op decided no commit was needed —
    the op's own no-op guard is always the last word)."""
    executed: list[dict[str, Any]] = []
    for _ in range(max_rounds):
        findings = [
            f
            for f in diagnose(
                root,
                compact_target_mb=compact_target_mb,
                segment_target_entries=segment_target_entries,
            )
            if f.get("actionable", True)
        ]
        if not findings:
            break
        for f in findings:
            before = current_snapshot_id(root)
            if f["op"] == "materialize_deletes":
                sid = materialize_deletes(spark, root, guard=guard)
            elif f["op"] == "cluster_incremental":
                sid = cluster_incremental(spark, root, guard=guard)
            elif f["op"] == "compact":
                sid = snapshot_compact(
                    spark, root, target_file_mb=compact_target_mb, guard=guard
                )
            else:
                sid = merge_segments(
                    root, guard=guard, target_entries=segment_target_entries
                )
            f["snapshot_id"] = sid if sid != before else None
            executed.append(f)
        if not any(f["snapshot_id"] for f in findings):
            break  # every op no-opped: re-diagnosing cannot make progress
    return executed
