"""Checkpoint manifest — per-partition lineage for resumable runs.

The engine analog of oval's ExecutionContext save/load
(``internal/runner/runner.go:250-273`` save, ``:71-104`` load, and the
follower/leader resume scenarios in /root/reference ``README.md:200-236``):
a JSON document recording, per (constraint, partition), the row count,
violation count, and completion status, keyed by constraint VERSION so a
changed constraint invalidates its own records and nothing else.

Writes are atomic (tmp file + rename) — a run killed mid-save leaves the
previous manifest intact, matching oval's load-time integrity expectations.
"""

from __future__ import annotations

import json
import os
import tempfile
from dataclasses import dataclass, field
from typing import Any


@dataclass
class Manifest:
    path: str
    run_id: str = "run-0"
    engine_version: str = "0.1.0"
    inputs: dict[str, Any] = field(default_factory=dict)
    # constraints[name] = {"version": str, "partitions": {str(pid): record}}
    constraints: dict[str, dict[str, Any]] = field(default_factory=dict)

    @classmethod
    def load_or_create(cls, path: str, run_id: str = "run-0", inputs: dict[str, Any] | None = None) -> "Manifest":
        if os.path.exists(path):
            with open(path) as f:
                raw = json.load(f)
            return cls(
                path=path,
                run_id=raw.get("run_id", run_id),
                engine_version=raw.get("engine_version", "0.1.0"),
                inputs=raw.get("inputs", {}),
                constraints=raw.get("constraints", {}),
            )
        return cls(path=path, run_id=run_id, inputs=inputs or {})

    def save(self) -> None:
        d = os.path.dirname(self.path) or "."
        os.makedirs(d, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=d, prefix=".manifest-")
        try:
            with os.fdopen(fd, "w") as f:
                json.dump(
                    {
                        "run_id": self.run_id,
                        "engine_version": self.engine_version,
                        "inputs": self.inputs,
                        "constraints": self.constraints,
                    },
                    f,
                    indent=1,
                    sort_keys=True,
                )
            os.replace(tmp, self.path)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)

    def done_partitions(self, name: str, version: str) -> set[int]:
        rec = self.constraints.get(name)
        if not rec or rec.get("version") != version:
            return set()
        return {int(p) for p, r in rec.get("partitions", {}).items() if r.get("status") == "done"}

    def mark_done(self, name: str, version: str, partition_records: dict[int, dict[str, Any]]) -> None:
        rec = self.constraints.get(name)
        if not rec or rec.get("version") != version:
            rec = {"version": version, "partitions": {}}
            self.constraints[name] = rec
        for pid, r in partition_records.items():
            rec["partitions"][str(pid)] = {**r, "status": "done"}

    def record_observed(self, name: str, version: str, metrics: dict[str, Any]) -> None:
        """Attach live run metrics (df.observe counters measured during the
        constraint's own write action — the oval stat-counter analog,
        /root/reference/internal/stat/stat.go:8-51) to the constraint
        record. Keyed by version like partitions; metrics describe the
        LATEST pass over this constraint."""
        rec = self.constraints.get(name)
        if not rec or rec.get("version") != version:
            rec = {"version": version, "partitions": {}}
            self.constraints[name] = rec
        rec["observed"] = {k: int(v) for k, v in metrics.items()}

    def totals(self) -> dict[str, dict[str, int]]:
        out = {}
        for name, rec in self.constraints.items():
            parts = rec.get("partitions", {})
            out[name] = {
                "partitions": len(parts),
                "violations": sum(int(r.get("violation_count", 0)) for r in parts.values()),
                "rows": sum(int(r.get("row_count", 0)) for r in parts.values()),
            }
        return out
