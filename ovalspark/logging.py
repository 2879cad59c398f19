"""Structured run logging — plain and JSON line formats (U7).

oval's logger selects plain-text or JSON output via a --log-format flag
(/root/reference/internal/logger/logger.go:17-42, cmd flag root.go); the
engine mirrors that: one line per event, either

    2026-08-16T12:00:00Z INFO constraint.done name=span_sequence violations=3

or the same event as a JSON object. Events go to stderr so stdout stays a
machine-parseable report channel (the CLI's final JSON report line).

Deliberately tiny: no handlers/hierarchies — a validation run emits a
handful of lifecycle events, and anything fancier belongs to the host's
log shipper. Timestamps are UTC RFC3339, matching the engine's UTC
session pinning.
"""

from __future__ import annotations

import json
import sys
import time
from typing import Any, TextIO

LEVELS = {"debug": 10, "info": 20, "warn": 30, "error": 40}


class RunLogger:
    """One-line-per-event logger with plain|json formats."""

    def __init__(self, fmt: str = "plain", level: str = "info", stream: TextIO | None = None):
        if fmt not in ("plain", "json"):
            raise ValueError(f"log format must be plain|json, got {fmt!r}")
        if level not in LEVELS:
            raise ValueError(f"log level must be one of {sorted(LEVELS)}, got {level!r}")
        self.fmt = fmt
        self.min_level = LEVELS[level]
        self.stream = stream if stream is not None else sys.stderr

    def log(self, level: str, event: str, **fields: Any) -> None:
        if LEVELS[level] < self.min_level:
            return
        ts = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
        if self.fmt == "json":
            line = json.dumps({"ts": ts, "level": level, "event": event, **fields}, sort_keys=True)
        else:
            kv = " ".join(f"{k}={fields[k]}" for k in fields)
            line = f"{ts} {level.upper()} {event}" + (f" {kv}" if kv else "")
        print(line, file=self.stream)

    def debug(self, event: str, **fields: Any) -> None:
        self.log("debug", event, **fields)

    def info(self, event: str, **fields: Any) -> None:
        self.log("info", event, **fields)

    def warn(self, event: str, **fields: Any) -> None:
        self.log("warn", event, **fields)

    def error(self, event: str, **fields: Any) -> None:
        self.log("error", event, **fields)


class NullLogger(RunLogger):
    """Default when no logger is supplied — drops everything."""

    def __init__(self):
        super().__init__(fmt="plain", level="error")

    def log(self, level: str, event: str, **fields: Any) -> None:  # noqa: ARG002
        return
