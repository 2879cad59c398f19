"""ValidationPlan — the engine's IR.

The reference's only "plan" is its in-memory ExecutionContext object graph
(``internal/runner/runner.go:26-35`` in /root/reference). Here the plan is
an explicit, versioned list of constraints; each constraint is a pure
function (tables) -> violations DataFrame in the common VIOLATION_SCHEMA.
Versions are recorded in the checkpoint manifest so a resume only skips
partitions validated by the SAME constraint version (O2/O3 analog).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame

from ovalspark.functions import spans as sp
from ovalspark.operators import (
    check_existence,
    check_partition_counts,
    check_referential,
    check_uniqueness,
    validate_spans,
)


@dataclass(frozen=True)
class Constraint:
    """One validation rule.

    ``fn(docs, catalog, assets) -> violations`` must be partition-local
    with respect to ``partition_id`` unless ``partition_local=False``:
    partition-local constraints can be re-run on a subset of partitions
    during resume; global ones (e.g. uniqueness, which must see every copy
    of a doc_id) re-run whole whenever any partition is incomplete.
    """

    name: str
    version: str
    fn: Callable[[DataFrame, DataFrame, DataFrame | None], DataFrame]
    partition_local: bool = True


@dataclass(frozen=True)
class ValidationPlan:
    constraints: tuple[Constraint, ...]

    def names(self) -> list[str]:
        return [c.name for c in self.constraints]


def default_plan(
    n_assets: int = sp.DEFAULT_N_ASSETS,
    broadcast_catalog: bool = False,
    include_referential: bool = True,
    span_bounds: tuple[int, int] | None = None,
    fused: bool = False,
) -> ValidationPlan:
    """The full oval-parity plan: span-sequence + existence + counts +
    uniqueness (+ referential when an asset catalog is supplied,
    + distribution drift when the generator's span bounds are known).

    ``fused=True`` collapses the four core constraints into ONE
    single-pass constraint (operators/fused.py) — same violation rows,
    one input scan instead of four. Throughput mode; resume granularity
    for the fused block is per-run (skip only when fully complete). Not
    partition_local: the duplicate check must see every copy of a doc_id."""
    from ovalspark.operators.drift import check_distribution
    from ovalspark.operators.fused import validate_all

    if fused:
        constraints = [
            Constraint(
                "all_checks",
                "1",
                lambda d, c, a: validate_all(d, c, n_assets),
                partition_local=False,
            ),
        ]
    else:
        constraints = [
            Constraint(
                "span_sequence",
                "1",
                lambda d, c, a: validate_spans(d, c, n_assets, broadcast_catalog=broadcast_catalog),
            ),
            Constraint("existence", "1", lambda d, c, a: check_existence(d, c)),
            Constraint("partition_counts", "1", lambda d, c, a: check_partition_counts(d, c)),
            Constraint("uniqueness", "1", lambda d, c, a: check_uniqueness(d), partition_local=False),
        ]
    if include_referential:
        constraints.append(Constraint("referential", "1", lambda d, c, a: check_referential(d, a)))
    if span_bounds is not None:
        mn, mx = span_bounds
        constraints.append(
            Constraint("distribution", "1", lambda d, c, a: check_distribution(d, mn, mx))
        )
    return ValidationPlan(constraints=tuple(constraints))
