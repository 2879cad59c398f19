"""Capture .explain('formatted') for the headline bench queries.

Usage: python tools/capture_plans.py <suffix> [query ...]
Writes plans/r10/<query>_<suffix>.txt for each query (default: all
headline queries). Plan capture only — no execution beyond what query
construction itself materializes (q40's publish-once inputs).
"""

from __future__ import annotations

import os
import sys


def main() -> int:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    import __spark_entry__ as entrymod
    from ovalspark.session import get_spark

    spark = get_spark(
        app_name="ovalspark-plans",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    qs = {**entrymod.retired_queries(), **entrymod.queries()}
    names = [n for n in __import__("bench").HEADLINE if not only or n in only]
    out_dir = os.path.join(repo, "plans", "r10")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(f"wrote {name}_{suffix}.txt ({plan.count('Exchange')} Exchange refs)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
