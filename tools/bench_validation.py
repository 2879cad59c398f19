"""Scaling-efficiency evidence: run the SAME validation job on the SAME
materialized input at two parallelism levels (the sandbox stand-in for
N vs 4N executors — BASELINE.json north_rule).

  python tools/bench_validation.py prepare   # materialize bench world once
  python tools/bench_validation.py run 8     # time full plan at local[8]
  python tools/bench_validation.py run 32    # time full plan at local[32]

``run`` prints one JSON line {"cpus": N, "seconds": S, "docs": D,
"docs_per_sec": R}. Each run is a fresh JVM (invoke as separate
processes) so the two measurements don't share executor state.
"""

from __future__ import annotations

import json
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

WORLD = "/tmp/ovalspark_bench_world"

# sized to run ~tens of seconds at local[8]: 32 shards x 24k docs ≈ 768k
# docs, ~4.3M spans (truncated-exp mean ≈ 5.6 of max 16)
SPEC_KW = dict(n_runners=4, n_writers=8, docs_per_writer=24000, max_spans=16, hot_shard_factor=2)
FAULTS = {"WRONG_KIND": 0.01, "STALE_GENERATION": 0.01, "SIZE_MISMATCH": 0.01, "LOST_DOC": 0.01, "DUP_DOC_ID": 0.01}


def prepare() -> None:
    from ovalspark.datagen import GenSpec, generate_assets, generate_catalog, generate_documents, inject_faults
    from ovalspark.session import get_spark
    from ovalspark.sources import TableSet

    shutil.rmtree(WORLD, ignore_errors=True)
    spark = get_spark(master="local[32]", shuffle_partitions=32,
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spec = GenSpec(**SPEC_KW)
    cat = generate_catalog(spark, spec)
    docs = generate_documents(cat, spec)
    bad, _ = inject_faults(docs, cat, spec, FAULTS, phantom_fraction=0.02)
    TableSet(docs=bad, catalog=cat, assets=generate_assets(spark, spec)).save(WORLD)
    print(json.dumps({"prepared": WORLD, "docs": spark.read.parquet(f"{WORLD}/documents").count()}))


def run(cpus: int) -> None:
    from ovalspark.operators import check_existence, check_partition_counts, check_uniqueness, validate_spans
    from ovalspark.session import get_spark

    spark = get_spark(
        app_name=f"ovalspark-scale-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 32),
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    docs = spark.read.parquet(f"{WORLD}/documents")
    cat = spark.read.parquet(f"{WORLD}/catalog")
    n_docs = docs.count()
    spark.range(1000).selectExpr("sum(id)").collect()  # JVM warm

    t0 = time.perf_counter()
    v = (
        validate_spans(docs, cat, broadcast_catalog=True)
        .unionByName(check_existence(docs, cat))
        .unionByName(check_partition_counts(docs, cat))
        .unionByName(check_uniqueness(docs))
    )
    v.write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    print(json.dumps({"cpus": cpus, "seconds": round(dt, 2), "docs": n_docs, "docs_per_sec": round(n_docs / dt, 1)}))


if __name__ == "__main__":
    if sys.argv[1] == "prepare":
        prepare()
    else:
        run(int(sys.argv[2]))
