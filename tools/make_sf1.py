"""Deterministic sf1 world builder: a 10× replication of the driver's
sf0.1 testdata with key-space shifts, so the HEADLINE suite can run at
sf1 (the per-round bench gate only ever runs at sf0.1 — one order of
magnitude up is what catches superlinear creep the small scale hides).

  python tools/make_sf1.py            # writes /tmp/ovalspark_sf1
  SPARK_GRAFT_SF_DIR=/tmp/ovalspark_sf1 python bench.py

Replication rules (replica r in 0..9; r=0 is the identity):

* Scaling tables (lineitem, orders, customer, part, supplier, events,
  documents, embeddings): every foreign-key DOMAIN shifts by r×stride
  consistently on both sides (o_custkey and c_custkey move together,
  l_partkey and p_partkey, …), so join fan-outs per key are IDENTICAL
  to sf0.1 — only the key-space population grows 10×.
* Fixed dimensions (nation, region) stay as-is — TPC-H keeps them
  constant across scale factors, and the scaled tables' nationkeys
  still resolve against them.
* documents.text gets a per-replica word-level token suffix ("w" →
  "w_3") for r>0. This is the load-bearing choice: a bijective token
  rename preserves every INTRA-replica word-shingle Jaccard and token-
  count relationship exactly (q42's verified near-dup pairs scale
  LINEARLY: 10× the replicas, 10× the pairs) while making CROSS-replica
  shingle/simhash-feature overlap zero — naive text replication would
  instead make every doc a 10-clique of near-duplicates, a quadratic
  candidate-pair artifact that would masquerade as engine creep in the
  very measurement this world exists for. The distinct-token vocabulary
  grows ~10×, which is what a genuinely larger corpus does. (Cost: r>0
  text is ~+2 chars/word longer; char-proportional scans inherit a
  ~20% overhead — noted in BASELINE.md where the numbers land.)
* embeddings replicate with shifted vec_id and unchanged vectors: the
  headline ANN query (q27) is a linear scan + TakeOrdered, duplicate
  vectors change neither its cost shape nor its k.

Everything is derived from the read-only testdata by Spark column
expressions — no randomness, rebuildable byte-for-byte.
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPLICAS = 10
SRC = os.environ.get("SPARK_GRAFT_SF_DIR_SRC", "/root/testdata/sf0.1")
OUT = os.environ.get("SPARK_GRAFT_SF1_OUT", "/tmp/ovalspark_sf1")

# key-domain strides: one power of 10 above each domain's sf0.1 maximum,
# applied to EVERY column in that domain so joins stay consistent
STRIDES = {
    "orderkey": 1_000_000,
    "custkey": 100_000,
    "partkey": 100_000,
    "suppkey": 10_000,
    "event_id": 1_000_000,
    "user_id": 10_000,
    "vec_id": 10_000,
    "doc_id": 100_000,
}

# table → {column: key domain} (columns not listed pass through)
KEYED = {
    "lineitem": {"l_orderkey": "orderkey", "l_partkey": "partkey", "l_suppkey": "suppkey"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "customer": {"c_custkey": "custkey"},
    "part": {"p_partkey": "partkey"},
    "supplier": {"s_suppkey": "suppkey"},
    "events": {"event_id": "event_id", "user_id": "user_id"},
    "embeddings": {"vec_id": "vec_id"},
    "documents": {"doc_id": "doc_id"},
}
FIXED_DIMS = ["nation", "region"]


MARKER = "_OVALSPARK_SF1_COMPLETE"


def is_built(out: str = OUT) -> bool:
    """True if a PRIOR build ran to completion (marker written last —
    an interrupted build leaves no marker and gets rebuilt)."""
    return os.path.exists(os.path.join(out, MARKER))


def build(spark, src: str = SRC, out: str = OUT, quiet: bool = False) -> None:
    """Build the 10× world with an EXISTING session (bench.py shares its
    local[32] session; ``main`` wraps this for the CLI path)."""
    from pyspark.sql import functions as F

    if os.path.exists(out):
        shutil.rmtree(out)
    os.makedirs(out)

    for t in FIXED_DIMS:
        src_df = spark.read.parquet(f"{src}/{t}.parquet")
        src_df.write.parquet(f"{out}/{t}.parquet")
        if not quiet:
            print(f"{t}: fixed dim, {src_df.count()} rows")

    for t, keycols in KEYED.items():
        src_df = spark.read.parquet(f"{src}/{t}.parquet")
        replicas = []
        for r in range(REPLICAS):
            rep = src_df
            for col, domain in keycols.items():
                rep = rep.withColumn(col, F.col(col) + F.lit(r * STRIDES[domain]))
            if t == "documents" and r > 0:
                # bijective per-replica token rename — see module doc
                rep = rep.withColumn(
                    "text",
                    F.concat_ws(
                        " ",
                        F.transform(
                            F.split(F.col("text"), " "),
                            lambda w: F.concat(w, F.lit(f"_{r}")),
                        ),
                    ),
                ).withColumn("n_chars", F.length("text").cast("long"))
            replicas.append(rep)
        out_df = replicas[0]
        for rep in replicas[1:]:
            out_df = out_df.unionByName(rep)
        out_df.write.parquet(f"{out}/{t}.parquet")
        if not quiet:
            n = spark.read.parquet(f"{out}/{t}.parquet").count()
            print(f"{t}: {n} rows ({REPLICAS}x)")
    with open(os.path.join(out, MARKER), "w") as f:
        f.write("ok\n")


def main() -> int:
    from ovalspark.session import get_spark

    spark = get_spark(
        app_name="make-sf1",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=32,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    build(spark)
    print(f"sf1 world at {OUT}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
