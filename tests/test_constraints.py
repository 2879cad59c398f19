"""Table-attached constraint contracts: definition, the metadata-first
audit, commit-time enforcement, and contract carry across every commit
kind (sources/constraints.py)."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from ovalspark.sources.constraints import (
    ConstraintError,
    ConstraintViolationError,
    audit_constraints,
    drop_constraints,
    set_constraints,
    table_constraints,
)
from ovalspark.sources.snapshots import (
    current_snapshot_id,
    snapshot_compact,
    snapshot_delete,
    snapshot_read,
    snapshot_upsert,
    snapshot_write,
)


def _frame(spark, n=1000, nulls=0, over=0, dups=0, bad_lang=0):
    """Deterministic doc-shaped frame with injectable violations:
    ``nulls`` rows with NULL n_chars, ``over`` rows with n_chars above
    10_000, ``dups`` extra rows duplicating the first keys, ``bad_lang``
    rows with lang='xx' (check-expr violations)."""
    df = spark.range(n).select(
        F.format_string("doc%05d", F.col("id")).alias("doc_id"),
        F.when(F.col("id") < nulls, F.lit(None))
        .when(F.col("id") < nulls + over, F.col("id") + 100_000)
        .otherwise(F.col("id") % 5000)
        .cast("long")
        .alias("n_chars"),
        F.when(F.col("id") < bad_lang, F.lit("xx")).otherwise(F.lit("en")).alias("lang"),
    )
    if dups:
        # duplicate CLEAN rows (highest ids) so dup counts don't compound
        # with the null/over/lang injections on the low ids
        df = df.unionByName(df.orderBy(F.desc("doc_id")).limit(dups))
    return df


CONTRACT = [
    {"name": "pk", "kind": "unique", "column": "doc_id"},
    {"name": "chars_present", "kind": "not_null", "column": "n_chars"},
    {"name": "chars_bounded", "kind": "range", "column": "n_chars", "lo": 0, "hi": 10_000},
    {"name": "lang_known", "kind": "check", "expr": "lang IN ('en','de','fr')"},
]


# ---------------------------------------------------------------- definitions


def test_definition_errors(tmp_path, spark):
    root = str(tmp_path / "t")
    with pytest.raises(FileNotFoundError):
        set_constraints(root, CONTRACT, spark=spark)
    snapshot_write(_frame(spark, 100), root)
    for bad, msg in [
        ([{"name": "x", "kind": "nope"}], "kind"),
        ([{"kind": "not_null", "column": "n_chars"}], "name"),
        ([{"name": "x", "kind": "not_null"}], "column"),
        ([{"name": "x", "kind": "range", "column": "n_chars"}], "lo"),
        ([{"name": "x", "kind": "range", "column": "n_chars", "lo": 9, "hi": 1}], ">"),
        ([{"name": "x", "kind": "check"}], "expr"),
        (
            [
                {"name": "x", "kind": "not_null", "column": "n_chars"},
                {"name": "x", "kind": "unique", "column": "doc_id"},
            ],
            "duplicate",
        ),
        ([{"name": "x", "kind": "not_null", "column": "ghost"}], "ghost"),
        ([{"name": "x", "kind": "not_null", "column": "n_chars", "what": 1}], "unknown"),
    ]:
        with pytest.raises(ConstraintError, match=msg):
            set_constraints(root, bad, spark=spark, validate=False)


def test_set_add_drop_roundtrip(tmp_path, spark):
    root = str(tmp_path / "t")
    snapshot_write(_frame(spark, 200), root)
    sid = set_constraints(root, CONTRACT, spark=spark)
    assert sid == 2
    assert [c["name"] for c in table_constraints(root)] == [
        "pk",
        "chars_present",
        "chars_bounded",
        "lang_known",
    ]
    # add-mode name clash refuses
    with pytest.raises(ConstraintError, match="already exist"):
        set_constraints(root, [CONTRACT[0]], mode="add", spark=spark)
    # drop unknown refuses; drop known removes
    with pytest.raises(ConstraintError, match="no such"):
        drop_constraints(root, "ghost")
    drop_constraints(root, ["lang_known", "pk"])
    assert [c["name"] for c in table_constraints(root)] == [
        "chars_present",
        "chars_bounded",
    ]
    # a fully dropped contract stays dropped across the next commit
    drop_constraints(root, ["chars_present", "chars_bounded"])
    assert table_constraints(root) == []
    snapshot_write(_frame(spark, 10), root, mode="append")
    assert table_constraints(root) == []
    # time travel reads the contract as of the old snapshot
    assert [c["name"] for c in table_constraints(root, snapshot_id=2)] == [
        "pk",
        "chars_present",
        "chars_bounded",
        "lang_known",
    ]


# --------------------------------------------------------------------- audit


def test_audit_exact_counts_and_decisions(tmp_path, spark):
    root = str(tmp_path / "t")
    snapshot_write(
        _frame(spark, 1000, nulls=7, over=11, dups=3, bad_lang=5).repartition(4),
        root,
    )
    set_constraints(root, CONTRACT, spark=spark, validate=False)
    report, detail = audit_constraints(spark, root)
    rows = {r["constraint"]: r for r in detail["rows"]}
    # nulls=7 NULL n_chars; over=11 above hi (NULLs pass range);
    # dups=3 duplicated doc_ids -> 6 rows carry a duplicated key;
    # bad_lang=5 'xx' rows, but ids 0..6 have NULL n_chars (still lang
    # violations: lang is injected independently) -> exactly 5
    assert rows["chars_present"]["violated_rows"] == 7
    assert rows["chars_bounded"]["violated_rows"] == 11
    assert rows["pk"]["violated_rows"] == 6
    assert rows["lang_known"]["violated_rows"] == 5
    assert rows["lang_known"]["decided"] == "scan"  # check exprs always scan
    # report frame mirrors the detail rows
    got = {r["constraint"]: r["violated_rows"] for r in report.collect()}
    assert got == {k: v["violated_rows"] for k, v in rows.items()}


def test_audit_metadata_only_on_clean_table(tmp_path, spark):
    root = str(tmp_path / "t")
    # clustered on the range column -> tight per-file bounds; parquet
    # always records null_count, so both stats constraints decide from
    # the manifest with ZERO data files read
    snapshot_write(_frame(spark, 2000), root, sort_by=["n_chars"])
    set_constraints(
        root,
        [CONTRACT[1], CONTRACT[2]],
        spark=spark,
    )
    _, detail = audit_constraints(spark, root)
    assert detail["files_scanned"] == 0
    for r in detail["rows"]:
        assert r["decided"] == "metadata"
        assert r["violated_rows"] == 0


def test_audit_logical_under_pending_mor_filters(tmp_path, spark):
    root = str(tmp_path / "t")
    snapshot_write(_frame(spark, 500, over=10).repartition(4), root)
    set_constraints(root, [CONTRACT[2]], spark=spark, validate=False)
    # MoR-delete exactly the out-of-range rows: physically present,
    # logically gone — the audit must count ZERO and say why
    snapshot_delete(
        spark, root, "n_chars > 10000", strategy="merge-on-read", fold_threshold=None
    )
    _, detail = audit_constraints(spark, root)
    assert detail["pending_row_filters"] == 1
    (row,) = detail["rows"]
    assert row["violated_rows"] == 0
    assert row["decided"] == "scan"


def test_set_constraints_validates_existing_data(tmp_path, spark):
    root = str(tmp_path / "t")
    snapshot_write(_frame(spark, 300, nulls=2), root)
    with pytest.raises(ConstraintViolationError, match="chars_present=2"):
        set_constraints(root, [CONTRACT[1]], spark=spark)
    assert table_constraints(root) == []  # nothing committed
    sid = set_constraints(root, [CONTRACT[1]], spark=spark, validate=False)
    assert current_snapshot_id(root) == sid
    # validate=True requires spark
    with pytest.raises(ValueError, match="spark"):
        set_constraints(root, [CONTRACT[0]], mode="add")


# --------------------------------------------------------------- enforcement


def _data_dirs(root):
    return set(glob.glob(os.path.join(root, "data", "snap-*")))


def test_append_enforcement_refuses_and_cleans(tmp_path, spark):
    root = str(tmp_path / "t")
    snapshot_write(_frame(spark, 400), root)
    set_constraints(root, CONTRACT, spark=spark)
    before_dirs = _data_dirs(root)
    before_rows = snapshot_read(spark, root).count()
    clean_more = _frame(spark, 100).withColumn(
        "doc_id", F.concat(F.lit("new-"), F.col("doc_id"))
    )
    for bad in [
        clean_more.withColumn(
            "n_chars", F.when(F.col("doc_id") == "new-doc00003", None).otherwise(F.col("n_chars"))
        ),  # not_null
        clean_more.withColumn(
            "n_chars", F.when(F.col("doc_id") == "new-doc00003", 99_999).otherwise(F.col("n_chars"))
        ),  # range
        clean_more.withColumn(
            "lang", F.when(F.col("doc_id") == "new-doc00003", "xx").otherwise(F.col("lang"))
        ),  # check
        clean_more.unionByName(clean_more.limit(1)),  # staged-internal dup
        _frame(spark, 5),  # collides with live doc_ids
    ]:
        with pytest.raises(ConstraintViolationError):
            snapshot_write(bad, root, mode="append")
        assert current_snapshot_id(root) == 2  # table untouched
        assert _data_dirs(root) == before_dirs  # staged files removed
    assert snapshot_read(spark, root).count() == before_rows
    # the clean append commits
    snapshot_write(clean_more, root, mode="append")
    assert snapshot_read(spark, root).count() == before_rows + 100


def test_overwrite_enforcement_and_contract_survival(tmp_path, spark):
    root = str(tmp_path / "t")
    snapshot_write(_frame(spark, 100), root)
    set_constraints(root, CONTRACT, spark=spark)
    with pytest.raises(ConstraintViolationError, match="pk"):
        snapshot_write(_frame(spark, 100, dups=2), root, mode="overwrite")
    # a clean overwrite commits AND the contract survives it
    snapshot_write(_frame(spark, 50), root, mode="overwrite")
    assert [c["name"] for c in table_constraints(root)] == [c["name"] for c in CONTRACT]
    # an overwrite dropping a constrained column refuses
    with pytest.raises(ConstraintError, match="lang"):
        snapshot_write(_frame(spark, 50).drop("lang"), root, mode="overwrite")


def test_enforce_false_records_without_blocking(tmp_path, spark):
    root = str(tmp_path / "t")
    snapshot_write(_frame(spark, 100), root)
    set_constraints(
        root,
        [{"name": "soft", "kind": "range", "column": "n_chars", "hi": 10_000, "enforce": False}],
        spark=spark,
    )
    snapshot_write(_frame(spark, 10, over=3), root, mode="append")  # not blocked
    _, detail = audit_constraints(spark, root)
    assert detail["rows"][0]["violated_rows"] == 3  # but the audit sees it


def test_upsert_enforcement(tmp_path, spark):
    root = str(tmp_path / "t")
    snapshot_write(_frame(spark, 200), root)
    set_constraints(root, CONTRACT, spark=spark)
    bad = _frame(spark, 5).withColumn("n_chars", F.lit(None).cast("long"))
    with pytest.raises(ConstraintViolationError, match="chars_present"):
        snapshot_upsert(spark, root, bad)
    assert current_snapshot_id(root) == 2
    # a clean upsert REPLACING live keys passes the unique contract
    # (matched keys retract; uniqueness holds by construction)
    sid = snapshot_upsert(spark, root, _frame(spark, 5), fold_threshold=None)
    assert sid == 3
    report, _ = audit_constraints(spark, root)
    assert report.agg(F.sum("violated_rows")).collect()[0][0] == 0


def test_contract_carries_across_commit_kinds(tmp_path, spark):
    root = str(tmp_path / "t")
    snapshot_write(_frame(spark, 300).repartition(4), root)
    set_constraints(root, [CONTRACT[1]], spark=spark)
    names = lambda: [c["name"] for c in table_constraints(root)]  # noqa: E731
    snapshot_write(
        _frame(spark, 20).withColumn("doc_id", F.concat(F.lit("n"), "doc_id")),
        root,
        mode="append",
    )
    assert names() == ["chars_present"]
    snapshot_delete(spark, root, "n_chars = 1")
    assert names() == ["chars_present"]
    snapshot_compact(spark, root, 64)
    assert names() == ["chars_present"]
    snapshot_upsert(spark, root, _frame(spark, 5), fold_threshold=None)
    assert names() == ["chars_present"]


def test_wap_branch_audits_against_contract(tmp_path, spark):
    """The documented WAP discipline: branch staging is UNENFORCED (dirty
    data stages on purpose), and validate_then_publish + check_frame
    holds the publish to the same contract direct writers face."""
    from ovalspark.sources.branches import create_branch, validate_then_publish

    from ovalspark.sources.constraints import check_frame

    root = str(tmp_path / "t")
    snapshot_write(_frame(spark, 100), root)
    set_constraints(root, CONTRACT, spark=spark)
    cons = table_constraints(root)
    validator = lambda staged: check_frame(staged, cons)  # noqa: E731

    broot = create_branch(root, "wip")
    prefixed = lambda df: df.withColumn(  # noqa: E731
        "doc_id", F.concat(F.lit("w-"), F.col("doc_id"))
    )
    # dirty staging is allowed on the branch (no enforcement there)...
    snapshot_write(prefixed(_frame(spark, 20, nulls=2)), broot)
    sid, viol = validate_then_publish(spark, root, "wip", validator)
    # ...but the audit gate refuses to publish it
    assert sid is None
    assert viol.collect()[0]["constraint"] == "chars_present"
    # fix the branch; the same gate publishes
    snapshot_write(prefixed(_frame(spark, 20)), broot, mode="overwrite")
    sid, viol = validate_then_publish(spark, root, "wip", validator)
    assert sid is not None and viol.isEmpty()
    assert snapshot_read(spark, root).count() == 120

    # cross-set uniqueness: a branch whose keys collide with PUBLISHED
    # rows passes the staged-only audit but fails the merged one
    broot2 = create_branch(root, "wip2")
    snapshot_write(_frame(spark, 5), broot2)  # doc ids already on main
    sid, viol = validate_then_publish(
        spark, root, "wip2", validator, audit_merged=True
    )
    assert sid is None
    assert viol.collect()[0]["constraint"] == "pk"


def test_audit_commit_delta(tmp_path, spark):
    """Per-commit O(new data) debt detection — the tail's view: direct
    writers are enforced, but the raw commit_staged_files path (branch
    staging, external engines) bypasses enforcement by design, and the
    delta audit names the commit that introduced the debt."""
    from ovalspark.sources.constraints import audit_commit_delta
    from ovalspark.sources.snapshots import commit_staged_files

    root = str(tmp_path / "t")
    snapshot_write(_frame(spark, 100).repartition(2), root)  # 1
    set_constraints(root, CONTRACT, spark=spark)  # 2 (metadata-only)
    assert audit_commit_delta(spark, root, 2) == []
    prefixed = _frame(spark, 10).withColumn(
        "doc_id", F.concat(F.lit("n"), F.col("doc_id"))
    )
    snapshot_write(prefixed, root, mode="append")  # 3: clean, enforced
    assert audit_commit_delta(spark, root, 3) == []

    # a CoW delete rewrites surviving (clean) rows — no false unique
    # positives from rewritten-rows-vs-parent
    snapshot_delete(spark, root, "n_chars = 1")
    assert audit_commit_delta(spark, root, current_snapshot_id(root)) == []

    # an upsert replacing live keys holds unique by construction
    snapshot_upsert(spark, root, _frame(spark, 5), fold_threshold=None)
    assert audit_commit_delta(spark, root, current_snapshot_id(root)) == []

    # dirty data lands through the RAW path: 2 NULL n_chars + 5 keys
    # colliding with live rows
    staged_dir = str(tmp_path / "staged")
    bad = _frame(spark, 5).unionByName(
        _frame(spark, 2)
        .withColumn("doc_id", F.concat(F.lit("x"), F.col("doc_id")))
        .withColumn("n_chars", F.lit(None).cast("long"))
    )
    bad.coalesce(1).write.parquet(staged_dir)
    import glob as g

    sid = commit_staged_files(
        root, g.glob(f"{staged_dir}/part-*.parquet"), bad.schema
    )  # NOT enforced
    rep = {r["constraint"]: r["violated_rows"] for r in audit_commit_delta(spark, root, sid)}
    assert rep["chars_present"] == 2
    assert rep["pk"] == 5  # added-vs-live collisions


def test_ref_constraint_audit_and_enforcement(tmp_path, spark):
    """Foreign-key existence as a contract (oval's media_ref-vs-asset-
    catalog check): the audit counts dangling refs exactly, commits
    introducing them are refused, and the ref side reads snapshot
    tables logically (a MoR-deleted asset IS a dangling ref)."""
    from ovalspark.sources.constraints import check_frame

    assets = str(tmp_path / "assets")
    snapshot_write(
        spark.range(500).select(F.format_string("as%04d", F.col("id")).alias("asset_id")),
        assets,
    )
    root = str(tmp_path / "docs")
    docs = spark.range(300).select(
        F.format_string("doc%04d", F.col("id")).alias("doc_id"),
        F.when(F.col("id") % 10 == 0, F.lit(None))  # NULL refs pass
        .otherwise(F.format_string("as%04d", F.col("id") % 500))
        .alias("media_ref"),
    )
    snapshot_write(docs, root)
    ref_con = {
        "name": "media_ok", "kind": "ref", "column": "media_ref",
        "ref_table": assets, "ref_column": "asset_id",
    }
    set_constraints(root, [ref_con], spark=spark)  # clean: validates green
    _, detail = audit_constraints(spark, root)
    assert detail["rows"][0]["violated_rows"] == 0

    # an append with 3 dangling refs is refused; table untouched
    bad = spark.range(5).select(
        F.format_string("nd%04d", F.col("id")).alias("doc_id"),
        F.when(F.col("id") < 3, F.format_string("zz%04d", F.col("id")))
        .otherwise(F.lit("as0001"))
        .alias("media_ref"),
    )
    with pytest.raises(ConstraintViolationError, match="media_ok=3"):
        snapshot_write(bad, root, mode="append")
    assert current_snapshot_id(root) == 2

    # deleting assets makes previously-clean docs dangle — the audit
    # reads the ref table LOGICALLY (merge-on-read delete included)
    snapshot_delete(
        spark, assets, "asset_id = 'as0042'", strategy="merge-on-read",
        fold_threshold=None,
    )
    _, detail = audit_constraints(spark, root)
    assert detail["rows"][0]["violated_rows"] == 1  # doc0042 dangles

    # check_frame covers ref too (the WAP validator path)
    viol = check_frame(bad, [ref_con])
    assert viol.collect()[0]["violated_rows"] == 3

    # definition errors
    with pytest.raises(ConstraintError, match="ref_table"):
        set_constraints(root, [{"name": "r2", "kind": "ref", "column": "media_ref"}],
                        mode="add", spark=spark, validate=False)
    with pytest.raises(ConstraintError, match="does not exist"):
        set_constraints(
            root,
            [{"name": "r3", "kind": "ref", "column": "media_ref",
              "ref_table": str(tmp_path / "ghost")}],
            mode="add", spark=spark, validate=False,
        )


def test_ref_constraint_on_upsert_and_parquet_ref(tmp_path, spark):
    """Upserts enforce ref constraints on their staged rows, and a plain
    parquet directory works as the ref side."""
    ref_dir = str(tmp_path / "langs")
    spark.createDataFrame(
        [("en",), ("de",), ("fr",)], "lang string"
    ).write.parquet(ref_dir)
    root = str(tmp_path / "t")
    snapshot_write(_frame(spark, 100), root)
    set_constraints(
        root,
        [{"name": "lang_ref", "kind": "ref", "column": "lang", "ref_table": ref_dir}],
        spark=spark,
    )
    bad = _frame(spark, 3).withColumn("lang", F.lit("zz"))
    with pytest.raises(ConstraintViolationError, match="lang_ref"):
        snapshot_upsert(spark, root, bad)
    sid = snapshot_upsert(spark, root, _frame(spark, 3), fold_threshold=None)
    assert sid == 3


def test_drift_constraint_ks(tmp_path, spark):
    """Distribution contracts (kind='drift', KS): the baseline is
    captured from the table at set time, same-distribution appends
    commit, a collapsed batch is refused, and tiny batches are skipped
    (a KS test on 50 rows is noise, not evidence)."""
    root = str(tmp_path / "t")
    base = spark.range(5000).select(
        F.format_string("doc%05d", F.col("id")).alias("doc_id"),
        (F.col("id") % 5000).alias("n_chars"),
    )
    snapshot_write(base, root)
    set_constraints(
        root, [{"name": "dist", "kind": "drift", "column": "n_chars"}], spark=spark
    )
    (con,) = table_constraints(root)
    assert con["baseline"]["n"] == 5000 and len(con["baseline"]["bps"]) >= 30
    _, detail = audit_constraints(spark, root)
    assert detail["rows"][0]["violated_rows"] == 0
    assert detail["drift"]["dist"]["statistic"] is not None

    def rows(lo, n, expr):
        return spark.range(lo, lo + n).select(
            F.format_string("x%06d", F.col("id")).alias("doc_id"), expr.alias("n_chars")
        )

    # same distribution (exact stride over the full support): commits
    snapshot_write(rows(5000, 1000, (F.col("id") - 5000) * 5), root, mode="append")
    # a collapsed batch (every value identical): refused
    with pytest.raises(ConstraintViolationError, match="dist"):
        snapshot_write(rows(9000, 1000, F.lit(1).cast("long")), root, mode="append")
    # below min_rows: skipped, commits
    snapshot_write(rows(20000, 50, F.lit(1).cast("long")), root, mode="append")
    assert current_snapshot_id(root) == 4


def test_drift_constraint_chi2(tmp_path, spark):
    """Categorical drift (chi²): baseline proportions from the table; a
    batch that inverts the mix — or introduces a category the baseline
    says cannot occur — is refused."""
    root = str(tmp_path / "t")
    lang = (
        F.when(F.col("id") % 20 < 16, "en")
        .when(F.col("id") % 20 < 19, "de")
        .otherwise("fr")
    )
    base = spark.range(4000).select(
        F.format_string("doc%05d", F.col("id")).alias("doc_id"), lang.alias("lang")
    )
    snapshot_write(base, root)
    set_constraints(
        root,
        [{"name": "mix", "kind": "drift", "column": "lang", "method": "chi2"}],
        spark=spark,
    )
    (con,) = table_constraints(root)
    assert sorted(con["baseline"]["cats"]) == ["de", "en", "fr"]
    _, detail = audit_constraints(spark, root)
    assert detail["rows"][0]["violated_rows"] == 0

    def rows(lo, n, lang_expr):
        return spark.range(lo, lo + n).select(
            F.format_string("x%06d", F.col("id")).alias("doc_id"),
            lang_expr.alias("lang"),
        )

    snapshot_write(rows(4000, 1000, lang), root, mode="append")  # same mix: ok
    with pytest.raises(ConstraintViolationError, match="mix"):
        snapshot_write(rows(9000, 1000, F.lit("fr")), root, mode="append")
    with pytest.raises(ConstraintViolationError, match="mix"):
        # a category with baseline probability ZERO: chi2 = inf
        snapshot_write(rows(9000, 1000, F.lit("zz")), root, mode="append")
    assert current_snapshot_id(root) == 3


def test_drift_ks_rejects_non_numeric(tmp_path, spark):
    """KS needs approxQuantile, which is numeric-only — a string or
    timestamp column must be declared honestly (chi2 or a derived
    numeric), not crash at capture time."""
    root = str(tmp_path / "t")
    snapshot_write(
        spark.range(10).select(
            F.col("id").alias("doc_id"),
            F.lit("en").alias("lang"),
            F.current_timestamp().alias("ts"),
        ),
        root,
    )
    for col in ("lang", "ts"):
        with pytest.raises(ConstraintError, match="NUMERIC"):
            set_constraints(
                root,
                [{"name": "d", "kind": "drift", "column": col}],
                spark=spark,
            )


def test_composite_unique_constraint(tmp_path, spark):
    """unique over a composite key: (writer_id, seq) tuples must be
    unique while each column alone repeats freely; NULL in any key part
    opts the row out (SQL UNIQUE); staged-vs-live collisions on the
    tuple are refused."""
    root = str(tmp_path / "t")
    base = spark.range(200).select(
        (F.col("id") % 10).alias("writer_id"),
        (F.col("id") / F.lit(10)).cast("long").alias("seq"),
        F.col("id").alias("payload"),
    )
    snapshot_write(base, root)
    con = {"name": "ck", "kind": "unique", "columns": ["writer_id", "seq"]}
    set_constraints(root, [con], spark=spark)  # validates: tuples unique
    # audit on a dirtied overwrite counts tuple-dup ROWS exactly
    dup2 = base.unionByName(base.limit(3))
    with pytest.raises(ConstraintViolationError, match="ck"):
        snapshot_write(dup2, root, mode="overwrite")
    # NULL key parts opt out
    with_nulls = base.unionByName(
        spark.createDataFrame([(None, 5, 999), (None, 5, 998)],
                              "writer_id long, seq long, payload long")
    )
    snapshot_write(with_nulls, root, mode="overwrite")  # commits: NULLs pass
    # staged-vs-live TUPLE collision refused; same columns with fresh
    # seq values commit (writer_id alone collides — that's allowed)
    fresh = spark.range(5).select(
        (F.col("id") % 10).alias("writer_id"),
        (F.col("id") + 1000).alias("seq"),
        F.col("id").alias("payload"),
    )
    snapshot_write(fresh, root, mode="append")
    colliding = spark.createDataFrame([(3, 7, 1)], "writer_id long, seq long, payload long")
    with pytest.raises(ConstraintViolationError, match="ck"):
        snapshot_write(colliding, root, mode="append")
    # definition errors
    with pytest.raises(ConstraintError, match="distinct"):
        set_constraints(root, [{"name": "b", "kind": "unique",
                                "columns": ["seq", "seq"]}], mode="add", spark=spark)
    with pytest.raises(ConstraintError, match="not both"):
        set_constraints(root, [{"name": "b", "kind": "unique", "column": "seq",
                                "columns": ["writer_id", "seq"]}], mode="add", spark=spark)


def test_drift_chi2_boolean_column_renders_like_audit(tmp_path, spark):
    """chi² baselines must capture categories with the SAME rendering
    the audit buckets with (Spark cast-to-string). A boolean column's
    Python str() is 'True'/'False' while Spark renders 'true'/'false' —
    the old capture sent every audited row to __other__ and refused
    every commit."""
    root = str(tmp_path / "t")
    flag = (F.col("id") % 10 < 8)
    base = spark.range(2000).select(
        F.format_string("doc%05d", F.col("id")).alias("doc_id"), flag.alias("ok")
    )
    snapshot_write(base, root)
    set_constraints(
        root,
        [{"name": "okmix", "kind": "drift", "column": "ok", "method": "chi2"}],
        spark=spark,
    )
    (con,) = table_constraints(root)
    assert sorted(con["baseline"]["cats"]) == ["false", "true"]
    # clean audit and a same-mix append both pass
    _, detail = audit_constraints(spark, root)
    assert detail["rows"][0]["violated_rows"] == 0
    same = spark.range(2000, 3000).select(
        F.format_string("x%05d", F.col("id")).alias("doc_id"), flag.alias("ok")
    )
    snapshot_write(same, root, mode="append")
    # an inverted mix still fires
    inverted = spark.range(9000, 10000).select(
        F.format_string("y%05d", F.col("id")).alias("doc_id"),
        (F.col("id") % 10 >= 8).alias("ok"),
    )
    with pytest.raises(ConstraintViolationError, match="okmix"):
        snapshot_write(inverted, root, mode="append")
    assert current_snapshot_id(root) == 3
