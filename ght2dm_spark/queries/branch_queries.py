"""Round-9 snapshot BRANCH declared queries: isolated branch lineage,
divergence accounting, fast-forward merge, key-level conflict
detection between diverged heads, and the vacuum retention-root audit
— the git-for-data workflow (experiment on a corpus branch, merge
when main hasn't moved, enumerate conflicts when it has) over the
engine's snapshot layer (snapshots.py: create_branch /
prepare_commit_branch / commit_branch / merge_branch / vacuum_plan).

Each query BUILDS a real multi-commit snapshot table from
deterministic doc_id splits, exercises the branch machinery, and
emits a frame whose oracle recomputes the expected result from the
same split predicates in pure SQL — the engine's pointer flips,
chain walks, and retention roots are what is actually under test.
Results are materialized (localCheckpoint) before the scratch table
is removed.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from ght2dm_spark.io import load_table
from ght2dm_spark.queries.registry import register
from ght2dm_spark.snapshots import (
    BranchDivergedError,
    commit,
    commit_branch,
    create_branch,
    history,
    merge_branch,
    prepare_commit,
    prepare_commit_branch,
    read_snapshot,
    tag_snapshot,
    vacuum,
    vacuum_plan,
)


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )


# --------------------------------------------------------------------------
# t1_branch_create_read


@register(
    "t1_branch_create_read",
    oracle="""
    SELECT 'exp' AS side,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(doc_id) AS BIGINT) AS sum_doc_id
    FROM documents WHERE doc_id % 4 IN (0, 1)
    UNION ALL
    SELECT 'main' AS side,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(doc_id) AS BIGINT) AS sum_doc_id
    FROM documents WHERE doc_id % 4 IN (0, 2)
    """,
)
def t1_branch_create_read(spark, sf_dir):
    """Branch isolation round-trip: commit a base corpus, fork branch
    'exp', append one increment TO THE BRANCH and a different one TO
    MAIN, then read both heads — each side must see the base plus ONLY
    its own increment (the experiment-without-copying workflow: a
    curation trial appends to its branch while production keeps
    committing to main).

    The oracle rebuilds both sides from the split predicates; any
    cross-contamination of the lineages (branch commit visible on
    main or vice versa) breaks the compare.  Scale: branch state is
    two pointer files — the data files are shared, never copied."""
    docs = _docs(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="ght2dm-branch-")
    try:
        t = f"{root}/corpus"
        commit(prepare_commit(docs.filter(F.col("doc_id") % 4 == 0), t))
        create_branch(t, "exp")
        commit_branch(
            prepare_commit_branch(
                docs.filter(F.col("doc_id") % 4 == 1), t, "exp"
            ),
            "exp",
        )
        commit(prepare_commit(
            docs.filter(F.col("doc_id") % 4 == 2), t, mode="append"
        ))

        def side(name, **kw):
            return read_snapshot(spark, t, **kw).agg(
                F.lit(name).alias("side"),
                F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                F.sum("doc_id").cast("bigint").alias("sum_doc_id"),
            ).select("side", "n_docs", "sum_doc_id")

        out = side("exp", branch="exp").unionAll(side("main")).localCheckpoint(
            eager=True
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


# --------------------------------------------------------------------------
# t1_branch_divergence


@register(
    "t1_branch_divergence",
    oracle="""
    SELECT CAST(sum(CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_base,
           CAST(sum(CASE WHEN doc_id % 4 = 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_main_only,
           CAST(sum(CASE WHEN doc_id % 4 = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_branch_only,
           CAST(1 AS BIGINT) AS diverged
    FROM documents
    """,
)
def t1_branch_divergence(spark, sf_dir):
    """Divergence accounting between a branch and main: rows common to
    both lineages (the merge base), rows only main added, rows only
    the branch added — and the engine's own refusal to fast-forward
    (merge_branch must raise BranchDivergedError, surfaced as the
    diverged flag).  This is the pre-merge report a data-branch
    workflow prints before choosing a replay direction.

    The side-only counts come from key anti-joins of the two HEAD
    reads against the base version read — derived entirely from
    snapshot reads, never from the predicates the oracle uses.
    Scale: the anti-joins key on the stable id both sides shuffle
    on; everything else is pointer-file walks."""
    docs = _docs(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="ght2dm-branch-")
    try:
        t = f"{root}/corpus"
        commit(prepare_commit(docs.filter(F.col("doc_id") % 4 == 0), t))
        create_branch(t, "exp")
        commit_branch(
            prepare_commit_branch(
                docs.filter(F.col("doc_id") % 4 == 1), t, "exp"
            ),
            "exp",
        )
        commit(prepare_commit(
            docs.filter(F.col("doc_id") % 4 == 2), t, mode="append"
        ))
        try:
            merge_branch(t, "exp")
            diverged = 0
        except BranchDivergedError:
            diverged = 1
        base = read_snapshot(spark, t, version=0).select("doc_id")
        main_only = (
            read_snapshot(spark, t).select("doc_id")
            .join(base, "doc_id", "left_anti")
        )
        branch_only = (
            read_snapshot(spark, t, branch="exp").select("doc_id")
            .join(base, "doc_id", "left_anti")
        )
        out = (
            base.agg(F.count(F.lit(1)).cast("bigint").alias("n_base"))
            .crossJoin(
                main_only.agg(
                    F.count(F.lit(1)).cast("bigint").alias("n_main_only")
                )
            )
            .crossJoin(
                branch_only.agg(
                    F.count(F.lit(1)).cast("bigint").alias("n_branch_only")
                )
            )
            .select(
                "n_base", "n_main_only", "n_branch_only",
                F.lit(diverged).cast("bigint").alias("diverged"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


# --------------------------------------------------------------------------
# t1_branch_merge_ff


@register(
    "t1_branch_merge_ff",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(doc_id) AS BIGINT) AS sum_doc_id,
           CAST(3 AS BIGINT) AS n_versions
    FROM documents WHERE doc_id % 4 IN (0, 1, 3)
    """,
)
def t1_branch_merge_ff(spark, sf_dir):
    """Fast-forward merge: two commits land on branch 'exp' while main
    stays untouched, then merge_branch flips CURRENT to the branch
    head in one atomic publish — main's read must now equal base plus
    both branch increments, and its history must be the THREE-version
    branch lineage (base + 2 branch commits), proving the merge
    adopted the chain rather than copying data.

    The oracle recomputes the merged content from the split
    predicates and pins the expected version count.  Scale: the merge
    is one pointer write regardless of table size."""
    docs = _docs(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="ght2dm-branch-")
    try:
        t = f"{root}/corpus"
        commit(prepare_commit(docs.filter(F.col("doc_id") % 4 == 0), t))
        create_branch(t, "exp")
        for r in (1, 3):
            commit_branch(
                prepare_commit_branch(
                    docs.filter(F.col("doc_id") % 4 == r), t, "exp"
                ),
                "exp",
            )
        merge_branch(t, "exp")
        n_versions = len(history(t))
        out = read_snapshot(spark, t).agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("doc_id").cast("bigint").alias("sum_doc_id"),
        ).select(
            "n_docs", "sum_doc_id",
            F.lit(n_versions).cast("bigint").alias("n_versions"),
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


# --------------------------------------------------------------------------
# t1_branch_conflict_keys


@register(
    "t1_branch_conflict_keys",
    oracle="""
    SELECT doc_id,
           CAST(n_chars + 1 AS BIGINT) AS main_chars,
           CAST(n_chars + 2 AS BIGINT) AS branch_chars
    FROM documents
    WHERE doc_id % 35 = 1 AND doc_id % 3 <> 0
    """,
)
def t1_branch_conflict_keys(spark, sf_dir):
    """Key-level conflict enumeration between diverged heads: main
    appends one re-scored document slice (+1 char), the branch appends
    an overlapping slice with DIFFERENT scores (+2), and the conflict
    report lists every key both sides touched with each side's value —
    exactly what a replay-based merge needs to decide winners.  Both
    side-increments are computed as head-minus-base key anti-joins
    over snapshot reads, so the engine's pinned file lists (not the
    fixture predicates) produce the answer.

    Scale: two anti-joins and one inner join, all keyed on the stable
    id; the conflict set is increment-sized, never table-sized."""
    docs = _docs(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="ght2dm-branch-")
    try:
        t = f"{root}/corpus"
        base = docs.filter(F.col("doc_id") % 3 == 0)
        commit(prepare_commit(base, t))
        create_branch(t, "exp")
        main_inc = docs.filter(
            (F.col("doc_id") % 5 == 1) & (F.col("doc_id") % 3 != 0)
        ).withColumn("n_chars", F.col("n_chars") + 1)
        branch_inc = docs.filter(
            (F.col("doc_id") % 7 == 1) & (F.col("doc_id") % 3 != 0)
        ).withColumn("n_chars", F.col("n_chars") + 2)
        commit(prepare_commit(main_inc, t, mode="append"))
        commit_branch(
            prepare_commit_branch(branch_inc, t, "exp"), "exp"
        )
        base_keys = read_snapshot(spark, t, version=0).select("doc_id")
        main_added = (
            read_snapshot(spark, t)
            .join(base_keys, "doc_id", "left_anti")
            .select("doc_id", F.col("n_chars").alias("main_chars"))
        )
        branch_added = (
            read_snapshot(spark, t, branch="exp")
            .join(base_keys, "doc_id", "left_anti")
            .select("doc_id", F.col("n_chars").alias("branch_chars"))
        )
        out = (
            main_added.join(branch_added, "doc_id")
            .select(
                "doc_id",
                F.col("main_chars").cast("bigint").alias("main_chars"),
                F.col("branch_chars").cast("bigint").alias("branch_chars"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


# --------------------------------------------------------------------------
# t1_vacuum_plan_audit


@register(
    "t1_vacuum_plan_audit",
    oracle="""
    SELECT 'kept_chain' AS category, CAST(1 AS BIGINT) AS n_manifests,
           CAST((SELECT count(*) FROM documents) AS BIGINT) AS n_rows
    UNION ALL
    SELECT 'kept_tag', CAST(1 AS BIGINT),
           CAST((SELECT count(*) FROM documents WHERE doc_id % 5 IN (0, 1))
                AS BIGINT)
    UNION ALL
    SELECT 'kept_branch', CAST(1 AS BIGINT),
           CAST((SELECT count(*) FROM documents
                 WHERE doc_id % 5 IN (0, 1, 2)) AS BIGINT)
    UNION ALL
    SELECT 'removable', CAST(2 AS BIGINT), CAST(NULL AS BIGINT)
    """,
)
def t1_vacuum_plan_audit(spark, sf_dir):
    """Vacuum retention-root audit: five append commits, a tag on v1,
    a branch forked at v2, then vacuum_plan(keep=1) must classify the
    manifests as 1 chain-kept (CURRENT), 1 tag-kept, 1 branch-kept,
    and 2 removable (v0, v3) — and after ACTUALLY vacuuming, the tag
    and branch heads must still read their full pinned contents (the
    retention-root guarantee; n_rows proves it with real reads, not
    file counts).

    The oracle pins the expected classification and recomputes the
    pinned row counts from the commit predicates.  Scale: the plan is
    a manifest-directory walk; no data is read to decide retention."""
    docs = _docs(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="ght2dm-branch-")
    try:
        t = f"{root}/corpus"
        for r in range(5):
            commit(prepare_commit(
                docs.filter(F.col("doc_id") % 5 == r), t,
                mode="append" if r else "overwrite",
            ))
        tag_snapshot(t, "rel", version=1)
        create_branch(t, "exp", version=2)
        plan = vacuum_plan(t, keep_manifests=1)
        vacuum(t, keep_manifests=1)
        rows = [
            ("kept_chain", len(plan["kept_chain"]),
             read_snapshot(spark, t).count()),
            ("kept_tag", len(plan["kept_tag"]),
             read_snapshot(spark, t, tag="rel").count()),
            ("kept_branch", len(plan["kept_branch"]),
             read_snapshot(spark, t, branch="exp").count()),
            ("removable", len(plan["removable"]), None),
        ]
        out = spark.createDataFrame(
            rows, "category string, n_manifests long, n_rows long"
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out
