"""Derived-column expressions from the reference's repo pipeline."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ght2dm_spark.functions.cleaning import zero_default


def clone_path(lang: Column | str, owner_login: Column | str, name: Column | str) -> Column:
    """``lower(lang/owner/name)`` with defaults ``unknown``/``john_doe``/``42``
    on empty — ``buildClonePath`` (``/root/reference/ght2dm.go:551-567``)."""
    return F.lower(
        F.concat_ws(
            "/",
            zero_default(lang, "unknown"),
            zero_default(owner_login, "john_doe"),
            zero_default(name, "42"),
        )
    )


def full_name(owner: Column | str, repo: Column | str) -> Column:
    """``owner || '/' || repo`` — collaborator lookup key (P6,
    ``/root/reference/ght2dm.go:900,925``).  NULLs take the Go
    zero-value '' INSIDE the helper (concat_ws alone would skip a NULL
    operand and drop the separator: NULL owner → 'repo', a key that can
    never match the '/repo' the repos pipeline stored)."""
    o = F.col(owner) if isinstance(owner, str) else owner
    r = F.col(repo) if isinstance(repo, str) else repo
    return F.concat_ws(
        "/", F.coalesce(o, F.lit("")), F.coalesce(r, F.lit(""))
    )
