"""Run configuration + entity dispatch (S4, the reference's JSON config
and folder-order-driven main loop).

The reference reads ``{"gh_torrent_folders": [...], "database": {...}}``
and processes folders IN CONFIG ORDER, dispatching on the directory
basename (``/root/reference/ght2dm.go:163-199,1036-1049,1153-1156``) —
order matters because relation imports resolve against the dimension
tables the earlier entities populate.  Here the DSN becomes an output
directory; everything else keeps the same shape.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from pathlib import Path

from pyspark.sql import SparkSession
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: entity basename → importer, mirroring the reference's switch
#: (``ght2dm.go:1036-1049``)
ENTITIES = ("users", "repos", "org_members", "repo_collaborators")


@dataclass
class RunConfig:
    folders: list[str]
    output_dir: str
    nocheck: bool = False  # the reference's -nocheck flag (ght2dm.go:1126)
    extra: dict = field(default_factory=dict)


def read_config(path: str) -> RunConfig:
    """Load the JSON run config (S4).  Unknown keys are preserved in
    ``extra`` rather than rejected."""
    with open(path) as f:
        raw = json.load(f)
    known = {"folders", "output_dir", "nocheck"}
    return RunConfig(
        folders=list(raw["folders"]),
        output_dir=raw["output_dir"],
        nocheck=bool(raw.get("nocheck", False)),
        extra={k: v for k, v in raw.items() if k not in known},
    )


def _users_schema() -> StructType:
    s = [
        ("id", LongType()), ("login", StringType()), ("avatar_url", StringType()),
        ("html_url", StringType()), ("type", StringType()), ("name", StringType()),
        ("company", StringType()), ("bio", StringType()), ("location", StringType()),
        ("email", StringType()), ("hireable", BooleanType()),
        ("followers", LongType()), ("following", LongType()),
        ("created_at", StringType()), ("updated_at", StringType()),
    ]
    return StructType([StructField(n, t) for n, t in s])


def _repos_schema() -> StructType:
    s = [
        ("id", LongType()), ("name", StringType()), ("full_name", StringType()),
        ("description", StringType()), ("homepage", StringType()),
        ("language", StringType()), ("default_branch", StringType()),
        ("master_branch", StringType()), ("html_url", StringType()),
        ("clone_url", StringType()), ("fork", BooleanType()),
        ("forks_count", LongType()), ("open_issues_count", LongType()),
        ("stargazers_count", LongType()), ("subscribers_count", LongType()),
        ("watchers_count", LongType()), ("size_in_kb", LongType()),
        ("created_at", StringType()), ("updated_at", StringType()),
        ("pushed_at", StringType()), ("owner_login", StringType()),
    ]
    return StructType([StructField(n, t) for n, t in s])


def _members_schema() -> StructType:
    return StructType(
        [StructField(n, t) for n, t in
         [("id", LongType()), ("login", StringType()), ("org", StringType()),
          ("type", StringType())]]
    )


def _collabs_schema() -> StructType:
    return StructType(
        [StructField(n, t) for n, t in
         [("id", LongType()), ("login", StringType()), ("repo", StringType()),
          ("owner", StringType())]]
    )


def run_from_config(spark: SparkSession, cfg: RunConfig) -> dict[str, str]:
    """Process every configured folder in order; returns table → path.

    Relation entities require their dimensions to have been imported
    first — exactly the reference's folder-order contract.
    """
    from ght2dm_spark.io import write_table
    from ght2dm_spark.pipelines import (
        import_org_members,
        import_repo_collaborators,
        import_repos,
        import_users,
    )
    from ght2dm_spark.sources.bson import read_bson_dumps, split_rejects

    out = Path(cfg.output_dir)
    written: dict[str, str] = {}
    state: dict = {}

    def _write(name, df):
        p = str(out / name)
        write_table(df, p)
        written[name] = p

    for folder in cfg.folders:
        entity = os.path.basename(os.path.normpath(folder))
        if entity not in ENTITIES:
            raise ValueError(f"unknown entity folder: {folder}")
        if entity == "users":
            good, rej = split_rejects(
                read_bson_dumps(spark, folder, _users_schema())
            )
            res = import_users(good, nocheck=cfg.nocheck)
            state["gh_users"] = res.gh_users
            state["gh_organizations"] = res.gh_organizations
            for n in ("users", "gh_users", "gh_organizations"):
                _write(n, getattr(res, n))
            _write("rejects_users", res.rejects.unionByName(rej, allowMissingColumns=True))
        elif entity == "repos":
            good, rej = split_rejects(
                read_bson_dumps(
                    spark, folder, _repos_schema(),
                    flatten={"owner_login": ("owner", "login")},
                )
            )
            res = import_repos(good)
            state["repositories"] = res.repositories
            state["gh_repositories"] = res.gh_repositories
            _write("repositories", res.repositories)
            _write("gh_repositories", res.gh_repositories)
            _write("rejects_repos", rej)
        elif entity == "org_members":
            good, rej = split_rejects(
                read_bson_dumps(spark, folder, _members_schema())
            )
            res = import_org_members(
                good, state["gh_users"], state["gh_organizations"]
            )
            _write("gh_users_organizations", res.gh_users_organizations)
            _write(
                "rejects_org_members",
                res.rejects.unionByName(rej, allowMissingColumns=True),
            )
        elif entity == "repo_collaborators":
            good, rej = split_rejects(
                read_bson_dumps(spark, folder, _collabs_schema())
            )
            res = import_repo_collaborators(
                good, state["gh_users"], state["repositories"],
                state["gh_repositories"],
            )
            _write("users_repositories", res.gh_users_organizations)
            _write(
                "rejects_repo_collaborators",
                res.rejects.unionByName(rej, allowMissingColumns=True),
            )
    return written
