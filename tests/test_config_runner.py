"""S4 + end-to-end runner: JSON config → BSON folders in order → all
seven output tables on disk (the reference's main() contract,
ght2dm.go:1129-1156)."""

from __future__ import annotations

import json

import pytest

from ght2dm_spark.config import read_config, run_from_config
from tests.test_bson_source import enc_doc


@pytest.fixture(scope="module")
def config_path(tmp_path_factory):
    root = tmp_path_factory.mktemp("ght")
    users = root / "users"
    repos = root / "repos"
    members = root / "org_members"
    collabs = root / "repo_collaborators"
    for d in (users, repos, members, collabs):
        d.mkdir()

    (users / "2014-01-01.bson").write_bytes(
        b"".join(
            enc_doc(x)
            for x in [
                {"id": 1, "login": "alice", "type": "User",
                 "created_at": "2013-01-01 00:00:00"},
                {"id": 2, "login": "acme", "type": "Organization",
                 "created_at": "2013-01-01 00:00:00"},
            ]
        )
    )
    (repos / "2014-01-01.bson").write_bytes(
        enc_doc(
            {"id": 10, "name": "tool", "full_name": "alice/tool",
             "language": "Go", "clone_url": "http://x/alice/tool.git",
             "owner": {"login": "alice"},
             "updated_at": "2014-01-01 00:00:00",
             "pushed_at": "2014-01-01 00:00:00"}
        )
    )
    (members / "2014-01-01.bson").write_bytes(
        enc_doc({"id": 1, "login": "alice", "org": "acme", "type": "User"})
    )
    (collabs / "2014-01-01.bson").write_bytes(
        enc_doc({"id": 1, "login": "alice", "repo": "tool", "owner": "alice"})
    )

    cfg = {
        "folders": [str(users), str(repos), str(members), str(collabs)],
        "output_dir": str(root / "out"),
    }
    p = root / "ght2dm.conf"
    p.write_text(json.dumps(cfg))
    return str(p)


def test_read_config(config_path):
    cfg = read_config(config_path)
    assert [f.rsplit("/", 1)[-1] for f in cfg.folders] == [
        "users", "repos", "org_members", "repo_collaborators"
    ]
    assert not cfg.nocheck


def test_run_from_config(spark, config_path):
    cfg = read_config(config_path)
    written = run_from_config(spark, cfg)
    assert set(written) >= {
        "users", "gh_users", "gh_organizations", "repositories",
        "gh_repositories", "gh_users_organizations", "users_repositories",
    }
    users = spark.read.parquet(written["users"])
    assert {r["username"] for r in users.collect()} == {"alice"}
    orgs = spark.read.parquet(written["gh_organizations"])
    assert orgs.count() == 1
    rel = spark.read.parquet(written["gh_users_organizations"])
    assert rel.count() == 1
    ur = spark.read.parquet(written["users_repositories"])
    assert ur.count() == 1


def test_incremental_rerun(spark, config_path, tmp_path):
    """Incremental mode: a second run with one new user appends exactly
    that user with a fresh surrogate id; existing rows and keys are
    untouched; a no-new-data rerun appends nothing."""
    import dataclasses

    cfg = read_config(config_path)
    out2 = str(tmp_path / "out_inc")
    first = dataclasses.replace(cfg, output_dir=out2)
    run_from_config(spark, first)
    users_v1 = {(r["id"], r["username"]) for r in
                spark.read.parquet(f"{out2}/users").collect()}

    # add a later dump with one known + one new user
    users_dir = cfg.folders[0]
    import pathlib
    (pathlib.Path(users_dir) / "2014-02-01.bson").write_bytes(
        b"".join(enc_doc(x) for x in [
            {"id": 1, "login": "alice", "type": "User",
             "created_at": "2013-01-01 00:00:00"},  # already loaded → skipped
            {"id": 9, "login": "zoe", "type": "User",
             "created_at": "2014-01-15 00:00:00"},
        ])
    )
    try:
        inc = dataclasses.replace(cfg, output_dir=out2, incremental=True,
                                  folders=[users_dir])
        run_from_config(spark, inc)
        users_v2 = {(r["id"], r["username"]) for r in
                    spark.read.parquet(f"{out2}/users").collect()}
        assert users_v1 < users_v2
        added = users_v2 - users_v1
        assert {u for _, u in added} == {"zoe"}
        ids = [i for i, _ in users_v2]
        assert len(ids) == len(set(ids))  # surrogate ids never collide
        assert max(i for i, _ in users_v1) < next(i for i, u in added if u == "zoe")

        # third run, nothing new → nothing appended
        run_from_config(spark, inc)
        users_v3 = {(r["id"], r["username"]) for r in
                    spark.read.parquet(f"{out2}/users").collect()}
        assert users_v3 == users_v2
    finally:
        (pathlib.Path(users_dir) / "2014-02-01.bson").unlink()
