"""ETL end-to-end golden tests (SURVEY §5 item 2): GHTorrent-shaped
fixtures (FIXTURES.md §A, covering all 14 edge cases of §A.5) → the four
pipelines → every output table compared against a DuckDB reimplementation
of the reference semantics; plus invariant and idempotency checks
(SURVEY §5 item 3).
"""

from __future__ import annotations

import datetime as dt

import duckdb
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    DateType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ght2dm_spark.pipelines import (
    import_org_members,
    import_repo_collaborators,
    import_repos,
    import_users,
)
from tests.conftest import assert_oracle_match

D1 = dt.date(2014, 1, 1)
D2 = dt.date(2014, 1, 2)

_users_schema = StructType(
    [
        StructField("id", LongType()),
        StructField("login", StringType()),
        StructField("avatar_url", StringType()),
        StructField("html_url", StringType()),
        StructField("type", StringType()),
        StructField("name", StringType()),
        StructField("company", StringType()),
        StructField("bio", StringType()),
        StructField("location", StringType()),
        StructField("email", StringType()),
        StructField("hireable", BooleanType()),
        StructField("followers", LongType()),
        StructField("following", LongType()),
        StructField("created_at", StringType()),
        StructField("updated_at", StringType()),
        StructField("file_date", DateType()),
        StructField("file_pos", LongType()),
    ]
)


def _u(id, login, type="User", file_date=D2, file_pos=0, **kw):
    base = dict(
        id=id, login=login, avatar_url=f"http://a/{login}", html_url=f"http://h/{login}",
        type=type, name=login.title(), company="c", bio="b", location="l",
        email=f"{login}@x", hireable=True, followers=1, following=2,
        created_at="2013-01-01 10:00:00", updated_at="2013-06-01 10:00:00",
        file_date=file_date, file_pos=file_pos,
    )
    base.update(kw)
    return tuple(base[f.name] for f in _users_schema.fields)


_repos_schema = StructType(
    [
        StructField("id", LongType()),
        StructField("name", StringType()),
        StructField("full_name", StringType()),
        StructField("description", StringType()),
        StructField("homepage", StringType()),
        StructField("language", StringType()),
        StructField("default_branch", StringType()),
        StructField("master_branch", StringType()),
        StructField("html_url", StringType()),
        StructField("clone_url", StringType()),
        StructField("fork", BooleanType()),
        StructField("forks_count", LongType()),
        StructField("open_issues_count", LongType()),
        StructField("stargazers_count", LongType()),
        StructField("subscribers_count", LongType()),
        StructField("watchers_count", LongType()),
        StructField("size_in_kb", LongType()),
        StructField("created_at", StringType()),
        StructField("updated_at", StringType()),
        StructField("pushed_at", StringType()),
        StructField("owner_login", StringType()),
        StructField("file_date", DateType()),
        StructField("file_pos", LongType()),
    ]
)


def _r(id, name, owner, lang="Go", file_pos=0, **kw):
    base = dict(
        id=id, name=name, full_name=f"{owner}/{name}".lower(), description="d",
        homepage="", language=lang, default_branch="master", master_branch="",
        html_url=f"http://gh/{owner}/{name}", clone_url=f"http://gh/{owner}/{name}.git",
        fork=False, forks_count=1, open_issues_count=2, stargazers_count=3,
        subscribers_count=4, watchers_count=5, size_in_kb=None,
        created_at="2013-01-01 10:00:00", updated_at="2014-01-01 10:00:00",
        pushed_at="2014-01-01 10:00:00", owner_login=owner,
        file_date=D2, file_pos=file_pos,
    )
    base.update(kw)
    return tuple(base[f.name] for f in _repos_schema.fields)


_rel_schema = StructType(
    [
        StructField("id", LongType()),
        StructField("login", StringType()),
        StructField("org", StringType()),
        StructField("type", StringType()),
        StructField("file_date", DateType()),
        StructField("file_pos", LongType()),
    ]
)

_collab_schema = StructType(
    [
        StructField("id", LongType()),
        StructField("login", StringType()),
        StructField("repo", StringType()),
        StructField("owner", StringType()),
        StructField("file_date", DateType()),
        StructField("file_pos", LongType()),
    ]
)


@pytest.fixture(scope="module")
def etl(spark, tmp_path_factory):
    """Build fixture parquet, run all four pipelines, register everything
    in a DuckDB connection for the oracle SQL."""
    d = tmp_path_factory.mktemp("ghtorrent")

    users_rows = [
        # edge 1: id=1 in two dumps, newest (D2) wins
        _u(1, "alice", file_date=D2, name="Alice"),
        _u(1, "alice", file_date=D1, name="OldAlice"),
        # edge 2: id=2 twice in one file → first file_pos wins
        _u(2, "bob", file_pos=3, company="first"),
        _u(2, "bob", file_pos=7, company="second"),
        # edge 3: invalid type → reject
        _u(3, "robo", type="Bot"),
        # edge 4: empty updated_at → coalesced to created_at
        _u(4, "carol", updated_at=""),
        # missing optionals → zero values
        _u(6, "dave", hireable=None, followers=None, bio=None),
        _u(8, "erin"),
        # organizations (edge 1 across dumps too)
        _u(5, "acme", type="Organization", file_date=D2, name="Acme"),
        _u(5, "acme", type="Organization", file_date=D1, name="OldAcme"),
        _u(7, "globex", type="Organization", updated_at=None),
    ]
    repos_rows = [
        # edge 5 + F7: empty language → clone_path 'unknown/…' but
        # primary_language '' → filtered out by the finalize WHERE
        _r(101, "zeta", "alice", lang=""),
        # empty owner/name → john_doe / 42 defaults, still surviving
        _r(108, "", "", lang="Go", clone_url="http://gh/x.git", full_name=""),
        # edge 6/7: null byte stripped; created_at empty → NULL
        _r(102, "tool\x00x", "bob", description="de\x00sc", created_at=""),
        # edge 8/14: same clone_path (case-insensitive), extremal row wins
        _r(103, "Tool", "Bob", updated_at="2014-02-01 10:00:00",
           pushed_at="2014-02-01 10:00:00", open_issues_count=1),
        _r(104, "tool", "bob", updated_at="2014-01-01 10:00:00",
           pushed_at="2014-01-15 10:00:00", open_issues_count=5),
        # edge 9: exact duplicate rows collapse via DISTINCT
        _r(105, "dup", "erin"),
        _r(105, "dup", "erin"),
        # edge 10: empty clone_url → filtered
        _r(106, "nourl", "alice", clone_url=""),
        # edge 11: github_id already in existing gh_repositories
        _r(107, "known", "alice"),
        # edge 11b: (clone_path, primary_language) already in repositories
        _r(109, "legacy", "erin"),
    ]
    members_rows = [
        (1, "alice", "acme", "User", D2, 0),
        (2, "alice", "acme", "User", D2, 1),  # edge 13: duplicate pair
        (3, "ghost", "acme", "User", D2, 2),  # edge 12: unresolved login
        (4, "bob", "nowhere", "User", D2, 3),  # edge 12: unresolved org
        (5, "bob", "globex", "User", D2, 4),
    ]
    collab_rows = [
        (1, "alice", "tool", "bob", D2, 0),
        (2, "alice", "tool", "bob", D2, 1),  # duplicate pair
        (3, "ghost", "tool", "bob", D2, 2),  # unresolved login
        (4, "bob", "nope", "bob", D2, 3),  # unresolved repo
    ]

    paths = {}
    for name, rows, schema in [
        ("gh_users_raw", users_rows, _users_schema),
        ("gh_repos_raw", repos_rows, _repos_schema),
        ("gh_org_members_raw", members_rows, _rel_schema),
        ("gh_repo_collaborators_raw", collab_rows, _collab_schema),
    ]:
        p = str(d / f"{name}.parquet")
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("overwrite").parquet(p)
        paths[name] = p

    raw_users = spark.read.schema(_users_schema).parquet(paths["gh_users_raw"])
    raw_repos = spark.read.schema(_repos_schema).parquet(paths["gh_repos_raw"])
    raw_members = spark.read.schema(_rel_schema).parquet(paths["gh_org_members_raw"])
    raw_collabs = spark.read.schema(_collab_schema).parquet(
        paths["gh_repo_collaborators_raw"]
    )

    existing_ghr = spark.createDataFrame([(900, 107)], "id long, github_id long")
    existing_repos = spark.createDataFrame(
        [(901, "go/erin/legacy", "Go")], "id long, clone_path string, primary_language string"
    )

    users_res = import_users(raw_users)
    repos_res = import_repos(
        raw_repos,
        existing_repositories=existing_repos,
        existing_gh_repositories=existing_ghr,
    )
    members_res = import_org_members(
        raw_members, users_res.gh_users, users_res.gh_organizations
    )
    collabs_res = import_repo_collaborators(
        raw_collabs,
        users_res.gh_users,
        repos_res.repositories,
        repos_res.gh_repositories,
    )

    con = duckdb.connect()
    for name, p in paths.items():
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}/*.parquet'")
    con.execute("CREATE TABLE existing_ghr AS SELECT 900 AS id, 107 AS github_id")
    con.execute(
        "CREATE TABLE existing_repos AS SELECT 901 AS id,"
        " 'go/erin/legacy' AS clone_path, 'Go' AS primary_language"
    )
    # Oracle building blocks shared by several checks
    con.execute("""
        CREATE VIEW won_users AS
        SELECT * FROM (
            SELECT *, row_number() OVER (
                PARTITION BY id ORDER BY file_date DESC, file_pos ASC) AS rn
            FROM gh_users_raw WHERE type = 'User') t
        WHERE rn = 1
    """)
    con.execute("""
        CREATE VIEW won_orgs AS
        SELECT * FROM (
            SELECT *, row_number() OVER (
                PARTITION BY id ORDER BY file_date DESC, file_pos ASC) AS rn
            FROM gh_users_raw WHERE type = 'Organization') t
        WHERE rn = 1
    """)
    con.execute("""
        CREATE VIEW sk_users AS
        SELECT *, row_number() OVER (ORDER BY id) AS uid FROM won_users
    """)
    con.execute("""
        CREATE VIEW sk_orgs AS
        SELECT *, row_number() OVER (ORDER BY id) AS oid FROM won_orgs
    """)
    con.execute("""
        CREATE VIEW stg AS
        SELECT replace(coalesce(name,''), chr(0), '') AS name,
               replace(coalesce(language,''), chr(0), '') AS primary_language,
               replace(coalesce(clone_url,''), chr(0), '') AS clone_url,
               replace(lower(concat_ws('/',
                   coalesce(nullif(coalesce(language,''),''),'unknown'),
                   coalesce(nullif(coalesce(owner_login,''),''),'john_doe'),
                   coalesce(nullif(coalesce(name,''),''),'42'))), chr(0), '') AS clone_path,
               'git' AS vcs, id AS github_id,
               replace(coalesce(full_name,''), chr(0), '') AS full_name,
               replace(coalesce(description,''), chr(0), '') AS description,
               replace(coalesce(homepage,''), chr(0), '') AS homepage,
               coalesce(fork, false) AS fork,
               replace(coalesce(default_branch,''), chr(0), '') AS default_branch,
               replace(coalesce(master_branch,''), chr(0), '') AS master_branch,
               replace(coalesce(html_url,''), chr(0), '') AS html_url,
               CAST(coalesce(forks_count, 0) AS INTEGER) AS forks_count,
               CAST(coalesce(open_issues_count, 0) AS INTEGER) AS open_issues_count,
               CAST(coalesce(stargazers_count, 0) AS INTEGER) AS stargazers_count,
               CAST(coalesce(subscribers_count, 0) AS INTEGER) AS subscribers_count,
               CAST(coalesce(watchers_count, 0) AS INTEGER) AS watchers_count,
               CAST(NULL AS INTEGER) AS size_in_kb,
               CAST(nullif(coalesce(created_at,''),'') AS TIMESTAMP) AS created_at,
               CAST(nullif(coalesce(updated_at,''),'') AS TIMESTAMP) AS updated_at,
               CAST(nullif(coalesce(pushed_at,''),'') AS TIMESTAMP) AS pushed_at
        FROM gh_repos_raw
    """)
    con.execute("""
        CREATE VIEW repo_surv AS
        SELECT * FROM (
            SELECT DISTINCT s.* FROM stg s
            JOIN (SELECT clone_path, max(updated_at) AS mu, max(pushed_at) AS mp,
                         min(open_issues_count) AS mo
                  FROM stg GROUP BY clone_path) g
              ON s.clone_path = g.clone_path AND s.updated_at = g.mu
             AND s.pushed_at = g.mp AND s.open_issues_count = g.mo) t
        WHERE clone_url <> '' AND clone_path <> '' AND primary_language <> ''
          AND NOT EXISTS (SELECT 1 FROM existing_ghr e WHERE e.github_id = t.github_id)
          AND NOT EXISTS (SELECT 1 FROM existing_repos r
                          WHERE r.clone_path = t.clone_path
                            AND r.primary_language = t.primary_language)
    """)
    con.execute("""
        CREATE VIEW sk_repos AS
        SELECT *, row_number() OVER (ORDER BY clone_path, github_id) AS rid
        FROM repo_surv
    """)

    res = {
        "users": users_res,
        "repos": repos_res,
        "members": members_res,
        "collabs": collabs_res,
        "raw_users": raw_users,
    }
    yield spark, con, res
    con.close()


def test_users_table(etl):
    spark, con, res = etl
    assert_oracle_match(
        res["users"].users,
        con,
        """SELECT uid AS id, coalesce(login,'') AS username,
                  coalesce(name,'') AS name, coalesce(email,'') AS email
           FROM sk_users""",
        name="users",
    )


def test_gh_users_table(etl):
    spark, con, res = etl
    assert_oracle_match(
        res["users"].gh_users,
        con,
        """SELECT uid AS id, uid AS user_id, id AS github_id,
                  coalesce(login,'') AS login, coalesce(bio,'') AS bio,
                  coalesce(company,'') AS company, coalesce(email,'') AS email,
                  coalesce(hireable, false) AS hireable,
                  coalesce(location,'') AS location,
                  coalesce(avatar_url,'') AS avatar_url,
                  coalesce(html_url,'') AS html_url,
                  coalesce(followers, 0) AS followers_count,
                  coalesce(following, 0) AS following_count,
                  CAST(nullif(coalesce(created_at,''),'') AS TIMESTAMP) AS created_at,
                  CAST(nullif(coalesce(nullif(coalesce(updated_at,''),''),
                                       coalesce(created_at,'')),'') AS TIMESTAMP)
                      AS updated_at
           FROM sk_users""",
        name="gh_users",
    )


def test_gh_organizations_table(etl):
    spark, con, res = etl
    assert_oracle_match(
        res["users"].gh_organizations,
        con,
        """SELECT oid AS id, coalesce(login,'') AS login, id AS github_id,
                  coalesce(avatar_url,'') AS avatar_url,
                  coalesce(html_url,'') AS html_url,
                  coalesce(name,'') AS name, coalesce(company,'') AS company,
                  coalesce(location,'') AS location, coalesce(email,'') AS email,
                  CAST(nullif(coalesce(created_at,''),'') AS TIMESTAMP) AS created_at,
                  CAST(nullif(coalesce(nullif(coalesce(updated_at,''),''),
                                       coalesce(created_at,'')),'') AS TIMESTAMP)
                      AS updated_at
           FROM sk_orgs""",
        name="gh_organizations",
    )


def test_user_rejects(etl):
    spark, con, res = etl
    rej = res["users"].rejects.select("id", "login", "type")
    assert [(r["id"], r["type"]) for r in rej.collect()] == [(3, "Bot")]


def test_repositories_table(etl):
    spark, con, res = etl
    assert_oracle_match(
        res["repos"].repositories,
        con,
        """SELECT rid AS id, name, primary_language, clone_url, clone_path, vcs
           FROM sk_repos""",
        name="repositories",
    )


def test_gh_repositories_table(etl):
    spark, con, res = etl
    assert_oracle_match(
        res["repos"].gh_repositories,
        con,
        """SELECT rid AS id, rid AS repository_id, github_id, full_name,
                  description, homepage, fork, default_branch, master_branch,
                  html_url, forks_count, open_issues_count, stargazers_count,
                  subscribers_count, watchers_count, size_in_kb,
                  created_at, updated_at, pushed_at
           FROM sk_repos""",
        name="gh_repositories",
    )


def test_repo_edge_cases(etl):
    """Spot-check the §A.5 edge semantics beyond the full-table compare."""
    spark, con, res = etl
    repos = {r["clone_path"]: r for r in res["repos"].repositories.collect()}
    ghr = {r["github_id"]: r for r in res["repos"].gh_repositories.collect()}
    # edge 5/F7: empty language filtered; john_doe/42 defaults survive
    assert not any(cp.startswith("unknown/") for cp in repos)
    assert "go/john_doe/42" in repos
    # edge 6: null bytes stripped
    assert ghr[102]["description"] == "desc"
    assert repos["go/bob/toolx"]["name"] == "toolx"
    # edge 7: empty created_at → NULL
    assert ghr[102]["created_at"] is None
    # edge 8/14: extremal row (103) won the bob/tool group, lowercased path
    assert ghr.get(103) is not None and ghr.get(104) is None
    assert "go/bob/tool" in repos
    # edge 9: DISTINCT collapsed the duplicate 105 rows
    assert res["repos"].gh_repositories.filter(F.col("github_id") == 105).count() == 1
    # edges 10/11: filtered and anti-joined github_ids absent
    assert all(g not in ghr for g in (106, 107, 109))


def test_org_members_table(etl):
    spark, con, res = etl
    assert_oracle_match(
        res["members"].gh_users_organizations,
        con,
        """SELECT DISTINCT u.uid AS gh_user_id, o.oid AS gh_organization_id
           FROM gh_org_members_raw m
           JOIN sk_users u ON u.login = m.login
           JOIN sk_orgs o ON o.login = m.org""",
        name="gh_users_organizations",
    )
    assert res["members"].rejects.count() == 2  # ghost + nowhere


def test_users_repositories_table(etl):
    spark, con, res = etl
    assert_oracle_match(
        res["collabs"].users_repositories,
        con,
        """SELECT DISTINCT u.uid AS user_id, r.rid AS repository_id
           FROM gh_repo_collaborators_raw c
           JOIN sk_users u ON u.login = c.login
           JOIN sk_repos r ON r.full_name = concat_ws('/', c.owner, c.repo)""",
        name="users_repositories",
    )
    assert res["collabs"].rejects.count() == 2  # ghost + missing repo


def test_invariants(etl):
    """Post-load invariants (SURVEY §5 item 3): unique keys, FK closure."""
    spark, con, res = etl
    repos = res["repos"].repositories
    assert repos.count() == repos.select("clone_path").distinct().count()
    assert repos.count() == repos.select("clone_url").distinct().count()
    ghu = res["users"].gh_users
    assert ghu.count() == ghu.select("github_id").distinct().count()
    # FKs resolve
    mem = res["members"].gh_users_organizations
    assert mem.join(ghu.select(F.col("id").alias("gh_user_id")), "gh_user_id", "left_anti").count() == 0
    ur = res["collabs"].users_repositories
    assert ur.join(repos.select(F.col("id").alias("repository_id")), "repository_id", "left_anti").count() == 0


def test_idempotency(etl):
    """Re-running an import with the previous outputs as existing targets
    adds zero rows — the semantic core of F3/F8."""
    spark, con, res = etl
    prev = res["users"]
    again = import_users(
        res["raw_users"],
        existing_gh_users=prev.gh_users,
        existing_gh_organizations=prev.gh_organizations,
    )
    assert again.users.count() == 0
    assert again.gh_users.count() == 0
    assert again.gh_organizations.count() == 0


def test_null_type_rows_are_rejected_not_dropped(spark):
    """A row whose BSON 'type' field is missing must land in rejects
    (the reference's zero-value policy turns a missing type into ''
    which hits the switch default, ght2dm.go:311-313) — three-valued
    logic previously made ~isin(...) NULL and the row vanished from
    users, orgs, AND rejects."""
    from ght2dm_spark.pipelines.ghtorrent import import_users

    raw = spark.createDataFrame(
        [
            _u(1, "u1", type="User"),
            _u(2, "missing", type=None),
            _u(3, "o1", type="Organization"),
        ],
        _users_schema,
    )
    res = import_users(raw)
    assert res.gh_users.count() == 1
    assert res.gh_organizations.count() == 1
    assert [r.id for r in res.rejects.collect()] == [2]
