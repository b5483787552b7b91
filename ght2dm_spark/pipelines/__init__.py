"""End-to-end ETL pipelines re-expressing the reference's importers
(SURVEY §3) as set-oriented DataFrame jobs."""

from ght2dm_spark.pipelines.ghtorrent import (
    OrgMembersResult,
    RepoCollaboratorsResult,
    ReposResult,
    UsersResult,
    import_org_members,
    import_repo_collaborators,
    import_repos,
    import_users,
)

__all__ = [
    "OrgMembersResult",
    "RepoCollaboratorsResult",
    "ReposResult",
    "UsersResult",
    "import_org_members",
    "import_repo_collaborators",
    "import_repos",
    "import_users",
]
