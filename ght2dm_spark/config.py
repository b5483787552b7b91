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
from pyspark.sql.types import StructType

#: entity basename → importer, mirroring the reference's switch
#: (``ght2dm.go:1036-1049``)
ENTITIES = ("users", "repos", "org_members", "repo_collaborators")


@dataclass
class RunConfig:
    folders: list[str]
    output_dir: str
    nocheck: bool = False  # the reference's -nocheck flag (ght2dm.go:1126)
    incremental: bool = False  # append-only rerun against existing outputs
    # E3/E4: the reference's -verbose (per-entity import counts) and
    # -debug (statement-level tracing) flags.  verbose logs a per-table
    # row count measured IN the write pass via df.observe — never a
    # second scan; debug additionally logs each table's formatted
    # physical plan.
    verbose: bool = False
    debug: bool = False
    extra: dict = field(default_factory=dict)


def read_config(path: str) -> RunConfig:
    """Load the JSON run config (S4).  Unknown keys are preserved in
    ``extra`` rather than rejected."""
    with open(path) as f:
        raw = json.load(f)
    known = {"folders", "output_dir", "nocheck", "incremental", "verbose", "debug"}
    return RunConfig(
        folders=list(raw["folders"]),
        output_dir=raw["output_dir"],
        nocheck=bool(raw.get("nocheck", False)),
        incremental=bool(raw.get("incremental", False)),
        verbose=bool(raw.get("verbose", False)),
        debug=bool(raw.get("debug", False)),
        extra={k: v for k, v in raw.items() if k not in known},
    )


def _decode_schema(registered: StructType) -> StructType:
    """Decode schema for read_bson_dumps, derived from the ONE schema
    registry (schemas.py — previously hand-duplicated here, a drift
    hazard): the registry entries include the file_date/file_pos scan
    provenance that the reader APPENDS, so the decode schema is the
    registry minus those two."""
    return StructType(
        [f for f in registered.fields if f.name not in ("file_date", "file_pos")]
    )


def _users_schema() -> StructType:
    from ght2dm_spark.schemas import GH_USERS_RAW

    return _decode_schema(GH_USERS_RAW)


def _repos_schema() -> StructType:
    from ght2dm_spark.schemas import GH_REPOS_RAW

    return _decode_schema(GH_REPOS_RAW)


def _members_schema() -> StructType:
    from ght2dm_spark.schemas import GH_ORG_MEMBERS_RAW

    return _decode_schema(GH_ORG_MEMBERS_RAW)


def _collabs_schema() -> StructType:
    from ght2dm_spark.schemas import GH_REPO_COLLABORATORS_RAW

    return _decode_schema(GH_REPO_COLLABORATORS_RAW)


def run_from_config(spark: SparkSession, cfg: RunConfig) -> dict[str, str]:
    """Process every configured folder in order; returns table → path.

    Relation entities require their dimensions to have been imported
    first — exactly the reference's folder-order contract.

    ``cfg.incremental``: rerun against existing outputs — already-loaded
    keys are anti-joined away (F3/F8), surrogate keys continue from the
    existing max (append-only, ids never reused), and new rows APPEND to
    the output tables.  A fresh run overwrites previous OUTPUTS, but
    folders within one run always accumulate (a config may list the same
    entity twice — the reference inserts every folder's rows into the
    same tables): later folders of an entity dedup against and append to
    the run's own staging, in either mode.

    Crash safety (the reference's per-file transactions, S8): every
    table write goes through the snapshot layer (:mod:`ght2dm_spark.
    snapshots`) — data + manifest are STAGED per table as the run
    progresses, and all CURRENT pointers flip together only after every
    table has staged successfully.  A kill anywhere mid-run leaves every
    output readable at its previous snapshot; a kill during the final
    pointer loop leaves each table at exactly the old or the new
    snapshot, never half-written.  Stale staging from a crashed run is
    invisible and reclaimed by ``snapshots.vacuum``.
    """
    from pyspark.sql import functions as F

    from ght2dm_spark.pipelines import (
        import_org_members,
        import_repo_collaborators,
        import_repos,
        import_users,
    )
    from ght2dm_spark.snapshots import (
        commit,
        prepare_commit,
        read_prepared,
        read_snapshot,
        vacuum,
    )
    from ght2dm_spark.sources.bson import read_bson_dumps, split_rejects

    import logging

    from pyspark.sql import Observation

    log = logging.getLogger(__name__)
    if cfg.verbose or cfg.debug:
        # the reference's -v/-d print unconditionally; under Python's
        # default logging config (root at WARNING, no handler) these
        # records would vanish while verbose's observe() cost still ran
        log.setLevel(logging.DEBUG if cfg.debug else logging.INFO)
        if not log.handlers:
            h = logging.StreamHandler()
            h.setFormatter(logging.Formatter("%(name)s: %(message)s"))
            log.addHandler(h)
    out = Path(cfg.output_dir)
    written: dict[str, str] = {}
    prepared = []
    # latest STAGED manifest per table this run — a later folder of the
    # same entity must read and chain onto the run's own staging, not the
    # still-unflipped CURRENT (else its anti-join misses the earlier
    # folder's rows and reissues their surrogate keys).  This holds for
    # FRESH runs too: the reference accumulates every folder's inserts
    # within one import (tables are only reset between runs), so the
    # second users folder of a fresh run appends to the first's staging.
    staged: dict[str, object] = {}

    def _write(name, df):
        p = str(out / name)
        if cfg.debug:
            log.debug("plan for %s:\n%s", name, df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
        obs = None
        if cfg.verbose:
            # E3: per-entity import counts, measured inside the write
            # job itself (df.observe) — the 100 TB form of the
            # reference's verbose logging, never a second scan
            obs = Observation(f"write_{name}")
            df = df.observe(obs, F.count(F.lit(1)).alias("n_rows"))
        # no self-read hazard on append: the incremental plan reads a
        # PINNED file list (previous snapshot or this run's staging),
        # never the live directory
        if name in staged:
            mode, base = "append", staged[name].manifest_name
        else:
            mode, base = ("append" if cfg.incremental else "overwrite"), None
        pc = prepare_commit(df, p, mode=mode, parent=base)
        prepared.append(pc)
        staged[name] = pc
        if obs is not None:
            log.info("wrote %s: %d rows (%s)", name, obs.get["n_rows"], mode)
        written[name] = p

    def _write_rejects(name, df):
        """Rejects have no key, so an incremental rerun — which rescans
        every file and re-emits every reject — would append the same
        rows again on each run.  exceptAll against the existing snapshot
        (NULL-safe, multiplicity-exact) keeps one copy per actual
        occurrence, mirroring what the keyed tables' anti-joins do.

        Known collapse: the in-run accumulation (``_existing`` returns
        earlier folders' staged rows) means an IDENTICAL reject row
        re-emitted by a LATER folder in the same run also collapses to
        one copy unless provenance columns (file_date / file_pos)
        disambiguate — which they do for every BSON-decode reject; only
        provenance-free reject shapes (resolve_fk drops) can coalesce
        across folders, and for those "the row is already recorded" is
        the semantics we want."""
        ex = _existing(name, merge_schema=True)
        if ex is not None:
            if set(df.columns) <= set(ex.columns):
                df = df.exceptAll(ex.select(*df.columns))
            else:
                # a widened reject shape (new provenance column) makes
                # the multiset dedup unsound — append raw, but LOUDLY:
                # silent skipping re-accumulated duplicates per rerun
                log.warning(
                    "%s: reject schema gained columns %s — skipping the "
                    "cross-run dedup for this write (duplicates from "
                    "re-scanned files may append)",
                    name,
                    sorted(set(df.columns) - set(ex.columns)),
                )
        _write(name, df)

    def _existing(name, merge_schema=False):
        if name in staged:
            # this run already staged the table — read the staged
            # manifest's pinned files so later folders see earlier ones
            # (applies to fresh runs too: in-run accumulation; schema
            # drift is impossible within one run, so no merge needed)
            return read_prepared(spark, staged[name])
        if not cfg.incremental:
            return None
        return read_snapshot(
            spark, str(out / name), merge_schema=merge_schema
        )

    def _dim(name):
        """Dimension table for a relation import: this run's STAGED
        parquet when an earlier folder produced it, else the COMMITTED
        snapshot (an incremental run whose config lists only
        org_members / repo_collaborators is legitimate — the reference
        resolves relation FKs against the persistent tables,
        ght2dm.go:814-960).  Reading the staged files — not the raw
        decode lineage the old in-memory state carried — means the
        relation join broadcasts a plain parquet scan of data already
        on disk."""
        ex = _existing(name)
        if ex is None:
            raise ValueError(
                f"relation folder needs the {name} dimension, but no "
                f"folder in this run imports it and no committed "
                f"snapshot exists at {out / name} — import the "
                "dimension first (or run incrementally against a "
                "populated output dir)"
            )
        return ex

    def _next_key(df):
        if df is None:
            return 1
        mx = df.agg(F.max("id")).collect()[0][0]
        return (mx or 0) + 1

    # validate EVERY folder before any staging work: a typo in the last
    # folder must fail in milliseconds, not after hours of decode/dedup
    # on the earlier ones (whose staged output would become vacuum
    # garbage).  Three static checks: known entity basename, the
    # directory exists, and every relation folder's dimension tables are
    # satisfiable (an earlier folder in THIS config, or a committed
    # snapshot on disk) — all readable from names and CURRENT pointers.
    from ght2dm_spark.snapshots import _read_current

    dim_tables = {
        "org_members": ("gh_users", "gh_organizations"),
        "repo_collaborators": ("gh_users", "repositories", "gh_repositories"),
    }
    produces = {
        "users": {"users", "gh_users", "gh_organizations"},
        "repos": {"repositories", "gh_repositories"},
    }
    run_products: set[str] = set()
    for folder in cfg.folders:
        entity = os.path.basename(os.path.normpath(folder))
        if entity not in ENTITIES:
            raise ValueError(f"unknown entity folder: {folder}")
        if not os.path.isdir(folder):
            raise ValueError(f"entity folder does not exist: {folder}")
        for t in dim_tables.get(entity, ()):
            if t in run_products:
                continue
            # A committed on-disk snapshot only satisfies the dimension
            # when the run is INCREMENTAL — _dim/_existing consult disk
            # solely under cfg.incremental, so accepting a snapshot here
            # on a non-incremental run would pass validation and still
            # fail hours later in _dim (the exact late failure this
            # fail-fast sweep exists to prevent).
            if cfg.incremental and _read_current(out / t) is not None:
                continue
            hint = (
                f"a committed snapshot exists at {out / t} but this run "
                "is not incremental (set incremental=true to read it)"
                if _read_current(out / t) is not None
                else f"no committed snapshot exists at {out / t}"
            )
            raise ValueError(
                f"{folder}: needs the {t} dimension, but no earlier "
                f"folder in this config imports it and {hint} — order "
                "the dimension folder first (or run incrementally "
                "against a populated output dir)"
            )
        run_products |= produces.get(entity, set())

    for folder in cfg.folders:
        entity = os.path.basename(os.path.normpath(folder))
        if entity == "users":
            # one persisted decode per folder: the keyed branch, the
            # org/user split, and the rejects write otherwise each
            # re-run the full binaryFile + BSON decode
            raw = read_bson_dumps(spark, folder, _users_schema()).persist()
            good, rej = split_rejects(raw)
            ex_u, ex_o = _existing("gh_users"), _existing("gh_organizations")
            res = import_users(
                good,
                existing_gh_users=ex_u,
                existing_gh_organizations=ex_o,
                nocheck=cfg.nocheck,
                user_key_start=_next_key(ex_u),
                org_key_start=_next_key(ex_o),
            )
            for n in ("users", "gh_users", "gh_organizations"):
                _write(n, getattr(res, n))
            _write_rejects(
                "rejects_users",
                res.rejects.unionByName(rej, allowMissingColumns=True),
            )
        elif entity == "repos":
            raw = read_bson_dumps(
                spark, folder, _repos_schema(),
                flatten={"owner_login": ("owner", "login")},
            ).persist()
            good, rej = split_rejects(raw)
            ex_r, ex_g = _existing("repositories"), _existing("gh_repositories")
            res = import_repos(
                good,
                existing_repositories=ex_r,
                existing_gh_repositories=ex_g,
                key_start=_next_key(ex_r),
            )
            _write("repositories", res.repositories)
            _write("gh_repositories", res.gh_repositories)
            _write_rejects("rejects_repos", rej)
        elif entity == "org_members":
            raw = read_bson_dumps(spark, folder, _members_schema()).persist()
            good, rej = split_rejects(raw)
            res = import_org_members(
                good, _dim("gh_users"), _dim("gh_organizations"),
                existing=_existing("gh_users_organizations"),
                nocheck=cfg.nocheck,
            )
            _write("gh_users_organizations", res.gh_users_organizations)
            _write_rejects(
                "rejects_org_members",
                res.rejects.unionByName(rej, allowMissingColumns=True),
            )
        elif entity == "repo_collaborators":
            raw = read_bson_dumps(spark, folder, _collabs_schema()).persist()
            good, rej = split_rejects(raw)
            res = import_repo_collaborators(
                good, _dim("gh_users"), _dim("repositories"),
                _dim("gh_repositories"),
                existing=_existing("users_repositories"),
                nocheck=cfg.nocheck,
            )
            _write("users_repositories", res.users_repositories)
            _write_rejects(
                "rejects_repo_collaborators",
                res.rejects.unionByName(rej, allowMissingColumns=True),
            )
        # staging writes above already ran their jobs — the folder's
        # decode cache has served all its consumers
        raw.unpersist()
    # every table staged — publish all snapshots in one tight loop
    for p in prepared:
        commit(p)
    # retention: immutable snapshots otherwise accumulate a full dataset
    # per rerun.  Keep THIS run's manifests plus one pre-run version per
    # table — a run that staged a table N times must not let a keep-2
    # window evict the version downstream consumers diff against
    # (read_increment since the pre-run seq).
    stagings: dict[str, int] = {}
    for p in prepared:
        stagings[p.table] = stagings.get(p.table, 0) + 1
    for table_path, n in stagings.items():
        vacuum(table_path, keep_manifests=n + 1)
    return written
