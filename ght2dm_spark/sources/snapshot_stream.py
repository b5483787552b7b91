"""Snapshot tables as a STRUCTURED STREAMING SOURCE (Spark 4 Python
DataSource streaming API) — the "table as a stream" integration every
lakehouse format grows: a query ``readStream.format("ght2dm_snapshot")
.load(path)`` emits each append commit's rows as a micro-batch, with
offsets = snapshot versions, so the snapshot layer now closes the loop
(stream→table via ``snapshots.snapshot_sink``, table→stream here).

Scale shape: ``latestOffset`` reads one pointer file driver-side;
``partitions`` diffs two manifests' file lists (append commits only
ever extend them — an overwrite/compaction breaks delta containment and
raises, same contract as ``snapshots.read_increment``; a merge-on-read
DELETE commit likewise raises, because a stream cannot retract rows it
already emitted — compact to materialize deletes, then restart); ``read`` opens
ONE parquet file per input partition executor-side and yields Arrow
record batches — per-file fan-out identical to the batch scan, no
driver data movement.  Exactly-once follows from offsets being
versions: a replayed batch re-reads the same immutable files.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

from ght2dm_spark.snapshots import (
    _DATA,
    _load_manifest,
    _manifest_for,
    _read_current,
)


class SnapshotFilePartition(InputPartition):
    def __init__(self, path: str, columns: list[str]):
        self.path = path
        self.columns = columns


def _manifest_at(table: Path, seq: int) -> dict | None:
    """Committed manifest for ``seq``, or None for the pre-table seq -1.
    A vacuumed/unknown version surfaces as ``_manifest_for``'s
    FileNotFoundError — the error a restarted checkpoint hits when its
    start version aged out."""
    if seq < 0:
        return None
    return _load_manifest(table, _manifest_for(table, seq))


def _files_at(m: dict | None) -> list[str]:
    return list(m["files"]) if m is not None else []


def _deletes_at(m: dict | None) -> list[str]:
    return list(m.get("delete_files", [])) if m is not None else []


def _current_seq(table: Path) -> int:
    name = _read_current(table)
    if name is None:
        return -1
    return _load_manifest(table, name)["seq"]


class SnapshotStreamDataSource(DataSource):
    """``readStream.format("ght2dm_snapshot")`` over a snapshot table."""

    @classmethod
    def name(cls) -> str:
        return "ght2dm_snapshot"

    def schema(self):
        # declared-schema discipline everywhere else; here the table's
        # own files ARE the contract, so read one footer (driver-side,
        # metadata-only) instead of making callers restate it
        path = self.options.get("path")
        if not path:
            raise ValueError("ght2dm_snapshot requires a load(path)")
        table = Path(path)
        files = _files_at(_manifest_at(table, _current_seq(table)))
        if not files:
            raise ValueError(f"{path}: no committed snapshot to stream")
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import from_arrow_schema

        sch = pq.read_schema(str(table / _DATA / files[0]))
        return from_arrow_schema(sch, prefer_timestamp_ntz=True)

    def streamReader(self, schema: StructType) -> "SnapshotStreamReader":
        return SnapshotStreamReader(schema, self.options)


class SnapshotStreamReader(DataSourceStreamReader):
    def __init__(self, schema: StructType, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("ght2dm_snapshot requires a load(path)")
        self.columns = [f.name for f in schema.fields]

    def initialOffset(self) -> dict:
        # start from empty: the existing snapshot arrives as batch 0
        return {"seq": -1}

    def latestOffset(self) -> dict:
        return {"seq": _current_seq(Path(self.path))}

    def partitions(self, start: dict, end: dict):
        table = Path(self.path)
        m_old = _manifest_at(table, int(start["seq"]))
        m_new = _manifest_at(table, int(end["seq"]))
        old = set(_files_at(m_old))
        new = _files_at(m_new)
        if not old <= set(new):
            raise ValueError(
                f"{self.path}: version {start['seq']} is not an "
                f"append-ancestor of {end['seq']} (overwrite/compaction "
                "intervened) — restart the stream from a fresh checkpoint"
            )
        # A merge-on-read delete commit bumps seq but leaves `files`
        # unchanged, so file containment alone would plan an EMPTY batch
        # and silently keep emitting rows the batch reader anti-joins
        # away.  Streams cannot retract, so surface it loudly (same
        # contract as the overwrite case above).  This also catches
        # batch 0 over a table already carrying delete files.
        if set(_deletes_at(m_old)) != set(_deletes_at(m_new)):
            raise ValueError(
                f"{self.path}: merge-on-read delete files changed between "
                f"versions {start['seq']} and {end['seq']} — a stream "
                "cannot retract already-emitted rows (and batch 0 would "
                "emit logically-deleted ones).  Compact the table to "
                "materialize deletes, then restart from a fresh checkpoint"
            )
        return [
            SnapshotFilePartition(str(table / _DATA / f), self.columns)
            for f in new
            if f not in old
        ]

    def read(self, partition: SnapshotFilePartition):
        import pyarrow.parquet as pq

        pf = pq.ParquetFile(partition.path)
        for batch in pf.iter_batches(columns=partition.columns):
            yield batch

    def commit(self, end: dict) -> None:
        pass
