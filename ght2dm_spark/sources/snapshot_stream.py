"""Snapshot tables as a STRUCTURED STREAMING SOURCE (Spark 4 Python
DataSource streaming API) — the "table as a stream" integration every
lakehouse format grows: a query ``readStream.format("ght2dm_snapshot")
.load(path)`` emits each append commit's rows as a micro-batch, with
offsets = snapshot versions, so the snapshot layer now closes the loop
(stream→table via ``snapshots.snapshot_sink``, table→stream here).

Scale shape: ``latestOffset`` reads one pointer file driver-side;
``partitions`` diffs two manifests' file lists (append commits only
ever extend them — an overwrite/compaction breaks delta containment and
raises, same contract as ``snapshots.read_increment``); ``read`` opens
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


def _files_at(table: Path, seq: int) -> list[str]:
    if seq < 0:
        return []
    name = _manifest_for(table, seq)
    if name is None:
        raise ValueError(f"{table}: version {seq} not found (vacuumed?)")
    return list(_load_manifest(table, name)["files"])


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
        files = _files_at(table, _current_seq(table))
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
        old = set(_files_at(table, int(start["seq"])))
        new = _files_at(table, int(end["seq"]))
        if not old <= set(new):
            raise ValueError(
                f"{self.path}: version {start['seq']} is not an "
                "append-ancestor of {end['seq']} (overwrite/compaction "
                "intervened) — restart the stream from a fresh checkpoint"
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
