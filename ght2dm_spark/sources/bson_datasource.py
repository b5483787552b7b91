"""BSON dumps as a first-class Spark data source (Python DataSource API).

``sources.bson.read_bson_dumps`` converts dumps through binaryFile +
``mapInPandas``; this module packages the same framing/decoding
(S1/S2/S3, ``/root/reference/ght2dm.go:212-236, 985-1029``) behind the
public Python DataSource API (pyspark.sql.datasource, Spark 4), so BSON
dumps read like any built-in format::

    spark.dataSource.register(BsonDataSource)
    df = (spark.read.format("ght2dm_bson")
          .schema("id bigint, login string, file_date date, file_pos bigint, _corrupt string")
          .option("flatten", "owner_login=owner.login")
          .load("/dumps/users"))

Scale shape: ``partitions()`` emits ONE partition per dump file — the
reference's own unit of atomicity (S8) — so a directory of daily dumps
fans out across executors with no driver-side data movement; the driver
does only the listing (the same listing any file source performs).  Rows
stream out of each file incrementally (the framing is sequential by
design), never materializing a whole dump in memory.

Per-field semantics match the mapInPandas path exactly: requested fields
are matched by BSON key, missing keys → NULL, nested one-level flattens
via the ``flatten`` option, malformed frames produce ``_corrupt`` rows
rather than failing the task (E1, ``ght2dm.go:281-290``).
"""

from __future__ import annotations

import os
import re
from collections.abc import Iterator
from datetime import date

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

from ght2dm_spark.sources.bson import (
    FILE_DATE_RE,
    BsonError,
    decode_doc,
    stream_frames,
)

_META = ("file_date", "file_pos", "_corrupt")


class BsonFilePartition(InputPartition):
    def __init__(self, path: str, file_date: date):
        self.path = path
        self.file_date = file_date


class BsonDataSource(DataSource):
    """``format("ght2dm_bson")`` — length-prefixed BSON dump directories."""

    @classmethod
    def name(cls) -> str:
        return "ght2dm_bson"

    def schema(self) -> str:
        # Inference-free default (SURVEY §1.3): provenance only; callers
        # name the entity fields they want, like the reference's structs.
        return "file_date date, file_pos bigint, _corrupt string"

    def reader(self, schema: StructType) -> "BsonDumpReader":
        return BsonDumpReader(schema, self.options)

    def writer(self, schema: StructType, overwrite: bool) -> "BsonDumpWriter":
        return BsonDumpWriter(schema, self.options, overwrite)


class BsonDumpReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.schema = schema
        self.path = options.get("path")
        if not self.path:
            raise ValueError("ght2dm_bson requires a load(path)")
        # "out=outer.inner, out2=o2.i2" — mirrors read_bson_dumps(flatten=)
        self.flatten: dict[str, tuple[str, str]] = {}
        for spec in (options.get("flatten") or "").split(","):
            spec = spec.strip()
            if spec:
                if "=" not in spec or "." not in spec.split("=", 1)[1]:
                    raise ValueError(
                        f"ght2dm_bson: flatten spec {spec!r} must be "
                        "'out=outer.inner' (comma-separated)"
                    )
                out, dotted = spec.split("=", 1)
                outer, inner = dotted.split(".", 1)
                self.flatten[out.strip()] = (outer.strip(), inner.strip())

    def partitions(self) -> list[BsonFilePartition]:
        # One partition per date-named dump file (S2 filter); undated
        # files are skipped exactly like visit() logs-and-skips them.
        parts = []
        for fname in sorted(os.listdir(self.path)):
            if not fname.endswith(".bson"):
                continue
            m = FILE_DATE_RE.search(fname)
            if not m:
                continue
            y, mo, d = (int(x) for x in m.group(1).split("-"))
            parts.append(
                BsonFilePartition(os.path.join(self.path, fname), date(y, mo, d))
            )
        return parts

    def read(self, partition: BsonFilePartition) -> Iterator[tuple]:
        fields = [f.name for f in self.schema.fields]

        def emit(row: dict) -> tuple:
            return tuple(row.get(f) for f in fields)

        with open(partition.path, "rb") as fh:
            yield from self._read_frames(fh, partition, fields, emit)

    def _read_frames(self, fh, partition, fields, emit) -> Iterator[tuple]:
        pos = 0
        gen = stream_frames(fh)
        while True:
            try:
                frame = next(gen)
            except StopIteration:
                return
            except BsonError as e:
                # corrupt tail → one reject row; frames before it already
                # emitted (the reference fails only the bad read)
                yield emit(
                    {"file_date": partition.file_date, "file_pos": -1,
                     "_corrupt": f"frame: {e}"}
                )
                return
            row: dict = {"file_date": partition.file_date, "file_pos": pos,
                         "_corrupt": None}
            try:
                doc = decode_doc(frame)
                for f in fields:
                    if f in self.flatten:
                        outer, inner = self.flatten[f]
                        sub = doc.get(outer)
                        row[f] = sub.get(inner) if isinstance(sub, dict) else None
                    elif f not in _META:
                        row[f] = doc.get(f)
            except BsonError as e:
                row["_corrupt"] = str(e)
            yield emit(row)
            pos += 1


class BsonWriterCommitMessage(WriterCommitMessage):
    def __init__(self, temp: str, final: str, rows: int):
        self.temp = temp
        self.final = final
        self.rows = rows


class BsonDumpWriter(DataSourceWriter):
    """The WRITE side of the dump format (Spark 4 Python DataSource
    writer API): each task frames its partition's rows as concatenated
    BSON documents into one date-named dump file — the reference's own
    file-per-unit layout (S8), so a dump written here reads back
    through this source (or the reference's loader) unchanged.

    Durability contract: tasks write ``*.bson.inprogress`` temp names
    (invisible to the reader, which lists only ``*.bson``), and
    ``commit`` renames the successful tasks' files into place — so a
    task that dies mid-write, or a speculative duplicate, can never
    surface partial or duplicated rows; ``abort`` removes what the
    failed job staged.  Overwrite deletes the OLD dump files inside
    ``commit`` too, not at writer construction: a job that fails before
    commit leaves the previous data untouched.

    Meta columns (file_date / file_pos / _corrupt) are provenance the
    READER synthesizes; they are dropped on write rather than
    round-tripped as data."""

    def __init__(self, schema: StructType, options: dict, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("ght2dm_bson requires a save(path)")
        self.file_date = options.get("file_date", "1970-01-01")
        if not re.fullmatch(r"\d{4}-\d{2}-\d{2}", self.file_date):
            raise ValueError(
                f"ght2dm_bson: file_date {self.file_date!r} must be "
                "YYYY-MM-DD — the reader's date filter would silently "
                "skip a file written under any other shape"
            )
        self.prefix = options.get("prefix", "dump")
        if FILE_DATE_RE.search(self.prefix):
            raise ValueError(
                f"ght2dm_bson: prefix {self.prefix!r} contains a "
                "date-like token; the reader takes the FIRST date in the "
                "filename as file_date, so a dated prefix would shadow "
                f"file_date={self.file_date}"
            )
        self.overwrite = overwrite
        self.fields = [f.name for f in schema.fields if f.name not in _META]
        os.makedirs(self.path, exist_ok=True)

    def write(self, iterator) -> "BsonWriterCommitMessage":
        import uuid

        from pyspark import TaskContext

        from ght2dm_spark.sources.bson import encode_doc

        pid = TaskContext.get().partitionId() if TaskContext.get() else 0
        fname = (
            f"{self.prefix}-{self.file_date}"
            f"-part{pid:05d}-{uuid.uuid4().hex[:8]}.bson"
        )
        final = os.path.join(self.path, fname)
        temp = final + ".inprogress"
        n = 0
        with open(temp, "wb") as fh:
            for row in iterator:
                d = row.asDict() if hasattr(row, "asDict") else dict(row)
                fh.write(
                    encode_doc({k: d.get(k) for k in self.fields})
                )
                n += 1
        if n == 0:
            os.unlink(temp)
            return BsonWriterCommitMessage("", "", 0)
        return BsonWriterCommitMessage(temp, final, n)

    def commit(self, messages) -> None:
        if self.overwrite:
            for fname in os.listdir(self.path):
                if fname.endswith(".bson"):
                    os.unlink(os.path.join(self.path, fname))
        for m in messages:
            if m is not None and m.rows:
                os.replace(m.temp, m.final)

    def abort(self, messages) -> None:
        for m in messages or []:
            if m is not None and m.temp:
                try:
                    os.unlink(m.temp)
                except FileNotFoundError:
                    pass
