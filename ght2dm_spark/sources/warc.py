"""WARC/WET corpus source and sink — the Common Crawl interchange
format an LLM training-data pipeline actually ingests (WARC, ISO
28500-ish; WET = the text-conversion records of a crawl).

Read architecture mirrors :mod:`ght2dm_spark.sources.bson` (the same
whole-file-per-task shape the reference uses for dumps,
``/root/reference/ght2dm.go:212-236`` for the framing discipline):

- ``spark.read.format("binaryFile")`` distributes whole ``.wet`` /
  ``.wet.gz`` files to executors — one file = one task, so the FILE
  COUNT is the parallelism; crawl segments arrive as many bounded
  files, which is exactly the right unit at 100 TB;
- an Arrow-batched ``mapInPandas`` splits records with
  :func:`split_wet_records`, a dependency-free parser for the WARC
  record framing (version line, CRLF headers, ``Content-Length``-bounded
  block, CRLF CRLF trailer);
- gzip is handled executor-side (``gzip.decompress`` reads the
  multi-member streams crawl writers emit — each record its own gzip
  member — as well as whole-file compression);
- malformed records land in ``_corrupt`` instead of failing the job
  (the E1 fail-and-continue contract every source here shares), and
  the parser RESYNCS on the next ``WARC/1.0`` magic so one bad record
  doesn't corrupt-route the rest of its file;
- each record carries ``file`` (basename) + ``rec_pos`` (0-based
  position in its file) provenance, the same shuffle-stable ordering
  columns the BSON source emits.

The WRITER (:func:`write_wet`) emits spec-shaped WET files from a
DataFrame, executor-side (one file per partition via
``mapPartitions``), with deterministic record ids — which is also what
makes the reader's correctness checkable end-to-end: write a corpus
out, read it back, and the round trip is byte-accounted (the
``t1_wet_roundtrip`` oracle query).
"""

from __future__ import annotations

import gzip
import hashlib
import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

_MAGIC = b"WARC/1.0"
_CRLF = b"\r\n"

#: reader output schema (DDL) — payload decoded as UTF-8 with
#: replacement (WET conversion records are text/plain by construction)
WET_SCHEMA = (
    "warc_type string, target_uri string, warc_date string, "
    "record_id string, content_type string, text string, "
    "file string, rec_pos long, _corrupt string"
)


class WarcError(ValueError):
    pass


def _parse_headers(block: bytes) -> dict[str, str]:
    headers: dict[str, str] = {}
    for line in block.split(_CRLF):
        if not line:
            continue
        name, sep, value = line.partition(b":")
        if not sep:
            raise WarcError(f"header line without ':': {line[:60]!r}")
        headers[name.decode("ascii", "replace").strip().lower()] = (
            value.decode("utf-8", "replace").strip()
        )
    return headers


def split_wet_records(
    buf: bytes,
) -> Iterator[tuple[dict[str, str] | None, bytes, str | None]]:
    """Yield ``(headers, payload, corrupt)`` per record: well-formed
    records carry their header dict and ``Content-Length`` bytes of
    payload (corrupt None); a malformed region yields one
    ``(None, b"", message)`` tuple and the parser resyncs at the next
    ``WARC/1.0`` magic (or ends).  Framing is the WARC rule: version
    line, CRLF-separated headers, blank line, block, CRLF CRLF."""
    off, n = 0, len(buf)
    while off < n:
        # skip inter-record padding (spec says exactly CRLF CRLF, but
        # tolerate any blank-line run — crawl writers vary)
        while off < n and buf[off : off + 2] == _CRLF:
            off += 2
        if off >= n:
            return
        try:
            if buf[off : off + len(_MAGIC)] != _MAGIC:
                raise WarcError(f"no WARC/1.0 magic at offset {off}")
            hdr_end = buf.find(_CRLF + _CRLF, off)
            if hdr_end < 0:
                raise WarcError(f"unterminated header block at offset {off}")
            version_end = buf.find(_CRLF, off)
            headers = _parse_headers(buf[version_end + 2 : hdr_end])
            try:
                length = int(headers["content-length"])
            except (KeyError, ValueError):
                raise WarcError(f"missing/bad Content-Length at offset {off}")
            body_start = hdr_end + 4
            if body_start + length > n:
                raise WarcError(
                    f"truncated block at offset {off}: need {length} bytes"
                )
            yield headers, buf[body_start : body_start + length], None
            off = body_start + length
        except WarcError as e:
            nxt = buf.find(_MAGIC, off + 1)
            yield None, b"", str(e)
            if nxt < 0:
                return
            off = nxt


def _maybe_gunzip(name: str, data: bytes) -> bytes:
    if name.endswith(".gz"):
        # gzip.decompress walks ALL members — crawl files are usually
        # one gzip member PER RECORD, concatenated
        return gzip.decompress(data)
    return data


def read_wet(spark: SparkSession, path: str) -> DataFrame:
    """Directory (or glob) of ``*.wet`` / ``*.wet.gz`` files →
    DataFrame of :data:`WET_SCHEMA`: one row per WARC record with
    provenance (``file``, ``rec_pos``) and malformed records routed to
    ``_corrupt`` (E1).  ``warc_date`` stays the header's string form —
    cast downstream (``to_timestamp``) so a sloppy crawl date cannot
    kill ingestion."""

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.wet*")
        .load(path)
        .select("path", "content")
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path_, content in zip(pdf["path"], pdf["content"]):
                base = path_.rsplit("/", 1)[-1]
                try:
                    raw = _maybe_gunzip(base, bytes(content))
                except OSError as e:
                    # rec_pos None, not 0: a whole-file gzip failure has
                    # no record position, and 0 would collide with the
                    # provenance of a real record 0 elsewhere
                    rows.append(
                        (None, None, None, None, None, None, base, None,
                         f"gzip: {e}")
                    )
                    continue
                for pos, (hdr, payload, bad) in enumerate(
                    split_wet_records(raw)
                ):
                    if bad is not None:
                        rows.append(
                            (None, None, None, None, None, None, base,
                             pos, bad)
                        )
                        continue
                    rows.append(
                        (
                            hdr.get("warc-type"),
                            hdr.get("warc-target-uri"),
                            hdr.get("warc-date"),
                            hdr.get("warc-record-id"),
                            hdr.get("content-type"),
                            payload.decode("utf-8", "replace"),
                            base,
                            pos,
                            None,
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "warc_type", "target_uri", "warc_date", "record_id",
                    "content_type", "text", "file", "rec_pos", "_corrupt",
                ],
            )

    return files.mapInPandas(decode, schema=WET_SCHEMA)


def encode_wet_record(
    uri: str, date: str, text: str, warc_type: str = "conversion"
) -> bytes:
    """One spec-shaped WET record.  The record id is deterministic
    (md5 of uri + date) so a rewritten corpus is byte-identical —
    which is what makes round-trip auditing exact."""
    payload = text.encode("utf-8")
    rid = hashlib.md5(f"{uri}\x00{date}".encode()).hexdigest()
    headers = (
        f"WARC/1.0\r\n"
        f"WARC-Type: {warc_type}\r\n"
        f"WARC-Target-URI: {uri}\r\n"
        f"WARC-Date: {date}\r\n"
        f"WARC-Record-ID: <urn:md5:{rid}>\r\n"
        f"Content-Type: text/plain\r\n"
        f"Content-Length: {len(payload)}\r\n"
        f"\r\n"
        # UTF-8, not ascii: real crawls carry internationalized URIs,
        # and an encode crash here would abort the whole write task —
        # the reader decodes headers utf-8/replace symmetrically
    ).encode("utf-8")
    return headers + payload + _CRLF + _CRLF


def write_wet(
    df: DataFrame,
    out_dir: str,
    uri_col: str = "uri",
    date_col: str = "date",
    text_col: str = "text",
    n_files: int = 4,
    compress: bool = True,
) -> DataFrame:
    """Write ``df`` as ``n_files`` WET files under ``out_dir``,
    EXECUTOR-side (one file per partition, the distributed write shape
    — no driver collect), each prefixed with a warcinfo record.
    Records within a file follow the partition's row order; use a
    ``repartition(n, key)``/``sortWithinPartitions`` upstream for a
    deterministic layout.  Returns a report DataFrame
    ``(file, n_records)`` — materializing it performs the write."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    sel = df.selectExpr(
        f"{uri_col} AS uri", f"{date_col} AS date", f"{text_col} AS text"
    ).repartition(n_files, "uri")

    def write_part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId()
        ext = ".wet.gz" if compress else ".wet"
        name = f"part-{pid:05d}{ext}"
        info = encode_wet_record(
            "urn:ght2dm:warcinfo", "2000-01-01T00:00:00Z",
            "software: ght2dm_spark write_wet\r\n", warc_type="warcinfo",
        )
        n = 0
        # Task-commit protocol: stream to an ATTEMPT-UNIQUE temp name
        # (taskAttemptId is unique across retries AND concurrent
        # speculative attempts — two attempts of one partition never
        # share a file descriptor), then os.rename onto the final
        # deterministic path at task end.  rename is atomic on POSIX,
        # so readers never observe a torn file and last-completed-
        # attempt-wins yields identical bytes either way (the payload is
        # deterministic per partition).  The leading "." keeps an
        # aborted attempt's temp invisible to read_wet's "*.wet*" glob.
        tmp = os.path.join(out_dir, f".{name}.attempt-{ctx.taskAttemptId()}.tmp")
        with open(tmp, "wb") as f:
            f.write(gzip.compress(info, mtime=0) if compress else info)
            for pdf in batches:
                for uri, date, text in zip(
                    pdf["uri"], pdf["date"], pdf["text"]
                ):
                    rec = encode_wet_record(str(uri), str(date), str(text or ""))
                    # one gzip MEMBER per record, mtime pinned: the crawl
                    # convention, and byte-deterministic for a given layout
                    f.write(gzip.compress(rec, mtime=0) if compress else rec)
                    n += 1
        os.rename(tmp, os.path.join(out_dir, name))
        yield pd.DataFrame({"file": [name], "n_records": [n]})

    return sel.mapInPandas(write_part, schema="file string, n_records long")
