"""Multimodal column support (SURVEY §2.9 / north_star "multimodal
columns"): image/audio/video payloads as opaque ``binary`` columns with
typed metadata, processed by Arrow-batched pandas iterators
(``mapInPandas``) — the Spark-side plumbing (schema, batch shape, UDF
signature, partitioning) is real and tested; only the codec calls are
stubbed, because the image/audio libraries are not in this container.

Design for 100 TB of media:

- payloads travel as parquet ``binary`` columns (or ``binaryFile`` scans
  of raw objects) — never strings, never base64;
- per-item work happens inside ``mapInPandas`` so Arrow moves bytes in
  columnar batches (``spark.sql.execution.arrow.maxRecordsPerBatch``
  bounds batch memory against large payloads);
- decode → feature-extract is a narrow map: no shuffle, scales with
  input splits; downstream joins/apis see only the small typed metadata
  and feature columns, payloads are pruned away by column projection.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

#: schema of the decoded-metadata struct produced by decode_meta
META_SCHEMA = (
    "content_len long, header_w int, header_h int, digest string"
)


def _decode_stub(payload: bytes) -> tuple[int, int]:
    """Deterministic fake codec: "width"/"height" from the first two
    payload bytes.  The real implementation calls PIL/libav here; the
    import is gated so environments with the libs swap it in."""
    try:  # pragma: no cover - the container has no PIL by design
        import PIL.Image  # noqa: F401

        raise NotImplementedError(
            "real image decode not wired up; replace _decode_stub"
        )
    except ImportError:
        pass
    w = payload[0] if len(payload) > 0 else 0
    h = payload[1] if len(payload) > 1 else 0
    return w, h


def decode_meta(df: DataFrame, payload_col: str = "payload", keep: list[str] | None = None) -> DataFrame:
    """binary payload → typed metadata via an Arrow-batched pandas map.

    Output: ``keep`` columns + (content_len, header_w, header_h, digest).
    digest is md5 hex — content addressing for exact media dedup.
    """
    keep = keep or [c for c in df.columns if c != payload_col]
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.schema.fields
        if f.name in keep
    )
    out_schema = f"{out_schema}, {META_SCHEMA}" if out_schema else META_SCHEMA

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf[payload_col]
            meta = pd.DataFrame(
                {
                    "content_len": payloads.map(len),
                    "header_w": payloads.map(lambda b: _decode_stub(b)[0]).astype("int32"),
                    "header_h": payloads.map(lambda b: _decode_stub(b)[1]).astype("int32"),
                    "digest": payloads.map(lambda b: hashlib.md5(b).hexdigest()),
                }
            )
            yield pd.concat([pdf[keep].reset_index(drop=True), meta], axis=1)

    return df.mapInPandas(batches, schema=out_schema)


#: schema of the feature struct produced by extract_features
FEATURES_SCHEMA = (
    "n_bytes long, byte_sum long, byte_mean double, byte_var double"
)


def extract_features(
    df: DataFrame, payload_col: str = "payload", keep: list[str] | None = None
) -> DataFrame:
    """binary payload → numeric feature vector via numpy inside
    mapInPandas — the real feature-extraction path shape (an embedding
    model or mel-spectrogram call slots in where the byte stats are).

    Features are exact integer moments of the byte stream (sum and
    sum-of-squares in int64) with mean/variance derived in float64 at
    the end, so results are bit-reproducible across engines and batch
    orders — the same exact-moment discipline as the SQL-side stats.
    """
    import numpy as np

    keep = keep or [c for c in df.columns if c != payload_col]
    kept_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.schema.fields
        if f.name in keep
    )
    out_schema = (
        f"{kept_schema}, {FEATURES_SCHEMA}" if kept_schema else FEATURES_SCHEMA
    )

    def feats(b: bytes) -> tuple[int, int, float, float]:
        arr = np.frombuffer(b, dtype=np.uint8).astype(np.int64)
        n = arr.size
        if n == 0:
            return 0, 0, 0.0, 0.0
        s = int(arr.sum())
        ss = int((arr * arr).sum())
        return n, s, s / n, (ss - s * s / n) / n

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = [feats(b) for b in pdf[payload_col]]
            meta = pd.DataFrame(
                rows, columns=["n_bytes", "byte_sum", "byte_mean", "byte_var"]
            )
            yield pd.concat([pdf[keep].reset_index(drop=True), meta], axis=1)

    return df.mapInPandas(batches, schema=out_schema)


def frame_sample(df: DataFrame, payload_col: str = "payload", every: int = 2, keep: list[str] | None = None) -> DataFrame:
    """'Frame sampling' over a binary payload: emit every ``every``-th
    byte-chunk as a row (stand-in for video frame extraction — the chunk
    loop is exactly where a real demuxer would yield frames).  Output:
    keep cols + (frame_idx int, frame binary)."""
    keep = keep or [c for c in df.columns if c != payload_col]
    kept_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.schema.fields
        if f.name in keep
    )
    out_schema = (
        f"{kept_schema}, frame_idx int, frame binary"
        if kept_schema
        else "frame_idx int, frame binary"
    )
    chunk = 16

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for _, r in pdf.iterrows():
                b = r[payload_col]
                frames = [b[i : i + chunk] for i in range(0, len(b), chunk)]
                for idx in range(0, len(frames), every):
                    rows.append(
                        {**{k: r[k] for k in keep}, "frame_idx": idx, "frame": frames[idx]}
                    )
            yield pd.DataFrame(rows, columns=[*keep, "frame_idx", "frame"])

    return df.mapInPandas(batches, schema=out_schema)
