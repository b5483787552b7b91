"""Multimodal declared queries: binary payloads synthesized from the
documents table (UTF-8 bytes of the text — deterministic on both
engines), pushed through the real Arrow/mapInPandas plumbing, with exact
DuckDB oracles (md5 over the same bytes, ascii() for the fake header).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

import pandas as pd

from ght2dm_spark.io import load_table
from ght2dm_spark.operators.multimodal import (
    decode_meta,
    extract_features,
    frame_sample,
    gif_bytes,
    jpeg_bytes,
    png_bytes,
)
from ght2dm_spark.queries.registry import register


def _with_payload(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", F.encode("text", "UTF-8").alias("payload"))


def synth_image_payload(doc_id: int) -> bytes:
    """Deterministic REAL image bytes per doc: format cycles
    png/jpeg/gif by ``doc_id % 3``; dimensions derive from doc_id, so an
    independent engine can predict what a correct parse must return
    without being able to build the bytes itself."""
    w = doc_id % 64 + 1
    h = doc_id % 48 + 1
    m = doc_id % 3
    if m == 0:
        return png_bytes(w, h, value=doc_id % 251)
    if m == 1:
        return jpeg_bytes(w, h)
    return gif_bytes(w, h)


def _with_image_payload(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").select("doc_id")

    @F.pandas_udf("binary")
    def make(doc_id: pd.Series) -> pd.Series:
        return doc_id.map(lambda i: synth_image_payload(int(i)))

    return d.select("doc_id", make("doc_id").alias("payload"))


@register(
    "t1_multimodal_decode",
    oracle="""
    SELECT doc_id,
           CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
                ELSE 'gif' END AS format,
           CAST(doc_id % 64 + 1 AS INTEGER) AS width,
           CAST(doc_id % 48 + 1 AS INTEGER) AS height
    FROM documents
    """,
)
def t1_multimodal_decode(spark, sf_dir):
    """Real image decode through mapInPandas: each doc carries ACTUAL
    PNG/JPEG/GIF bytes (spec-valid containers built per doc_id —
    :func:`synth_image_payload`), and ``decode_meta`` recovers
    format/width/height by parsing the container headers (PNG IHDR, JPEG
    SOF marker walk, GIF screen descriptor — operators.multimodal.
    parse_image_header), no codec library.  The oracle predicts the
    parse output from the generator's doc_id formulas — DuckDB cannot
    parse the bytes, but it knows exactly what a correct parser must
    find, so a wrong parse (endianness, offset, marker-walk bug)
    mismatches immediately.

    Scale: payload synthesis and parsing are one narrow Arrow-batched
    map over doc splits — no shuffle; only the small typed metadata
    survives projection downstream."""
    out = decode_meta(_with_image_payload(spark, sf_dir), "payload", keep=["doc_id"])
    return out.select("doc_id", "format", "width", "height")


@register(
    "t1_multimodal_frames",
    oracle="""
    WITH idx AS (
        SELECT doc_id, text,
               unnest(range(0, CAST(ceil(length(text) / 16.0) AS BIGINT), 2)) AS frame_idx
        FROM documents
    )
    SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx,
           substr(text, CAST(frame_idx * 16 + 1 AS INTEGER), 16) AS frame_text
    FROM idx
    """,
)
def t1_multimodal_frames(spark, sf_dir):
    """Frame sampling: every 2nd 16-byte chunk of each payload becomes a
    row (the demuxer stand-in).  Decoded back to string for the compare
    (DuckDB's substr over the same ASCII yields identical chunks)."""
    out = frame_sample(_with_payload(spark, sf_dir), "payload", every=2, keep=["doc_id"])
    return out.select(
        "doc_id", "frame_idx", F.decode("frame", "UTF-8").alias("frame_text")
    )


@register(
    "t1_multimodal_features",
    oracle="""
    WITH c AS (SELECT doc_id, length(text) AS n,
                      list_filter(list_transform(
                        string_split_regex(text, ''), ch -> ascii(ch)),
                        x -> x IS NOT NULL) AS codes
               FROM documents),
    m AS (SELECT doc_id, n,
                 CAST(list_sum(codes) AS BIGINT) AS s,
                 CAST(list_sum(list_transform(codes, x -> x * x)) AS BIGINT)
                   AS ss
          FROM c)
    SELECT doc_id, CAST(n AS BIGINT) AS n_bytes, s AS byte_sum,
           round(CAST(s AS DOUBLE) / n, 6) AS byte_mean,
           round((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n) / n, 6)
             AS byte_var
    FROM m
    """,
)
def t1_multimodal_features(spark, sf_dir):
    """Feature extraction over binary payloads: numpy byte moments per
    item through the Arrow/mapInPandas batch path — the shape a real
    embedding/spectrogram extractor uses (vectorized math over each
    payload's buffer, columnar transfer both ways).  Moments are exact
    int64 sums; mean/variance divide once in float64, so the oracle's
    ascii-code arithmetic lands on identical doubles.

    Scale: narrow map over payload splits — no shuffle; downstream
    consumers read only the small feature columns (payload pruned by
    projection).  Arrow batch size bounds executor memory against large
    payloads."""
    out = extract_features(_with_payload(spark, sf_dir), "payload", keep=["doc_id"])
    return out.select(
        "doc_id",
        "n_bytes",
        "byte_sum",
        F.round("byte_mean", 6).alias("byte_mean"),
        F.round("byte_var", 6).alias("byte_var"),
    )


# --------------------------------------------------------------------------
# t1_multimodal_audio

_WAV_RATES = (8000, 16000, 32000)  # all divisible by 20 → exact durations


def synth_audio_payload(doc_id: int) -> bytes:
    """Deterministic REAL WAV bytes per doc: channels/rate/length derive
    from doc_id, so the oracle can predict what a correct RIFF parse
    must return without being able to build the bytes itself."""
    from ght2dm_spark.operators.multimodal import wav_bytes

    channels = 1 + doc_id % 2
    rate = _WAV_RATES[doc_id % 3]
    n_samples = rate * (doc_id % 5 + 1) // 20  # 50–250 ms, exact
    return wav_bytes(channels, rate, n_samples)


@register(
    "t1_multimodal_audio",
    oracle=f"""
    SELECT doc_id,
           'wav' AS format,
           CAST(1 + doc_id % 2 AS INTEGER) AS channels,
           CAST(CASE doc_id % 3 WHEN 0 THEN 8000 WHEN 1 THEN 16000
                ELSE 32000 END AS INTEGER) AS sample_rate,
           CAST((doc_id % 5 + 1) * 50 AS BIGINT) AS duration_ms
    FROM documents
    """,
)
def t1_multimodal_audio(spark, sf_dir):
    """Real audio-container decode through mapInPandas: each doc carries
    ACTUAL PCM WAV bytes (RIFF + fmt + data, built per doc_id), and
    ``decode_audio_meta`` walks the chunk list to recover channels /
    sample rate / duration (operators.multimodal.parse_wav_header — no
    audio library).  The oracle predicts the parse from the generator's
    doc_id formulas, so an endianness / chunk-walk / alignment bug
    mismatches immediately; duration is integer-exact because every
    rate divides the sample-count formula.

    Scale: same narrow-map shape as the image decode — Arrow-batched
    payload stream, metadata-only output, no shuffle."""
    d = load_table(spark, sf_dir, "documents").select("doc_id")

    @F.pandas_udf("binary")
    def make(doc_id: pd.Series) -> pd.Series:
        return doc_id.map(lambda i: synth_audio_payload(int(i)))

    from ght2dm_spark.operators.multimodal import decode_audio_meta

    out = decode_audio_meta(
        d.select("doc_id", make("doc_id").alias("payload")),
        "payload",
        keep=["doc_id"],
    )
    return out.select(
        "doc_id", "format", "channels", "sample_rate", "duration_ms"
    )


# --------------------------------------------------------------------------
# t1_multimodal_video

_MP4_SCALES = (600, 1000, 90000)  # QuickTime / ms / MPEG-TS-style clocks


def synth_video_payload(doc_id: int) -> bytes:
    """Deterministic REAL ISO-BMFF bytes per doc (ftyp + moov/mvhd):
    timescale / duration / brand derive from doc_id so the oracle can
    predict the parse."""
    from ght2dm_spark.operators.multimodal import mp4_bytes

    ts = _MP4_SCALES[doc_id % 3]
    dur_ms = (doc_id % 10 + 1) * 500
    return mp4_bytes(ts, ts * dur_ms // 1000, brand=("isom", "mp42")[doc_id % 2])


@register(
    "t1_multimodal_video",
    oracle="""
    SELECT doc_id,
           'mp4' AS format,
           CAST(CASE doc_id % 3 WHEN 0 THEN 600 WHEN 1 THEN 1000
                ELSE 90000 END AS INTEGER) AS timescale,
           CAST((doc_id % 10 + 1) * 500 AS BIGINT) AS duration_ms,
           CASE doc_id % 2 WHEN 0 THEN 'isom' ELSE 'mp42' END AS brand
    FROM documents
    """,
)
def t1_multimodal_video(spark, sf_dir):
    """Real video-container decode through mapInPandas: each doc carries
    ACTUAL ISO BMFF bytes (ftyp + moov/mvhd built per doc_id), and
    ``decode_video_meta`` walks the box tree — length-prefixed
    big-endian boxes, 64-bit largesize handling, nested moov→mvhd — to
    recover timescale / duration / brand (operators.multimodal.
    parse_mp4_header, no media library).  The oracle predicts the parse
    from the generator's formulas; every duration is integer-exact
    because each timescale divides its duration formula.

    With this the image / audio / video triple all run the same
    pattern: opaque binary column → Arrow-batched pure-Python container
    parse → typed metadata, payloads pruned after the map."""
    d = load_table(spark, sf_dir, "documents").select("doc_id")

    @F.pandas_udf("binary")
    def make(doc_id: pd.Series) -> pd.Series:
        return doc_id.map(lambda i: synth_video_payload(int(i)))

    from ght2dm_spark.operators.multimodal import decode_video_meta

    out = decode_video_meta(
        d.select("doc_id", make("doc_id").alias("payload")),
        "payload",
        keep=["doc_id"],
    )
    return out.select("doc_id", "format", "timescale", "duration_ms", "brand")


def _ahash_bits_ctes(docs_cte: str) -> str:
    """The analytic pixel→8×8-pool→bits CTE chain over a docs CTE that
    must expose (doc_id, seed); shared by t1_image_ahash and
    t1_media_dedup so both oracles predict the identical generator."""
    return f"""
    {docs_cte},
    d AS (SELECT doc_id, seed,
                 CAST(seed % 64 + 1 AS BIGINT) AS w,
                 CAST(seed % 48 + 1 AS BIGINT) AS h
          FROM src
          WHERE seed % 64 >= 7 AND seed % 48 >= 7),
    rws AS (SELECT doc_id, seed, w, h, unnest(range(0, h)) AS r FROM d),
    px AS MATERIALIZED (
        SELECT doc_id, seed, w, h, r, unnest(range(0, w)) AS c FROM rws),
    cells AS MATERIALIZED (
        SELECT doc_id, (r * 8) // h AS ci, (c * 8) // w AS cj,
               sum((31 * r + 17 * c + 7 * seed) % 256) AS s,
               count(*) AS n
        FROM px GROUP BY 1, 2, 3),
    means AS (SELECT doc_id, ci, cj, s // n AS m FROM cells),
    g AS (SELECT doc_id, sum(m) // 64 AS gm FROM means GROUP BY 1),
    bits AS (SELECT doc_id,
                    string_agg(CASE WHEN m >= gm THEN '1' ELSE '0' END, ''
                               ORDER BY ci, cj) AS ahash
             FROM means JOIN g USING (doc_id) GROUP BY doc_id)"""


_AHASH_SQL = f"""
    WITH {_ahash_bits_ctes(
        "src AS (SELECT doc_id, doc_id AS seed FROM documents)"
    ).lstrip()},
    cl AS (SELECT ahash, count(*) AS n_same FROM bits GROUP BY 1)
    SELECT b.doc_id, b.ahash, CAST(cl.n_same AS BIGINT) AS n_same
    FROM bits b JOIN cl USING (ahash)
"""


@register("t1_image_ahash", oracle=_AHASH_SQL)
def t1_image_ahash(spark, sf_dir):
    """PIXEL-level image fingerprinting: each doc carries a real
    zlib-compressed grayscale PNG whose rows cycle through filter types
    None/Sub/Up (operators.multimodal.png_pattern_bytes); the engine
    inflates the IDAT, reverses the per-row filters (all five types
    supported), integer-pools the pixels to an 8×8 grid and emits the
    64-bit average hash — the perceptual near-dup fingerprint that
    survives re-encoding, joined back to its hash-cluster size.

    The oracle cannot decode PNGs; it PREDICTS the pixels from the
    generator's (31r + 17c + 7·doc_id) mod 256 formula and replays the
    identical integer pooling in SQL — so any decode defect (wrong
    filter reversal, offset, stride, pooling boundary) mismatches
    bit-for-bit.  Images below the 8×8 grid are filtered on both sides.

    Scale: synthesis, decode, and hashing are ONE narrow Arrow-batched
    map over doc splits — media bytes never shuffle, only the 64-char
    fingerprint does (the multimodal posture: move hashes, not media);
    the cluster-size join shuffles fingerprints, uniform by
    construction."""
    from ght2dm_spark.operators.multimodal import image_ahash, png_pattern_bytes

    d = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .filter((F.col("doc_id") % 64 >= 7) & (F.col("doc_id") % 48 >= 7))
    )

    @F.pandas_udf("binary")
    def make(doc_id: pd.Series) -> pd.Series:
        return doc_id.map(
            lambda i: png_pattern_bytes(
                int(i) % 64 + 1, int(i) % 48 + 1, int(i)
            )
        )

    pay = d.select("doc_id", make("doc_id").alias("payload"))
    hashed = image_ahash(pay, "payload", keep=["doc_id"])
    # count-per-hash as a window IN the ahash shuffle, not an
    # aggregate-then-join-back: the aggregate subtree and the probe
    # subtree each contained the pandas-UDF decode (different shuffle
    # shapes — ReusedExchange can't serve them), so the join form
    # PIXEL-DECODED THE WHOLE CORPUS TWICE.  One ArrowEvalPython pass
    # now (plan: 2 → 1), identical counts.
    wa = Window.partitionBy("ahash")
    return hashed.select(
        "doc_id",
        "ahash",
        F.count(F.lit(1)).over(wa).cast("bigint").alias("n_same"),
    )


_AUDIO_FP_SQL = """
    WITH d AS (SELECT doc_id,
                      CAST(doc_id % 500 + 64 AS BIGINT) AS n
               FROM documents),
    sm AS MATERIALIZED (
        SELECT doc_id, n, unnest(range(0, n)) AS i FROM d),
    wn AS MATERIALIZED (
        SELECT doc_id, (i * 64) // n AS wi,
               sum(abs((13 * i * i + 17 * i + 31 * doc_id) % 65536
                       - 32768)) AS s,
               count(*) AS cnt
        FROM sm GROUP BY 1, 2),
    means AS (SELECT doc_id, wi, s // cnt AS m FROM wn),
    g AS (SELECT doc_id, sum(m) // 64 AS gm FROM means GROUP BY 1),
    fp AS (SELECT doc_id,
                  string_agg(CASE WHEN m >= gm THEN '1' ELSE '0' END, ''
                             ORDER BY wi) AS afp
           FROM means JOIN g USING (doc_id) GROUP BY doc_id)
    SELECT doc_id, afp FROM fp
"""


@register("t1_audio_fingerprint", oracle=_AUDIO_FP_SQL)
def t1_audio_fingerprint(spark, sf_dir):
    """SAMPLE-level audio fingerprinting: each doc carries a real mono
    16-bit PCM WAV (patterned samples, operators.multimodal.
    wav_pattern_bytes); the engine walks the RIFF chunks, validates the
    fmt block, decodes the int16 samples and emits a 64-bit integer
    energy fingerprint (|sample| pooled into 64 windows, bit = window ≥
    global mean) — the content-level near-dup key that, unlike the md5
    digest, survives container-level changes.

    Oracle: DuckDB cannot parse WAV; it predicts the samples from the
    generator's (13i² + 17i + 31·doc_id) mod 65536 − 32768 formula and
    replays the identical integer pooling — any decode defect (chunk
    alignment, endianness, signedness) mismatches bit-for-bit.  Same
    predictive-oracle pattern as t1_image_ahash.

    Scale: synthesis, decode and pooling are one narrow Arrow-batched
    map; audio bytes never shuffle — only the 64-char fingerprint
    column survives projection."""
    from ght2dm_spark.operators.multimodal import audio_ahash, wav_pattern_bytes

    d = load_table(spark, sf_dir, "documents").select("doc_id")

    @F.pandas_udf("binary")
    def make(doc_id: pd.Series) -> pd.Series:
        return doc_id.map(
            lambda i: wav_pattern_bytes(
                8000 + (int(i) % 5) * 1000, int(i) % 500 + 64, int(i)
            )
        )

    pay = d.select("doc_id", make("doc_id").alias("payload"))
    return audio_ahash(pay, "payload", keep=["doc_id"]).select(
        "doc_id", "afp"
    )


_VIDEO_SAMPLES_SQL = """
    WITH d AS (SELECT doc_id, CAST(doc_id % 30 + 8 AS BIGINT) AS n
               FROM documents),
    sm AS MATERIALIZED (
        SELECT doc_id, n, unnest(range(0, n)) AS i FROM d),
    agg AS (SELECT doc_id,
                   count(*) AS n_samples,
                   sum((7 * doc_id + 5 * i * i) % 1000 + 100) AS total_bytes,
                   max((7 * doc_id + 5 * i * i) % 1000 + 100) AS max_sample
            FROM sm GROUP BY 1)
    SELECT a.doc_id,
           CAST(a.n_samples AS BIGINT) AS n_samples,
           CAST(a.total_bytes AS BIGINT) AS total_bytes,
           CAST(a.max_sample AS BIGINT) AS max_sample,
           CAST((d.n // 2) * (1000 + d.doc_id % 100)
                + (d.n - d.n // 2) * 2000 AS BIGINT) AS duration_ticks
    FROM agg a JOIN d USING (doc_id)
"""


@register("t1_video_sample_table", oracle=_VIDEO_SAMPLES_SQL)
def t1_video_sample_table(spark, sf_dir):
    """DEMUX-level video parse: each doc carries a real ISO-BMFF file
    whose moov holds an actual sample table (stbl: per-sample stsz
    sizes + two stts duration runs); the engine walks
    moov→trak→mdia→minf→stbl and reports per-file sample count, byte
    total, largest sample and total tick duration — the numbers a
    frame-extraction pipeline needs before touching any codec (which
    samples to fetch, how much I/O they cost).

    Oracle: DuckDB predicts the tables from the generator formulas
    ((7·doc_id + 5i²) mod 1000 + 100 sizes; split duration runs) — a
    box-walk or table-stride defect mismatches immediately.  Same
    predictive pattern as t1_image_ahash / t1_audio_fingerprint; with
    them, all three modalities are decoded at CONTENT depth, not just
    header depth.

    Scale: one narrow Arrow-batched map; only the 4-column summary
    survives, media bytes never shuffle."""
    from ght2dm_spark.operators.multimodal import (
        mp4_samples_bytes,
        parse_mp4_samples,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id")

    @F.pandas_udf("binary")
    def make(doc_id: pd.Series) -> pd.Series:
        return doc_id.map(lambda i: mp4_samples_bytes(int(i)))

    pay = d.select("doc_id", make("doc_id").alias("payload"))
    schema = (
        "doc_id bigint, n_samples bigint, total_bytes bigint, "
        "max_sample bigint, duration_ticks bigint"
    )

    def batches(it):
        for pdf in it:
            rows = []
            for did, b in zip(pdf["doc_id"], pdf["payload"]):
                p = parse_mp4_samples(bytes(b))
                if p is None:
                    rows.append((did, None, None, None, None))
                else:
                    rows.append((did, p[0], p[1], p[2], p[3]))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "n_samples",
                    "total_bytes",
                    "max_sample",
                    "duration_ticks",
                ],
            )

    return pay.mapInPandas(batches, schema=schema)


_MEDIA_SRC_CTE = """src AS (
        SELECT doc_id, doc_id AS seed FROM documents
        UNION ALL
        SELECT doc_id + 1000000 AS doc_id, doc_id AS seed
        FROM documents WHERE doc_id % 10 = 0)"""

_MEDIA_DEDUP_SQL = f"""
    WITH {_ahash_bits_ctes(_MEDIA_SRC_CTE).lstrip()},
    canon AS (SELECT ahash, min(doc_id) AS canonical FROM bits GROUP BY 1)
    SELECT b.doc_id, c.canonical, b.ahash
    FROM bits b JOIN canon c USING (ahash)
    WHERE b.doc_id <> c.canonical
"""


@register("t1_media_dedup", oracle=_MEDIA_DEDUP_SQL)
def t1_media_dedup(spark, sf_dir):
    """Perceptual MEDIA dedup end-to-end: the corpus plus planted
    re-uploads (every 10th image appears again under a new doc_id but
    the same pixels) is pixel-decoded and average-hashed; images
    sharing a fingerprint collapse to the lowest-doc_id canonical, and
    the query emits the redundant→canonical mapping — what a dedup job
    applies before training.  The fingerprint (not the byte digest) is
    the key, so the same pipeline also collapses re-encoded copies.

    Oracle: the same planted-duplicate frame predicted analytically
    (seed stays the ORIGINAL doc_id for re-uploads, so both engines
    agree on which pixels repeat).

    Scale: decode+hash is the one narrow map over media splits; the
    canonical pick is a min-aggregation on the 64-char fingerprint —
    uniform keys, one shuffle; mapping join is fingerprint-keyed."""
    from ght2dm_spark.operators.multimodal import image_ahash, png_pattern_bytes

    d0 = load_table(spark, sf_dir, "documents").select("doc_id")
    aug = d0.select("doc_id", F.col("doc_id").alias("seed")).unionByName(
        d0.filter(F.col("doc_id") % 10 == 0).select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"),
            F.col("doc_id").alias("seed"),
        )
    ).filter((F.col("seed") % 64 >= 7) & (F.col("seed") % 48 >= 7))

    @F.pandas_udf("binary")
    def make(seed: pd.Series) -> pd.Series:
        return seed.map(
            lambda i: png_pattern_bytes(
                int(i) % 64 + 1, int(i) % 48 + 1, int(i)
            )
        )

    pay = aug.select("doc_id", make("seed").alias("payload"))
    hashed = image_ahash(pay, "payload", keep=["doc_id"])
    # canonical-per-fingerprint as min(doc_id) OVER the ahash window —
    # the aggregate+join-back form decoded every image twice (the same
    # two-ArrowEvalPython shape as t1_image_ahash, fixed the same way)
    wa = Window.partitionBy("ahash")
    return (
        hashed.select(
            "doc_id", "ahash", F.min("doc_id").over(wa).alias("canonical")
        )
        .filter(F.col("doc_id") != F.col("canonical"))
        .select("doc_id", "canonical", "ahash")
    )
