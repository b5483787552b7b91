"""Real-bytes tests for the pure-Python image container parser
(operators.multimodal.parse_image_header) and its generators.

The independence check matters: the generators and the parser were
written against the same specs, so one fixture here is a KNOWN png from
the wild (a canonical 1×1 PNG, hard-coded bytes) — proving the parser
reads the format, not just our own writer's output.
"""

from __future__ import annotations

import base64
import struct
import zlib

from ght2dm_spark.operators.multimodal import (
    gif_bytes,
    jpeg_bytes,
    parse_image_header,
    png_bytes,
)

# The canonical minimal 1×1 transparent PNG (public reference fixture,
# produced by standard tooling — not by our generator).
_KNOWN_1X1_PNG = base64.b64decode(
    "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJ"
    "AAAADUlEQVR42mNkYPhfDwAChwGA60e6kgAAAABJRU5ErkJggg=="
)


def test_known_external_png_parses():
    assert parse_image_header(_KNOWN_1X1_PNG) == ("png", 1, 1)


def test_png_roundtrip_and_decodability():
    b = png_bytes(63, 48, value=200)
    assert parse_image_header(b) == ("png", 63, 48)
    # the IDAT really is the declared image: h rows of (filter byte + w
    # pixels) of the fill value
    assert b[12:16] == b"IHDR"
    (idat_len,) = struct.unpack(">I", b[33:37])
    assert b[37:41] == b"IDAT"
    raw = zlib.decompress(b[41 : 41 + idat_len])
    assert raw == (b"\x00" + bytes([200]) * 63) * 48


def test_jpeg_sof_parse_skips_prior_segments():
    b = jpeg_bytes(320, 240)
    assert parse_image_header(b) == ("jpeg", 320, 240)
    # progressive marker (SOF2) parses the same way
    b2 = b.replace(b"\xff\xc0", b"\xff\xc2", 1)
    assert parse_image_header(b2) == ("jpeg", 320, 240)


def test_gif_little_endian_dims():
    assert parse_image_header(gif_bytes(500, 7)) == ("gif", 500, 7)


def test_truncated_and_unknown_payloads_are_rejects_not_errors():
    png = png_bytes(10, 10)
    assert parse_image_header(png[:20]) == ("png", None, None)
    jpg = jpeg_bytes(10, 10)
    # cut before SOF: SOI + APP0 only
    assert parse_image_header(jpg[:10]) == ("jpeg", None, None)
    assert parse_image_header(b"GIF89a\x01") == ("gif", None, None)
    assert parse_image_header(b"not an image at all") == ("unknown", None, None)
    assert parse_image_header(b"") == ("unknown", None, None)


def test_jpeg_eoi_before_sof_yields_no_dims():
    assert parse_image_header(b"\xff\xd8\xff\xd9") == ("jpeg", None, None)


def test_jpeg_fill_bytes_before_marker():
    """T.81 allows 0xFF padding before any marker; camera files use it."""
    b = jpeg_bytes(64, 32)
    padded = b[:2] + b"\xff\xff\xff" + b[2:]
    assert parse_image_header(padded) == ("jpeg", 64, 32)


# --------------------------------------------------------------------------
# WAV / RIFF


def test_wav_roundtrip():
    from ght2dm_spark.operators.multimodal import parse_wav_header, wav_bytes

    b = wav_bytes(channels=2, rate=16000, n_samples=8000)
    assert parse_wav_header(b) == ("wav", 2, 16000, 500)
    mono = wav_bytes(channels=1, rate=8000, n_samples=400)
    assert parse_wav_header(mono) == ("wav", 1, 8000, 50)


def test_wav_chunk_walk_skips_unknown_chunks():
    """Real WAVs carry LIST/INFO/fact chunks before data — the walker
    must skip them by size (including the odd-size alignment pad)."""
    import struct

    from ght2dm_spark.operators.multimodal import parse_wav_header, wav_bytes

    b = wav_bytes(channels=1, rate=8000, n_samples=800)
    # splice an odd-sized junk chunk between WAVE and fmt
    junk = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # pad to even
    spliced = b[:12] + junk + b[12:]
    fixed = b"RIFF" + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    assert parse_wav_header(fixed) == ("wav", 1, 8000, 100)


def test_wav_rejects_not_errors():
    from ght2dm_spark.operators.multimodal import parse_wav_header, wav_bytes

    assert parse_wav_header(b"RIFFxxxxNOPE")[0] == "unknown"
    assert parse_wav_header(b"")[0] == "unknown"
    # RIFF/WAVE but truncated before fmt: wav with no decodable params
    b = wav_bytes(1, 8000, 100)
    assert parse_wav_header(b[:12]) == ("wav", None, None, None)


# --------------------------------------------------------------------------
# MP4 / ISO BMFF


def test_mp4_roundtrip_v0():
    from ght2dm_spark.operators.multimodal import mp4_bytes, parse_mp4_header

    assert parse_mp4_header(mp4_bytes(600, 1500)) == ("mp4", 600, 2500, "isom")
    assert parse_mp4_header(mp4_bytes(90000, 630000, "mp42")) == (
        "mp4", 90000, 7000, "mp42",
    )


def test_mp4_box_walk_skips_siblings_and_handles_largesize():
    """mvhd must be found after unrelated sibling boxes, and a 64-bit
    largesize box header must advance the walk correctly."""
    import struct

    from ght2dm_spark.operators.multimodal import mp4_bytes, parse_mp4_header

    import struct as _s

    b = mp4_bytes(1000, 4000)
    ftyp_len = _s.unpack(">I", b[:4])[0]
    ftyp, moov = b[:ftyp_len], b[ftyp_len:]
    free = struct.pack(">I", 16) + b"free" + b"\x00" * 8
    # same free box re-encoded with size=1 + 64-bit largesize
    big = struct.pack(">I", 1) + b"free" + struct.pack(">Q", 24) + b"\x00" * 8
    assert parse_mp4_header(ftyp + free + moov) == ("mp4", 1000, 4000, "isom")
    assert parse_mp4_header(ftyp + big + moov) == ("mp4", 1000, 4000, "isom")


def test_mp4_rejects_not_errors():
    from ght2dm_spark.operators.multimodal import mp4_bytes, parse_mp4_header

    assert parse_mp4_header(b"")[0] == "unknown"
    assert parse_mp4_header(b"\x00\x00\x00\x08mdat")[0] == "unknown"
    import struct as _s

    b = mp4_bytes(600, 600)
    # ftyp intact but moov truncated away: brand recovered, no duration
    ftyp_len = _s.unpack(">I", b[:4])[0]
    assert parse_mp4_header(b[:ftyp_len]) == ("mp4", None, None, "isom")


def test_png_pixel_roundtrip_filters_none_sub_up():
    """png_pattern_bytes encodes rows with filters 0/1/2; the decoder
    must reverse all of them to reproduce the generator formula."""
    import numpy as np

    from ght2dm_spark.operators.multimodal import (
        decode_png_gray,
        png_pattern_bytes,
    )

    for (w, h, s) in [(8, 8, 0), (13, 9, 5), (64, 48, 123), (40, 11, 7)]:
        img = decode_png_gray(png_pattern_bytes(w, h, s))
        r = np.arange(h).reshape(-1, 1)
        c = np.arange(w).reshape(1, -1)
        want = ((31 * r + 17 * c + 7 * s) % 256).astype(np.uint8)
        assert img is not None and (img == want).all(), (w, h, s)


def test_png_pixel_decode_average_and_paeth_filters():
    """Filters 3 (Average) and 4 (Paeth) aren't produced by the
    generator, so exercise them with hand-encoded rows: encode a known
    image per spec §9, decode, compare."""
    import struct
    import zlib

    import numpy as np

    from ght2dm_spark.operators.multimodal import (
        _PNG_SIG,
        _png_chunk,
        decode_png_gray,
    )

    rng = np.random.RandomState(42)
    w, h = 11, 6
    img = rng.randint(0, 256, size=(h, w)).astype(np.int32)

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

    rows = []
    prev = np.zeros(w, dtype=np.int32)
    for y in range(h):
        cur = img[y]
        ft = 3 if y % 2 == 0 else 4
        enc = np.zeros(w, dtype=np.int32)
        for x in range(w):
            left = cur[x - 1] if x else 0
            up = prev[x]
            ul = prev[x - 1] if x else 0
            pred = (left + up) // 2 if ft == 3 else paeth(left, up, ul)
            enc[x] = (cur[x] - pred) % 256
        rows.append(bytes([ft]) + enc.astype(np.uint8).tobytes())
        prev = cur
    raw = b"".join(rows)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    b = (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )
    got = decode_png_gray(b)
    assert got is not None and (got == img.astype(np.uint8)).all()


def test_ahash_rejects_small_and_nonpng():
    from ght2dm_spark.operators.multimodal import (
        ahash64,
        decode_png_gray,
        png_pattern_bytes,
    )

    assert decode_png_gray(b"not a png at all") is None
    small = decode_png_gray(png_pattern_bytes(4, 4, 1))
    assert small is not None and ahash64(small) is None


def test_wav_sample_decode_skips_padded_unknown_chunks():
    """A LIST chunk with an odd size before data must be skipped with
    its pad byte (RIFF chunks align to even offsets); the sample decode
    must still find the data chunk."""
    import struct

    import numpy as np

    from ght2dm_spark.operators.multimodal import decode_wav_samples

    samples = np.array([100, -200, 300], dtype="<i2")
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    odd = b"x" * 3  # odd-size chunk → 1 pad byte follows
    body = (
        b"WAVE"
        + b"LIST" + struct.pack("<I", len(odd)) + odd + b"\x00"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", samples.nbytes) + samples.tobytes()
    )
    b = b"RIFF" + struct.pack("<I", len(body)) + body
    got = decode_wav_samples(b)
    assert got is not None and (got == [100, -200, 300]).all()


def test_wav_sample_decode_rejects_stereo_and_8bit():
    import struct

    from ght2dm_spark.operators.multimodal import (
        decode_wav_samples,
        wav_bytes,
    )

    assert decode_wav_samples(wav_bytes(2, 8000, 10)) is None  # stereo
    assert decode_wav_samples(wav_bytes(1, 8000, 10, bits=8)) is None
    assert decode_wav_samples(b"RIFFxxxxNOPE") is None


def test_null_payloads_are_rejects_not_errors():
    """One NULL payload in 100 TB of media must reject the ROW, never
    the task: every parse/decode entry point takes None and returns its
    reject shape instead of raising."""
    from ght2dm_spark.operators.multimodal import (
        decode_png_gray,
        decode_wav_samples,
        parse_mp4_header,
        parse_mp4_samples,
        parse_wav_header,
    )

    assert parse_image_header(None) == ("unknown", None, None)
    assert parse_wav_header(None) == ("unknown", None, None, None)
    assert parse_mp4_header(None) == ("unknown", None, None, None)
    assert decode_png_gray(None) is None
    assert decode_wav_samples(None) is None
    assert parse_mp4_samples(None) is None


def test_mp4_sample_walk_backtracks_to_sibling_trak():
    """A leading metadata-only trak (no stbl chain) must not shadow the
    real track: the box walk tries every sibling matching a path
    segment instead of committing to the first."""
    from ght2dm_spark.operators.multimodal import (
        _bmff_box,
        mp4_samples_bytes,
        parse_mp4_samples,
    )

    good = mp4_samples_bytes(seed=5)
    # rebuild: moov( empty-trak , real-trak )
    ftyp_len = struct.unpack(">I", good[:4])[0]
    moov = good[ftyp_len:]
    real_trak = moov[8:]  # strip the moov envelope → the full trak box
    empty_trak = _bmff_box(b"trak", _bmff_box(b"mdia", b""))
    rebuilt = good[:ftyp_len] + _bmff_box(b"moov", empty_trak + real_trak)
    assert parse_mp4_samples(rebuilt) == parse_mp4_samples(good)
    assert parse_mp4_samples(rebuilt) is not None


def test_mp4_fixed_size_stsz_is_arithmetic_not_a_list():
    """A crafted stsz with sample_size != 0 and a ~2^32 sample count must
    yield derived totals (fixed*n), not a tens-of-GB materialized list."""
    from ght2dm_spark.operators.multimodal import (
        _bmff_box,
        parse_mp4_samples,
    )

    n = 0xFFFFFFF0
    stsz = b"\x00\x00\x00\x00" + struct.pack(">II", 64, n)
    stts = b"\x00\x00\x00\x00" + struct.pack(">I", 1) + struct.pack(">II", n, 10)
    stbl = _bmff_box(b"stbl", _bmff_box(b"stsz", stsz) + _bmff_box(b"stts", stts))
    moov = _bmff_box(
        b"moov", _bmff_box(b"trak", _bmff_box(b"mdia", _bmff_box(b"minf", stbl)))
    )
    ftyp = _bmff_box(b"ftyp", b"isom" + struct.pack(">I", 0) + b"isom")
    got = parse_mp4_samples(ftyp + moov)
    assert got == (n, 64 * n, 64, n * 10)


def test_crafted_overflow_headers_reject_row_not_task():
    """Unsigned container fields exceeding the signed declared-column
    range must parse as NULL metadata (reject the ROW) — fed to pandas'
    Int32/Int64 casts they would raise and kill the whole task."""
    import struct

    from ght2dm_spark.operators.multimodal import (
        _PNG_SIG,
        _png_chunk,
        parse_image_header,
        parse_mp4_header,
        parse_wav_header,
        _wav_wrap,
    )

    # PNG declaring width 2^31 (spec-invalid, crafted)
    ihdr = struct.pack(">IIBBBBB", 0x80000000, 10, 8, 0, 0, 0, 0)
    bad_png = _PNG_SIG + _png_chunk(b"IHDR", ihdr)
    assert parse_image_header(bad_png) == ("png", None, 10)

    # WAV declaring sample rate 2^31+1
    fmt = struct.pack("<HHIIHH", 1, 2, 0x80000001, 4, 4, 16)
    bad_wav = _wav_wrap(fmt, b"\x00" * 8)
    fmt_, ch, rate, dur = parse_wav_header(bad_wav)
    assert (fmt_, ch, rate) == ("wav", 2, None)

    # MP4 mvhd v1 with 64-bit duration 2^63 at timescale 1
    def box(t, body):
        return struct.pack(">I", len(body) + 8) + t + body

    mvhd = (
        b"\x01\x00\x00\x00"
        + struct.pack(">QQ", 0, 0)
        + struct.pack(">IQ", 1, 2**63)
    )
    bad_mp4 = box(b"ftyp", b"isom" + b"\x00" * 8) + box(
        b"moov", box(b"mvhd", mvhd)
    )
    f, ts, dur_ms, brand = parse_mp4_header(bad_mp4)
    assert (f, ts, dur_ms, brand) == ("mp4", 1, None, "isom")


def test_truncated_chunks_parse_as_corrupt_not_sibling_bytes():
    """A truncated fmt/mvhd must yield NULLs, never the NEXT chunk's
    bytes reported as valid metadata."""
    import struct

    from ght2dm_spark.operators.multimodal import (
        parse_mp4_header,
        parse_wav_header,
    )

    # fmt chunk declaring sz=4 followed by a LIST chunk: the old parser
    # read the LIST header bytes as sample_rate
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", 4) + b"\x01\x00\x02\x00"
        + b"LIST" + struct.pack("<I", 4) + b"INFO"
    )
    wav = b"RIFF" + struct.pack("<I", len(body)) + body
    assert parse_wav_header(wav) == ("wav", None, None, None)

    # 4-byte mvhd followed by a free box: must not parse free's bytes
    def box(t, b_):
        return struct.pack(">I", len(b_) + 8) + t + b_

    mp4 = box(b"ftyp", b"isom" + b"\x00" * 8) + box(
        b"moov", box(b"mvhd", b"\x00" * 4) + box(b"free", b"\x01" * 32)
    )
    assert parse_mp4_header(mp4) == ("mp4", None, None, "isom")


def test_mp4_samples_skip_tableless_trak_and_reject_overflow():
    """A first trak whose stbl lacks stsz must not shadow a later
    complete trak; u32xu32 totals exceeding int64 reject the row."""
    import struct

    from ght2dm_spark.operators.multimodal import parse_mp4_samples

    def box(t, b_):
        return struct.pack(">I", len(b_) + 8) + t + b_

    def trak(stbl_children: bytes):
        return box(
            b"trak", box(b"mdia", box(b"minf", box(b"stbl", stbl_children)))
        )

    stsz = box(b"stsz", struct.pack(">III", 0, 0, 3) + struct.pack(">3I", 5, 7, 9))
    stts = box(b"stts", struct.pack(">II", 0, 1) + struct.pack(">II", 3, 10))
    empty_trak = trak(box(b"stco", b"\x00" * 8))  # stbl without stsz/stts
    good_trak = trak(stsz + stts)
    mp4 = box(b"ftyp", b"isom" + b"\x00" * 8) + box(
        b"moov", empty_trak + good_trak
    )
    assert parse_mp4_samples(mp4) == (3, 21, 9, 30)

    # fixed-size branch with fixed*n > int64 max → reject
    stsz_of = box(b"stsz", struct.pack(">III", 0xFFFFFFFF, 0xFFFFFFFF, 0xFFFFFFFF))
    stts_of = box(b"stts", struct.pack(">II", 0, 1) + struct.pack(">II", 0xFFFFFFFF, 0xFFFFFFFF))
    mp4_of = box(b"ftyp", b"isom" + b"\x00" * 8) + box(
        b"moov", trak(stsz_of + stts_of)
    )
    assert parse_mp4_samples(mp4_of) is None


def test_png_decompression_bomb_rejected():
    """A crafted PNG claiming huge dims with a tiny highly-compressible
    IDAT must be rejected before inflating gigabytes."""
    import struct
    import zlib

    from ght2dm_spark.operators.multimodal import (
        _PNG_SIG,
        _png_chunk,
        decode_png_gray,
    )

    ihdr = struct.pack(">IIBBBBB", 65535, 65535, 8, 0, 0, 0, 0)
    bomb = (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"\x00" * 4096))
        + _png_chunk(b"IEND", b"")
    )
    assert decode_png_gray(bomb) is None  # pixel cap, no inflate
