"""WARC/WET source: framing, corrupt routing with resync, gzip
multi-member handling, provenance, and the executor-side writer's
round trip."""

from __future__ import annotations

import gzip

from ght2dm_spark.sources.warc import (
    encode_wet_record,
    read_wet,
    split_wet_records,
    write_wet,
)


def _rec(uri="http://x/1", date="2024-01-01T00:00:00Z", text="hello"):
    return encode_wet_record(uri, date, text)


def test_split_parses_records_and_headers():
    buf = _rec(text="one") + _rec(uri="http://x/2", text="two wo")
    out = list(split_wet_records(buf))
    assert [bad for _, _, bad in out] == [None, None]
    (h1, p1, _), (h2, p2, _) = out
    assert h1["warc-target-uri"] == "http://x/1" and p1 == b"one"
    assert h2["warc-target-uri"] == "http://x/2" and p2 == b"two wo"
    assert h1["warc-type"] == "conversion"
    assert h1["warc-record-id"].startswith("<urn:md5:")


def test_split_routes_corrupt_and_resyncs():
    good = _rec(text="ok")
    # record with a lying Content-Length (truncated block)
    bad = good.replace(b"Content-Length: 2\r\n", b"Content-Length: 9999\r\n")
    buf = bad + good + b"GARBAGE-TRAILER"
    out = list(split_wet_records(buf))
    bads = [b for _, _, b in out if b is not None]
    goods = [(h, p) for h, p, b in out if b is None]
    # truncated first record -> corrupt; parser resyncs on the next
    # magic and still yields the good record; the trailer is corrupt too
    assert len(bads) == 2 and "truncated" in bads[0]
    assert len(goods) == 1 and goods[0][1] == b"ok"


def test_split_empty_payload_and_crlf_padding():
    buf = _rec(text="") + b"\r\n\r\n" + _rec(text="x")
    out = list(split_wet_records(buf))
    assert [bad for _, _, bad in out] == [None, None]
    assert out[0][1] == b"" and out[1][1] == b"x"


def test_read_wet_provenance_and_gzip_members(spark, tmp_path):
    d = tmp_path / "wet"
    d.mkdir()
    # file A: plain, two records; file B: multi-member gzip, one record
    (d / "seg-a.wet").write_bytes(_rec(text="a0") + _rec("http://x/2", text="a1"))
    (d / "seg-b.wet.gz").write_bytes(
        gzip.compress(_rec("http://y/1", text="b0"), mtime=0)
        + gzip.compress(_rec("http://y/2", text="b1"), mtime=0)
    )
    # a non-wet file must be ignored by the glob
    (d / "README.txt").write_text("not a wet file")
    got = {
        (r["file"], r["rec_pos"], r["target_uri"], r["text"])
        for r in read_wet(spark, str(d)).collect()
    }
    assert got == {
        ("seg-a.wet", 0, "http://x/1", "a0"),
        ("seg-a.wet", 1, "http://x/2", "a1"),
        ("seg-b.wet.gz", 0, "http://y/1", "b0"),
        ("seg-b.wet.gz", 1, "http://y/2", "b1"),
    }


def test_read_wet_corrupt_rows_carry_file_and_reason(spark, tmp_path):
    d = tmp_path / "wet"
    d.mkdir()
    (d / "bad.wet").write_bytes(b"NOT-WARC-AT-ALL")
    (d / "notgzip.wet.gz").write_bytes(b"plainly not gzip")
    rows = read_wet(spark, str(d)).collect()
    by_file = {r["file"]: r for r in rows}
    assert "magic" in by_file["bad.wet"]["_corrupt"]
    assert by_file["notgzip.wet.gz"]["_corrupt"].startswith("gzip:")
    assert all(r["text"] is None for r in rows)


def test_write_read_round_trip(spark, sf_dir):
    import tempfile
    import shutil

    from pyspark.sql import functions as F

    from ght2dm_spark.io import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        F.concat(F.lit("https://corpus.example/"), F.col("doc_id").cast("string")).alias("uri"),
        F.lit("2024-01-01T00:00:00Z").alias("date"),
        F.coalesce(F.col("text"), F.lit("")).alias("text"),
    )
    root = tempfile.mkdtemp(prefix="ght2dm-wet-")
    try:
        report = write_wet(docs, root, n_files=4).collect()
        assert sum(r["n_records"] for r in report) == docs.count()
        back = read_wet(spark, root)
        assert back.filter(F.col("_corrupt").isNotNull()).count() == 0
        conv = back.filter(F.col("warc_type") == "conversion")
        # every (uri, text) pair survives byte-for-byte, no dup/loss
        a = docs.select("uri", "text")
        b = conv.select(F.col("target_uri").alias("uri"), "text")
        assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()
        # warcinfo prologue present once per file
        assert (
            back.filter(F.col("warc_type") == "warcinfo").count()
            == len(report)
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_write_wet_handles_non_ascii_uri_and_text(spark, tmp_path):
    """Internationalized URIs and non-ASCII text must round-trip (UTF-8
    headers and payload), not crash the writer task."""
    df = spark.createDataFrame(
        [("https://例え.jp/ページ", "2024-01-01T00:00:00Z", "naïve café — 测试")],
        "uri string, date string, text string",
    )
    out = str(tmp_path / "wet")
    assert write_wet(df, out, n_files=1).collect()[0]["n_records"] == 1
    got = read_wet(spark, out).filter("warc_type = 'conversion'").collect()
    assert len(got) == 1
    assert got[0]["target_uri"] == "https://例え.jp/ページ"
    assert got[0]["text"] == "naïve café — 测试"
