"""JSONL / CSV source: reject routing, gzip transparency, and the
shared split_rejects contract with the BSON source."""

from __future__ import annotations

import gzip

import pytest
from pyspark.sql import types as T

from ght2dm_spark.sources.bson import split_rejects
from ght2dm_spark.sources.jsonl import read_csv, read_jsonl

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)

LINES = [
    '{"doc_id": 1, "text": "hello world", "lang": "en"}',
    '{"doc_id": 2, "text": "bonjour", "lang": "fr"}',
    '{"doc_id": 3, "text": "missing lang"}',  # missing field -> NULL, not reject
    '{"doc_id": broken!!',  # malformed -> reject
    '{"doc_id": 5, "text": "ok", "lang": "de"}',
]


@pytest.fixture()
def jsonl_dir(tmp_path):
    p = tmp_path / "dump.jsonl"
    p.write_text("\n".join(LINES) + "\n")
    return str(p)


def test_jsonl_rejects_routed_not_fatal(spark, jsonl_dir):
    good, rejects = split_rejects(read_jsonl(spark, jsonl_dir, SCHEMA))
    g = {r.doc_id: r for r in good.collect()}
    assert set(g) == {1, 2, 3, 5}
    assert g[3].lang is None  # missing tag -> zero-value, P1 policy
    rej = rejects.collect()
    assert len(rej) == 1 and "broken" in rej[0]._corrupt
    # typed schema, no inference pass
    assert [f.name for f in good.schema.fields] == ["doc_id", "text", "lang"]


def test_jsonl_gzip_transparent(spark, tmp_path):
    p = tmp_path / "dump.jsonl.gz"
    with gzip.open(p, "wt") as fh:
        fh.write("\n".join(LINES) + "\n")
    good, rejects = split_rejects(read_jsonl(spark, str(p), SCHEMA))
    # full-row collects: a corrupt-column-only query (rejects.count())
    # is disallowed straight off the reader — module docstring
    assert len(good.collect()) == 4 and len(rejects.collect()) == 1


def test_csv_rejects_routed(spark, tmp_path):
    p = tmp_path / "export.csv"
    p.write_text(
        "doc_id,text,lang\n"
        "1,hello,en\n"
        "not_a_number,broken,xx\n"  # uncastable doc_id -> reject
        "3,ok,de\n"
    )
    good, rejects = split_rejects(read_csv(spark, str(p), SCHEMA))
    assert {r.doc_id for r in good.collect()} == {1, 3}
    rej = rejects.collect()
    assert len(rej) == 1 and rej[0]._corrupt.startswith("not_a_number")


def test_xml_rejects_routed(spark, tmp_path):
    from ght2dm_spark.sources.jsonl import read_xml

    p = tmp_path / "dump.xml"
    p.write_text(
        "<rows>"
        "<row><doc_id>1</doc_id><text>hello</text><lang>en</lang></row>"
        "<row><doc_id>2</doc_id><text>bonjour</text><lang>fr</lang></row>"
        "<row><doc_id>3</doc_id><text>missing lang</text></row>"
        "<row><doc_id>not-a-number</doc_id><text>bad</text><lang>xx</lang></row>"
        "</rows>"
    )
    good, rejects = split_rejects(read_xml(spark, str(p), SCHEMA))
    g = {r.doc_id: r for r in good.collect()}
    assert set(g) == {1, 2, 3}
    assert g[3].lang is None  # missing element -> NULL, P1 policy
    rej = rejects.collect()
    assert len(rej) == 1 and "not-a-number" in rej[0]._corrupt
    assert [f.name for f in good.schema.fields] == ["doc_id", "text", "lang"]
