"""BSON source at scale-up fixture size: a multi-file dump run (5 dated
files × 4000 docs, ~1.5 MB/file) through read_bson_dumps →
newest-wins dedup, verifying frame splitting, decode fidelity, and
provenance ordering hold beyond the toy fixtures — the same code path a
multi-GB nightly dump directory exercises, where each file is one
binaryFile split and decode parallelism is per-file.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from ght2dm_spark.operators.dedup import dedup_newest
from ght2dm_spark.sources.bson import read_bson_dumps, split_rejects
from tests.test_bson_source import enc_doc

N_FILES = 5
DOCS_PER_FILE = 4000

_schema = StructType(
    [
        StructField("id", LongType()),
        StructField("login", StringType()),
        StructField("type", StringType()),
        StructField("followers", LongType()),
    ]
)


@pytest.fixture(scope="module")
def big_dump_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("bigdumps")
    # Same 4000 ids re-dumped on 5 consecutive days; followers encodes
    # the dump day so newest-wins is value-checkable, not just countable.
    for day in range(1, N_FILES + 1):
        docs = (
            enc_doc(
                {
                    "id": i,
                    "login": f"user_{i}_d{day}",
                    "type": "User",
                    "followers": day * 1000 + (i % 7),
                }
            )
            for i in range(DOCS_PER_FILE)
        )
        (d / f"2014-02-{day:02d}.bson").write_bytes(b"".join(docs))
    return str(d)


def test_bson_scaleup_decode_and_newest_wins(spark, big_dump_dir):
    good, rejects = split_rejects(read_bson_dumps(spark, big_dump_dir, _schema))
    assert rejects.count() == 0
    assert good.count() == N_FILES * DOCS_PER_FILE

    # per-file decode fidelity: every (file, position) decoded in order
    per_file = (
        good.groupBy("file_date")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("file_pos").alias("lo"),
            F.max("file_pos").alias("hi"),
        )
        .collect()
    )
    assert len(per_file) == N_FILES
    for r in per_file:
        assert (r["n"], r["lo"], r["hi"]) == (DOCS_PER_FILE, 0, DOCS_PER_FILE - 1)

    newest = dedup_newest(
        good, ["id"], [F.desc("file_date"), F.asc("file_pos")]
    )
    assert newest.count() == DOCS_PER_FILE
    # every survivor comes from the last dump day
    assert (
        newest.filter(
            (F.col("followers") < N_FILES * 1000)
            | ~F.col("login").endswith(f"_d{N_FILES}")
        ).count()
        == 0
    )
