"""Python DataSource API form of the BSON dump source: register
``format("ght2dm_bson")``, read the same fixture directory as
test_bson_source, and expect identical semantics — per-file partitions,
date-regex file filter (S2), provenance columns (S3), nested flatten,
corrupt-frame rejects (E1).
"""

from __future__ import annotations

import pytest

from tests.test_bson_source import dump_dir  # noqa: F401  (fixture reuse)

SCHEMA = (
    "id bigint, login string, type string, hireable boolean, "
    "owner_login string, file_date date, file_pos bigint, _corrupt string"
)


@pytest.fixture(scope="module")
def registered(spark):
    from ght2dm_spark.sources.bson_datasource import BsonDataSource

    spark.dataSource.register(BsonDataSource)
    return spark


def _read(spark, path):
    return (
        spark.read.format("ght2dm_bson")
        .schema(SCHEMA)
        .option("flatten", "owner_login=owner.login")
        .load(path)
    )


def test_datasource_matches_mapinpandas_semantics(registered, dump_dir):  # noqa: F811
    df = _read(registered, dump_dir)
    rows = {
        (r["id"], str(r["file_date"])): r
        for r in df.filter("_corrupt IS NULL").collect()
    }
    assert rows[(1, "2014-01-02")]["file_pos"] == 0
    assert rows[(2, "2014-01-02")]["file_pos"] == 1
    assert rows[(1, "2014-01-01")]["login"] == "old_alice"
    assert rows[(1, "2014-01-02")]["owner_login"] == "nested_owner"
    assert rows[(2, "2014-01-02")]["hireable"] is None
    # misnamed notes.bson skipped entirely
    assert not any(r["id"] == 99 for r in rows.values())
    # corrupt tail → one reject row, good doc in the same file survives
    rejects = df.filter("_corrupt IS NOT NULL").collect()
    assert len(rejects) == 1 and rejects[0]["file_pos"] == -1
    assert rows[(3, "2014-01-03")]["login"] == "carol"


def test_datasource_partitioning_is_per_file(registered, dump_dir):  # noqa: F811
    # 3 dated files → 3 input partitions (the reference's per-file unit
    # of work, S8); undated files contribute none.
    df = _read(registered, dump_dir)
    assert df.rdd.getNumPartitions() == 3


def test_datasource_default_schema_is_provenance_only(registered, dump_dir):  # noqa: F811
    df = registered.read.format("ght2dm_bson").load(dump_dir)
    assert df.columns == ["file_date", "file_pos", "_corrupt"]
    assert df.count() == 5  # 2 + 1 + (1 good + 1 reject)


def test_bson_writer_roundtrip(spark, tmp_path):
    """The write side of the data source: a DataFrame saved as
    ght2dm_bson frames one dump file per partition; reading the
    directory back through the same source recovers every row (string /
    int64 / bool), with provenance synthesized from the written
    file date and no rejects."""
    from ght2dm_spark.sources.bson_datasource import BsonDataSource

    spark.dataSource.register(BsonDataSource)
    df = spark.createDataFrame(
        [(i, f"user{i}", i % 2 == 0) for i in range(100)],
        "id bigint, login string, active boolean",
    ).repartition(3)
    out = str(tmp_path / "dumps")
    (
        df.write.format("ght2dm_bson")
        .option("file_date", "2020-05-17")
        .option("prefix", "users")
        .mode("overwrite")
        .save(out)
    )
    import os

    files = [f for f in os.listdir(out) if f.endswith(".bson")]
    assert 1 <= len(files) <= 3 and all("2020-05-17" in f for f in files)

    back = (
        spark.read.format("ght2dm_bson")
        .schema(
            "id bigint, login string, active boolean, "
            "file_date date, file_pos bigint, _corrupt string"
        )
        .load(out)
    )
    rows = back.collect()
    assert len(rows) == 100
    assert all(r._corrupt is None for r in rows)
    assert {(r.id, r.login, r.active) for r in rows} == {
        (i, f"user{i}", i % 2 == 0) for i in range(100)
    }
    assert all(str(r.file_date) == "2020-05-17" for r in rows)

    # mode("overwrite") replaces: write fewer rows, read count drops
    (
        df.limit(10).coalesce(1)
        .write.format("ght2dm_bson")
        .option("file_date", "2020-05-18")
        .mode("overwrite")
        .save(out)
    )
    n2 = (
        spark.read.format("ght2dm_bson")
        .schema("id bigint, file_date date, file_pos bigint, _corrupt string")
        .load(out)
        .count()
    )
    assert n2 == 10


def test_bson_writer_commit_hygiene_and_option_validation(spark, tmp_path):
    """Writer durability contract: tasks stage *.bson.inprogress and
    commit renames them, so a completed write leaves no temp files and a
    pre-staged orphan temp is never visible to the reader.  Option
    validation fails fast: malformed file_date (the reader's date filter
    would silently skip the file), date-like prefix (would shadow
    file_date on read-back), malformed flatten spec."""
    import os

    import pytest

    from ght2dm_spark.sources.bson_datasource import BsonDataSource

    spark.dataSource.register(BsonDataSource)
    df = spark.createDataFrame([(1, "a")], "id bigint, login string")
    out = str(tmp_path / "dumps")

    # a leaked temp from a hypothetical dead task: invisible to reads
    os.makedirs(out)
    orphan = os.path.join(out, "users-2020-05-17-part99999-dead.bson.inprogress")
    with open(orphan, "wb") as fh:
        fh.write(b"\x01")  # truncated frame — would be _corrupt if read

    df.write.format("ght2dm_bson").option("file_date", "2020-05-17").option(
        "prefix", "users"
    ).mode("append").save(out)
    names = sorted(os.listdir(out))
    assert [n for n in names if n.endswith(".bson")] != []
    # the job's own temps are gone; only the planted orphan remains
    assert [n for n in names if n.endswith(".inprogress")] == [
        os.path.basename(orphan)
    ]
    n = (
        spark.read.format("ght2dm_bson")
        .schema("id bigint, file_date date, file_pos bigint, _corrupt string")
        .load(out)
        .count()
    )
    assert n == 1  # orphan temp not read

    with pytest.raises(Exception, match="YYYY-MM-DD"):
        df.write.format("ght2dm_bson").option("file_date", "20200517").mode(
            "append"
        ).save(str(tmp_path / "bad1"))
    with pytest.raises(Exception, match="date-like"):
        df.write.format("ght2dm_bson").option(
            "prefix", "backup-2020-01-01"
        ).option("file_date", "2020-05-17").mode("append").save(
            str(tmp_path / "bad2")
        )
    with pytest.raises(Exception, match="flatten spec"):
        (
            spark.read.format("ght2dm_bson")
            .schema("x string, file_date date, file_pos bigint, _corrupt string")
            .option("flatten", "x=owner")
            .load(out)
            .count()
        )


def test_bson_reader_empty_and_hostile_directories(spark, tmp_path):
    """An empty (or undated-only, or bogus-dated) directory must read as
    ZERO rows — a fresh pipeline run before any dumps arrive is routine,
    and a foreign '9999-99-99' file from another tool must be skipped
    like any undated file, not crash the whole load."""
    from ght2dm_spark.sources.bson_datasource import BsonDataSource

    spark.dataSource.register(BsonDataSource)
    sch = "id bigint, file_date date, file_pos bigint, _corrupt string"

    empty = tmp_path / "empty"
    empty.mkdir()
    assert (
        spark.read.format("ght2dm_bson").schema(sch).load(str(empty)).count()
        == 0
    )

    hostile = tmp_path / "hostile"
    hostile.mkdir()
    (hostile / "notes.bson").write_bytes(b"\x01")  # undated
    (hostile / "backup-9999-99-99.bson").write_bytes(b"\x01")  # not a date
    assert (
        spark.read.format("ght2dm_bson").schema(sch).load(str(hostile)).count()
        == 0
    )


def test_bson_overwrite_scopes_to_dataset_and_purges_temps(spark, tmp_path):
    """Overwrite must delete only what the reader considers the dataset
    (dated .bson): an undated file another tool parked in the directory
    survives, while stale .inprogress temps from dead tasks are purged."""
    import os

    from ght2dm_spark.sources.bson_datasource import BsonDataSource

    spark.dataSource.register(BsonDataSource)
    out = tmp_path / "dumps"
    out.mkdir()
    (out / "notes.bson").write_bytes(b"\x01")  # NOT part of the dataset
    stale = out / "users-2020-01-01-part00000-dead.bson.inprogress"
    stale.write_bytes(b"\x01")  # dead task's temp from an earlier job

    df = spark.createDataFrame([(1, "a")], "id bigint, login string")
    df.write.format("ght2dm_bson").option("file_date", "2020-05-17").option(
        "prefix", "users"
    ).mode("append").save(str(out))
    df.write.format("ght2dm_bson").option("file_date", "2020-05-18").option(
        "prefix", "users"
    ).mode("overwrite").save(str(out))

    names = sorted(os.listdir(out))
    assert "notes.bson" in names, "undated bystander must survive overwrite"
    assert not any(n.endswith(".inprogress") for n in names), (
        "stale temps purge on overwrite"
    )
    dated = [n for n in names if n.endswith(".bson") and "2020-05-1" in n]
    assert all("2020-05-18" in n for n in dated), "old dataset replaced"


def test_bson_append_leaves_no_temps_and_purges_only_stale_ones(
    spark, tmp_path
):
    """Append-mode commit hygiene: a zero-row partition's temp never
    survives the job, old crash orphans (past the staleness cutoff) are
    purged, and a FRESH temp — possibly a concurrent job's live task —
    is left alone."""
    import os

    from ght2dm_spark.sources import bson_datasource as mod

    spark.dataSource.register(mod.BsonDataSource)
    out = tmp_path / "dumps"
    out.mkdir()
    old = out / "users-2020-01-01-part00000-dead.bson.inprogress"
    old.write_bytes(b"\x01")
    os.utime(old, (1, 1))  # far past the staleness cutoff
    fresh = out / "users-2020-01-02-part00001-live.bson.inprogress"
    fresh.write_bytes(b"\x01")  # mtime = now: could be a live writer

    # 8 rows / 32 partitions → most tasks see zero rows
    df = spark.createDataFrame(
        [(i, f"u{i}") for i in range(8)], "id bigint, login string"
    ).repartition(32)
    df.write.format("ght2dm_bson").option("file_date", "2020-05-17").option(
        "prefix", "users"
    ).mode("append").save(str(out))

    names = sorted(os.listdir(out))
    temps = [n for n in names if n.endswith(".inprogress")]
    assert temps == [fresh.name], (
        "append commit must remove its own zero-row temps and stale "
        f"orphans but keep fresh ones, left: {temps}"
    )
    assert (
        spark.read.format("ght2dm_bson")
        .schema("id bigint, login string, file_date date")
        .load(str(out))
        .count()
        == 8
    )


def test_bson_writer_rejects_uncomposable_names(spark, tmp_path):
    """file_date must be a REAL calendar date (2020-99-99 wrote fine,
    then bricked every read), and a prefix that composes with the date
    into a different first date-like token must be rejected (it would
    silently mis-stamp file_date on read-back)."""
    import pytest

    from ght2dm_spark.sources.bson_datasource import BsonDataSource

    spark.dataSource.register(BsonDataSource)
    df = spark.createDataFrame([(1, "a")], "id bigint, login string")
    with pytest.raises(Exception, match="calendar"):
        df.write.format("ght2dm_bson").option("file_date", "2020-99-99").mode(
            "append"
        ).save(str(tmp_path / "bad_cal"))
    with pytest.raises(Exception, match="first"):
        df.write.format("ght2dm_bson").option("prefix", "logs-2024-07").option(
            "file_date", "2020-05-17"
        ).mode("append").save(str(tmp_path / "bad_prefix"))
