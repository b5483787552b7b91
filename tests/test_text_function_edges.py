"""Edge pins for the text scalar builders — cases the corpus oracles
never exercise because the driver fixtures contain no short or NULL
documents, found (and one confirmed live) in review:

- Spark's ``sequence(1, 0)`` is the DESCENDING array [1, 0], not empty
  like DuckDB's end-exclusive ``range`` — so the rolling fingerprint
  needed an explicit short-doc guard or sub-gram docs would fingerprint
  their whole text and hash-mismatch the oracle;
- a NULL document made every lang-id WHEN condition NULL and fell
  through to the LAST branch ('fr').
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ght2dm_spark.functions.text import lang_id, rolling_min_fingerprint


def test_rolling_fingerprint_null_for_short_docs(spark):
    df = spark.createDataFrame(
        [("ab",), ("",), (None,), ("abcdefgh",), ("abcdefghi",)],
        "text string",
    ).select(
        "text", rolling_min_fingerprint("text", gram=8).alias("fp")
    )
    got = {r.text: r.fp for r in df.collect()}
    assert got["ab"] is None and got[""] is None and got[None] is None
    assert got["abcdefgh"] is not None
    # 9 chars → min over the two 8-gram windows, never the whole text
    import hashlib

    w1 = hashlib.md5(b"abcdefgh").hexdigest()
    w2 = hashlib.md5(b"bcdefghi").hexdigest()
    assert got["abcdefghi"] == min(w1, w2)


def test_lang_id_null_text_is_und(spark):
    df = spark.createDataFrame(
        [(None,), ("",), ("the and of to",), ("der die das und",)],
        "text string",
    ).select("text", lang_id("text").alias("lang"))
    got = {r.text: r.lang for r in df.collect()}
    assert got[None] == "und" and got[""] == "und"
    assert got["the and of to"] == "en"
    assert got["der die das und"] == "de"


def test_explode_ws_tokens_matches_ws_tokens(spark):
    """explode_ws_tokens (explode(split) + post-explode predicate — the
    codegen-friendly rewrite) must yield exactly the rows that exploding
    ws_tokens (filter(split)) would: same tokens, same multiplicity,
    NULL/empty/whitespace-only/multi-separator texts included."""
    from ght2dm_spark.functions.text import explode_ws_tokens, ws_tokens

    rows = [
        (1, "a b  c"),
        (2, "  leading and trailing  "),
        (3, ""),
        (4, None),
        (5, " \t\n "),
        (6, "ONE token"),
        (7, "x"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    fast = explode_ws_tokens(df, "text", "tok", keep=("id",))
    slow = df.select(
        "id", F.explode(ws_tokens(F.lower("text"))).alias("tok")
    )
    assert sorted(map(tuple, fast.collect())) == sorted(
        map(tuple, slow.collect())
    )

def test_punct_ratio_translate_equals_regex_class(spark):
    """punct_ratio deletes the enumerated set _KEEP_CHARS via translate;
    this pins its strict equivalence to the original regexp_replace
    '[a-z0-9\\s]' form (Java \\s = space \\t \\n \\x0B \\f \\r) on inputs
    beyond the ASCII corpus: unicode whitespace (NBSP is NOT \\s),
    accented letters, uppercase (lowered first), digits, every Java \\s
    member, and empty/NULL."""
    from pyspark.sql import functions as F

    from ght2dm_spark.functions.text import punct_ratio

    rows = [
        (1, "abc! def?"),
        (2, "AÀb c"),  # À stays (not [a-z] after lower? 'à' is not a-z), NBSP not \s
        (3, "x\ty\nz\x0b\f\r"),
        (4, "0123456789"),
        (5, ""),
        (6, None),
        (7, "...---..."),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = df.select(
        "id",
        punct_ratio("text").alias("fast"),
        F.when(
            F.length("text") > 0,
            F.length(
                F.regexp_replace(F.lower("text"), r"[a-z0-9\s]", "")
            ).cast("double")
            / F.length("text"),
        ).alias("ref"),
    ).collect()
    for r in got:
        assert r.fast == r.ref, (r.id, r.fast, r.ref)


def test_repetition_ratio_null_text_zero_bigrams(spark, tmp_path):
    """NULL text has ZERO bigrams, not NULL — the mapInPandas rewrite
    regressed this (review reproduction: spark (1, None, None) vs oracle
    (1, 0, None)); run the real query + oracle over a NULL-bearing
    fixture so the contract can't silently drift again."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ght2dm_spark.queries import ORACLE, QUERIES
    from tests.conftest import assert_oracle_match

    d = str(tmp_path)
    pq.write_table(
        pa.table(
            {
                "doc_id": [1, 2, 3],
                "text": [None, "", "a b a b"],
                "lang": ["en"] * 3,
                "source": ["s0"] * 3,
                "n_chars": [0, 0, 7],
            }
        ),
        f"{d}/documents.parquet",
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'")
    df = QUERIES["t1_repetition_ratio"](spark, d)
    assert_oracle_match(df, con, ORACLE["t1_repetition_ratio"], name="rep_null")
    got = {r.doc_id: (r.n_bigrams, r.rep_ratio) for r in df.collect()}
    assert got[1] == (0, None) and got[2] == (0, None)
    con.close()
