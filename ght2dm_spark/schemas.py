"""Schema registry — every schema is declared, never inferred (SURVEY §1.3:
the reference's input schemas are struct tags, ght2dm.go:38-102; output
schemas are field lists ght2dm.go:105-160 + db/create_tmp_tables.sql:10-33).

Explicit schemas also skip Spark's footer-inference job per read — at
100 TB that's the difference between a metadata-only open and a cluster
round-trip per table; locally it was dominating small-query latency.
"""

from __future__ import annotations

from pyspark.sql import types as T


def _s(*fields: tuple) -> T.StructType:
    return T.StructType([T.StructField(n, t, True) for n, t in fields])


LONG = T.LongType()
INT = T.IntegerType()
STR = T.StringType()
DBL = T.DoubleType()
BOOL = T.BooleanType()
TS = T.TimestampNTZType()
DATE = T.DateType()

# ---------------------------------------------------------------------------
# Driver testdata tables (FIXTURES.md §B).  Timestamps in the testdata
# parquet are isAdjustedToUTC=false → TIMESTAMP_NTZ; events.ts has shipped
# both as TIMESTAMP(NANOS) and TIMESTAMP(MICROS) across driver rounds —
# io.load_table sniffs the footer and adapts (long+convert vs native read),
# so the LongType here is just the NANOS-era default.
# ---------------------------------------------------------------------------

TESTDATA: dict[str, T.StructType] = {
    "region": _s(("r_regionkey", INT), ("r_name", STR)),
    "nation": _s(("n_nationkey", INT), ("n_name", STR), ("n_regionkey", INT)),
    "customer": _s(
        ("c_custkey", LONG),
        ("c_name", STR),
        ("c_nationkey", INT),
        ("c_acctbal", DBL),
        ("c_mktsegment", STR),
    ),
    "supplier": _s(
        ("s_suppkey", LONG), ("s_name", STR), ("s_nationkey", INT), ("s_acctbal", DBL)
    ),
    "part": _s(
        ("p_partkey", LONG),
        ("p_name", STR),
        ("p_brand", STR),
        ("p_type", STR),
        ("p_size", INT),
        ("p_retailprice", DBL),
    ),
    "orders": _s(
        ("o_orderkey", LONG),
        ("o_custkey", LONG),
        ("o_orderstatus", STR),
        ("o_totalprice", DBL),
        ("o_orderdate", TS),
        ("o_orderpriority", STR),
    ),
    "lineitem": _s(
        ("l_orderkey", LONG),
        ("l_partkey", LONG),
        ("l_suppkey", LONG),
        ("l_linenumber", INT),
        ("l_quantity", DBL),
        ("l_extendedprice", DBL),
        ("l_discount", DBL),
        ("l_tax", DBL),
        ("l_returnflag", STR),
        ("l_linestatus", STR),
        ("l_shipdate", TS),
    ),
    "events": _s(
        ("event_id", LONG),
        ("ts", LONG),  # TIMESTAMP(NANOS) read as long; io converts to micros
        ("user_id", LONG),
        ("event_type", STR),
        ("value", DBL),
        ("props", STR),
    ),
    "documents": _s(
        ("doc_id", LONG),
        ("text", STR),
        ("lang", STR),
        ("source", STR),
        ("n_chars", LONG),
    ),
    "embeddings": _s(
        ("vec_id", LONG),
        ("embedding", T.ArrayType(T.FloatType(), True)),
        ("label", INT),
    ),
}

# ---------------------------------------------------------------------------
# GHTorrent input entities (FIXTURES.md §A; struct tags ght2dm.go:38-102).
# BSON-missing fields arrive as NULL; per-column zero-value policy applied
# by the pipelines.  file_date/file_pos are scan provenance (S2/S3).
# ---------------------------------------------------------------------------

GH_USERS_RAW = _s(
    ("id", LONG),
    ("login", STR),
    ("avatar_url", STR),
    ("html_url", STR),
    ("type", STR),
    ("name", STR),
    ("company", STR),
    ("bio", STR),
    ("location", STR),
    ("email", STR),
    ("hireable", BOOL),
    ("followers", LONG),
    ("following", LONG),
    ("created_at", STR),
    ("updated_at", STR),
    ("file_date", DATE),
    ("file_pos", LONG),
)

GH_ORG_MEMBERS_RAW = _s(
    ("id", LONG),
    ("login", STR),
    ("org", STR),
    ("type", STR),
    ("file_date", DATE),
    ("file_pos", LONG),
)

GH_REPOS_RAW = _s(
    ("id", LONG),
    ("name", STR),
    ("full_name", STR),
    ("description", STR),
    ("homepage", STR),
    ("language", STR),
    ("default_branch", STR),
    ("master_branch", STR),
    ("html_url", STR),
    ("clone_url", STR),
    ("fork", BOOL),
    ("forks_count", LONG),
    ("open_issues_count", LONG),
    ("stargazers_count", LONG),
    ("subscribers_count", LONG),
    ("watchers_count", LONG),
    ("size_in_kb", LONG),
    ("created_at", STR),
    ("updated_at", STR),
    ("pushed_at", STR),
    ("owner_login", STR),
    ("file_date", DATE),
    ("file_pos", LONG),
)

GH_REPO_COLLABORATORS_RAW = _s(
    ("id", LONG),
    ("login", STR),
    ("repo", STR),
    ("owner", STR),
    ("file_date", DATE),
    ("file_pos", LONG),
)
