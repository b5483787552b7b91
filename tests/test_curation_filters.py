"""Edge pins for the curation-filter queries (curation_filters.py) on
cases the driver corpus never exercises — NULL/empty/short documents,
within-doc-only gram repetition, zero vectors, exact saturation:

- a token-less document must surface with every Gopher rule FALSE (not
  vanish through the inner aggregations);
- within-doc 5-gram repetition must NOT count as cross-doc duplication
  (countDistinct doc_id >= 2, Lee-2022 semantics);
- an all-zero embedding has scale 0 → q all zero, rmse exactly 0.0;
- quantization saturates at exactly ±127, never -128 (the sign-aware
  floor can't round |x/scale| past 127.5).

Each case runs the REAL query + its REAL oracle over a crafted parquet
fixture — the same dual-engine compare as the driver, so an edge-case
divergence fails here instead of in a future CORRECTNESS round.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import duckdb
import pytest

from ght2dm_spark.queries import ORACLE, QUERIES
from tests.conftest import assert_oracle_match

PASSING = (
    "the quick brown fox jumps over a lazy dog while the keen red hen "
    "walks past a tall green barn to see the wide blue lake and rest"
)  # 27 words, all distinct but articles; passes every Gopher rule


@pytest.fixture(scope="module")
def edge_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("curation_edge")
    docs = {
        "doc_id": [1, 2, 3, 4, 5, 6, 7, 8],
        "text": [
            None,  # NULL text → no tokens
            "",  # empty → no tokens
            "a b c",  # 3 tokens → no 5-grams
            PASSING,  # shares every gram with doc 5
            PASSING,  # exact dup of doc 4, other source
            # within-doc repeated 5-gram, unique to this doc
            "p q r s t p q r s t",
            # one-word spam: fails the distinct-ratio rule
            "the " * 30 + "end",
            # numeric tokens: fails the alpha-word rule (Gopher verbatim)
            " ".join(str(i) for i in range(25)),
        ],
        "lang": ["en"] * 8,
        "source": ["s0", "s0", "s1", "s0", "s1", "s2", "s2", "s3"],
        "n_chars": [0, 0, 5, len(PASSING), len(PASSING), 19, 123, 65],
    }
    pq.write_table(pa.table(docs), d / "documents.parquet")
    embs = {
        "vec_id": [1, 2, 3, 4],
        "embedding": pa.array(
            [
                [0.0, 0.0, 0.0, 0.0],
                [1.0, -1.0, 0.5, 0.0],
                [-2.0, 1.0, 0.25, -0.25],
                [],  # zero-length vector: scale 0, rmse NULL — not a crash
            ],
            type=pa.list_(pa.float32()),
        ),
        "label": [0, 1, 2, 3],
    }
    pq.write_table(pa.table(embs), d / "embeddings.parquet")
    return str(d)


@pytest.fixture(scope="module")
def edge_duck(edge_dir):
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{edge_dir}/{t}.parquet'"
        )
    yield con
    con.close()


@pytest.mark.parametrize(
    "name",
    [
        "t1_gopher_rules",
        "t1_dup_ngram_coverage",
        "t1_source_dup_profile",
        "t1_cross_source_leakage",
        "t1_int8_quantize",
    ],
)
def test_edge_fixture_matches_oracle(name, spark, edge_dir, edge_duck):
    assert_oracle_match(
        QUERIES[name](spark, edge_dir), edge_duck, ORACLE[name], name=name
    )


def test_gopher_rules_edge_values(spark, edge_dir):
    got = {
        r.doc_id: r.asDict()
        for r in QUERIES["t1_gopher_rules"](spark, edge_dir).collect()
    }
    # token-less docs surface, all-FALSE
    for did in (1, 2):
        assert got[did] == {
            "doc_id": did,
            "r_word_count": False,
            "r_mean_word_len": False,
            "r_stopwords": False,
            "r_alpha_words": False,
            "r_distinct": False,
            "passes": False,
        }
    assert got[4]["passes"] and got[5]["passes"]
    spam = got[7]
    assert not spam["r_distinct"]  # 2 types over 31 tokens
    assert spam["r_alpha_words"] and spam["r_stopwords"]  # 'the' ×30
    assert not spam["passes"]
    nums = got[8]
    assert not nums["r_alpha_words"] and not nums["r_stopwords"]
    assert nums["r_word_count"] and nums["r_distinct"]
    assert not nums["passes"]


def test_dup_ngram_within_doc_repetition_not_dup(spark, edge_dir):
    got = {
        r.doc_id: (r.n_grams, r.n_dup)
        for r in QUERIES["t1_dup_ngram_coverage"](spark, edge_dir).collect()
    }
    assert got[1] == (0, 0) and got[2] == (0, 0) and got[3] == (0, 0)
    # docs 4 and 5 are identical → every gram position duplicated
    n = got[4][0]
    assert n > 0 and got[4] == (n, n) and got[5] == (n, n)
    # doc 6 repeats its own gram ('p q r s t' twice + bridging grams)
    # but shares nothing cross-doc → n_dup = 0
    assert got[6][0] == 6 and got[6][1] == 0


def test_int8_quantize_edge_values(spark, edge_dir):
    got = {
        r.vec_id: r.asDict()
        for r in QUERIES["t1_int8_quantize"](spark, edge_dir).collect()
    }
    zero = got[1]
    assert (zero["n_saturated"], zero["n_zero"], zero["q_sum"]) == (0, 4, 0)
    assert zero["rmse"] == 0.0
    # absmax 1.0 → q = [127, -127, 64, 0]; half-up: 63.5 → 64
    v2 = got[2]
    assert (v2["n_saturated"], v2["n_zero"], v2["q_sum"]) == (2, 1, 64)
    # negative absmax: q = [-127, 64, 16, -16]; saturation counts |q|=127
    v3 = got[3]
    assert (v3["n_saturated"], v3["q_sum"]) == (1, -63)
    # zero-LENGTH vector: size(qs) = 0 must not divide (ANSI mode would
    # crash the whole query — the round-5 review reproduction)
    empty = got[4]
    assert (empty["n_saturated"], empty["n_zero"], empty["q_sum"]) == (0, 0, 0)
    assert empty["rmse"] is None
    # quantized values never escape int8 range (no -128)
    for v in got.values():
        assert abs(v["q_sum"]) <= 127 * 64


def test_int8_quantize_matches_numpy_replay(spark):
    """Third-implementation cross-check on real fixture data: replay the
    absmax-int8 quantization in numpy float64 (same op order: widen →
    scale → sign-aware half-away floor → residual picounits) and demand
    bit-exact agreement with the Spark result — catching a shared
    Spark/DuckDB SQL misreading that the dual-engine oracle cannot."""
    import math

    import numpy as np

    sf_dir = "/root/testdata/sf0.001"
    got = {
        r.vec_id: r
        for r in QUERIES["t1_int8_quantize"](spark, sf_dir).collect()
    }
    import pyarrow.parquet as pq_mod

    tbl = pq_mod.read_table(f"{sf_dir}/embeddings.parquet").to_pylist()
    assert len(tbl) == len(got)
    for row in tbl:
        x = np.array(row["embedding"], dtype=np.float64)
        amax = np.abs(x).max()
        scale = amax / 127.0
        if scale == 0.0:
            q = np.zeros_like(x, dtype=np.int64)
            r2m = np.zeros_like(x, dtype=np.int64)
        else:
            t = x / scale
            q = np.where(
                t >= 0, np.floor(t + 0.5), -np.floor(-t + 0.5)
            ).astype(np.int64)
            r = x - q * scale
            r2m = np.floor(r * r * 1e12 + 0.5).astype(np.int64)
        rmse = math.sqrt(float(int(r2m.sum())) / 1e12 / len(x))
        g = got[row["vec_id"]]
        assert g.n_saturated == int((np.abs(q) == 127).sum())
        assert g.n_zero == int((q == 0).sum())
        assert g.q_sum == int(q.sum())
        assert g.rmse == rmse, (row["vec_id"], g.rmse, rmse)


# --- property tests: full Python model vs the real query over random
# corpora (the test_properties.py discipline applied to the round-5
# filters).  Small word alphabet forces gram collisions and rule flips.

import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ght2dm_spark.functions.text import STOPWORDS

_slow = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_WORDS = ["the", "a", "of", "table", "rowscan", "q", "42", "7", "zz", "xx"]

corpus_strategy = st.lists(
    st.lists(st.sampled_from(_WORDS), min_size=0, max_size=40),
    min_size=1,
    max_size=12,
)


def _write_docs(doc_words):
    d = tempfile.mkdtemp(prefix="curation_prop_")
    docs = {
        "doc_id": list(range(1, len(doc_words) + 1)),
        "text": [" ".join(ws) for ws in doc_words],
        "lang": ["en"] * len(doc_words),
        "source": [f"s{i % 3}" for i in range(len(doc_words))],
        "n_chars": [len(" ".join(ws)) for ws in doc_words],
    }
    pq.write_table(pa.table(docs), f"{d}/documents.parquet")
    return d


@given(doc_words=corpus_strategy)
@_slow
def test_gopher_rules_match_python_model(spark, doc_words):
    d = _write_docs(doc_words)
    got = {
        r.doc_id: r.asDict()
        for r in QUERIES["t1_gopher_rules"](spark, d).collect()
    }
    assert len(got) == len(doc_words)
    for i, ws in enumerate(doc_words, start=1):
        nw = len(ws)
        sumlen = sum(len(w) for w in ws)
        nstop = sum(w in STOPWORDS for w in ws)
        ndist = len(set(ws))
        nalpha = sum(any("a" <= c <= "z" for c in w) for w in ws)
        expect = {
            "r_word_count": 20 <= nw <= 1000,
            "r_mean_word_len": nw > 0 and 3 * nw <= sumlen <= 10 * nw,
            "r_stopwords": nstop >= 2,
            "r_alpha_words": nw > 0 and 5 * nalpha >= 4 * nw,
            "r_distinct": nw > 0 and 10 * ndist >= 3 * nw,
        }
        expect["passes"] = all(expect.values())
        row = got[i]
        for k, v in expect.items():
            assert row[k] == v, (i, k, ws, row, expect)


@given(doc_words=corpus_strategy)
@_slow
def test_dup_ngram_coverage_matches_python_model(spark, doc_words):
    d = _write_docs(doc_words)
    got = {
        r.doc_id: (r.n_grams, r.n_dup)
        for r in QUERIES["t1_dup_ngram_coverage"](spark, d).collect()
    }
    docs_per_gram: dict[tuple, set] = {}
    per_doc_grams = []
    for i, ws in enumerate(doc_words, start=1):
        grams = [tuple(ws[j : j + 5]) for j in range(max(len(ws) - 4, 0))]
        per_doc_grams.append(grams)
        for g in grams:
            docs_per_gram.setdefault(g, set()).add(i)
    for i, grams in enumerate(per_doc_grams, start=1):
        n_dup = sum(1 for g in grams if len(docs_per_gram[g]) >= 2)
        assert got[i] == (len(grams), n_dup), (i, doc_words[i - 1])
