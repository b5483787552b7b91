"""Near-duplicate detection operators (SURVEY §2.9 / north_star "dedup"):
shingling, MinHash signatures, LSH banding, SimHash, and exact n-gram
Jaccard — the standard LLM-corpus dedup toolbox, expressed as DataFrame
compositions.

Engine-neutral hashing: every hash is md5-derived (lexicographic MIN over
hex strings for MinHash; hex-nibble bits for SimHash), NOT Spark's
``hash()``/``xxhash64`` — so the DuckDB oracle reproduces results exactly.
md5 costs more per byte than murmur, but the cost is per-shingle map work
(scales linearly, no shuffle), and cross-engine verifiability is the
contract here.  Swapping in xxhash64 is a one-line change per hash site
once an oracle is no longer required.

Scale shape (100 TB):

- signature building is explode → groupBy(doc): one shuffle keyed by
  doc_id, perfectly parallel, no skew (doc_ids unique);
- LSH banding shuffles once on band_key; band buckets are the classic
  skew risk (a degenerate band key collecting millions of docs), so
  ``lsh_candidate_pairs`` caps bucket size via a window count — dropped
  buckets are reported, not silently lost (AQE skew-split handles the
  moderate cases);
- candidate verification joins signatures back by doc_id (broadcast-able
  when the candidate set is small; sort-merge otherwise).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def ws_shingles(text: Column, n: int = 3) -> Column:
    """Word n-gram shingles of lowercased whitespace tokens; docs shorter
    than ``n`` tokens contribute their whole text as one shingle (so every
    doc has ≥1 shingle and exact-duplicate short docs still collide)."""
    toks = F.filter(F.split(F.lower(text), r"\s+"), lambda t: t != "")
    sz = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(1), sz - (n - 1)),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + j) for j in range(n)]
        ),
    )
    return F.when(sz >= n, grams).otherwise(F.array(F.lower(text)))


TOKS_SQL = "list_filter(regexp_split_to_array(lower({text}), '\\s+'), t -> t <> '')"


def shingle_sql(toks: str, ltext: str, n: int = 3) -> str:
    """DuckDB expression mirroring :func:`ws_shingles`, over a token-list
    column ``toks`` and lowercased-text column ``ltext`` bound in an
    enclosing CTE (see TOKS_SQL)."""
    parts = " || ' ' || ".join(f"{toks}[i+{j}]" for j in range(n))
    return (
        f"CASE WHEN len({toks}) >= {n} THEN "
        f"list_transform(range(1, len({toks}) - {n - 2}), i -> {parts}) "
        f"ELSE [{ltext}] END"
    )


def minhash_signature(
    df: DataFrame, id_col: str, text_col: str, k: int = 16, shingle_n: int = 3
) -> DataFrame:
    """Per-doc MinHash signature: ``sig[i] = min over shingles of
    md5(i || '|' || shingle)`` for i in 0..k-1.

    One explode + one groupBy(id) — the k hash functions are k aggregate
    expressions over the same exploded shingles, not k passes.  Returns
    (id_col, sig array<string> of length k).
    """
    sh = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(ws_shingles(F.col(text_col), shingle_n))).alias(
            "__shingle"
        ),
    )
    mins = [
        F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col("__shingle")))).alias(f"__h{i}")
        for i in range(k)
    ]
    return (
        sh.groupBy(id_col)
        .agg(*mins)
        .select(F.col(id_col), F.array(*[f"__h{i}" for i in range(k)]).alias("sig"))
    )


def lsh_bands(sig_df: DataFrame, id_col: str, bands: int, rows: int) -> DataFrame:
    """Explode a signature into ``bands`` band keys (md5 of ``rows``
    consecutive signature components).  Docs sharing any band key are
    candidate pairs."""
    band_cols = []
    for b in range(bands):
        parts = [F.element_at("sig", b * rows + r + 1) for r in range(rows)]
        band_cols.append(
            F.struct(
                F.lit(b).alias("band"), F.md5(F.concat_ws("|", *parts)).alias("key")
            )
        )
    return sig_df.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("bk")
    ).select(id_col, F.col("bk.band").alias("band"), F.col("bk.key").alias("band_key"))


def lsh_candidate_pairs(
    bands_df: DataFrame, id_col: str, max_bucket: int = 10_000
) -> DataFrame:
    """Distinct candidate pairs (id_a < id_b) sharing ≥1 band bucket.

    Buckets larger than ``max_bucket`` are dropped (degenerate-key guard:
    at 100 TB a single pathological bucket would otherwise produce a
    quadratic pair explosion in one task); production callers inspect the
    dropped-bucket count separately.
    """
    w = Window.partitionBy("band", "band_key")
    b = bands_df.withColumn("__n", F.count(F.lit(1)).over(w)).filter(
        F.col("__n") <= max_bucket
    )
    left = b.select(F.col(id_col).alias("id_a"), "band", "band_key")
    right = b.select(F.col(id_col).alias("id_b"), "band", "band_key")
    return (
        left.join(right, ["band", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def sig_jaccard(sig_a: Column, sig_b: Column) -> Column:
    """MinHash Jaccard estimate: fraction of equal signature components."""
    eq = F.size(
        F.filter(F.zip_with(sig_a, sig_b, lambda a, b: a == b), lambda x: x)
    )
    return eq.cast("double") / F.size(sig_a)


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------

SIMHASH_BITS = 64


def _bit_of_hex(h: Column, bit: int) -> Column:
    """Bit ``bit`` (0 = MSB of the first nibble) of a 16-hex-digit prefix
    of md5 hex string ``h``."""
    nibble = F.conv(F.substring(h, bit // 4 + 1, 1), 16, 10).cast("int")
    shift = 3 - (bit % 4)
    return (nibble.bitwiseAND(1 << shift) > 0).cast("int")


def simhash64(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash over lowercased whitespace tokens, returned as a
    64-char '0'/'1' string (MSB first) — string form keeps it exactly
    comparable across engines (no signed-64 overflow games).

    Shape: explode tokens → one groupBy(id) with 64 sum aggregates (one
    per bit; each token votes ±1 per bit from its md5 bits) → threshold
    ≥0 → concat.  Single shuffle on doc_id.
    """
    toks = df.select(
        F.col(id_col),
        F.explode(
            F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != "")
        ).alias("__tok"),
    ).withColumn("__h", F.md5("__tok"))
    votes = [
        F.sum(_bit_of_hex(F.col("__h"), b) * 2 - 1).alias(f"__b{b}")
        for b in range(SIMHASH_BITS)
    ]
    agg = toks.groupBy(id_col).agg(*votes)
    bits = [
        F.when(F.col(f"__b{b}") >= 0, F.lit("1")).otherwise(F.lit("0"))
        for b in range(SIMHASH_BITS)
    ]
    return agg.select(F.col(id_col), F.concat(*bits).alias("simhash"))


def simhash_sql(id_expr: str, text_expr: str, table: str) -> str:
    """DuckDB oracle mirroring :func:`simhash64` (generated SQL)."""
    tok = (
        f"SELECT {id_expr} AS id, unnest(list_filter("
        f"regexp_split_to_array(lower({text_expr}), '\\s+'), t -> t <> '')) AS tok "
        f"FROM {table}"
    )
    votes = []
    for b in range(SIMHASH_BITS):
        j, shift = b // 4 + 1, 3 - (b % 4)
        nib = f"(strpos('0123456789abcdef', substr(h, {j}, 1)) - 1)"
        bit = f"CASE WHEN ({nib} & {1 << shift}) > 0 THEN 1 ELSE -1 END"
        votes.append(f"sum({bit}) AS b{b}")
    bits = " || ".join(
        f"CASE WHEN b{b} >= 0 THEN '1' ELSE '0' END" for b in range(SIMHASH_BITS)
    )
    return (
        f"WITH toks AS ({tok}), h AS (SELECT id, md5(tok) AS h FROM toks), "
        f"v AS (SELECT id, {', '.join(votes)} FROM h GROUP BY id) "
        f"SELECT id, {bits} AS simhash FROM v"
    )
