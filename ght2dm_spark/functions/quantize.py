"""Shared absmax-int8 quantization expression fragments (the LLM.int8()
/ FAISS-SQ8 scheme) used by the quantization audit
(queries/curation_filters.py t1_int8_quantize) and the SQ8 search
(queries/similarity_queries.py t1_sq8_ann).

q = half-away-round(x / scale), scale = absmax/127.  Both engines
express the rounding as sign-aware floor (never round() on a double —
the t1_embedding_centroid lesson) and residual energy as exact integer
picounits, so every float output is one final op over deterministic
integer state.  Two spellings of the SAME expression tree: Spark needs
typed literal suffixes (0D/0L) to stay in double/long; DuckDB rejects
them.
"""

from __future__ import annotations

#: Spark SQL fragment: int8 code of ``xd`` (a DOUBLE expression) under
#: a bound ``scale`` column.  Callers .replace("xd", <expr>).
Q_SPARK = (
    "CASE WHEN scale = 0D THEN 0L ELSE CAST("
    "CASE WHEN xd >= 0D THEN floor(xd / scale + 0.5D)"
    " ELSE -floor(-xd / scale + 0.5D) END AS BIGINT) END"
)

#: DuckDB spelling of the same tree (no literal suffixes).
Q_SQL = (
    "CASE WHEN scale = 0 THEN CAST(0 AS BIGINT) ELSE CAST("
    "CASE WHEN xd >= 0 THEN floor(xd / scale + 0.5)"
    " ELSE -floor(-xd / scale + 0.5) END AS BIGINT) END"
)

#: Spark: per-vector absmax/127 scale over an ``embedding`` array column.
#: The coalesce makes an EMPTY array scale 0 (its max is NULL) instead of
#: poisoning every downstream expression with NULL — and in the SQ8 rank
#: window a NULL score would order differently across engines.
SCALE_SPARK = (
    "coalesce(array_max(transform(embedding,"
    " x -> abs(CAST(x AS DOUBLE)))), 0.0D) / 127.0D"
)

#: DuckDB spelling.
SCALE_SQL = (
    "coalesce(list_max(list_transform(embedding,"
    " x -> abs(CAST(x AS DOUBLE)))), 0) / 127.0"
)


def spark_quant_exprs() -> dict[str, str]:
    """Spark fragments over (embedding, scale): the int8 code array and
    the integer-picounit residual-energy sum."""
    xd = "CAST(x AS DOUBLE)"
    q = Q_SPARK.replace("xd", xd)
    r = f"({xd} - {q} * scale)"
    return {
        "qs": f"transform(embedding, x -> {q})",
        "r2m": (
            f"aggregate(transform(embedding, x -> CAST(floor({r} * {r}"
            " * 1000000000000D + 0.5D) AS BIGINT)), 0L, (a, v) -> a + v)"
        ),
    }
