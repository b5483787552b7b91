"""BPE merge training over a word-frequency frame (Sennrich et al.
2016) — the operator core behind queries/tokenizer_queries.

Operates on ``(word, cnt)`` — the corpus never appears here; producing
that frame is the caller's single corpus-sized aggregate.  See the
query module docstring for the bracket-wrapped greedy-replace encoding
and why plain SQL ``replace`` implements BPE's merge semantics exactly.

Words must match ``[a-z_]+`` (no ``<``/``>``) so the bracket encoding
is unambiguous; the end-of-word marker ``_`` is appended as its own
symbol.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: end-of-word marker appended as its own symbol (GPT-2's Ġ analogue)
EOW = "_"


def initial_symbols(wc: DataFrame) -> DataFrame:
    """(word, cnt) → + ``sym``: chars + EOW marker, bracket-wrapped.
    The filter is ``^[a-z]+$``: words containing anything else —
    including ``_``, which is reserved as the EOW marker — are DROPPED
    here, fail-fast and deterministically on both engines (it matches
    the oracle's ``regexp_full_match(tok, '[a-z]+')``): a quote in a
    word would blow up the literal-spliced replace deep in round 1, an
    empty word's sequence(1, 0) injects phantom '' symbols that diverge
    from reference_train, and an ``_``-bearing word would forge EOW
    symbols."""
    wc = wc.filter(F.col("word").rlike("^[a-z]+$"))
    return wc.withColumn(
        "sym",
        F.expr(
            "concat(array_join(transform(sequence(1, length(word)), "
            "i -> concat('<', substring(word, i, 1), '>')), ''), "
            f"'<{EOW}>')"
        ),
    )


def train(wc: DataFrame, rounds: int) -> tuple[DataFrame, DataFrame]:
    """Learn ``rounds`` merges; returns (merge table (round, left_sym,
    right_sym, merged, n_occurrences) — possibly EMPTY when the corpus
    exhausts before round 1 — and the final vocab frame (word, cnt,
    sym)).  Each round: occurrence-weighted
    adjacent-pair count → argmax ((count DESC, pair ASC) tie-break) →
    greedy merge via literal replace.

    The argmax pair is MATERIALIZED each round (one bounded 1-row
    collect — the k-means/graph control-flow precedent) for two
    load-bearing reasons: (a) splicing it back as a LITERAL keeps the
    vocab plan linear in rounds, where a lazily-composed best frame
    embedded the previous round's plan twice and grew it ~2^rounds
    (Catalyst hangs near 25 rounds); (b) an exhausted pair supply
    (rounds > available merges) STOPS training with the vocab intact —
    a crossJoin against an empty best frame previously annihilated the
    whole vocab, where reference_train stops and keeps it."""
    spark = wc.sparkSession
    sym = initial_symbols(wc)
    merges = []
    for r in range(1, rounds + 1):
        pairs = (
            sym.withColumn(
                "l", F.split(F.expr("substring(sym, 2, length(sym) - 2)"), "><")
            )
            .filter(F.size("l") >= 2)
            .select(
                "cnt",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(l) - 1), "
                        "i -> concat(element_at(l, i), ' ', "
                        "element_at(l, i + 1)))"
                    )
                ).alias("pair"),
            )
            .groupBy("pair")
            .agg(F.sum("cnt").alias("n_occurrences"))
        )
        row = (
            pairs.orderBy(F.desc("n_occurrences"), F.asc("pair"))
            .limit(1)
            .collect()
        )
        if not row:
            break
        # module contract: symbols match [a-z_]+ — safe to splice
        bl, br = row[0]["pair"].split(" ", 1)
        n = int(row[0]["n_occurrences"])
        merges.append((r, bl, br, bl + br, n))
        sym = sym.select(
            "word",
            "cnt",
            F.expr(
                f"replace(sym, '<{bl}><{br}>', '<{bl}{br}>')"
            ).alias("sym"),
        )
    # ONE frame from the already-collected literals (possibly empty):
    # per-round range(1) frames forced callers into an N-deep union and
    # one Spark job per round just to read literals back
    merges_df = spark.createDataFrame(
        merges,
        "round int, left_sym string, right_sym string, merged string, "
        "n_occurrences long",
    )
    return merges_df, sym


def reference_train(words: dict[str, int], rounds: int) -> list[tuple]:
    """Pure-Python reference BPE (the hypothesis-test model): identical
    semantics — EOW marker, weighted pair counts, (count DESC, pair
    ASC) tie-break, greedy left-to-right non-overlapping merge.
    Returns [(round, left, right, merged, count)]."""
    vocab = {tuple(w) + (EOW,): c for w, c in words.items()}
    out = []
    for r in range(1, rounds + 1):
        counts: dict[tuple, int] = {}
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] = (
                    counts.get((syms[i], syms[i + 1]), 0) + c
                )
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (bl, br), n = best
        new_vocab: dict[tuple, int] = {}
        for syms, c in vocab.items():
            merged: list = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == bl and syms[i + 1] == br:
                    merged.append(bl + br)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            t = tuple(merged)
            new_vocab[t] = new_vocab.get(t, 0) + c
        vocab = new_vocab
        out.append((r, bl, br, bl + br, n))
    return out
