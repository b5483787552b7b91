"""Pure-Python reference models for the round-3 statistics — the BPE
test's strategy generalized: an implementation bug MIRRORED into its
oracle SQL passes the Spark≡DuckDB gate; it does not pass an
independently-written numpy/python reimplementation reading the same
parquet.
"""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
import pandas as pd

from ght2dm_spark.queries import QUERIES


def _daily_micro(sf_dir):
    ev = pq.read_table(f"{sf_dir}/events.parquet").to_pandas()
    ev["d"] = (
        ev["ts"].dt.floor("D") - pd.Timestamp("1970-01-01")
    ).dt.days.astype(np.int64)
    ev["vm"] = np.round(ev["value"].to_numpy() * 1_000_000).astype(np.int64)
    g = ev.groupby(["event_type", "d"], sort=True)["vm"].sum()
    return {
        et: grp.droplevel(0).sort_index().to_numpy()
        for et, grp in g.groupby(level=0)
    }


def _tdiv(a, b):
    # truncation toward zero for either sign (== Spark div, DuckDB //)
    return int(np.fix(a / b)) if b else 0


def test_theilsen_matches_python_reference(spark, sf_dir):
    series = _daily_micro(sf_dir)
    got = {r.event_type: r for r in QUERIES["t1_theilsen_slope"](spark, sf_dir).collect()}
    # day spacing matters: rebuild (d, v) pairs, not just values
    ev = pq.read_table(f"{sf_dir}/events.parquet").to_pandas()
    ev["d"] = (
        ev["ts"].dt.floor("D") - pd.Timestamp("1970-01-01")
    ).dt.days.astype(np.int64)
    ev["vm"] = np.round(ev["value"].to_numpy() * 1_000_000).astype(np.int64)
    for et, grp in ev.groupby("event_type"):
        dv = grp.groupby("d", sort=True)["vm"].sum()
        d = dv.index.to_numpy()
        v = dv.to_numpy()
        slopes = sorted(
            _tdiv(v[j] - v[i], d[j] - d[i])
            for i in range(len(v))
            for j in range(i + 1, len(v))
        )
        want = slopes[(len(slopes) + 1) // 2 - 1]
        assert got[et].ts_slope == want, et
        assert got[et].n_pairs == len(slopes)
    assert set(got) == set(series)


def test_mann_kendall_matches_python_reference(spark, sf_dir):
    series = _daily_micro(sf_dir)
    got = {r.event_type: r for r in QUERIES["t1_mann_kendall"](spark, sf_dir).collect()}
    for et, v in series.items():
        s = sum(
            int(np.sign(v[j] - v[i]))
            for i in range(len(v))
            for j in range(i + 1, len(v))
        )
        n = len(v)
        _, counts = np.unique(v, return_counts=True)
        var18 = n * (n - 1) * (2 * n + 5) - sum(
            int(t) * (int(t) - 1) * (2 * int(t) + 5) for t in counts
        )
        assert got[et].s_stat == s, et
        assert got[et].var18 == var18, et


def test_ewma_and_holt_match_python_reference(spark, sf_dir):
    series = _daily_micro(sf_dir)
    ew = {r.event_type: r for r in QUERIES["t1_ewma"](spark, sf_dir).collect()}
    ho = {r.event_type: r for r in QUERIES["t1_holt_linear"](spark, sf_dir).collect()}
    for et, v in series.items():
        s = int(v[0])
        for x in v[1:]:
            s = _tdiv(3 * int(x) + 7 * s, 10)
        assert ew[et].ewma_micro == s, et
        l, b = int(v[0]), int(v[1]) - int(v[0])
        for x in v[2:]:
            l_new = _tdiv(3 * int(x) + 7 * (l + b), 10)
            b = _tdiv(2 * (l_new - l) + 8 * b, 10)
            l = l_new
        assert (ho[et].level_micro, ho[et].trend_micro) == (l, b), et


def test_acf_matches_python_reference(spark, sf_dir):
    ev = pq.read_table(f"{sf_dir}/events.parquet").to_pandas()
    ev["d"] = (
        ev["ts"].dt.floor("D") - pd.Timestamp("1970-01-01")
    ).dt.days.astype(np.int64)
    ev["vc"] = np.round(ev["value"].to_numpy() * 100).astype(np.int64)
    got = {
        (r.event_type, r.lag): r
        for r in QUERIES["t1_acf"](spark, sf_dir).collect()
    }
    for et, grp in ev.groupby("event_type"):
        v = grp.groupby("d", sort=True)["vc"].sum().to_numpy()
        n = len(v)
        mu = _tdiv(int(v.sum()), n)
        dev = v.astype(object) - mu  # python ints — no overflow ambiguity
        denom = int(sum(x * x for x in dev))
        for lag in range(1, 8):
            num = int(sum(dev[t + lag] * dev[t] for t in range(n - lag)))
            r = got[(et, lag)]
            assert (r.acov_num, r.denom) == (num, denom), (et, lag)


def test_mmr_matches_python_greedy_reference(spark, sf_dir):
    emb = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pandas()
    vecs = {
        int(i): np.asarray(v, dtype=np.float64)
        for i, v in zip(emb["vec_id"], emb["embedding"])
    }

    def seq_cos(a, b):
        # sequential left-to-right folds, matching operators/similarity
        num = 0.0
        da = 0.0
        db = 0.0
        for x, y in zip(a, b):
            num += x * y
        for x in a:
            da += x * x
        for y in b:
            db += y * y
        return num / np.sqrt(da * db)

    got = {}
    for r in QUERIES["t1_mmr_rerank"](spark, sf_dir).collect():
        got.setdefault(r.q_id, {})[r.pick] = r.c_id
    for qid in range(5):
        qv = vecs[qid]
        scored = sorted(
            ((seq_cos(qv, v), -cid) for cid, v in vecs.items() if cid != qid),
            reverse=True,
        )[:10]
        cand = [(-ncid, cos) for cos, ncid in scored]
        sel = [min((c for c in cand), key=lambda c: (-c[1], c[0]))[0]]
        while len(sel) < 5:
            best = None
            for cid, cos in cand:
                if cid in sel:
                    continue
                msim = max(seq_cos(vecs[cid], vecs[s]) for s in sel)
                score = 7 * cos - 3 * msim
                key = (-score, cid)
                if best is None or key < best[0]:
                    best = (key, cid)
            sel.append(best[1])
        assert [got[qid][p] for p in range(1, 6)] == sel, qid


def test_kn_surprisal_matches_python_reference(spark, sf_dir):
    """Independent interpolated-Kneser-Ney reimplementation (counts via
    Python dicts, probability straight from the published formula) — a
    bug mirrored into the SQL oracle cannot pass this."""
    import math
    import re
    from collections import Counter, defaultdict

    docs = pq.read_table(f"{sf_dir}/documents.parquet").to_pandas()
    ws = re.compile(r"\s+", re.ASCII)
    bigrams_per_doc = {}
    c2 = Counter()
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        toks = [t for t in ws.split(str(text).lower()) if t] if text is not None else []
        bgs = list(zip(toks, toks[1:]))
        if bgs:
            bigrams_per_doc[int(doc_id)] = bgs
            c2.update(bgs)
    cv = Counter()
    n1f = Counter()
    nw = Counter()
    for (v, w), n in c2.items():
        cv[v] += n
        n1f[v] += 1
        nw[w] += 1
    ntot = len(c2)
    D = 0.75
    expect = {}
    for doc_id, bgs in bigrams_per_doc.items():
        terms = [
            round(
                -math.log2(
                    (max(c2[(v, w)] - D, 0.0) + D * n1f[v] * nw[w] / ntot)
                    / cv[v]
                ),
                9,
            )
            for v, w in bgs
        ]
        # DECIMAL(28,9) sum == exact sum of 1e-9-unit integers
        nano = sum(int(round(t * 1e9)) for t in terms)
        expect[doc_id] = (len(bgs), round(nano / 1e9 / len(bgs), 6))
    got = {
        r.doc_id: (r.n_bigrams, float(r.avg_kn_surprisal))
        for r in QUERIES["t1_kn_surprisal"](spark, sf_dir).collect()
    }
    assert set(got) == set(expect)
    for doc_id in expect:
        assert got[doc_id][0] == expect[doc_id][0], doc_id
        assert abs(got[doc_id][1] - expect[doc_id][1]) <= 1e-6, doc_id


def test_zipf_fit_matches_numpy_polyfit(spark, sf_dir):
    """The integer-unit closed-form slope must agree with numpy's
    float least squares on the same (log2 rank, log2 count) points."""
    import re
    from collections import Counter

    docs = pq.read_table(f"{sf_dir}/documents.parquet").to_pandas()
    ws = re.compile(r"\s+", re.ASCII)
    per_lang = {}
    for lang, text in zip(docs["lang"], docs["text"]):
        toks = [t for t in ws.split(str(text).lower()) if t] if text is not None else []
        per_lang.setdefault(lang, Counter()).update(toks)
    got = {r.lang: (r.k, r.zipf_slope) for r in QUERIES["t1_zipf_fit"](spark, sf_dir).collect()}
    for lang, cnt in per_lang.items():
        top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:100]
        if len(top) < 2:
            assert lang not in got
            continue
        x = np.log2(np.arange(1, len(top) + 1, dtype=float))
        y = np.log2(np.array([c for _, c in top], dtype=float))
        slope = np.polyfit(x, y, 1)[0]
        k, got_slope = got[lang]
        assert k == len(top)
        # integer micro-unit snapping bounds the divergence
        assert abs(got_slope - slope) < 5e-5, (lang, got_slope, slope)


def test_simhash_hamming_pairs_complete_vs_bruteforce(spark, sf_dir):
    """Pigeonhole completeness: the multi-block index must return
    EXACTLY the pairs a brute-force all-pairs Hamming scan finds at
    radius <= 3 (the planted duplicates guarantee a nonempty answer)."""
    from ght2dm_spark.queries.dedup_queries import _aug_docs
    from ght2dm_spark.operators.neardup import simhash64, simhash_hamming_pairs

    sim = simhash64(_aug_docs(spark, sf_dir), "doc_id", "text")
    fps = {r.doc_id: r.simhash for r in sim.collect()}
    ids = sorted(fps)
    brute = set()
    for i, a in enumerate(ids):
        fa = fps[a]
        for b in ids[i + 1:]:
            d = sum(x != y for x, y in zip(fa, fps[b]))
            if d <= 3:
                brute.add((a, b, d))
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in QUERIES["t1_simhash_hamming_pairs"](spark, sf_dir).collect()
    }
    assert brute, "fixture must plant at least one near pair"
    assert got == brute
