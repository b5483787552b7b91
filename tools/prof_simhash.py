"""Profile simhash64 + hamming-pairs variants at sf0.1."""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from ght2dm_spark.session import get_spark
from ght2dm_spark.queries.dedup_queries import _aug_docs, HAMMING_R, HAMMING_BLOCKS
from ght2dm_spark.operators.neardup import (
    simhash64,
    simhash_hamming_pairs,
    lsh_candidate_pairs,
    SIMHASH_BITS,
)

SF = "/root/testdata/sf0.1"


def simhash64_np(df, id_col, text_col):
    d = df.select(F.col(id_col), F.col(text_col).alias("__text"))

    def sh_batches(it):
        import hashlib
        import re

        import numpy as np
        import pandas as pd

        ws = re.compile(r"\s+", re.ASCII)
        memo = {}

        def tokbits(tok):
            b = memo.get(tok)
            if b is None:
                b = np.unpackbits(
                    np.frombuffer(
                        hashlib.md5(tok.encode("utf-8")).digest()[:8], np.uint8
                    )
                ).astype(np.int64)
                memo[tok] = b
            return b

        tbl = np.array(["0", "1"])
        for pdf in it:
            ids, shs = [], []
            for i, t in zip(pdf[id_col], pdf["__text"]):
                if t is None:
                    continue
                toks = [x for x in ws.split(t.lower()) if x]
                if not toks:
                    continue
                c = np.zeros(64, np.int64)
                for tok in toks:
                    c += tokbits(tok)
                bits = (2 * c >= len(toks)).astype(np.int8)
                ids.append(i)
                shs.append("".join(tbl[bits]))
            yield pd.DataFrame({id_col: ids, "simhash": shs})

    return d.mapInPandas(sh_batches, f"{id_col} long, simhash string")


def pairs_bitcount(sim, id_col, radius, blocks, max_bucket=10_000):
    width = SIMHASH_BITS // blocks
    blk = sim.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.substring("simhash", b * width + 1, width).alias("band_key"),
                    )
                    for b in range(blocks)
                ]
            )
        ).alias("bk"),
    ).select(id_col, F.col("bk.band").alias("band"), F.col("bk.band_key").alias("band_key"))
    cand = lsh_candidate_pairs(blk, id_col, max_bucket=max_bucket)
    h1 = F.conv(F.substring("simhash", 1, 32), 2, 10).cast("long")
    h2 = F.conv(F.substring("simhash", 33, 32), 2, 10).cast("long")
    sa = sim.select(F.col(id_col).alias("id_a"), h1.alias("__a1"), h2.alias("__a2"))
    sb = sim.select(F.col(id_col).alias("id_b"), h1.alias("__b1"), h2.alias("__b2"))
    dist = F.bit_count(F.col("__a1").bitwiseXOR(F.col("__b1"))) + F.bit_count(
        F.col("__a2").bitwiseXOR(F.col("__b2"))
    )
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("hamming", dist.cast("int"))
        .filter(F.col("hamming") <= radius)
        .select("id_a", "id_b", "hamming")
    )


def t(fn, reps=3):
    fn()
    s = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        s.append(time.perf_counter() - t0)
    return round(statistics.median(s), 3)


def main():
    spark = get_spark()
    aug = _aug_docs(spark, SF)

    print("build current:", t(lambda: simhash64(aug, "doc_id", "text").foreach(lambda r: None)))
    print("build numpy:  ", t(lambda: simhash64_np(aug, "doc_id", "text").foreach(lambda r: None)))

    a = {r.doc_id: r.simhash for r in simhash64(aug, "doc_id", "text").collect()}
    b = {r.doc_id: r.simhash for r in simhash64_np(aug, "doc_id", "text").collect()}
    print("build parity:", "OK" if a == b else f"MISMATCH {len(a)} vs {len(b)}")

    def full_cur():
        sim = simhash64(aug, "doc_id", "text").cache()
        n = simhash_hamming_pairs(sim, "doc_id", radius=HAMMING_R, blocks=HAMMING_BLOCKS).count()
        sim.unpersist()
        return n

    def full_new():
        sim = simhash64_np(aug, "doc_id", "text").cache()
        n = pairs_bitcount(sim, "doc_id", HAMMING_R, HAMMING_BLOCKS).count()
        sim.unpersist()
        return n

    print("full current:", t(full_cur))
    print("full new:    ", t(full_new))

    sim = simhash64(aug, "doc_id", "text").cache()
    pa = sorted(map(tuple, simhash_hamming_pairs(sim, "doc_id", radius=HAMMING_R, blocks=HAMMING_BLOCKS).collect()))
    pb = sorted(map(tuple, pairs_bitcount(sim, "doc_id", HAMMING_R, HAMMING_BLOCKS).collect()))
    print("pairs parity:", "OK" if pa == pb else f"MISMATCH {len(pa)} vs {len(pb)}")
    sim.unpersist()


if __name__ == "__main__":
    main()
