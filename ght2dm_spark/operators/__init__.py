from ght2dm_spark.operators.dedup import dedup_exact, dedup_newest, keep_extremal
from ght2dm_spark.operators.joins import anti_join, broadcast_lookup, or_lookup, resolve_fk
from ght2dm_spark.operators.keys import add_surrogate_key
from ght2dm_spark.operators.topk import top_k, top_k_per_group

__all__ = [
    "dedup_exact",
    "dedup_newest",
    "keep_extremal",
    "anti_join",
    "broadcast_lookup",
    "or_lookup",
    "resolve_fk",
    "add_surrogate_key",
    "top_k",
    "top_k_per_group",
]
