from ght2dm_spark.functions.cleaning import (
    coalesce_empty,
    empty_to_null,
    epoch_us,
    strip_null_bytes,
    to_ts,
    trunc_ntz,
    zero_default,
)
from ght2dm_spark.functions.derive import clone_path, full_name

__all__ = [
    "coalesce_empty",
    "empty_to_null",
    "epoch_us",
    "strip_null_bytes",
    "to_ts",
    "zero_default",
    "clone_path",
    "full_name",
]
