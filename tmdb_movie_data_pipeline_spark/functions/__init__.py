"""Expression helpers shared across operators."""

from .diststat import bucket_offsets
from .numeric import (
    MONEY_SCALE,
    PRICE_SCALE,
    UNIT_SCALE,
    qavg,
    qavg_over,
    qavg_sql,
    qsum,
    qsum_over,
    qsum_sql,
    quantize,
    round2,
    round4,
    round6,
    safe_div,
)

__all__ = [
    "MONEY_SCALE",
    "bucket_offsets",
    "PRICE_SCALE",
    "UNIT_SCALE",
    "quantize",
    "qavg",
    "qavg_over",
    "qavg_sql",
    "qsum",
    "qsum_over",
    "qsum_sql",
    "round2",
    "round4",
    "round6",
    "safe_div",
]
