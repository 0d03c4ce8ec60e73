"""Distributed order statistics: the bucket-histogram offset idiom.

Global ranks, cumulative sums and order statistics over a big frame
normally need a single-partition window (the classic scale killer). The
idiom used across this engine replaces it with three bounded steps:

1. bucket rows by a monotone function of the ordering key;
2. compute per-bucket partial aggregates — a TINY histogram — and window
   THAT for cross-bucket exclusive prefix sums (the only unpartitioned
   window in the plan runs over |buckets| rows);
3. broadcast the offsets back and finish with bucket-PARTITIONED local
   windows: global value = offset + bucket-local running value.

First proven by agg_rfm_segmentation's distributed NTILE and the quantile
sketch's exact k-th order statistic; this helper centralizes the subtle
part (exclusive frame, descending option, empty-prefix coalesce) for the
rank-statistics family (Pareto head, Mann-Whitney, Kolmogorov-Smirnov,
funnel median).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

__all__ = ["bucket_offsets"]


def bucket_offsets(
    frame: DataFrame,
    bucket_col: str,
    sums: dict[str, Column],
    *,
    descending: bool = False,
    partition_by: list[str] | None = None,
) -> DataFrame:
    """Exclusive cross-bucket prefix sums over the bucket histogram.

    Returns one row per distinct (``partition_by``..., ``bucket_col``)
    value with a column ``_off_<name>`` per entry of ``sums``: the total
    of that expression over all STRICTLY earlier buckets of the same
    partition (ascending order, or descending with ``descending=True``),
    0 for the first bucket. Broadcast-join the result back and add
    bucket-local running values to get exact global (or per-group) ones.

    With ``partition_by`` the offsets window itself is partitioned —
    GROUPED order statistics then contain no unpartitioned window at all.
    """
    parts = list(partition_by or [])
    hist = frame.groupBy(*parts, bucket_col).agg(
        *[F.sum(c).alias(f"_h_{n}") for n, c in sums.items()]
    )
    order = F.desc(bucket_col) if descending else F.asc(bucket_col)
    base = W.partitionBy(*parts) if parts else W
    w = base.orderBy(order).rowsBetween(W.unboundedPreceding, -1)
    return hist.select(
        *parts,
        bucket_col,
        *[
            F.coalesce(F.sum(f"_h_{n}").over(w), F.lit(0)).alias(f"_off_{n}")
            for n in sums
        ],
    )
