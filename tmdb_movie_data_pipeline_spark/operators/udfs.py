"""User-defined function battery (SURVEY.md §2.9 "UDF/UDAF/UDTF").

The reference is, in effect, one big row-at-a-time Python UDF (the
normalize loop, src/movie.py:187-204). The engine's policy inverts that:
built-in expressions first; when Python is genuinely needed, Arrow-batched
vectorized UDFs — never per-row serde:

* scalar ``pandas_udf``      — whole-column numpy arithmetic per Arrow batch;
* grouped-agg ``pandas_udf`` — one reduced value per group;
* ``applyInPandas``          — full pandas DataFrame per group (UDAF+transform);
* Python UDTF                — one row in, many rows out (table function).

Every entry keeps its arithmetic exactly reproducible (integer quantization
inside the UDF, deterministic IEEE division at the end) so the DuckDB
oracle hash-matches the Python-side computation — the same discipline as
functions/numeric.py, enforced *inside* user code.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..io import load_table
from ..registry import register


@register(
    "udf_pandas_scalar",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           SQRT(l_extendedprice) + FLOOR(l_quantity / 10.0) AS scored
    FROM lineitem
    WHERE l_orderkey % 200 = 0
    """,
)
def pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized scalar UDF: numpy sqrt/floor over Arrow batches (sqrt and
    floor are IEEE-correctly-rounded, so Python == JVM == DuckDB bitwise)."""
    import numpy as np

    @F.pandas_udf(T.DoubleType())
    def score(price: pd.Series, qty: pd.Series) -> pd.Series:
        return np.sqrt(price) + np.floor(qty / 10.0)

    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 200 == 0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        score(F.col("l_extendedprice"), F.col("l_quantity")).alias("scored"),
    )


@register(
    "udf_grouped_agg",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                    * CAST(l_quantity AS BIGINT)) AS DOUBLE)
               / CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) / 100.0
               AS weighted_avg_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDF: quantity-weighted mean price, computed
    on quantized int64 inside Python (order-independent, exact) with one
    final IEEE division — cross-engine bit-equal."""

    import numpy as np

    @F.pandas_udf(T.DoubleType())
    def wavg(price: pd.Series, qty: pd.Series) -> float:
        # half-up quantization (np.round is banker's — would diverge from
        # Spark/DuckDB ROUND at exact .5 ties)
        p = np.floor(price * 100 + 0.5).astype("int64")
        q = qty.astype("int64")
        return float(int((p * q).sum()) / int(q.sum()) / 100.0)

    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        wavg(F.col("l_extendedprice"), F.col("l_quantity")).alias("weighted_avg_price")
    )


APPLY_SCHEMA = T.StructType(
    [
        T.StructField("c_mktsegment", T.StringType()),
        T.StructField("c_custkey", T.LongType()),
        T.StructField("bal_minus_seg_mean", T.DoubleType()),
        T.StructField("seg_rank", T.LongType()),
    ]
)


@register(
    "udf_apply_in_pandas",
    oracle="""
    SELECT c_mktsegment, c_custkey,
           (CAST(ROUND(c_acctbal * 100) AS BIGINT)
            - CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) OVER w AS DOUBLE)
              / CAST(COUNT(*) OVER w AS DOUBLE)) / 100.0  AS bal_minus_seg_mean,
           CAST(RANK() OVER (PARTITION BY c_mktsegment
                             ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS seg_rank
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment)
    """,
)
def apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas group transform: per-segment mean-centering + rank —
    the custom-UDAF-and-transform shape (one shuffle on the group key,
    whole group as a pandas frame in one Python worker)."""

    def center(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        # half-away-from-zero (acctbal can be negative; matches ROUND in
        # Spark and DuckDB, unlike np.round's banker's rounding)
        x = pdf["c_acctbal"] * 100
        q = np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)).astype("int64")
        q = pd.Series(q, index=pdf.index)
        mean = float(int(q.sum())) / float(len(q))
        # deterministic ordering: acctbal desc, custkey asc
        order = pdf.sort_values(
            ["c_acctbal", "c_custkey"], ascending=[False, True]
        ).reset_index()
        seg_rank = pd.Series(0, index=pdf.index, dtype="int64")
        # RANK(): ties share the min position (1-based)
        pos = 1
        prev_bal = None
        for n, (idx, bal) in enumerate(zip(order["index"], order["c_acctbal"]), start=1):
            if prev_bal is None or bal != prev_bal:
                pos = n
                prev_bal = bal
            seg_rank[idx] = pos
        return pd.DataFrame(
            {
                "c_mktsegment": pdf["c_mktsegment"],
                "c_custkey": pdf["c_custkey"],
                "bal_minus_seg_mean": (q.astype("float64") - mean) / 100.0,
                "seg_rank": seg_rank,
            }
        )

    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").applyInPandas(center, APPLY_SCHEMA)


@register(
    "udtf_explode_buckets",
    oracle="""
    SELECT o_orderkey, bucket_idx,
           CAST(ROUND(o_totalprice * 100) AS BIGINT) // 3
             + CASE WHEN bucket_idx < CAST(ROUND(o_totalprice * 100) AS BIGINT) % 3
                    THEN 1 ELSE 0 END AS bucket_cents
    FROM orders, (SELECT UNNEST([0, 1, 2]) AS bucket_idx)
    WHERE o_orderkey % 500 = 0
    """,
)
def udtf_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function): splits each order's total into 3
    integer-cent buckets (largest-remainder rounding) — one row in, three
    rows out; the canonical row-expanding UDTF shape."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="o_orderkey bigint, bucket_idx int, bucket_cents bigint")
    class SplitBuckets:
        def eval(self, orderkey: int, totalprice: float):
            import math

            # half-up (Python round() is banker's)
            cents = int(math.floor(totalprice * 100 + 0.5))
            base, rem = divmod(cents, 3)
            for i in range(3):
                yield orderkey, i, base + (1 if i < rem else 0)

    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 500 == 0)
    o.createOrReplaceTempView("t_orders_udtf")
    spark.udtf.register("split_buckets", SplitBuckets)
    return spark.sql(
        """
        SELECT s.o_orderkey, s.bucket_idx, s.bucket_cents
        FROM t_orders_udtf,
             LATERAL split_buckets(o_orderkey, o_totalprice) s
        """
    )


@register(
    "udf_cogrouped_join",
    oracle="""
    SELECT c.c_custkey,
           CAST(COUNT(o.o_orderkey) AS BIGINT) AS num_orders,
           CAST(COALESCE(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)), 0)
                AS BIGINT)                      AS total_spend_cents,
           CAST(ROUND(c.c_acctbal * 100) AS BIGINT) AS acctbal_cents
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    WHERE c.c_custkey % 100 = 0
    GROUP BY c.c_custkey, c.c_acctbal
    """,
)
def cogrouped_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped ``applyInPandas``: customers cogrouped with their orders by
    key, merged in one Python pass per key — the custom-join shape
    (``cogroup`` is the pandas-API dual of a join + groupBy).

    Scale shape: one hash shuffle per side on the cogroup key (exactly what
    an equi-join would pay), then each key's two pandas frames visit a
    single Arrow-batched worker — no driver collect, no broadcast. Spend is
    summed as half-up-quantized int cents inside Python (order-free), so
    the result is bit-equal to the oracle's LEFT JOIN + GROUP BY. Customers
    with no orders surface with zero counts (cogroup keeps keys present on
    either side); order groups with no customer row emit nothing, matching
    the oracle's FROM customer LEFT JOIN.
    """
    import numpy as np

    def merge(c_pdf: pd.DataFrame, o_pdf: pd.DataFrame) -> pd.DataFrame:
        if len(c_pdf) == 0:  # orders whose key has no customer row
            return pd.DataFrame(
                columns=["c_custkey", "num_orders", "total_spend_cents", "acctbal_cents"]
            )
        # half-away-from-zero quantization (acctbal can be negative;
        # np.round is banker's and would diverge at exact .5 ties)
        def q_cents(x: pd.Series) -> pd.Series:
            v = x * 100
            return pd.Series(
                np.where(v >= 0, np.floor(v + 0.5), np.ceil(v - 0.5)).astype("int64"),
                index=x.index,
            )

        spend = int(q_cents(o_pdf["o_totalprice"]).sum()) if len(o_pdf) else 0
        return pd.DataFrame(
            {
                "c_custkey": c_pdf["c_custkey"].astype("int64"),
                "num_orders": np.int64(len(o_pdf)),
                "total_spend_cents": np.int64(spend),
                "acctbal_cents": q_cents(c_pdf["c_acctbal"]),
            }
        )

    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") % 100 == 0)
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") % 100 == 0)
    return (
        cust.groupBy("c_custkey")
        .cogroup(orders.groupBy("o_custkey"))
        .applyInPandas(
            merge,
            "c_custkey long, num_orders long, total_spend_cents long, acctbal_cents long",
        )
    )


@register(
    "udf_pandas_scalar_iter",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(ROUND(l_extendedprice * 1000000) AS BIGINT) % 97 AS bucket97
    FROM lineitem
    WHERE l_orderkey % 200 = 0
    """,
)
def pandas_scalar_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterator-of-series pandas UDF (SCALAR_ITER): the variant for
    expensive per-executor init — the \"model\" (here just the quantizer
    constants) loads ONCE per partition, then streams over Arrow batches;
    a plain scalar UDF would re-enter Python with no place to hoist that
    setup. Arithmetic is half-up integer quantization, so Python == JVM ==
    DuckDB exactly."""
    import numpy as np

    @F.pandas_udf(T.LongType())
    def bucket(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        scale, mod = 1_000_000, 97  # per-partition init, amortized
        for b in batches:
            micros = np.floor(b * scale + 0.5).astype("int64")
            yield pd.Series(micros % mod)

    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 200 == 0)
    return li.select(
        "l_orderkey", "l_linenumber", bucket(F.col("l_extendedprice")).alias("bucket97")
    )


@register(
    "udf_map_in_arrow",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(ROUND(l_extendedprice * 100) AS BIGINT)
             + CAST(l_quantity AS BIGINT) AS price_qty_mix
    FROM lineitem
    WHERE l_orderkey % 200 = 0
    """,
)
def map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mapInArrow``: zero-copy RecordBatch-in / RecordBatch-out — the
    lowest-overhead Python hook (no pandas conversion at all), the shape
    for columnar codecs and Arrow-native libraries. ``pc.round`` is pinned
    to half_towards_infinity (positive inputs ⇒ half-up) to match both
    engines' ROUND."""
    import pyarrow as pa

    def mix(batches: "Iterator[pa.RecordBatch]") -> "Iterator[pa.RecordBatch]":
        import pyarrow.compute as pc

        for b in batches:
            cents = pc.cast(
                pc.round(
                    pc.multiply(b.column("l_extendedprice"), pa.scalar(100.0)),
                    ndigits=0,
                    round_mode="half_towards_infinity",
                ),
                pa.int64(),
            )
            qty = pc.cast(b.column("l_quantity"), pa.int64())
            yield pa.RecordBatch.from_arrays(
                [b.column("l_orderkey"), b.column("l_linenumber"),
                 pc.add(cents, qty)],
                ["l_orderkey", "l_linenumber", "price_qty_mix"],
            )

    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 200 == 0)
        .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_quantity")
    )
    return li.mapInArrow(
        mix, "l_orderkey long, l_linenumber int, price_qty_mix long"
    )


_POLY_N = 3  # fixed-width chunks requested by the registered query
_POLY_WIDTH = 16


@register(
    "udtf_polymorphic_split",
    oracle=f"""
    SELECT doc_id,
           {", ".join(
               f"substr(text, {i * _POLY_WIDTH + 1}, {_POLY_WIDTH}) AS chunk_{i}"
               for i in range(_POLY_N)
           )}
    FROM documents WHERE doc_id % 7 = 0
    """,
)
def udtf_polymorphic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POLYMORPHIC Python UDTF (Spark 4 ``analyze()``): the output schema —
    ``chunk_0 .. chunk_{{n-1}}`` — is computed at ANALYSIS time from the
    constant ``n`` argument, not declared statically. This is the schema-
    from-arguments contract (SPARK-44503) that static-returnType UDTFs
    (udtf_explode_buckets above) cannot express; the worker then yields
    fixed-width text chunks matching exactly the analyzer-produced arity.
    Chunking itself mirrors the oracle's substr() battery byte for byte."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import StringType, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    class SplitFixed:
        @staticmethod
        def analyze(text: AnalyzeArgument, n: AnalyzeArgument) -> AnalyzeResult:
            schema = StructType()
            for i in range(n.value):
                schema = schema.add(f"chunk_{i}", StringType())
            return AnalyzeResult(schema=schema)

        def eval(self, text: str, n: int):
            yield tuple(
                text[i * _POLY_WIDTH : (i + 1) * _POLY_WIDTH] for i in range(n)
            )

    poly = udtf(SplitFixed)
    spark.udtf.register("split_fixed", poly)
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 7 == 0)
    docs.createOrReplaceTempView("t_docs_poly")
    return spark.sql(
        f"""
        SELECT d.doc_id, s.*
        FROM t_docs_poly d, LATERAL split_fixed(d.text, {_POLY_N}) s
        """
    )


# -- Spark 4 UDTF with TABLE argument (PARTITION BY / ORDER BY) ---------------


@register(
    "udtf_table_arg_gaps",
    oracle="""
    WITH seq AS (
        SELECT user_id,
               epoch_us(ts) - epoch_us(LAG(ts) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us
        FROM events
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT)                AS n_events,
           CAST(COALESCE(MAX(gap_us), 0) AS BIGINT) AS max_gap_us
    FROM seq GROUP BY 1
    """,
)
def udtf_table_arg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 UDTF consuming a TABLE argument with PARTITION BY/ORDER BY:
    per-user largest inter-event gap computed by a stateful per-partition
    accumulator (``__init__``/``eval``/``terminate``) — the API for custom
    per-group sequential logic when a window expression can't express the
    state machine (here it can, which is exactly what lets the oracle
    pin the UDTF contract: partition isolation, order delivery, terminate
    emission).

    Scale: the TABLE argument's PARTITION BY is a plain hash Exchange;
    state is O(1) per partition key. Python crossing is Arrow-batched; a
    production hot path would prefer the pure-window form (left as the
    oracle) — registered to pin the API surface, per the builtins-first
    policy.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="user_id bigint, n_events bigint, max_gap_us bigint")
    class UserGaps:
        def __init__(self):
            self._user = None
            self._prev = None
            self._n = 0
            self._max = 0

        def eval(self, row):
            self._user = row["user_id"]
            t = row["ts_us"]
            if self._prev is not None and t - self._prev > self._max:
                self._max = t - self._prev
            self._prev = t
            self._n += 1

        def terminate(self):
            if self._user is not None:
                yield self._user, self._n, self._max

    load_table(spark, sf_dir, "events").createOrReplaceTempView("t_events_gaps")
    spark.udtf.register("user_gaps", UserGaps)
    return spark.sql(
        """
        SELECT user_id, n_events, max_gap_us
        FROM user_gaps(
            TABLE(SELECT user_id, unix_micros(ts) AS ts_us, event_id
                  FROM t_events_gaps)
            PARTITION BY user_id ORDER BY (ts_us, event_id)
        )
        """
    )


# -- Spark 4 Arrow-optimized scalar Python UDF — deferred r7 queue ------------


@register(
    "udf_arrow_scalar",
    oracle="""
    SELECT o_orderkey,
           CAST(ROUND(o_totalprice * 100) AS BIGINT) % 97 AS bucket97
    FROM orders WHERE o_orderkey % 100 = 0
    """
)
def arrow_scalar_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4's Arrow-optimized scalar Python UDF (``@udf(useArrow=True)``)
    — the row-at-a-time @udf API with pandas-UDF transport underneath:
    existing per-scalar code gets Arrow batching WITHOUT the rewrite to
    Series-in/Series-out. Registered to pin the API surface alongside the
    classic pandas variants (udf_pandas_scalar etc.); the arithmetic is
    integer so the oracle is exact, and the builtins-first policy note
    stands — this exists for when Python is unavoidable, not as a hot
    path (the oracle IS the pure-SQL form a production job should use).
    """
    from pyspark.sql.functions import udf

    @udf(returnType="long", useArrow=True)
    def bucket97(totalprice: float) -> int:
        import math

        return int(math.floor(totalprice * 100 + 0.5)) % 97

    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 100 == 0)
    return o.select("o_orderkey", bucket97(F.col("o_totalprice")).alias("bucket97"))
