"""Spatial operators: grid-bucketed distance self-join (SURVEY §2.9, joins).

The classic scale pattern for "find all point pairs within distance R":
bucket points into grid cells of side >= R, replicate each PROBE point to
its 3x3 neighborhood, equi-join on the cell id, and verify the exact
distance predicate on the (tiny) candidate set. The all-pairs O(n^2)
comparison becomes an equi-join whose candidate count is bounded by local
density — the same neighborhood-bucketing shape as the LSH dedup family
(dedup.py) and the fuzzy deletion-neighborhood join (joins.py), applied to
geometry.

Points are derived deterministically from customer keys (the synthetic
tables carry no coordinates): two md5-derived projections onto a
2^20 x 2^20 integer plane (the repo's cross-engine hash family — a LINEAR
multiplicative hash is unusable here: h(k) = k*A mod 2^32 maps every
key-pair at the same delta to the same displacement vector, so a few
"lucky" deltas each contribute O(n) near-pairs and the output degenerates
into lattice stripes). All arithmetic is int64-exact, so the DuckDB oracle
(a direct all-pairs join — affordable at fixture scale, which is the point
of having the grid version) reproduces the pair set bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register

__all__ = ["grid_points", "grid_distance_self_join"]

_PLANE_MOD = 1 << 20  # md5-derived 2^60 hash -> 2^20 coordinate
_CELL = 1 << 15  # grid cell side -> 32x32 cells over the plane
_RADIUS = 1 << 14  # R <= CELL, so 3x3 neighbor cells suffice
_R2 = _RADIUS * _RADIUS


def _coord_sql(axis: str) -> str:
    return (
        f"('0x' || substr(md5('{axis}_' || CAST(c_custkey AS VARCHAR)), 1, 15))"
        f"::BIGINT % {_PLANE_MOD}"
    )


def grid_points(customers: DataFrame) -> DataFrame:
    """Project each customer onto the integer plane: two hash coordinates."""

    def coord(axis: str):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(axis + "_"), F.col("c_custkey").cast("string"))),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long")
            % _PLANE_MOD
        )

    x, y = coord("sx"), coord("sy")
    return customers.select(
        F.col("c_custkey").alias("pkey"), x.alias("x"), y.alias("y")
    )


def grid_distance_self_join(points: DataFrame) -> DataFrame:
    """All pairs (a < b) with squared L2 distance <= R^2, via 3x3 grid probes.

    Each probe point replicates to its 9 neighbor cells; build points stay
    in their single home cell, so every qualifying pair joins EXACTLY once
    (b's unique home cell matches one of a's 9 distinct probe cells; the
    a < b guard kills the mirrored direction). |dx|<=R<=CELL guarantees no
    qualifying pair spans more than one cell boundary.
    """
    pts = points.select(
        "pkey",
        "x",
        "y",
        F.expr(f"x div {_CELL}").alias("cx"),
        F.expr(f"y div {_CELL}").alias("cy"),
    )
    d = F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1)))
    probes = (
        pts.withColumn("dx", d)
        .withColumn("dy", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .select(
            F.col("pkey").alias("akey"),
            F.col("x").alias("ax"),
            F.col("y").alias("ay"),
            (F.col("cx") + F.col("dx")).alias("ncx"),
            (F.col("cy") + F.col("dy")).alias("ncy"),
        )
    )
    build = pts.select(
        F.col("pkey").alias("bkey"),
        F.col("x").alias("bx"),
        F.col("y").alias("by"),
        "cx",
        "cy",
    )
    dist_sq = (F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx")) + (
        F.col("ay") - F.col("by")
    ) * (F.col("ay") - F.col("by"))
    return (
        probes.join(
            build,
            (F.col("ncx") == F.col("cx"))
            & (F.col("ncy") == F.col("cy"))
            & (F.col("akey") < F.col("bkey")),
        )
        .withColumn("dist_sq", dist_sq.cast("long"))
        .filter(F.col("dist_sq") <= _R2)
        .select(
            F.col("akey").alias("custkey_a"),
            F.col("bkey").alias("custkey_b"),
            "dist_sq",
        )
    )


@register(
    "join_spatial_grid",
    oracle=f"""
    WITH pts AS (
        SELECT c_custkey AS pkey,
               {_coord_sql('sx')} AS x,
               {_coord_sql('sy')} AS y
        FROM customer
    )
    SELECT a.pkey AS custkey_a, b.pkey AS custkey_b,
           CAST((a.x - b.x) * (a.x - b.x)
              + (a.y - b.y) * (a.y - b.y) AS BIGINT) AS dist_sq
    FROM pts a JOIN pts b ON a.pkey < b.pkey
    WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= {_R2}
    """,
)
def spatial_grid_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-bucketed neighbor search vs the oracle's exact all-pairs join —
    identical pair sets prove the bucketing loses nothing, while the Spark
    plan stays an equi-join (shuffle keyed on cells, never n^2 rows).
    """
    return grid_distance_self_join(grid_points(load_table(spark, sf_dir, "customer")))
