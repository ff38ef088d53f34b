"""Planar grid radius join — the 2-D generalization of
operators/joins.py::interval_bucket_join.

The reference carries merchant coordinates
(`merchant_latitude/longitude`, /root/reference/src/sql/
create_bronze_layer.sql:27-28) but never joins on them; the analytical
operator those columns imply is a spatial radius join ("customers
within r of each merchant"). A naive distance join is a nested loop —
O(|A|·|B|) — so it is rewritten on a fixed grid:

  1. cell assignment — every point hashes to integer cell
     (⌊x/r⌋, ⌊y/r⌋); pure arithmetic, codegen'd;
  2. neighbor expansion — ONE side explodes to its 3×3 surrounding
     cells (any pair within distance r lies in adjacent cells when the
     cell edge is r, so candidate generation is exhaustive by
     construction — no recall loss);
  3. equi-join on the cell id (hash join; broadcastable when one side
     is a dimension) + residual exact distance predicate.

Cost at scale: the exploded side grows 9×, but the join is a plain
shuffle/broadcast hash join on an integer pair — no cross product
ever materializes. Squared distances avoid sqrt entirely, keeping the
predicate exact IEEE arithmetic (cross-engine reproducible).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grid_radius_join(
    a: DataFrame,
    ax: str,
    ay: str,
    b: DataFrame,
    bx: str,
    by: str,
    radius: float,
    broadcast_b: bool = False,
) -> DataFrame:
    """All (a, b) pairs with squared planar distance ≤ radius².

    Column names of `a` and `b` must be disjoint. The b side is the
    one replicated 9×; pass the smaller table as `b` (and set
    `broadcast_b` when it is dimension-sized).
    """
    r = float(radius)

    def cell(c: str):
        return F.floor(F.col(c) / F.lit(r)).cast("long")

    a_keyed = a.withColumn("__cx", cell(ax)).withColumn("__cy", cell(ay))
    off = F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1)))
    b_keyed = (
        b.withColumn("__ox", off)
        .withColumn("__oy", off)
        .withColumn("__cx", cell(bx) + F.col("__ox"))
        .withColumn("__cy", cell(by) + F.col("__oy"))
        .drop("__ox", "__oy")
    )
    b_side = F.broadcast(b_keyed) if broadcast_b else b_keyed
    dx = F.col(ax) - F.col(bx)
    dy = F.col(ay) - F.col(by)
    return (
        a_keyed.join(b_side, ["__cx", "__cy"])
        .withColumn("d2", dx * dx + dy * dy)
        .filter(F.col("d2") <= F.lit(r * r))
        .drop("__cx", "__cy")
    )
