"""2-D skyline (Pareto frontier) without a global window.

The classic "cheapest-for-its-class" analytics operator: a point
(cost, benefit) is on the frontier iff no other point has cost ≤ and
benefit ≥ with at least one strict. The naive form is a quadratic
NOT-EXISTS self-join (which is exactly what the DuckDB oracle twin
runs, so the scalable plan is verified against the textbook
definition); this implementation is the partition-parallel form:

  1. collapse to distinct (cost, benefit) pairs, keep per-pair counts
     (one partial-agg'd shuffle over the fact);
  2. per distinct cost keep only the max benefit (same-cost dominance);
  3. bucket the cost axis into B fixed-width ranges; per-bucket maxima
     (B rows) are collected and their strict-prefix running max is
     broadcast back as a literal array — the cross-bucket dominance
     test costs O(B) driver work, never a global sort;
  4. inside each bucket a PARTITIONED window computes the running
     strict-predecessor max; a pair survives iff its benefit exceeds
     both the in-bucket prefix and the previous buckets' broadcast max.

Every window is partitioned by bucket — no unpartitioned window
anywhere (the registry-wide plan contract), so the frontier pass
scales to any fact size: the only driver-side state is B integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def skyline_2d(
    df: DataFrame,
    cost_col: str,
    benefit_col: str,
    n_buckets: int = 64,
) -> DataFrame:
    """Pareto frontier minimizing ``cost_col``, maximizing
    ``benefit_col``. Returns (cost, benefit, n_rows) — one row per
    frontier point with the count of input rows sitting exactly on
    it — ordered by cost ascending."""
    # a NULL cost/benefit has no place on a dominance frontier (and
    # NULL ordering differs between engines): rows missing either
    # dimension are excluded from the screen
    pairs = (
        df.filter(
            F.col(cost_col).isNotNull() & F.col(benefit_col).isNotNull()
        )
        .groupBy(
            F.col(cost_col).alias("cost"), F.col(benefit_col).alias("benefit")
        )
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    # same-cost dominance: only the max-benefit pair per cost survives
    best = pairs.groupBy("cost").agg(
        F.max("benefit").alias("benefit"),
        F.max_by("n_rows", "benefit").alias("n_rows"),
    )
    lo, hi = best.agg(F.min("cost"), F.max("cost")).first()
    if lo is None:
        return best.select("cost", "benefit", "n_rows")
    width = (float(hi) - float(lo)) / n_buckets or 1.0
    bucketed = best.withColumn(
        "__b",
        F.least(
            F.floor((F.col("cost") - F.lit(float(lo))) / F.lit(width)),
            F.lit(n_buckets - 1),
        ).cast("int"),
    )
    # strict-prefix maxima across buckets: B rows to the driver, a
    # B-length literal array back — O(B) state, fact never collected
    bmax = {
        r["__b"]: r["m"]
        for r in bucketed.groupBy("__b").agg(F.max("benefit").alias("m")).collect()
    }
    prefix = []
    run = None
    for b in range(n_buckets):
        prefix.append(run)
        if b in bmax:
            run = max(run, bmax[b]) if run is not None else bmax[b]
    # literals keep the benefit column's NATIVE type: a long cast here
    # would truncate fractional benefits and let a point dominated by
    # an earlier-bucket fractional max (5.5 vs 5.2) survive the frontier
    btype = best.schema["benefit"].dataType.simpleString()
    prefix_arr = F.array(
        *[
            F.lit(p).cast(btype) if p is not None else F.lit(None).cast(btype)
            for p in prefix
        ]
    )
    w = (
        Window.partitionBy("__b")
        .orderBy(F.asc("cost"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # greatest() skips NULLs (returns NULL only when both sides are),
    # so no sentinel literal is needed — the dominance bound keeps the
    # benefit column's exact type end to end
    guarded = bucketed.select(
        "cost",
        "benefit",
        "n_rows",
        F.greatest(
            F.max("benefit").over(w),
            F.element_at(prefix_arr, F.col("__b") + 1),
        ).alias("__dom"),
    )
    return (
        guarded.filter(
            F.col("__dom").isNull() | (F.col("benefit") > F.col("__dom"))
        )
        .select("cost", "benefit", "n_rows")
        .orderBy("cost")
    )
