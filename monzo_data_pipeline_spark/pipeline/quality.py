"""Data-quality gates for the medallion pipeline.

The reference has no data validation at all (and even swallows
transform failures, transform.py:13-16 — the bug SURVEY.md §7.4 tells
us not to copy). A pipeline feeding a 100 TB lake needs cheap,
aggregate-shaped checks that run as ONE job per table — never a
per-rule scan:
  * every rule below compiles to one conditional aggregate, so N
    rules over M rows cost one pass;
  * results come back as data (rule, violations), and `enforce`
    raises — quality failures fail the run loudly.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import types as T
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    name: str
    # predicate over a row: True = OK. Violations = rows where NOT pred.
    predicate: Column


def not_null(col: str) -> Rule:
    return Rule(f"not_null({col})", F.col(col).isNotNull())


def unique_key(df: DataFrame, keys: list[str]) -> DataFrame:
    """PK-uniqueness as its own (grouped) check: key values with >1 row.
    Not expressible as a row predicate — one groupBy job."""
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .select(*keys, "n")
    )


def in_range(col: str, lo=None, hi=None) -> Rule:
    pred = F.lit(True)
    if lo is not None:
        pred = pred & (F.col(col) >= lo)
    if hi is not None:
        pred = pred & (F.col(col) <= hi)
    return Rule(f"in_range({col},{lo},{hi})", pred)


def accepted_values(col: str, values: list) -> Rule:
    return Rule(f"accepted_values({col})", F.col(col).isin(values) | F.col(col).isNull())


def check(df: DataFrame, rules: list[Rule]) -> dict[str, int]:
    """Run all row-predicate rules in ONE aggregate pass.
    Returns {rule_name: violation_count}."""
    aggs = [
        F.count_if(~r.predicate).alias(r.name) for r in rules
    ]
    row = df.agg(*aggs).collect()[0]
    return {r.name: row[r.name] for r in rules}


def enforce(df: DataFrame, rules: list[Rule], table: str) -> None:
    """Raise if any rule has violations — quality failures fail the
    run (the anti-swallow policy)."""
    results = check(df, rules)
    bad = {k: v for k, v in results.items() if v > 0}
    if bad:
        raise ValueError(f"data-quality violations in {table}: {bad}")


def schema_drift(
    expected: T.StructType, actual: T.StructType
) -> list[dict[str, str]]:
    """Schema-drift report between a table's declared schema and an
    incoming batch: added / removed / type-changed columns (nested
    structs compared by their full dataType string).

    The reference has no schema evolution at all (DDL executed once,
    SURVEY §1.2); a 100 TB lake ingesting third-party feeds needs the
    drift REPORT even when the policy is strict. Pure metadata work —
    no job runs.
    """
    exp = {f.name: f.dataType.simpleString() for f in expected.fields}
    act = {f.name: f.dataType.simpleString() for f in actual.fields}
    report: list[dict[str, str]] = []
    for name in sorted(set(act) - set(exp)):
        report.append({"column": name, "change": "added", "type": act[name]})
    for name in sorted(set(exp) - set(act)):
        report.append({"column": name, "change": "removed", "type": exp[name]})
    for name in sorted(set(exp) & set(act)):
        if exp[name] != act[name]:
            report.append(
                {
                    "column": name,
                    "change": "type_changed",
                    "type": f"{exp[name]} -> {act[name]}",
                }
            )
    return report


def enforce_schema_policy(
    expected: T.StructType,
    actual: T.StructType,
    allow_additive: bool = True,
) -> list[dict[str, str]]:
    """Gate a batch on its drift report: additive columns pass when
    `allow_additive` (they land NULL for old rows under mergeSchema
    reads — sources/io.py::read_with_schema_merge); removals and type
    changes always raise (silent type coercion is the reference's
    INTEGER→REAL money bug, SURVEY §7.1)."""
    report = schema_drift(expected, actual)
    fatal = [
        r
        for r in report
        if r["change"] in ("removed", "type_changed")
        or (r["change"] == "added" and not allow_additive)
    ]
    if fatal:
        raise ValueError(f"schema drift rejected: {fatal}")
    return report


# ---------------------------------------------------------------------------
# Round 2 — table profiling and cross-warehouse reconciliation.
# ---------------------------------------------------------------------------


def profile_table(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Column-level data profile — the ANALYZE TABLE / dbt-docs stats
    pass: per column, row count, null count, exact distinct count, and
    min/max rendered as strings (one schema for every column type).

    ONE scan and one partial-aggregated shuffle: the per-column stats
    are computed as a single wide agg and unpivoted cluster-side (no
    per-column jobs, no collect — profiling 100 TB is one pass).
    Exact countDistinct keeps it oracle-checkable; swap in
    approx_count_distinct at scale where ±2 % is fine.
    """
    cols = columns or df.columns
    # r10 (guide §2.3 + §2.5): project to the profiled columns, then
    # raise the parallelism floor before the wide agg — the multi-
    # countDistinct plans an Expand (len(cols)+1 copies of every row)
    # INSIDE the scan stage, and a single-row-group file runs that
    # whole blow-up on one core. The projection keeps the fan-out
    # exchange to the profiled bytes only.
    from ..operators.partitioning import fan_out

    df = fan_out(df.select(*cols))
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            F.countDistinct(c).alias(f"{c}__distinct"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    wide = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"{c}__n").alias("n_rows"),
                F.col(f"{c}__nulls").alias("n_nulls"),
                F.col(f"{c}__distinct").alias("n_distinct"),
                F.col(f"{c}__min").alias("min_str"),
                F.col(f"{c}__max").alias("max_str"),
            )
            for c in cols
        ]
    )
    return wide.select(F.explode(per_col).alias("p")).select("p.*")


def reconciliation_checksums(
    df: DataFrame, int_cols: list[str], bucket_key: str, n_buckets: int = 32
) -> DataFrame:
    """Order-independent per-bucket checksums for cross-warehouse
    reconciliation (primary ↔ replica drift detection at 100 TB
    without moving data): hash each row's INTEGER columns with the
    engine-agnostic polynomial fold, sum hashes per hash-bucket of the
    key, compare bucket tables between systems — a mismatched bucket
    narrows the diff to 1/n_buckets of the table.

    Integer columns only by design: float/str renderings differ
    across engines, integer arithmetic cannot. Σ hash over a bucket is
    order-independent (addition commutes), so partitioning/layout
    differences between the two warehouses never matter.
    """
    h = F.lit(0).cast("long")
    for c in int_cols:
        h = (h * 131 + F.pmod(F.coalesce(F.col(c).cast("long"), F.lit(-1)), F.lit(2147483647))) % 2147483647
    return (
        df.select(F.pmod(F.col(bucket_key).cast("long"), F.lit(n_buckets)).alias("bucket"), h.alias("h"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            # accumulate in DECIMAL(38,0): a plain long SUM overflows at
            # ~3e10 rows/bucket of 2^31-scale hashes (exactly the 100 TB
            # design point) while a comparison warehouse summing in
            # 128-bit stays exact — every bucket would report spurious
            # drift. Fold back mod 2^31-1 for a compact int64 checksum.
            (F.sum(F.col("h").cast("decimal(38,0)")) % F.lit(2147483647))
            .cast("long")
            .alias("checksum"),
        )
    )


def correlation_matrix(
    df: DataFrame, cols: list[str], scale: int = 100
) -> DataFrame:
    """Pairwise Pearson correlation over numeric columns — the
    multi-column half of the profiling pass (feature redundancy /
    leakage screens over a training table).

    ONE scan, one wide partial-aggregated agg: every pairwise moment
    (Σxᵢ, Σxᵢ², Σxᵢxⱼ) comes from the same pass; the pair explode is
    cluster-side on the 1-row result. Values are quantized to integers
    (floor(x·scale)) and moments accumulate in DECIMAL(38,0), so the
    sums are EXACT at lake row counts; the final correlation uses only
    division and IEEE-correctly-rounded sqrt on those exact sums —
    bit-identical across engines (no log, no float accumulation
    order), emitted as floor(corr·10⁶). Zero-variance columns yield
    NULL (correlation undefined).
    """
    q = {c: F.floor(F.col(c) * scale).cast("decimal(38,0)") for c in cols}
    aggs = [F.count(F.lit(1)).cast("decimal(38,0)").alias("__n")]
    for i, c in enumerate(cols):
        aggs.append(F.sum(q[c]).alias(f"__s_{i}"))
        aggs.append(F.sum(q[c] * q[c]).alias(f"__ss_{i}"))
    for i in range(len(cols)):
        for j in range(i + 1, len(cols)):
            aggs.append(F.sum(q[cols[i]] * q[cols[j]]).alias(f"__sp_{i}_{j}"))
    wide = df.agg(*aggs)

    def corr_micro(i: int, j: int):
        n = F.col("__n")
        num = (n * F.col(f"__sp_{i}_{j}") - F.col(f"__s_{i}") * F.col(f"__s_{j}")).cast(
            "double"
        )
        d_i = (n * F.col(f"__ss_{i}") - F.col(f"__s_{i}") * F.col(f"__s_{i}")).cast(
            "double"
        )
        d_j = (n * F.col(f"__ss_{j}") - F.col(f"__s_{j}") * F.col(f"__s_{j}")).cast(
            "double"
        )
        return F.when(
            (d_i > 0) & (d_j > 0),
            F.floor(num / F.sqrt(d_i) / F.sqrt(d_j) * 1_000_000).cast("long"),
        )

    pairs = F.array(
        *[
            F.struct(
                F.lit(cols[i]).alias("col_a"),
                F.lit(cols[j]).alias("col_b"),
                corr_micro(i, j).alias("corr_micro"),
            )
            for i in range(len(cols))
            for j in range(i + 1, len(cols))
        ]
    )
    return wide.select(F.explode(pairs).alias("p")).select("p.*")


def rule_screen(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Cluster-side variant of :func:`check`: the same one-pass wide
    aggregate, unpivoted to (check_name, n_violations) rows so the
    report is itself a DataFrame (joinable, storable, oracle-checkable)
    instead of a driver dict."""
    wide = df.agg(
        *[F.count_if(~r.predicate).alias(f"c{i}") for i, r in enumerate(rules)]
    )
    return wide.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r.name).alias("check_name"),
                        F.col(f"c{i}").alias("n_violations"),
                    )
                    for i, r in enumerate(rules)
                ]
            )
        ).alias("s")
    ).select("s.check_name", "s.n_violations")


def fk_orphan_count(
    fact: DataFrame, dim: DataFrame, fact_key: str, dim_key: str, name: str
) -> DataFrame:
    """Referential-integrity screen: count of fact rows whose FK has
    no match in the dimension (the analytical form of the reference's
    silver-layer FOREIGN KEY declarations,
    /root/reference/src/sql/create_silver_layer.sql:17-18, which
    SQLite never actually enforces without a pragma).

    Left-anti join keyed on the FK — shuffle-partitioned by key, dim
    side broadcast when small (AQE decides) — then a count: one row
    out. NULL FKs are orphans by this screen's definition (they
    reference nothing)."""
    orphans = fact.join(
        dim.select(F.col(dim_key).alias(fact_key)).distinct(),
        on=fact_key,
        how="left_anti",
    )
    return orphans.agg(F.count(F.lit(1)).alias("n_violations")).select(
        F.lit(name).alias("check_name"), "n_violations"
    )


def chi_square_independence(
    df: DataFrame, a_col: str, b_col: str
) -> DataFrame:
    """Chi-square test of independence between two bounded-domain
    categorical columns — the drift screen that catches a correlated
    split or a source whose language mix shifted (the contingency twin
    of ks_drift's two-sample test).

    Determinism: each cell's (o−e)²/e term is computed in ONE fixed
    IEEE-double operation order from exact integer counts, then
    floored to ppm — so the final SUM is over exact BIGINTs
    (order-independent under any partitioning, identical in the
    DuckDB twin). Zero-observed cells contribute their full expected
    mass, so the full L×S cross (two broadcast-small aggregate frames)
    is materialized, never the fact×fact.

    Output: one row (n_cells, dof, chi2_ppm, cramers_v_ppm).
    Plan: three partial-agg'd passes over the fact (cells, row
    totals, col totals — Catalyst shares the scan), then O(L·S)
    broadcast-side arithmetic."""
    cells = df.groupBy(a_col, b_col).agg(F.count(F.lit(1)).alias("o"))
    rt = df.groupBy(a_col).agg(F.count(F.lit(1)).alias("__nl"))
    ct = df.groupBy(b_col).agg(F.count(F.lit(1)).alias("__ns"))
    n = df.agg(F.count(F.lit(1)).alias("__nn"))
    full = (
        rt.crossJoin(F.broadcast(ct))
        .join(cells, [a_col, b_col], "left")
        .crossJoin(F.broadcast(n))
    )
    o = F.coalesce(F.col("o"), F.lit(0)).cast("double")
    e = (F.col("__nl") * F.col("__ns")).cast("double") / F.col("__nn").cast(
        "double"
    )
    term = F.floor((o - e) * (o - e) / e * F.lit(1_000_000.0)).cast("long")
    agg = full.agg(
        F.count(F.lit(1)).alias("n_cells"),
        (
            (F.count_distinct(F.col(a_col)) - 1)
            * (F.count_distinct(F.col(b_col)) - 1)
        ).alias("dof"),
        F.sum(term).alias("chi2_ppm"),
        F.max("__nn").alias("__n"),
        F.least(
            F.count_distinct(F.col(a_col)) - 1,
            F.count_distinct(F.col(b_col)) - 1,
        ).alias("__k"),
    )
    v = F.floor(
        F.sqrt(
            F.col("chi2_ppm").cast("double")
            / F.lit(1_000_000.0)
            / (F.col("__n") * F.col("__k")).cast("double")
        )
        * F.lit(1_000_000.0)
    ).cast("long")
    # an empty input has no contingency table: count_distinct()−1
    # would read −1·−1 = dof 1 — emit NULLs instead (same CASE in the
    # DuckDB twin)
    return agg.select(
        "n_cells",
        F.when(F.col("n_cells") > 0, F.col("dof")).alias("dof"),
        "chi2_ppm",
        F.when((F.col("n_cells") > 0) & (F.col("__k") > 0), v).alias(
            "cramers_v_ppm"
        ),
    )


def calibration_bins(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Reliability / calibration table for a classifier (r9): bin the
    integer scores into `n_bins` equal-width bands over the observed
    [min, max] range and report, per band, the row count, the mean
    score (milli-units) and the positive-label rate (ppm) — the
    binned curve an ECE / reliability diagram reads, and the label-QA
    step a training-data pipeline runs on its quality classifier
    before trusting its accept threshold.

    All integer arithmetic: band = (score − lo)·B DIV (hi − lo + 1)
    (equal-width, clamp-free by construction since score ≤ hi), mean
    and rate as floor'd fixed-point DIVs — hash-checkable
    cross-engine. r10 plan shape (guide §2.3 "aggregate before you
    shuffle" + §2.4 one-exchange sharing): rows collapse to the
    DISTINCT-score grain first — count and Σlabel partial-aggregate
    map-side behind ONE exchange, the min/max range branch REUSES
    that exchange instead of re-evaluating the (often expensive,
    e.g. tokenize-and-hash) score expression a second time, and the
    final n_bins-row rollup runs over the value-grain table. Σscore
    per bin = Σ(s·count_s) exactly; output bounded by n_bins."""
    # range and bins read the SAME null-filtered frame: a null-label
    # row must not widen [lo, hi] while being excluded from every
    # band (r10 fix; the oracle twin mirrors the filter)
    scored = df.filter(
        F.col(score_col).isNotNull() & F.col(label_col).isNotNull()
    )
    pc = scored.groupBy(
        F.col(score_col).cast("long").alias("__s")
    ).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(F.col(label_col).cast("boolean").cast("long")).alias(
            "__y"
        ),
    )
    rng = pc.agg(
        F.min("__s").alias("__lo"), F.max("__s").alias("__hi")
    )
    binned = pc.crossJoin(F.broadcast(rng)).select(
        F.expr(
            f"(__s - __lo) * {n_bins} DIV (__hi - __lo + 1)"
        ).alias("bin"),
        "__n",
        (F.col("__s") * F.col("__n")).alias("__sn"),
        "__y",
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.sum("__n").alias("n"),
            F.sum("__sn").alias("__ss"),
            F.sum("__y").alias("__pos"),
        )
        .select(
            "bin",
            "n",
            F.expr(
                "CAST(CAST(__ss AS DECIMAL(38,0)) * 1000"
                " DIV n AS BIGINT)"
            ).alias("mean_score_milli"),
            F.expr(
                "CAST(CAST(__pos AS DECIMAL(38,0)) * 1000000"
                " DIV n AS BIGINT)"
            ).alias("pos_rate_ppm"),
        )
        .orderBy("bin")
    )


def cohens_kappa(df: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """Cohen's kappa between two (boolean-like) labelers — the
    inter-annotator / model-vs-heuristic agreement statistic a
    labeling pipeline gates label quality on, exact in integers:

        kappa = (p_o − p_e) / (1 − p_e)
              = (po·N − Σ_k ra_k·rb_k) / (N² − Σ_k ra_k·rb_k)

    with po the agreement count and ra/rb the per-class marginals —
    multiplied through by N² so the ppm output is one floor DIV of
    exact DECIMAL(38,0) products. One aggregate over the 2×2 (or
    k×k) contingency; output is a single row (n, po_ppm, pe_ppm,
    kappa_ppm; kappa NULL when pe == 1, the degenerate
    single-class case)."""
    pairs = (
        df.filter(F.col(a_col).isNotNull() & F.col(b_col).isNotNull())
        .select(
            F.col(a_col).cast("boolean").cast("long").alias("__a"),
            F.col(b_col).cast("boolean").cast("long").alias("__b"),
        )
        .groupBy("__a", "__b")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    dec = "decimal(38,0)"
    stats = pairs.agg(
        F.sum("__n").alias("__N"),
        F.sum(F.when(F.col("__a") == F.col("__b"), F.col("__n"))).alias(
            "__po"
        ),
        # Σ_k ra_k·rb_k from the contingency cells: Σ_k (Σ_j n_kj)·(Σ_i n_ik)
        # expands to Σ over cell pairs; compute the marginals instead
        # via two conditional sums per class (boolean domain: k ∈ {0,1})
        F.sum(F.when(F.col("__a") == 1, F.col("__n"))).alias("__ra1"),
        F.sum(F.when(F.col("__b") == 1, F.col("__n"))).alias("__rb1"),
    )
    return stats.select(
        F.col("__N").alias("n"),
        F.expr(
            "CAST(CAST(coalesce(__po, 0) AS DECIMAL(38,0)) * 1000000"
            " DIV __N AS BIGINT)"
        ).alias("po_ppm"),
        F.expr(
            "CAST((CAST(coalesce(__ra1,0) AS DECIMAL(38,0))"
            " * coalesce(__rb1,0)"
            " + CAST(__N - coalesce(__ra1,0) AS DECIMAL(38,0))"
            " * (__N - coalesce(__rb1,0))) * 1000000"
            " DIV (CAST(__N AS DECIMAL(38,0)) * __N) AS BIGINT)"
        ).alias("pe_ppm"),
        F.expr(
            "CASE WHEN CAST(__N AS DECIMAL(38,0)) * __N"
            " = CAST(coalesce(__ra1,0) AS DECIMAL(38,0))"
            "   * coalesce(__rb1,0)"
            "   + CAST(__N - coalesce(__ra1,0) AS DECIMAL(38,0))"
            "   * (__N - coalesce(__rb1,0)) THEN NULL ELSE "
            "CAST((CAST(coalesce(__po, 0) AS DECIMAL(38,0)) * __N"
            "  - (CAST(coalesce(__ra1,0) AS DECIMAL(38,0))"
            "     * coalesce(__rb1,0)"
            "     + CAST(__N - coalesce(__ra1,0) AS DECIMAL(38,0))"
            "     * (__N - coalesce(__rb1,0)))) * 1000000"
            " DIV (CAST(__N AS DECIMAL(38,0)) * __N"
            "  - (CAST(coalesce(__ra1,0) AS DECIMAL(38,0))"
            "     * coalesce(__rb1,0)"
            "     + CAST(__N - coalesce(__ra1,0) AS DECIMAL(38,0))"
            "     * (__N - coalesce(__rb1,0)))) AS BIGINT) END"
        ).alias("kappa_ppm"),
    )
