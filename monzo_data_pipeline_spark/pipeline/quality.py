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
