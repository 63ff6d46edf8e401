"""Data-quality constraint validation — declarative expectations over a
DataFrame, evaluated in ONE pass.

The reference pins its contract implicitly: a fixed Postgres DDL
(`/root/reference/airflow/dags/etl_dag.py:116-139, 259-283`) silently
coerces whatever pandas hands it (SURVEY §1.4 — "mismatches are silently
coerced"). This module makes the contract explicit and *measured*: each
rule is a boolean Column; `quality_report` folds every rule into a single
aggregate pass (no per-rule scan), and `check` raises when violations
exceed a threshold — the dbt-test / expectations shape, Spark-native.

Scale: one scan, map-side partial aggregation of |rules| counters, a
1-row result. Referential rules (`fk_violations`) are the one exception:
they need an anti-join, whose build side (the dim key set) broadcasts.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    """A named expectation: `violated` is a boolean Column that is true
    on the rows BREAKING the expectation."""

    name: str
    violated: Column


def not_null(col: str) -> Rule:
    return Rule(f"{col}_not_null", F.col(col).isNull())


def unique_key(*cols: str) -> Rule:
    """Marker rule for a uniqueness constraint — evaluated separately in
    `quality_report` (uniqueness is a property of the whole column, not a
    row predicate)."""
    return Rule("unique:" + ",".join(cols), F.lit(False))


def in_set(col: str, allowed: tuple) -> Rule:
    return Rule(
        f"{col}_in_set",
        ~F.col(col).isin(*allowed) | F.col(col).isNull(),
    )


def in_range(col: str, lo, hi) -> Rule:
    return Rule(
        f"{col}_in_range",
        (F.col(col) < F.lit(lo)) | (F.col(col) > F.lit(hi)) | F.col(col).isNull(),
    )


def matches(col: str, pattern: str) -> Rule:
    return Rule(f"{col}_matches", ~F.col(col).rlike(pattern) | F.col(col).isNull())


def quality_report(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """(rule, n_violations, n_rows) — every row-predicate rule counted in
    ONE aggregate over ONE scan; `unique_key` rules each add a grouped
    duplicate count (their own shuffle, unavoidable: uniqueness is
    global)."""
    row_rules = [r for r in rules if not r.name.startswith("unique:")]
    uniq_rules = [r for r in rules if r.name.startswith("unique:")]

    aggs = [F.count(F.lit(1)).alias("__n")]
    for r in row_rules:
        aggs.append(
            F.sum(F.when(r.violated, 1).otherwise(0)).alias(r.name)
        )
    wide = df.agg(*aggs)
    per_rule = [
        F.struct(
            F.lit(r.name).alias("rule"),
            F.col(r.name).alias("n_violations"),
            F.col("__n").alias("n_rows"),
        )
        for r in row_rules
    ]
    out = wide.select(F.explode(F.array(*per_rule)).alias("s")).select(
        "s.rule", "s.n_violations", "s.n_rows"
    )
    for r in uniq_rules:
        cols = r.name.split(":", 1)[1].split(",")
        dup = (
            df.groupBy(*cols)
            .agg(F.count(F.lit(1)).alias("c"))
            .agg(
                F.coalesce(
                    F.sum(F.when(F.col("c") > 1, F.col("c"))), F.lit(0)
                ).alias("n_violations"),
                F.sum("c").alias("n_rows"),
            )
            .select(
                F.lit(r.name).alias("rule"), "n_violations", "n_rows"
            )
        )
        out = out.unionByName(dup)
    return out


def fk_violations(
    fact: DataFrame, fact_key: str, dim: DataFrame, dim_key: str
) -> DataFrame:
    """(rule, n_violations, n_rows) for referential integrity: fact rows
    whose key has no parent in dim.

    ONE scan of the fact side: a broadcast LEFT join marks matched keys
    and a single aggregate counts both the total and the orphans (an
    anti-join formulation needs a second fact scan — or a cross join of
    two 1-row aggregates, which plans as a nested-loop node the plan
    lint rightly rejects)."""
    marked = fact.join(
        F.broadcast(
            dim.select(F.col(dim_key).alias(fact_key))
            .distinct()
            .withColumn("__hit", F.lit(1))
        ),
        fact_key,
        "left",
    )
    return marked.agg(
        F.sum(F.when(F.col("__hit").isNull(), 1).otherwise(0)).alias(
            "n_violations"
        ),
        F.count(F.lit(1)).alias("n_rows"),
    ).select(F.lit(f"fk:{fact_key}").alias("rule"), "n_violations", "n_rows")


def check(report: DataFrame, max_violation_frac: float = 0.0) -> None:
    """Raise ValueError if any rule's violation fraction exceeds the
    threshold. Driver-side on the |rules|-row report — never on data."""
    bad = [
        (r["rule"], r["n_violations"], r["n_rows"])
        for r in report.collect()
        if r["n_rows"] and r["n_violations"] / r["n_rows"] > max_violation_frac
    ]
    if bad:
        raise ValueError(f"quality check failed: {bad}")
