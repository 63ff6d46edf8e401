"""Data-quality constraint operator (operators/quality.py): report
correctness on crafted violations, single-scan plan shape, and the
check() gate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_dag_paris_velib_spark.operators.quality import (
    check,
    fk_violations,
    in_range,
    in_set,
    matches,
    not_null,
    quality_report,
    unique_key,
)


@pytest.fixture()
def dirty(spark):
    return spark.createDataFrame(
        [
            (1, "O", 10.0, "a@x.io"),
            (2, "F", -5.0, "b@x.io"),      # range violation
            (2, "Z", 20.0, "nope"),        # dup key, bad status, bad email
            (None, "O", 30.0, None),       # null id, null email
        ],
        "id long, status string, price double, email string",
    )


def test_report_counts_each_rule(spark, dirty):
    rep = quality_report(
        dirty,
        [
            not_null("id"),
            in_set("status", ("O", "F")),
            in_range("price", 0, 100),
            matches("email", "^[a-z]+@[a-z.]+$"),
            unique_key("id"),
        ],
    )
    got = {r["rule"]: (r["n_violations"], r["n_rows"]) for r in rep.collect()}
    assert got["id_not_null"] == (1, 4)
    assert got["status_in_set"] == (1, 4)
    assert got["price_in_range"] == (1, 4)
    assert got["email_matches"] == (2, 4)
    # both rows of the duplicated key count as violations
    assert got["unique:id"] == (2, 4)


def test_row_rules_are_single_scan(spark, dirty):
    rep = quality_report(
        dirty, [not_null("id"), in_range("price", 0, 100)]
    )
    plan = rep._jdf.queryExecution().executedPlan().toString()
    # one aggregate pass, no shuffle of the input beyond the 1-row agg
    assert plan.count("Scan ExistingRDD") + plan.count("FileScan") == 1


def test_fk_violations_counts_orphans(spark):
    fact = spark.createDataFrame([(1,), (2,), (9,)], "k long")
    dim = spark.createDataFrame([(1,), (2,)], "pk long")
    row = fk_violations(fact, "k", dim, "pk").collect()[0]
    assert (row["rule"], row["n_violations"], row["n_rows"]) == ("fk:k", 1, 3)


def test_check_raises_over_threshold(spark, dirty):
    rep = quality_report(dirty, [not_null("id")])
    with pytest.raises(ValueError, match="id_not_null"):
        check(rep)
    # 25% violations pass a 50% threshold
    check(rep, max_violation_frac=0.5)
