"""Oracle parity for the demoted query tail.

The external correctness harness walks ``queries()`` in insertion order
with a ~50-query budget, so the queries in ``plans.DEMOTED`` (every one
driver-green in a previous CORRECTNESS_r*.json) no longer receive a fresh
driver-checked row each round. This test preserves the same differential
evidence locally: run each demoted query AT THE DRIVER'S OWN OPERATING
POINT (sf=0.01 — a smaller sf could in principle miss value-canonical
edges like r03's q43 HUGEINT cast) and compare row count, sorted column
names, and the order-insensitive canonical value hash against its DuckDB
oracle — the identical comparison tools/diffcheck.py (and the driver)
performs.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from diffcheck import TABLES, canon_hash  # noqa: E402

from etl_dag_paris_velib_spark.plans import DEMOTED, REGISTRY  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def test_demoted_queries_are_at_the_tail():
    names = list(REGISTRY.specs)
    assert names[-len(DEMOTED) :] == list(DEMOTED)
    # everything that has never had a driver correctness row sits in the
    # checked window (first 50 entries)
    assert len(names) - len(DEMOTED) <= 50


# As of round 7 the sweep covers the WINDOW specs too (everything in the
# registry): window specs whose driver row predates a code change — or
# that never had one — get the same local differential evidence as the
# demoted tail, and nothing can fall through a rotation gap. The extra
# cost over the old DEMOTED+NEW_THIS_ROUND split is the ~50 window specs,
# a couple of minutes at sf0.01.
WINDOW = tuple(n for n in REGISTRY.specs if n not in set(DEMOTED))


@pytest.mark.parametrize("name", DEMOTED + WINDOW)
def test_demoted_query_matches_oracle(spark, oracle_con, name):
    spec = REGISTRY.specs[name]
    assert spec.oracle is not None, f"{name} demoted without an oracle"
    sdf = spec.fn(spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    res = oracle_con.execute(spec.oracle)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert len(srows) == len(drows), f"{name}: rows {len(srows)} vs {len(drows)}"
    assert sorted(scols) == sorted(dcols), f"{name}: schema {sorted(scols)} vs {sorted(dcols)}"
    assert canon_hash(scols, srows) == canon_hash(dcols, drows), (
        f"{name}: value hash mismatch"
    )
