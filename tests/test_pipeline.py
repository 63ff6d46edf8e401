"""End-to-end pipeline-runner tests: both reference branches in one app,
observe()-based rows_inserted parity, retry behavior, and idempotent
re-runs via dynamic partition overwrite."""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime

import pytest

from etl_dag_paris_velib_spark.pipeline import run_branch, run_pipeline
from etl_dag_paris_velib_spark.sources.fetcher import FileFetcher


RUN_TS = datetime(2025, 2, 1, 9, 0, 0)


@dataclass
class FlakyFetcher:
    """Fails the first ``fail_times`` fetches — the reference's retry case
    (etl_dag.py:331-332)."""

    inner: FileFetcher
    fail_times: int
    calls: int = 0

    def fetch_to_bronze(self, bronze_dir, name, ts):
        self.calls += 1
        if self.calls <= self.fail_times:
            raise ConnectionError("transient fetch failure")
        return self.inner.fetch_to_bronze(bronze_dir, name, ts)


def test_two_branch_pipeline(spark, tmp_path, fixtures_dir):
    res = run_pipeline(
        spark,
        {
            "weather": FileFetcher(f"{fixtures_dir}/weather.json"),
            "station_status": FileFetcher(f"{fixtures_dir}/station_status.json"),
        },
        bronze_dir=str(tmp_path / "bronze"),
        out_dir=str(tmp_path / "gold"),
        run_ts=RUN_TS,
    )
    assert set(res) == {"weather", "station_status"}
    # observe() metric equals the sink's actual row count (reference
    # rows_inserted XCom, s3_to_postgres.py:85-92)
    for r in res.values():
        written = spark.read.parquet(r.output_path)
        assert written.count() == r.rows_inserted
        assert r.rows_inserted > 0
        assert r.attempts == 1
    # weather branch lands exactly one row per poll (etl_dag.py:85-99)
    assert res["weather"].rows_inserted == 1
    # partition layout carries the run hour
    st = spark.read.parquet(res["station_status"].output_path)
    assert {str(r.ingest_date) for r in st.select("ingest_date").distinct().collect()} == {
        "2025-02-01"
    }


def test_rerun_is_idempotent(spark, tmp_path, fixtures_dir):
    fetchers = {"station_status": FileFetcher(f"{fixtures_dir}/station_status.json")}
    kwargs = dict(
        bronze_dir=str(tmp_path / "bronze"), out_dir=str(tmp_path / "gold"), run_ts=RUN_TS
    )
    first = run_pipeline(spark, fetchers, **kwargs)["station_status"]
    second = run_pipeline(spark, fetchers, **kwargs)["station_status"]
    # dynamic partition overwrite: the retry/re-run replaces its own
    # partition instead of double-appending (the reference double-inserts)
    final = spark.read.parquet(second.output_path).count()
    assert final == first.rows_inserted == second.rows_inserted


def test_retry_recovers_from_transient_failure(spark, tmp_path, fixtures_dir):
    flaky = FlakyFetcher(FileFetcher(f"{fixtures_dir}/weather.json"), fail_times=2)
    res = run_branch(
        spark,
        "weather",
        flaky,
        bronze_dir=str(tmp_path / "bronze"),
        out_dir=str(tmp_path / "gold"),
        run_ts=RUN_TS,
        retries=3,
    )
    assert res.attempts == 3
    assert res.rows_inserted == 1


def test_retry_budget_exhausted(spark, tmp_path, fixtures_dir):
    flaky = FlakyFetcher(FileFetcher(f"{fixtures_dir}/weather.json"), fail_times=99)
    with pytest.raises(RuntimeError, match="after 3 attempts"):
        run_branch(
            spark,
            "weather",
            flaky,
            bronze_dir=str(tmp_path / "bronze"),
            out_dir=str(tmp_path / "gold"),
            run_ts=RUN_TS,
            retries=2,
        )
