"""As-of join differential vs pandas merge_asof: backward/forward,
with and without tolerance, over randomized multi-key data."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from etl_dag_paris_velib_spark.operators.asof import asof_join


@pytest.fixture(scope="module")
def frames():
    rng = np.random.default_rng(7)
    n_left, n_right = 300, 120
    left = pd.DataFrame(
        {
            "key": rng.integers(0, 5, n_left),
            "ts": rng.integers(0, 10_000, n_left).astype("datetime64[s]"),
            "l_id": np.arange(n_left),
        }
    )
    # unique (key, ts) on the right dodges pandas' tie ambiguity
    right = (
        pd.DataFrame(
            {
                "key": rng.integers(0, 5, n_right),
                "ts": rng.integers(0, 10_000, n_right).astype("datetime64[s]"),
                "r_id": np.arange(n_right),
                "payload": rng.normal(size=n_right).round(6),
            }
        )
        .drop_duplicates(["key", "ts"])
        .reset_index(drop=True)
    )
    return left, right


@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("tolerance", [None, 600])
def test_asof_matches_pandas(spark, frames, direction, tolerance):
    left_pd, right_pd = frames
    left = spark.createDataFrame(left_pd)
    right = spark.createDataFrame(right_pd)
    got_df = asof_join(
        left,
        right,
        on="key",
        ts="ts",
        right_cols=("payload",),
        right_id="r_id",
        direction=direction,
        tolerance_sec=tolerance,
    )
    got = {
        r.l_id: (r.r_id_asof, r.payload_asof) for r in got_df.collect()
    }

    want_pd = pd.merge_asof(
        left_pd.sort_values("ts", kind="stable"),
        right_pd.sort_values("ts", kind="stable"),
        on="ts",
        by="key",
        direction=direction,
        tolerance=None if tolerance is None else pd.Timedelta(seconds=tolerance),
    )
    for row in want_pd.itertuples():
        r_id = None if pd.isna(row.r_id) else int(row.r_id)
        payload = None if pd.isna(row.payload) else row.payload
        assert got[row.l_id] == (r_id, payload), (
            direction,
            tolerance,
            row.l_id,
        )
