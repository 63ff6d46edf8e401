"""Shuffle-volume regression gate (the r05 verdict's #5 ask).

SHUFFLE.md records measured per-query shuffle bytes but nothing failed on
regression. This test re-measures the top shuffle movers at sf0.01 and
fails when a plan change DOUBLES a query's shuffle write or read bytes
against the ledger (tools/shuffle_budget.json). Unlike wall time, shuffle
bytes are plan-shaped and nearly deterministic — host steal can't flake
them — so a tight multiplicative bound is safe; a small absolute floor
absorbs AQE partition-coalescing jitter on the tiny queries.

Runs in a SUBPROCESS (fresh JVM) for two reasons: job-group attribution
must not see stages from other tests, and the LSH pair-set cache (q21)
must build exactly once per session — Spark 4.1.2 cannot rebuild a
pandas-UDF-bearing cache twice (verify notes).

To re-record after a DELIBERATE plan change:
    python tools/shufflemeter.py /root/testdata/sf0.01 --json /tmp/m.json \
        <names...>   # then copy sw/sr into tools/shuffle_budget.json
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BUDGET_PATH = os.path.join(ROOT, "tools", "shuffle_budget.json")
SF_DIR = "/root/testdata/sf0.01"
SLACK_BYTES = 256 * 1024  # AQE coalescing jitter floor for tiny queries


@pytest.fixture(scope="module")
def measured():
    with open(BUDGET_PATH) as f:
        budget = json.load(f)
    out_path = "/tmp/shuffle_measure_ci.json"
    if os.path.exists(out_path):
        os.remove(out_path)
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(ROOT, "tools", "shufflemeter.py"),
            SF_DIR,
            "--json",
            out_path,
            *sorted(budget),
        ],
        cwd=ROOT,
        capture_output=True,
        text=True,
        timeout=900,
        env={**os.environ, "SPARK_GRAFT_CPUS": "8"},
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    with open(out_path) as f:
        return budget, json.load(f)


def test_budget_covers_top_movers():
    with open(BUDGET_PATH) as f:
        budget = json.load(f)
    assert len(budget) >= 10
    for name, b in budget.items():
        assert b["sw"] >= 0 and b["sr"] >= 0, name


def test_shuffle_bytes_within_budget(measured):
    budget, m = measured
    over = []
    for name, b in budget.items():
        got = m.get(name)
        assert got is not None, f"{name}: no stages attributed"
        for key in ("sw", "sr"):
            limit = max(2.0 * b[key], b[key] + SLACK_BYTES)
            if got[key] > limit:
                over.append(
                    f"{name}.{key}: {got[key]:.0f}B > limit {limit:.0f}B "
                    f"(budget {b[key]:.0f}B) — a plan change increased "
                    "shuffle volume; fix the plan or re-record the ledger"
                )
    assert not over, "\n".join(over)
