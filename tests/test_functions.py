"""Unit tests for the text/vector column primitives and the as-of join."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from etl_dag_paris_velib_spark.functions import (
    cosine_similarity,
    doc_fingerprint,
    minhash_signature,
    shingles,
    simhash64,
    token_count,
    tokens,
)
from etl_dag_paris_velib_spark.operators.asof import asof_join


def test_tokens_and_shingles(spark):
    df = spark.createDataFrame([("The quick brown fox jumps",)], ["text"])
    row = df.select(
        tokens("text").alias("toks"),
        shingles("text", 3).alias("sh"),
        token_count("text").alias("n"),
    ).first()
    assert row.toks == ["the", "quick", "brown", "fox", "jumps"]
    assert row.sh == ["the quick brown", "quick brown fox", "brown fox jumps"]
    assert row.n == 5


def test_simhash64_basic(spark):
    df = spark.createDataFrame(
        [("the quick brown fox",), ("the quick brown fox",), ("completely different words here",)],
        ["text"],
    )
    rows = df.select(simhash64(tokens("text")).alias("h")).collect()
    assert rows[0].h == rows[1].h  # deterministic
    assert rows[0].h != rows[2].h
    assert isinstance(rows[0].h, int)


def test_minhash_identical_docs_share_signature(spark):
    df = spark.createDataFrame(
        [("alpha beta gamma delta epsilon",), ("alpha beta gamma delta epsilon",)],
        ["text"],
    )
    rows = df.select(minhash_signature(shingles("text"), k=8).alias("sig")).collect()
    assert rows[0].sig == rows[1].sig
    assert len(rows[0].sig) == 8


def test_doc_fingerprint_normalizes_whitespace_and_case(spark):
    df = spark.createDataFrame([("Hello  World",), ("hello world",)], ["text"])
    rows = df.select(doc_fingerprint("text").alias("fp")).collect()
    assert rows[0].fp == rows[1].fp


def test_cosine_similarity(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0], [1.0, 0.0]), ([1.0, 0.0], [0.0, 1.0])], ["a", "b"]
    )
    rows = df.select(cosine_similarity("a", "b").alias("c")).collect()
    assert abs(rows[0].c - 1.0) < 1e-12
    assert abs(rows[1].c) < 1e-12


def test_asof_join_carries_matched_row_atomically(spark):
    """The newest right row has a NULL payload column; the as-of output must
    carry THAT row's (NULL, ts, id) — not splice an older non-null payload."""
    ts = datetime.datetime
    left = spark.createDataFrame(
        [(1, ts(2024, 1, 1, 12), "L")], ["k", "ts", "lval"]
    )
    right = spark.createDataFrame(
        [
            (1, ts(2024, 1, 1, 10), 10, "old-payload"),
            (1, ts(2024, 1, 1, 11), 11, None),  # newest prior row, NULL payload
        ],
        ["k", "ts", "rid", "payload"],
    )
    out = asof_join(
        left, right, on="k", ts="ts", right_cols=("payload",), right_id="rid"
    ).first()
    assert out.rid_asof == 11
    assert out.ts_asof == ts(2024, 1, 1, 11)
    assert out.payload_asof is None  # atomic: no mixing with the older row


def test_asof_join_tie_and_no_match(spark):
    ts = datetime.datetime
    left = spark.createDataFrame(
        [(1, ts(2024, 1, 1, 10), "exact-tie"), (2, ts(2024, 1, 1, 9), "no-match")],
        ["k", "ts", "lval"],
    )
    right = spark.createDataFrame(
        [(1, ts(2024, 1, 1, 10), 5), (1, ts(2024, 1, 1, 10), 7)],
        ["k", "ts", "rid"],
    )
    rows = {
        r.lval: r
        for r in asof_join(
            left, right, on="k", ts="ts", right_cols=(), right_id="rid"
        ).collect()
    }
    # >= semantics: equal-ts right rows match; greatest rid wins the tie
    assert rows["exact-tie"].rid_asof == 7
    assert rows["no-match"].rid_asof is None and rows["no-match"].ts_asof is None
