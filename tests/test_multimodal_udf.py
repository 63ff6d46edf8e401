"""Tests for the multimodal plumbing and the remaining UDF-tier surfaces
(applyInPandas grouped dedup, UDTF chunker). Decode kernels are
deterministic fakes by design — these tests pin the schema, batch shape,
fan-out, and feature contract, and that the real path raises the
documented NotImplementedError."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from etl_dag_paris_velib_spark.functions.udfs import make_chunk_udtf
from etl_dag_paris_velib_spark.operators.dedup import keep_first, keep_first_grouped
from etl_dag_paris_velib_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    decode_media,
    extract_features,
    sample_frames,
)
from etl_dag_paris_velib_spark.operators.similarity import brute_force_topk
from etl_dag_paris_velib_spark.operators.textstats import chunk_documents


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (i, ["image", "audio", "video"][i % 3], bytes([i % 251]) * (100 + i), "x/y", "s")
        for i in range(30)
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_decode_media_schema_and_determinism(spark, media):
    out = decode_media(media)
    rows = {r.media_id: r for r in out.collect()}
    assert len(rows) == 30
    again = {r.media_id: r for r in decode_media(media).collect()}
    assert rows == again  # deterministic fake
    r0 = rows[0]
    assert r0.payload_bytes == 100
    assert 64 <= r0.width < 256 and 64 <= r0.height < 256


def test_decode_media_real_path_is_declared_stub(spark, media):
    import py4j.protocol
    from pyspark.errors import PythonException

    with pytest.raises((PythonException, py4j.protocol.Py4JJavaError)) as e:
        decode_media(media, real=True).collect()
    assert "NotImplementedError" in str(e.value)


def test_extract_features_feed_similarity(spark, media):
    feats = extract_features(media)
    first = feats.first()
    assert len(first.features) == 16
    # the feature column plugs straight into the vector-search operators
    qs = (
        feats.filter(F.col("media_id") < 2)
        .selectExpr(
            "media_id as q_id",
            "cast(features as array<double>) as qv",
            "sqrt(aggregate(features, cast(0.0 as double), (a, x) -> a + x*x)) as nq",
        )
    )
    top = brute_force_topk(feats, qs, k=3, id_col="media_id", vec_col="features")
    assert top.groupBy("q_id").count().filter("count != 3").count() == 0


def test_sample_frames_fanout(spark, media):
    frames = sample_frames(media, every_nth=8)
    rows = frames.collect()
    assert rows, "video rows must fan out to frames"
    # only video rows fan out; every fingerprint deterministic + distinct per idx
    vid_ids = {r.media_id for r in rows}
    kinds = {r.media_id: r.kind for r in media.select("media_id", "kind").collect()}
    assert all(kinds[m] == "video" for m in vid_ids)
    assert len({(r.media_id, r.frame_idx) for r in rows}) == len(rows)


def test_keep_first_grouped_matches_window_variant(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    df = docs.select("doc_id", "lang", "source")
    a = {tuple(r) for r in keep_first(df, ["lang"], ["doc_id"]).collect()}
    b = {tuple(r) for r in keep_first_grouped(df, ["lang"], ["doc_id"]).collect()}
    assert a == b


def test_chunk_udtf_matches_jvm_chunker(spark):
    from etl_dag_paris_velib_spark.operators.textstats import chunk_documents_expr

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(25)
    jvm = {
        (r.doc_id, r.chunk_idx): r.chunk_hash
        for r in chunk_documents(docs).collect()
    }
    # the pure-expression reference formulation agrees with the Arrow path
    expr = {
        (r.doc_id, r.chunk_idx): r.chunk_hash
        for r in chunk_documents_expr(docs).collect()
    }
    assert expr == jvm
    chunker = make_chunk_udtf(chunk_tokens=50, overlap=10)
    spark.udtf.register("chunk_text", chunker)
    docs.createOrReplaceTempView("chunk_in")
    got = spark.sql(
        "SELECT c.doc_id, c.chunk_idx, c.chunk_text "
        "FROM chunk_in, LATERAL chunk_text(doc_id, text) c"
    ).collect()
    udtf_hashes = {
        (r.doc_id, r.chunk_idx): hashlib.md5(r.chunk_text.encode()).hexdigest()
        for r in got
    }
    assert udtf_hashes == jvm
