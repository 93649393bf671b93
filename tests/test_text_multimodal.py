"""Text-analysis + multimodal operators: language-ID heuristic on
constructed samples, fingerprint determinism, blob plumbing, decode
stub contract."""

import pytest

from flink_window_dgim_traffic_spark.operators import multimodal as M
from flink_window_dgim_traffic_spark.operators import text as T
from flink_window_dgim_traffic_spark.session import table


@pytest.fixture(scope="module")
def documents(spark, sf_dir):
    return table(spark, sf_dir, "documents")


def test_lang_id_markers(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat is in the house and it is warm"),
            (2, "el perro de la casa que ladra los dias"),
            (3, "der hund und die katze das ist gut"),
            (4, "le chat et la souris est dans les champs"),
            (5, "这是中文文本"),
            (6, ""),
            (7, "zzz qqq xxx"),
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r["pred_lang"] for r in T.lang_id(df).collect()}
    assert got == {1: "en", 2: "es", 3: "de", 4: "fr", 5: "zh", 6: "und", 7: "und"}


def test_quality_score_range(documents):
    for r in T.quality_score(documents).collect():
        assert 0.0 <= r["quality_score"] <= 1.0
        assert r["n_stopwords"] <= r["n_tokens"]


def test_fingerprint_sensitivity(spark):
    df = spark.createDataFrame(
        [(1, "hello world"), (2, "hello world"), (3, "hello worle")],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r["fingerprint"] for r in T.doc_fingerprint(df).collect()}
    assert got[1] == got[2]
    assert got[1] != got[3]
    assert 0 <= got[1] < 2147483647


def test_media_blob_schema_and_features(documents):
    blobs = M.with_media_blob(documents.limit(20))
    schema = dict((f.name, f.dataType.simpleString()) for f in blobs.schema.fields)
    assert schema["payload"] == "binary"
    assert schema["meta"].startswith("struct<")
    feats = M.multimodal_features(documents.limit(20)).collect()
    assert len(feats) == 20
    for r in feats:
        assert r["byte_len"] > 0
        assert r["byte_sum"] > 0
        assert 0 < r["n_distinct_bytes"] <= min(r["byte_len"], 256)
        assert 1 <= r["width"] <= 64


def test_decode_stub_contract():
    with pytest.raises(NotImplementedError):
        M.decode_media(b"\x00\x01", "image/png")
