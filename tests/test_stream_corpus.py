"""Batch/stream unification for the stateless corpus operators: the
SAME operator functions (corpus_mix, text/quality projections, BPE
encode) applied to a streaming DataFrame must emit exactly the batch
result — no reimplementation, no state, map-only plans run as-is under
the streaming runner."""

import os

import pytest
from pyspark.sql import functions as F

from flink_window_dgim_traffic_spark.operators import bpe as B
from flink_window_dgim_traffic_spark.operators import corpus as C
from flink_window_dgim_traffic_spark.operators import text as T
from flink_window_dgim_traffic_spark.session import table


@pytest.fixture(scope="module")
def doc_stream_dir(spark, sf_dir, tmp_path_factory):
    """documents replayed as 3 parquet chunks with pinned mtimes."""
    d = tmp_path_factory.mktemp("doc_chunks")
    pdf = table(spark, sf_dir, "documents").orderBy("doc_id").toPandas()
    n = len(pdf)
    for i in range(3):
        chunk = pdf.iloc[i * n // 3 : (i + 1) * n // 3]
        p = str(d / f"chunk_{i:02d}.parquet")
        chunk.to_parquet(p, index=False)
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))
    return str(d)


def _doc_stream(spark, path):
    return (
        spark.readStream.schema(
            "doc_id bigint, text string, lang string, "
            "source string, n_chars bigint"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )


def _run(df, name):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def test_corpus_mix_on_stream_matches_batch(spark, sf_dir, doc_stream_dir):
    q = _run(C.corpus_mix(_doc_stream(spark, doc_stream_dir)), "t_mix_stream")
    got = sorted(
        map(tuple, spark.sql("SELECT * FROM t_mix_stream").collect())
    )
    want = sorted(
        map(tuple, C.corpus_mix(table(spark, sf_dir, "documents")).collect())
    )
    assert got == want
    q.stop()


def test_quality_score_on_stream_matches_batch(spark, sf_dir, doc_stream_dir):
    q = _run(
        T.quality_score(_doc_stream(spark, doc_stream_dir)), "t_qs_stream"
    )
    got = sorted(
        map(tuple, spark.sql("SELECT * FROM t_qs_stream").collect())
    )
    want = sorted(
        map(
            tuple,
            T.quality_score(table(spark, sf_dir, "documents")).collect(),
        )
    )
    assert got == want
    q.stop()


def test_bpe_encode_on_stream_matches_batch(spark, sf_dir, doc_stream_dir):
    # production pattern: vocab trained once on the batch corpus, the
    # frozen merges applied to the incoming stream map-only
    docs = table(spark, sf_dir, "documents")
    merges = B.bpe_train_merges(docs)
    q = _run(
        B.bpe_token_count(_doc_stream(spark, doc_stream_dir), merges=merges),
        "t_bpe_stream",
    )
    got = sorted(
        map(tuple, spark.sql("SELECT * FROM t_bpe_stream").collect())
    )
    want = sorted(map(tuple, B.bpe_token_count(docs, merges=merges).collect()))
    assert got == want
    q.stop()


def test_gopher_and_pii_on_stream_match_batch(spark, sf_dir, doc_stream_dir):
    """The round-2 quality filters are stateless too: the same
    gopher_quality / pii_redact plans run under the streaming runner
    and emit exactly the batch rows."""
    from flink_window_dgim_traffic_spark.operators import quality as QL

    docs = table(spark, sf_dir, "documents")
    for fn, name in ((QL.gopher_quality, "t_gq_stream"),
                     (QL.pii_redact, "t_pii_stream")):
        q = _run(fn(_doc_stream(spark, doc_stream_dir)), name)
        got = sorted(map(tuple, spark.sql(f"SELECT * FROM {name}").collect()))
        want = sorted(map(tuple, fn(docs).collect()))
        assert got == want
        q.stop()


def test_stream_parquet_sink_roundtrip(spark, sf_dir, doc_stream_dir, tmp_path):
    """Streamed gopher-filtered docs land in a partitioned parquet
    sink exactly once; reading the sink back (which honors the
    _spark_metadata manifest) equals the batch filter output, and
    partition pruning works on the directory layout."""
    from pyspark.sql import functions as F

    from flink_window_dgim_traffic_spark.operators import quality as QL
    from flink_window_dgim_traffic_spark.streaming.jobs import stream_to_parquet

    out = str(tmp_path / "sink_out")
    ckpt = str(tmp_path / "sink_ckpt")
    src = _doc_stream(spark, doc_stream_dir)
    passed = src.select("doc_id", "source", "text").join(
        QL.gopher_quality(src).filter("passes_gopher").select("doc_id"),
        "doc_id",
    )
    q = stream_to_parquet(passed, out, ckpt, partition_by=["source"])
    q.awaitTermination()
    q.stop()

    got = spark.read.parquet(out)
    docs = table(spark, sf_dir, "documents")
    want = docs.join(
        QL.gopher_quality(docs).filter("passes_gopher").select("doc_id"),
        "doc_id",
    ).select("doc_id", "source", "text")
    assert sorted(map(tuple, got.select("doc_id", "source", "text").collect())) == \
        sorted(map(tuple, want.collect()))
    # manifest exists (exactly-once commit protocol)
    import os as _os
    assert _os.path.isdir(_os.path.join(out, "_spark_metadata"))
    # directory partitioning prunes: one source reads a subset
    one = got.filter(F.col("source") == "src1")
    assert 0 < one.count() < got.count()


def test_stream_pack_matches_batch(spark, sf_dir, doc_stream_dir):
    """The one-counter-per-key streaming packer must assign exactly
    the batch packer's pack ids/positions when docs replay in doc_id
    order — the stateful batch/stream unification (the stateless ops
    above get it for free; this one needs the prefix-sum state)."""
    from flink_window_dgim_traffic_spark.operators.packing import sequence_pack
    from flink_window_dgim_traffic_spark.streaming.packing import (
        sequence_pack_stream,
    )

    q = (
        sequence_pack_stream(_doc_stream(spark, doc_stream_dir))
        .writeStream.format("memory")
        .queryName("t_pack_stream")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(map(tuple, spark.sql("SELECT * FROM t_pack_stream").collect()))
    want = sorted(
        map(
            tuple,
            sequence_pack(table(spark, sf_dir, "documents"))
            .select(
                "doc_id", "source", "shard", "n_tokens",
                "pack_id", "pack_pos", "spans_boundary",
            )
            .collect(),
        )
    )
    assert got == want
    q.stop()


def test_stream_pack_checkpoint_restart(spark, sf_dir, tmp_path):
    """Kill-and-restart durability for the streaming packer: the
    per-key token counter survives in the checkpointed state store,
    so docs arriving after a restart continue the SAME context stream
    (pack ids keep counting up, no reset, no duplicates)."""
    import shutil

    from flink_window_dgim_traffic_spark.operators.packing import sequence_pack
    from flink_window_dgim_traffic_spark.streaming.packing import (
        sequence_pack_stream,
    )

    staging = tmp_path / "staging"
    staging.mkdir()
    src_dir = tmp_path / "src"
    src_dir.mkdir()
    ckpt = str(tmp_path / "ckpt")
    pdf = table(spark, sf_dir, "documents").orderBy("doc_id").toPandas()
    n = len(pdf)
    files = []
    for i in range(4):
        chunk = pdf.iloc[i * n // 4 : (i + 1) * n // 4]
        p = str(staging / f"chunk_{i:02d}.parquet")
        chunk.to_parquet(p, index=False)
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))
        files.append(p)

    out = str(tmp_path / "pack_out")

    def run_once():
        q = (
            sequence_pack_stream(_doc_stream(spark, str(src_dir)))
            .writeStream.outputMode("update")
            .foreachBatch(
                lambda df, eid: df.write.mode("append").parquet(out)
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        q.stop()

    for f in files[:2]:
        shutil.copy(f, src_dir)
    run_once()
    for f in files[2:]:
        shutil.copy(f, src_dir)
    run_once()

    got = sorted(
        map(
            tuple,
            spark.read.parquet(out)
            .select(
                "doc_id", "source", "shard", "n_tokens",
                "pack_id", "pack_pos", "spans_boundary",
            )
            .collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            sequence_pack(table(spark, sf_dir, "documents")).select(
                "doc_id", "source", "shard", "n_tokens",
                "pack_id", "pack_pos", "spans_boundary",
            ).collect(),
        )
    )
    assert got == want
