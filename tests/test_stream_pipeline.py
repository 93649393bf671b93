"""Incremental-batch curation pipeline parity: ordered replay through
the foreachBatch pipeline (persistent index/counters/thresholds state)
must equal the whole-corpus batch twin, including across restarts and
replayed batches."""

import shutil

from pyspark.sql import functions as F

from flink_window_dgim_traffic_spark.streaming.pipeline import (
    curation_batch_twin,
    curation_stream,
    make_curation_batch_fn,
    read_curated,
    seed_curation_state,
)

SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


def _mk_docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, lang, src, len(t)) for (i, t, lang, src) in rows], SCHEMA
    )


def _corpus():
    """Benchmark partition src0 + three stream sources; exercises the
    cap (src1 has 5 docs, cap=3), exact-copy decontamination (doc 20
    copies benchmark text), cross-chunk dedup (doc 31 repeats doc 11's
    text), and the per-lang gate (mixed quality, two langs)."""
    bench = [
        (1, "the of to in is benchmark eval text one", "en", "src0"),
        (2, "solid informative benchmark prose with many fine words",
         "en", "src0"),
        (3, "la de el en es texto de referencia uno", "es", "src0"),
        (4, "contenido util y variado para la prueba de calidad",
         "es", "src0"),
    ]
    chunk1 = [
        (10, "fresh interesting document with plenty of varied words",
         "en", "src1"),
        (11, "another quality training document full of signal", "en",
         "src1"),
        (12, "the the the the of of of", "en", "src1"),
        (13, "documento nuevo con contenido variado y util", "es",
         "src2"),
    ]
    chunk2 = [
        (20, "solid informative benchmark prose with many fine words",
         "en", "src1"),  # exact copy of benchmark -> decontaminated
        (21, "late arrival still under the source budget maybe", "en",
         "src1"),
        (22, "a a a a a a a a", "en", "src2"),
        (30, "final doc crossing the src1 cap boundary now", "en",
         "src1"),  # 5th src1 doc: over cap=3 (10,11,12 spent it)
        (31, "another quality training document full of signal", "en",
         "src3"),  # copy of doc 11 -> cross-chunk dedup
    ]
    return bench, chunk1, chunk2


def _write_chunk(spark, tmp_path, src_dir, name, rows):
    stage = tmp_path / f"stage_{name}"
    _mk_docs(spark, rows).coalesce(1).write.parquet(str(stage))
    part = next(p for p in stage.iterdir() if p.name.endswith(".parquet"))
    shutil.copy(part, src_dir / f"{name}.parquet")


def test_curation_stream_matches_batch_twin(spark, tmp_path):
    bench, chunk1, chunk2 = _corpus()
    src = tmp_path / "src"
    src.mkdir()
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    seed_curation_state(spark, state, _mk_docs(spark, bench))

    def run_once():
        stream = spark.readStream.schema(SCHEMA).parquet(str(src))
        q = curation_stream(stream, state, ckpt, cap=3)
        q.awaitTermination()

    _write_chunk(spark, tmp_path, src, "c1", chunk1)
    run_once()
    _write_chunk(spark, tmp_path, src, "c2", chunk2)
    run_once()
    # third run with NO new data: no batches, output unchanged
    run_once()

    got = {
        tuple(r)
        for r in read_curated(spark, state)
        .select("doc_id", "source", "lang", "quality_score")
        .collect()
    }
    twin = curation_batch_twin(
        _mk_docs(spark, bench + chunk1 + chunk2), cap=3
    )
    expect = {
        tuple(r)
        for r in twin.select(
            "doc_id", "source", "lang", "quality_score"
        ).collect()
    }
    assert got == expect
    # sanity on the semantics the fixture encodes: the benchmark copy
    # and the cross-chunk duplicate never survive; src1 keeps <= cap
    out_ids = {t[0] for t in got}
    assert 20 not in out_ids and 31 not in out_ids
    assert 30 not in out_ids  # over the src1 budget
    srcs = [t[1] for t in got]
    assert srcs.count("src1") <= 3


def test_replayed_batch_is_skipped(spark, tmp_path):
    """Crash-replay semantics: running the SAME batch id twice
    commits its output exactly once (marker short-circuit)."""
    bench, chunk1, _ = _corpus()
    state = str(tmp_path / "state")
    seed_curation_state(spark, state, _mk_docs(spark, bench))
    fn = make_curation_batch_fn(state, cap=3)
    batch = _mk_docs(spark, chunk1)
    fn(batch, 0)
    first = {
        tuple(r) for r in read_curated(spark, state).collect()
    }
    counters1 = {
        (r["source"], r["admitted"])
        for r in spark.read.parquet(f"{state}/counters/batch-0").collect()
    }
    fn(batch, 0)  # replay
    assert {
        tuple(r) for r in read_curated(spark, state).collect()
    } == first
    assert {
        (r["source"], r["admitted"])
        for r in spark.read.parquet(f"{state}/counters/batch-0").collect()
    } == counters1


def test_crash_between_state_writes_and_marker(spark, tmp_path):
    """Round-3 advisor finding: a crash AFTER the counters/index state
    writes but BEFORE the _done marker must not double-count budgets
    or shrink the replayed batch's output.  Staged batch-id-keyed
    state + marker promotion makes the replay recompute from committed
    state only — end state identical to a crash-free run."""
    bench, chunk1, chunk2 = _corpus()
    state = str(tmp_path / "state")
    seed_curation_state(spark, state, _mk_docs(spark, bench))
    fn = make_curation_batch_fn(state, cap=3)
    fn(_mk_docs(spark, chunk1), 0)

    batch2 = _mk_docs(spark, chunk2)
    fn(batch2, 1)
    # simulate the crash window: every state write for batch 1 landed
    # but the marker did not
    import os

    os.remove(f"{state}/_done/1")
    # staged-but-uncommitted writes are invisible to readers
    committed_out = {
        tuple(r) for r in read_curated(spark, state).collect()
    }
    assert committed_out == {
        tuple(r)
        for r in spark.read.parquet(f"{state}/out/batch-0").collect()
    }

    fn(batch2, 1)  # replay after restart
    got = {
        tuple(r)
        for r in read_curated(spark, state)
        .select("doc_id", "source", "lang", "quality_score")
        .collect()
    }
    expect = {
        tuple(r)
        for r in curation_batch_twin(
            _mk_docs(spark, bench + chunk1 + chunk2), cap=3
        )
        .select("doc_id", "source", "lang", "quality_score")
        .collect()
    }
    assert got == expect
    # budgets not double-counted: src1 admitted exactly its cap-bound
    # total across both batches (3 from chunk1 spent the budget; the
    # chunk2 src1 rows admit 0 more)
    counters = {
        r["source"]: r["admitted"]
        for r in spark.read.parquet(
            f"{state}/counters/batch-1"
        ).collect()
    }
    assert counters["src1"] == 3


def test_compaction_preserves_semantics(spark, tmp_path):
    """Folding deltas into the seed index must change NOTHING the
    pipeline computes: later batches dedup identically, re-running
    compaction is a no-op, and the delta dirs are gone."""
    import os

    from flink_window_dgim_traffic_spark.streaming.pipeline import (
        compact_curation_state,
    )

    bench, chunk1, chunk2 = _corpus()

    def run(compact_between: bool, root: str):
        state = str(tmp_path / root)
        seed_curation_state(spark, state, _mk_docs(spark, bench))
        fn = make_curation_batch_fn(state, cap=3)
        fn(_mk_docs(spark, chunk1), 0)
        if compact_between:
            assert compact_curation_state(spark, state) == 1
            assert compact_curation_state(spark, state) == 0  # no-op
            assert not os.path.exists(
                f"{state}/index_delta/batch-0"
            )
        fn(_mk_docs(spark, chunk2), 1)
        return {
            tuple(r) for r in read_curated(spark, state).collect()
        }

    assert run(True, "state_a") == run(False, "state_b")
