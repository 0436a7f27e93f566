"""Pins for streaming BM25 index maintenance (streaming/bm25_maintain.py):
stream == from-scratch closed form, replay safety (counters exactly-once,
postings dedup-at-read), kill-and-restart, and bucket-pruned serving."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from realtime_change_data_capture_streaming_spark.llm_ops.text import text_bm25_topk
from realtime_change_data_capture_streaming_spark.session import scratch_dir
from realtime_change_data_capture_streaming_spark.sources.tables import load_table
from realtime_change_data_capture_streaming_spark.streaming.bm25_maintain import (
    _ingest_batch,
    _serve_topk,
    _stats,
    stream_bm25_index_maintain,
)
from realtime_change_data_capture_streaming_spark.streaming.cdc_stream import stage_ordered_batches


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_maintained_index_equals_from_scratch_build(spark, sf_dir):
    """The whole correctness story: BM25's inputs are associative over
    immutable docs, so the streamed-in index must serve the EXACT
    ranking of a from-scratch build over the same corpus."""
    got = _rows(stream_bm25_index_maintain(spark, sf_dir))
    want = _rows(text_bm25_topk(spark, sf_dir))
    assert got == want
    assert len(got) > 0


def test_ingest_replay_is_exactly_once_for_counters(spark, sf_dir, tmp_path):
    """A fully-applied replayed batch skips on the manifest bid: the
    corpus counters must not double-fold, and the serving output must
    not change (re-appended postings would be deduped anyway, but the
    skip means they are not even written twice)."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(50)
    pdir, sstore = str(tmp_path / "postings"), str(tmp_path / "stats")
    _ingest_batch(pdir, sstore, d, 0)
    bid0, n0, s0 = _stats(sstore)
    assert (bid0, n0) == (0, 50)
    served = _rows(_serve_topk(spark, pdir, sstore))
    _ingest_batch(pdir, sstore, d, 0)  # re-delivery
    assert _stats(sstore) == (bid0, n0, s0)
    assert _rows(_serve_topk(spark, pdir, sstore)) == served


def test_half_applied_replay_dedups_at_read(spark, sf_dir, tmp_path):
    """Crash between the postings append and the stats commit: the
    replayed batch re-appends the same rows, then commits counters once.
    Serving must dedup the doubled postings — scores identical to the
    clean run, df not inflated."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(50)
    clean_p, clean_s = str(tmp_path / "cp"), str(tmp_path / "cs")
    _ingest_batch(clean_p, clean_s, d, 0)
    want = _rows(_serve_topk(spark, clean_p, clean_s))

    from realtime_change_data_capture_streaming_spark.streaming.bm25_maintain import (
        _batch_postings,
        _postings_store,
    )

    pdir, sstore = str(tmp_path / "postings"), str(tmp_path / "stats")
    postings, _lens = _batch_postings(d)
    # the half-applied prefix: append landed IN THE LIVE DIR, counters
    # did not — the replay then appends the same rows a second time
    postings.write.mode("append").partitionBy("bucket").parquet(
        _postings_store(pdir).live_dir()
    )
    _ingest_batch(pdir, sstore, d, 0)  # the replay (full batch)
    assert _stats(sstore)[1] == 50, "counters folded exactly once"
    # non-vacuous: the log really holds every posting twice
    live = _postings_store(pdir).live_dir()
    raw = spark.read.parquet(live)
    assert raw.count() == 2 * raw.dropDuplicates(["doc_id", "term"]).count()
    assert _rows(_serve_topk(spark, pdir, sstore)) == want


def test_serving_zero_committed_docs_is_empty_not_an_error(spark, sf_dir, tmp_path):
    """ADVICE r13 (low): in the half-applied crash window the postings
    bucket dirs EXIST but the stats commit never landed (n_docs == 0) —
    serving must return the empty frame, not raise ZeroDivisionError
    computing avgdl."""
    from realtime_change_data_capture_streaming_spark.streaming.bm25_maintain import (
        _batch_postings,
        _postings_store,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(20)
    pdir, sstore = str(tmp_path / "postings"), str(tmp_path / "stats")
    postings, _lens = _batch_postings(d)
    # the half-applied prefix only: append landed, counters did not
    postings.write.mode("append").partitionBy("bucket").parquet(
        _postings_store(pdir).live_dir()
    )
    assert _stats(sstore) == (-1, 0, 0)
    out = _serve_topk(spark, pdir, sstore)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["doc_id", "n_terms_hit", "bm25", "rk"]


def test_restart_from_checkpoint_replays_batch(spark, sf_dir):
    """Kill-and-restart: the driver dies after batch 0 processed but
    before its checkpoint commit; the restarted run (fresh closures)
    replays it and must converge to the crash-free ranking."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    frames = [
        d.filter(F.pmod(F.col("doc_id"), F.lit(2)) == 0),
        d.filter(F.pmod(F.col("doc_id"), F.lit(2)) == 1),
    ]
    want = _rows(text_bm25_topk(spark, sf_dir))

    work = scratch_dir(prefix="rs_bm25_")
    in_dir = stage_ordered_batches(frames, f"{work}/staged")
    from realtime_change_data_capture_streaming_spark.streaming.bm25_maintain import _serve_topk

    def run(crash=None):
        postings_dir, stats_store = f"{work}/postings", f"{work}/stats"
        from realtime_change_data_capture_streaming_spark.streaming._drive import drive_staged_stream
        from realtime_change_data_capture_streaming_spark.streaming.bm25_maintain import _ingest_batch

        def gate(batch, bid):
            _ingest_batch(postings_dir, stats_store, batch, bid)
            if crash is not None and bid >= crash:
                raise RuntimeError(f"injected crash after batch {bid}")

        drive_staged_stream(spark, in_dir, "doc_id bigint, text string", gate, f"{work}/ckpt")
        return postings_dir, stats_store

    with pytest.raises(Exception, match="injected crash|Query .* terminated"):
        run(crash=0)
    pdir, sstore = run()
    assert _rows(_serve_topk(spark, pdir, sstore)) == want


def test_serving_scan_is_bucket_pruned(spark, sf_dir, tmp_path):
    """The inverted-index seek: the serving read must plan ONLY the
    query terms' md5 buckets (path-level pruning), never the whole
    postings dir."""
    from realtime_change_data_capture_streaming_spark.llm_ops.text import _BM25_QUERY, _term_bucket_py

    from realtime_change_data_capture_streaming_spark.streaming.bm25_maintain import _postings_store

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    pdir, sstore = str(tmp_path / "postings"), str(tmp_path / "stats")
    _ingest_batch(pdir, sstore, d, 0)
    want = {f"bucket={_term_bucket_py(t)}" for t in _BM25_QUERY}
    live = _postings_store(pdir).live_dir()
    buckets = sorted({_term_bucket_py(t) for t in _BM25_QUERY})
    rows = spark.read.option("basePath", live).parquet(
        *[f"{live}/bucket={b}" for b in buckets]
    )
    files = rows.inputFiles()
    assert files and all(any(w in f for w in want) for f in files), files[:3]


def test_ingest_loop_auto_compacts_and_ranking_is_unchanged(spark, sf_dir, tmp_path, monkeypatch):
    """VERDICT r13 task 4: the ingest loop must trigger segment merging
    itself — N small batches past the manifest-tracked cadence
    auto-compact (postings manifest rotates, log file count drops to the
    deduped layout) and the served ranking is identical to an
    untriggered run over the same corpus."""
    import realtime_change_data_capture_streaming_spark.streaming.bm25_maintain as bm

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(60)
    batches = [d.filter(F.pmod(F.col("doc_id"), F.lit(6)) == i) for i in range(6)]

    # reference run: triggering disabled (cadence out of reach)
    monkeypatch.setattr(bm, "AUTO_COMPACT_BATCHES", 10_000)
    p0, s0 = str(tmp_path / "p0"), str(tmp_path / "s0")
    for i, b in enumerate(batches):
        bm._ingest_batch(p0, s0, b, i)
    want = _rows(_serve_topk(spark, p0, s0))
    store0 = bm._postings_store(p0)
    assert store0._manifest()["seq"] == 0, "untriggered run must never rotate"

    # triggered run: compaction every 3 applied batches
    monkeypatch.setattr(bm, "AUTO_COMPACT_BATCHES", 3)
    p1, s1 = str(tmp_path / "p1"), str(tmp_path / "s1")
    for i, b in enumerate(batches):
        bm._ingest_batch(p1, s1, b, i)
    store1 = bm._postings_store(p1)
    m1 = store1._manifest()
    assert m1["seq"] >= 2, "cadence 3 over 6 batches must rotate twice"
    assert m1["applied_bid"] == 5, "compaction must record the frontier it folded"
    # the live log is the deduped (doc, term) layout, not a 6-batch append pile
    raw = spark.read.parquet(store1.live_dir())
    assert raw.count() == raw.dropDuplicates(["doc_id", "term"]).count()
    assert _rows(_serve_topk(spark, p1, s1)) == want


def test_random_splits_and_cadences_serve_identically(spark, sf_dir, tmp_path, monkeypatch):
    """Property: for RANDOM doc->batch assignments and RANDOM
    auto-compaction cadences (including every-batch and never), the
    maintained index serves the exact ranking of a clean one-shot
    ingest — batching and housekeeping are jointly invisible."""
    import random

    import realtime_change_data_capture_streaming_spark.streaming.bm25_maintain as bm

    rng = random.Random(1404)
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(60)
    ref_p, ref_s = str(tmp_path / "refp"), str(tmp_path / "refs")
    monkeypatch.setattr(bm, "AUTO_COMPACT_BATCHES", 10_000)
    bm._ingest_batch(ref_p, ref_s, d, 0)
    want = _rows(_serve_topk(spark, ref_p, ref_s))
    assert want, "reference serve is empty — fixture too small"

    for trial in range(3):
        n_batches = rng.choice([3, 4, 5])
        salt = rng.randrange(1 << 30)
        cadence = rng.choice([1, 2, 10_000])
        monkeypatch.setattr(bm, "AUTO_COMPACT_BATCHES", cadence)
        p, s = str(tmp_path / f"p{trial}"), str(tmp_path / f"s{trial}")
        split = F.pmod(F.crc32(F.concat(F.col("doc_id").cast("string"), F.lit(str(salt)))), F.lit(n_batches))
        for i in range(n_batches):
            bm._ingest_batch(p, s, d.filter(split == i), i)
        got = _rows(_serve_topk(spark, p, s))
        assert got == want, (trial, n_batches, cadence, salt)


def test_compaction_dedups_and_swaps_atomically(spark, sf_dir, tmp_path):
    """Segment-merge housekeeping: after a half-applied replay doubled
    the append-log, compaction must (a) rewrite the live version to
    (doc, term)-grain with no duplicate rows left on disk, (b) leave
    the serving output unchanged, and (c) swap behind the manifest flip
    so a reader holding the pre-compaction version keeps working."""
    from realtime_change_data_capture_streaming_spark.streaming.bm25_maintain import (
        _batch_postings,
        _postings_store,
        compact_bm25_postings,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(50)
    pdir, sstore = str(tmp_path / "postings"), str(tmp_path / "stats")
    postings, _lens = _batch_postings(d)
    store = _postings_store(pdir)
    # half-applied prefix + full replay: the log holds every row twice
    postings.write.mode("append").partitionBy("bucket").parquet(store.live_dir())
    _ingest_batch(pdir, sstore, d, 0)
    live0 = store.live_dir()
    raw0 = spark.read.parquet(live0)
    n_log = raw0.count()
    n_unique = raw0.dropDuplicates(["doc_id", "term"]).count()
    assert n_log == 2 * n_unique, (n_log, n_unique)
    want = _rows(_serve_topk(spark, pdir, sstore))
    reader_on_old = spark.read.parquet(live0)

    compact_bm25_postings(spark, pdir)
    live1 = store.live_dir()
    assert live1 != live0, "compaction must publish a NEW version"
    assert spark.read.parquet(live1).count() == n_unique
    assert _rows(_serve_topk(spark, pdir, sstore)) == want
    # grace window: the pre-compaction reader still collects its snapshot
    assert reader_on_old.count() == n_log
