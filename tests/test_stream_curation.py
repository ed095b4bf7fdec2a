"""Streaming corpus curation == batch curation, under every slicing.

The invariants that make the streaming curation pipeline trustworthy at
scale, each pinned here:

- materialized curated table == the batch oracle (same scoring
  operators + min-doc_id-per-fingerprint dedup) on the same documents;
- batch-boundary determinism: one-shard-per-trigger and all-at-once
  replays produce identical tables (keep-first falls out of the merge
  rule, not arrival order);
- a canonical (lower doc_id) copy arriving in a LATER epoch evicts the
  higher-id stand-in;
- restart on the same checkpoint is a no-op (exactly-once).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from aktuell_spark.streaming.curation import (
    DOC_FEED_SCHEMA,
    curate_batch_oracle,
    run_curation_stream,
)

GOOD = (
    "the quick brown fox jumps over a lazy dog and then walks to the "
    "river with its friends to drink some cold water in the morning sun"
)
SPAM = "buy " * 60  # repetitive + near-zero distinct ratio -> filtered


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, lang, src, len(t)) for (i, t, lang, src) in rows],
        DOC_FEED_SCHEMA,
    )


def _rows():
    rows = []
    for i in range(30):
        rows.append((i, f"{GOOD} variant {i} with extra tail {i * 7}",
                     "en", "web"))
    # exact duplicates of doc 3's content under higher ids
    rows.append((100, f"{GOOD} variant 3 with extra tail 21", "en", "web"))
    rows.append((101, f"{GOOD} variant 3 with extra tail 21", "en", "crawl"))
    # junk that must be filtered, not deduped
    rows.append((200, SPAM, "en", "web"))
    rows.append((201, "x", "en", "web"))
    return rows


def _write_feed(spark, feed_dir, rows, n_files=4):
    os.makedirs(feed_dir, exist_ok=True)
    chunk = max(1, len(rows) // n_files)
    for i in range(0, len(rows), chunk):
        _docs(spark, rows[i:i + chunk]).coalesce(1).write.mode(
            "append"
        ).parquet(feed_dir)


def _table_rows(table):
    return {
        tuple(r) for r in table.read().select(
            "fingerprint", "doc_id", "lang", "source", "n_tokens",
            "quality_score",
        ).collect()
    }


def test_stream_matches_batch_oracle(spark, tmp_path):
    rows = _rows()
    feed = str(tmp_path / "feed")
    _write_feed(spark, feed, rows)
    _, table = run_curation_stream(
        spark, feed, str(tmp_path / "tbl"), str(tmp_path / "ckpt"),
        n_buckets=4,
    )
    got = _table_rows(table)
    want = {
        tuple(r) for r in curate_batch_oracle(_docs(spark, rows)).collect()
    }
    assert got == want
    ids = {r[1] for r in got}
    assert 3 in ids and 100 not in ids and 101 not in ids  # keep-first
    assert 200 not in ids and 201 not in ids  # filtered junk
    assert len(got) == 30  # 30 distinct contents survive


def test_slicing_determinism_and_restart(spark, tmp_path):
    rows = _rows()
    feed = str(tmp_path / "feed")
    _write_feed(spark, feed, rows, n_files=6)

    _, t_one = run_curation_stream(
        spark, feed, str(tmp_path / "t1"), str(tmp_path / "c1"),
        n_buckets=4, max_files_per_trigger=1,
    )
    _, t_all = run_curation_stream(
        spark, feed, str(tmp_path / "t2"), str(tmp_path / "c2"),
        n_buckets=4,
    )
    assert _table_rows(t_one) == _table_rows(t_all)

    # restart on the same checkpoint: no new files -> table unchanged
    before = _table_rows(t_one)
    _, t_again = run_curation_stream(
        spark, feed, str(tmp_path / "t1"), str(tmp_path / "c1"),
        n_buckets=4, max_files_per_trigger=1,
    )
    assert _table_rows(t_again) == before


def test_late_canonical_evicts_standin(spark, tmp_path):
    feed = str(tmp_path / "feed")
    dup_text = f"{GOOD} late arrival case"
    _write_feed(spark, feed, [(50, dup_text, "en", "web")], n_files=1)
    _, table = run_curation_stream(
        spark, feed, str(tmp_path / "tbl"), str(tmp_path / "ckpt"),
        n_buckets=4,
    )
    assert {r[1] for r in _table_rows(table)} == {50}

    # canonical copy (doc_id 7 < 50) lands in a later shard
    _write_feed(spark, feed, [(7, dup_text, "en", "crawl")], n_files=1)
    _, table = run_curation_stream(
        spark, feed, str(tmp_path / "tbl"), str(tmp_path / "ckpt"),
        n_buckets=4,
    )
    rows = _table_rows(table)
    assert {r[1] for r in rows} == {7}
    assert {r[3] for r in rows} == {"crawl"}


def test_lang_filter(spark, tmp_path):
    feed = str(tmp_path / "feed")
    rows = [(1, f"{GOOD} one", "en", "web"), (2, f"{GOOD} two", "de", "web")]
    _write_feed(spark, feed, rows, n_files=1)
    _, table = run_curation_stream(
        spark, feed, str(tmp_path / "tbl"), str(tmp_path / "ckpt"),
        n_buckets=4, langs=("en",),
    )
    assert {r[1] for r in _table_rows(table)} == {1}
