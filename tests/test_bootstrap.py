"""Snapshot-then-tail bootstrap (T3) + subscription validation (F3)."""

from __future__ import annotations

from pyspark.sql import functions as F

from aktuell_spark.fixtures import gen_transcript_changes, gen_transcripts
from aktuell_spark.operators.cdc import latest_image
from aktuell_spark.streaming.bootstrap import EngineConfig, snapshot_then_tail
from aktuell_spark.streaming.pipeline import write_change_feed
from tests.conftest import assert_df_equal


def test_snapshot_then_tail_equals_full_state(spark, tmp_path):
    """Base table + change tail must materialize exactly latest_image of
    (snapshot-as-inserts ∪ changes): live changes win over the seed."""
    base = gen_transcripts(spark, n_convs=20, avg_turns=6, hot_turns=20, seed=41)
    changes = gen_transcript_changes(base, seed=41).localCheckpoint()
    # tail = only the updates/deletes (snapshot already has the inserts)
    tail = changes.filter(F.col("op") != "insert")
    feed = str(tmp_path / "feed")
    write_change_feed(tail, feed, n_files=3)

    _, table = snapshot_then_tail(
        spark, base, feed,
        str(tmp_path / "table"), str(tmp_path / "ckpt"), n_buckets=8,
    )
    # oracle: replay everything in batch (insert events carry the same
    # payload as the base table rows)
    expected = latest_image(changes)
    assert_df_equal(table.read(), expected)


def test_bootstrap_idempotent_on_restart(spark, tmp_path):
    base = gen_transcripts(spark, n_convs=5, avg_turns=4, hot_turns=8, seed=43)
    feed = str(tmp_path / "feed")
    changes = gen_transcript_changes(base, seed=43).localCheckpoint()
    write_change_feed(changes.filter(F.col("op") != "insert"), feed, n_files=2)
    args = (spark, base, feed, str(tmp_path / "t"), str(tmp_path / "c"))
    _, t1 = snapshot_then_tail(*args, n_buckets=4)
    before = t1.read().count()
    _, t2 = snapshot_then_tail(*args, n_buckets=4)  # restart: seed skipped
    assert t2.read().count() == before


def test_subscription_validation(spark):
    cfg = EngineConfig({"aktuell": ["transcripts", "tool_events"], "open": []})
    assert cfg.is_valid_subscription("aktuell", "transcripts")
    assert cfg.is_valid_subscription("aktuell", "")  # wildcard collection
    assert not cfg.is_valid_subscription("aktuell", "nope")
    assert cfg.is_valid_subscription("open", "anything")  # empty list = all
    assert not cfg.is_valid_subscription("unknown", "transcripts")


def test_snapshot_then_tail_with_enrichment(spark, tmp_path):
    """Round-1 bug: an enriched tail read enriched state columns that the
    seed never wrote → AnalysisException on the first micro-batch. The
    seed now materializes the same enriched payload."""
    from aktuell_spark.streaming.pipeline import enrich_turns

    base = gen_transcripts(spark, n_convs=12, avg_turns=5, hot_turns=10, seed=47)
    changes = gen_transcript_changes(base, seed=47).localCheckpoint()
    feed = str(tmp_path / "feed")
    write_change_feed(changes.filter(F.col("op") != "insert"), feed, n_files=2)

    _, table = snapshot_then_tail(
        spark, base, feed,
        str(tmp_path / "table"), str(tmp_path / "ckpt"),
        n_buckets=4, enrich=True,
    )
    got = table.read()
    assert {"n_tokens", "quality_score", "fingerprint"} <= set(got.columns)
    # oracle = fold the tail over the base state (NOT latest_image of all
    # changes: ~2% of insert events carry a late-shifted ts that the
    # snapshot seed — taken from the base table — never saw)
    from aktuell_spark.operators.cdc import apply_batch_to_state

    folded = apply_batch_to_state(base, changes.filter(F.col("op") != "insert"))
    expected = enrich_turns(folded).select(*got.columns)
    assert_df_equal(got, expected)
