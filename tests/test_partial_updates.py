"""S3 completion: partial-update post-image reconstruction.

Reference semantics: update events carry updatedFields/removedFields
(/root/reference/pkg/models/types.go:17-18) and the full post-image only
exists when the source does UpdateLookup (pkg/sync/database.go:78); the
integration suite asserts the update event's updatedFields content
(tests/integration_test.go:237-308). Here the engine reconstructs the
post-image in the sink MERGE, so a delta-only feed materializes exactly
like a full-post-image feed.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from aktuell_spark.fixtures import gen_transcript_changes, gen_transcripts
from aktuell_spark.operators.cdc import reconstruct_post_images
from aktuell_spark.streaming.pipeline import run_cdc_pipeline, write_change_feed
from tests.conftest import golden_partial_replay

CHANGE_DDL = (
    "seq long, op string, conv_id string, turn_idx int, role string, text string, "
    "tool string, updated_fields map<string,string>, removed_fields array<string>, "
    "ts string"
)


def _mk(spark, rows):
    return spark.createDataFrame(rows, CHANGE_DDL).withColumn(
        "ts", F.to_timestamp("ts")
    )


def test_reconstruct_fold_semantics(spark):
    df = _mk(spark, [
        # A: insert -> delta text update -> delta tool removal
        (1, "insert", "A", 0, "user", "hello", "search", None, None, "2025-01-01 00:00:00"),
        (2, "update", "A", 0, None, None, None, {"text": "hello v2"}, None, "2025-01-01 01:00:00"),
        (3, "update", "A", 0, None, None, None, None, ["tool"], "2025-01-01 02:00:00"),
        # B: orphan delta (no base) -> dropped, like a Mongo update matching nothing
        (4, "update", "B", 0, None, None, None, {"text": "orphan"}, None, "2025-01-01 00:00:00"),
        # C: insert -> delete -> stray delta after delete -> tombstone stays
        (5, "insert", "C", 0, "user", "bye", "", None, None, "2025-01-01 00:00:00"),
        (6, "delete", "C", 0, None, None, None, None, None, "2025-01-01 01:00:00"),
        (7, "update", "C", 0, None, None, None, {"text": "zombie"}, None, "2025-01-01 02:00:00"),
        # D: newer full image supersedes an older delta
        (8, "update", "D", 0, None, None, None, {"text": "old delta"}, None, "2025-01-01 00:00:00"),
        (9, "update", "D", 0, "user", "full image", "py", None, None, "2025-01-01 01:00:00"),
    ])
    got = {r["conv_id"]: r for r in reconstruct_post_images(df).collect()}
    assert set(got) == {"A", "C", "D"}
    assert (got["A"]["text"], got["A"]["tool"], got["A"]["seq"]) == ("hello v2", None, 3)
    assert got["A"]["role"] == "user"  # untouched column survives the fold
    assert got["C"]["op"] == "delete" and got["C"]["seq"] == 6
    assert (got["D"]["text"], got["D"]["seq"]) == ("full image", 9)


def test_reconstruct_duplicate_delta_idempotent(spark):
    """Redelivered deltas (same seq) apply once-equivalently: set/remove
    are idempotent, and replayed seqs <= the stored seq are skipped."""
    df = _mk(spark, [
        (1, "insert", "A", 0, "user", "base", "t", None, None, "2025-01-01 00:00:00"),
        (2, "update", "A", 0, None, None, None, {"text": "v2"}, None, "2025-01-01 01:00:00"),
        (2, "update", "A", 0, None, None, None, {"text": "v2"}, None, "2025-01-01 01:00:00"),
    ])
    row = reconstruct_post_images(df).collect()[0]
    assert (row["text"], row["seq"]) == ("v2", 2)


def test_partial_pipeline_matches_golden_and_full_feed(spark, tmp_path):
    """The delta-only feed, run through the streaming sink with
    reconstruction on, equals (a) the driver-side golden replay and
    (b) the full-post-image feed's materialization, byte for byte."""
    t = gen_transcripts(spark, n_convs=30, avg_turns=8, hot_turns=40, seed=7)
    full = gen_transcript_changes(t, seed=7, remove_tool_pct=40).localCheckpoint()
    part = gen_transcript_changes(
        t, seed=7, remove_tool_pct=40, partial_updates=True
    ).localCheckpoint()

    # same logical stream: identical seq/op/key multiset
    assert full.count() == part.count()

    write_change_feed(full, f"{tmp_path}/feed_full", n_files=3)
    write_change_feed(part, f"{tmp_path}/feed_part", n_files=3)
    _, table_full = run_cdc_pipeline(
        spark, f"{tmp_path}/feed_full", f"{tmp_path}/tab_full",
        f"{tmp_path}/ck_full", n_buckets=8,
    )
    _, table_part = run_cdc_pipeline(
        spark, f"{tmp_path}/feed_part", f"{tmp_path}/tab_part",
        f"{tmp_path}/ck_part", n_buckets=8, partial_updates=True,
    )
    rows_full = sorted(map(tuple, table_full.read().collect()))
    rows_part = sorted(map(tuple, table_part.read().collect()))
    assert rows_part == rows_full

    golden = golden_partial_replay([r.asDict() for r in part.collect()])
    got = {(r["conv_id"], r["turn_idx"]): r.asDict() for r in table_part.read().collect()}
    assert set(got) == set(golden)
    for k, exp in golden.items():
        for c in ("role", "text", "tool", "ts"):
            assert got[k][c] == exp[c], f"{k}.{c}: {got[k][c]!r} != {exp[c]!r}"


def test_partial_pipeline_restart_is_noop(spark, tmp_path):
    t = gen_transcripts(spark, n_convs=10, avg_turns=6, hot_turns=20, seed=3)
    part = gen_transcript_changes(t, seed=3, partial_updates=True).localCheckpoint()
    write_change_feed(part, f"{tmp_path}/feed", n_files=2)
    _, table = run_cdc_pipeline(
        spark, f"{tmp_path}/feed", f"{tmp_path}/tab", f"{tmp_path}/ck",
        n_buckets=4, partial_updates=True, max_files_per_trigger=1,
    )
    first = sorted(map(tuple, table.read().collect()))
    _, table2 = run_cdc_pipeline(
        spark, f"{tmp_path}/feed", f"{tmp_path}/tab", f"{tmp_path}/ck",
        n_buckets=4, partial_updates=True,
    )
    assert sorted(map(tuple, table2.read().collect())) == first


def test_enrich_with_partials_rejected(spark, tmp_path):
    import pytest

    with pytest.raises(ValueError, match="incompatible"):
        run_cdc_pipeline(
            spark, f"{tmp_path}/nofeed", f"{tmp_path}/tab", f"{tmp_path}/ck",
            enrich=True, partial_updates=True,
        )
