"""Epoch time travel on the merge-on-read sink (Iceberg VERSION AS OF
analogue): MoR keeps each epoch's run files until compaction, so a
snapshot read is a scan restricted to runs <= E plus the drop floor AS
RECORDED in E's commit marker."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aktuell_spark.streaming.sink import BucketedUpsertTable

DDL = (
    "seq long, op string, conv_id string, turn_idx int, role string, "
    "text string, tool string, ts string"
)


def _batch(spark, rows):
    return spark.createDataFrame(rows, DDL).withColumn("ts", F.to_timestamp("ts"))


def _mor(spark, tmp_path, name="t"):
    return BucketedUpsertTable(
        spark, str(tmp_path / name), n_buckets=4, merge_on_read=True
    )


def test_as_of_epoch_snapshots(spark, tmp_path):
    table = _mor(spark, tmp_path)
    table.merge_batch(_batch(spark, [
        (1, "insert", "a", 0, "u", "a0", "", "2025-01-01 00:00:00"),
        (2, "insert", "b", 0, "u", "b0", "", "2025-01-01 00:00:01"),
    ]), 0)
    table.merge_batch(_batch(spark, [
        (3, "update", "a", 0, "u", "a1", "", "2025-01-01 00:01:00"),
        (4, "insert", "c", 0, "u", "c0", "", "2025-01-01 00:01:01"),
    ]), 1)
    table.merge_batch(_batch(spark, [
        (5, "delete", "b", 0, None, None, None, "2025-01-01 00:02:00"),
    ]), 2)

    def state(df):
        return {r["conv_id"]: r["text"] for r in df.collect()}

    assert state(table.read(as_of_epoch=0)) == {"a": "a0", "b": "b0"}
    assert state(table.read(as_of_epoch=1)) == {"a": "a1", "b": "b0", "c": "c0"}
    assert state(table.read(as_of_epoch=2)) == {"a": "a1", "c": "c0"}
    assert state(table.read()) == state(table.read(as_of_epoch=2))


def test_as_of_epoch_uses_floor_of_that_epoch(spark, tmp_path):
    """A collection drop in a later epoch must not erase earlier
    snapshots: the floor applied is the one recorded at E's commit."""
    table = _mor(spark, tmp_path)
    table.merge_batch(_batch(spark, [
        (1, "insert", "a", 0, "u", "a0", "", "2025-01-01 00:00:00"),
        (2, "insert", "b", 0, "u", "b0", "", "2025-01-01 00:00:01"),
    ]), 0)
    table.merge_batch(_batch(spark, [
        (10, "drop", "", -1, None, None, None, "2025-01-01 01:00:00"),
        (11, "insert", "e", 0, "u", "e0", "", "2025-01-01 01:00:01"),
    ]), 1)
    assert {r["conv_id"] for r in table.read().collect()} == {"e"}
    # snapshot BEFORE the drop still sees the pre-drop rows
    assert {r["conv_id"] for r in table.read(as_of_epoch=0).collect()} == {"a", "b"}
    assert {r["conv_id"] for r in table.read(as_of_epoch=1).collect()} == {"e"}


def test_as_of_epoch_rejects_cow_and_post_compaction(spark, tmp_path):
    cow = BucketedUpsertTable(spark, str(tmp_path / "cow"), n_buckets=4)
    cow.merge_batch(_batch(spark, [
        (1, "insert", "a", 0, "u", "a0", "", "2025-01-01 00:00:00"),
    ]), 0)
    with pytest.raises(ValueError, match="merge_on_read"):
        cow.read(as_of_epoch=0)

    mor = _mor(spark, tmp_path, "mor")
    mor.merge_batch(_batch(spark, [
        (1, "insert", "a", 0, "u", "a0", "", "2025-01-01 00:00:00"),
    ]), 0)
    mor.merge_batch(_batch(spark, [
        (2, "update", "a", 0, "u", "a1", "", "2025-01-01 00:01:00"),
    ]), 1)
    assert {r["text"] for r in mor.read(as_of_epoch=0).collect()} == {"a0"}
    mor.compact(tombstone_horizon=0)
    with pytest.raises(ValueError, match="compact"):
        mor.read(as_of_epoch=0)
    # current read still fine after compaction
    assert {r["text"] for r in mor.read().collect()} == {"a1"}


def test_as_of_epoch_partial_updates_mor(spark, tmp_path):
    """Time travel composes with MoR × partial updates (delta runs are
    reconstructed from only the runs <= E)."""
    table = BucketedUpsertTable(
        spark, str(tmp_path / "morp"), n_buckets=4,
        merge_on_read=True, partial_updates=True,
    )
    full = _batch(spark, [
        (1, "insert", "a", 0, "u", "a0", "", "2025-01-01 00:00:00"),
    ]).withColumn("updated_fields", F.lit(None).cast("map<string,string>")) \
      .withColumn("removed_fields", F.lit(None).cast("array<string>"))
    table.merge_batch(full, 0)
    delta = _batch(spark, [
        (2, "update", "a", 0, None, None, None, "2025-01-01 00:01:00"),
    ]).withColumn(
        "updated_fields",
        F.create_map(F.lit("text"), F.lit("a1")).cast("map<string,string>"),
    ).withColumn("removed_fields", F.lit(None).cast("array<string>"))
    table.merge_batch(delta, 1)
    assert {r["text"] for r in table.read(as_of_epoch=0).collect()} == {"a0"}
    assert {r["text"] for r in table.read(as_of_epoch=1).collect()} == {"a1"}


# -- incremental change reads ------------------------------------------

def test_changes_between_epochs(spark, tmp_path):
    table = _mor(spark, tmp_path, "cdf")
    table.merge_batch(_batch(spark, [
        (1, "insert", "a", 0, "u", "a0", "", "2025-01-01 00:00:00"),
        (2, "insert", "b", 0, "u", "b0", "", "2025-01-01 00:00:01"),
    ]), 0)
    table.merge_batch(_batch(spark, [
        (3, "update", "a", 0, "u", "a1", "", "2025-01-01 00:01:00"),
    ]), 1)
    table.merge_batch(_batch(spark, [
        (4, "update", "a", 0, "u", "a2", "", "2025-01-01 00:02:00"),
        (5, "delete", "b", 0, None, None, None, "2025-01-01 00:02:01"),
    ]), 2)

    ch = {(r["conv_id"], r["op"], r["text"])
          for r in table.changes(since_epoch=0).collect()}
    # epochs 1..2 net: a updated to a2 (final image in range), b deleted
    assert ch == {("a", "update", "a2"), ("b", "delete", None)}

    ch01 = {(r["conv_id"], r["op"], r["text"])
            for r in table.changes(0, 1).collect()}
    assert ch01 == {("a", "update", "a1")}

    # empty range
    assert table.changes(2, 2).count() == 0


def test_changes_rejects_cow(spark, tmp_path):
    cow = BucketedUpsertTable(spark, str(tmp_path / "cow2"), n_buckets=4)
    cow.merge_batch(_batch(spark, [
        (1, "insert", "a", 0, "u", "a0", "", "2025-01-01 00:00:00"),
    ]), 0)
    with pytest.raises(ValueError, match="merge_on_read"):
        cow.changes(0)


def test_changes_feed_a_downstream_table(spark, tmp_path):
    """The point of the feed: a second sink tails this table's changes
    and converges to the same state."""
    up = _mor(spark, tmp_path, "up")
    up.merge_batch(_batch(spark, [
        (1, "insert", "a", 0, "u", "a0", "", "2025-01-01 00:00:00"),
        (2, "insert", "b", 0, "u", "b0", "", "2025-01-01 00:00:01"),
    ]), 0)
    up.merge_batch(_batch(spark, [
        (3, "update", "a", 0, "u", "a1", "", "2025-01-01 00:01:00"),
        (4, "delete", "b", 0, None, None, None, "2025-01-01 00:01:01"),
    ]), 1)
    down = BucketedUpsertTable(spark, str(tmp_path / "down"), n_buckets=4)
    for i, since in enumerate([-1, 0]):
        delta = up.changes(since, since + 1).drop("bucket")
        down.merge_batch(delta, i)
    assert (
        {(r["conv_id"], r["text"]) for r in down.read().collect()}
        == {(r["conv_id"], r["text"]) for r in up.read().collect()}
        == {("a", "a1")}
    )


# -- metadata tables ---------------------------------------------------

def test_history_and_files_metadata(spark, tmp_path):
    table = _mor(spark, tmp_path, "meta")
    table.merge_batch(_batch(spark, [
        (1, "insert", "a", 0, "u", "a0", "", "2025-01-01 00:00:00"),
        (2, "insert", "b", 0, "u", "b0", "", "2025-01-01 00:00:01"),
    ]), 0)
    table.merge_batch(_batch(spark, [
        (3, "update", "a", 0, "u", "a1", "", "2025-01-01 00:01:00"),
    ]), 1)
    hist = {r["epoch"]: r for r in table.history().collect()}
    assert set(hist) == {0, 1}
    assert hist[0]["merged_rows"] == 2 and hist[1]["merged_rows"] == 1
    assert all(r["merge_sec"] > 0 for r in hist.values())

    files = table.files().collect()
    # MoR: every live file is an epoch run; rows add up to total events
    assert all(f["epoch"] in (0, 1) for f in files)
    assert sum(f["n_rows"] for f in files) == 3
    assert all(f["bytes"] > 0 for f in files)


# -- schema evolution --------------------------------------------------

def test_mor_schema_evolution_add_column(spark, tmp_path):
    """A payload column added mid-stream (Iceberg add-column analogue):
    old runs lack it; reads fill null for pre-evolution rows and carry
    the value for post-evolution rows."""
    root = str(tmp_path / "evo")
    import pyspark.sql.types as T

    base_payload = ("conv_id", "turn_idx", "role", "text", "tool", "ts")
    t1 = BucketedUpsertTable(
        spark, root, n_buckets=4, merge_on_read=True, payload=base_payload
    )
    t1.merge_batch(_batch(spark, [
        (1, "insert", "a", 0, "u", "a0", "", "2025-01-01 00:00:00"),
    ]), 0)

    evolved = (*base_payload, "channel")
    schema = T.StructType(
        list(_batch(spark, []).schema.fields)
        + [T.StructField("channel", T.StringType(), True)]
    )
    t2 = BucketedUpsertTable(
        spark, root, n_buckets=4, merge_on_read=True, payload=evolved,
        payload_schema=schema,
    )
    b2 = _batch(spark, [
        (2, "insert", "b", 0, "u", "b0", "", "2025-01-01 00:01:00"),
    ]).withColumn("channel", F.lit("web"))
    t2.merge_batch(b2, 1)

    got = {r["conv_id"]: r["channel"] for r in t2.read().collect()}
    assert got == {"a": None, "b": "web"}
    # time travel before the evolution also resolves (all-null column)
    assert {r["conv_id"] for r in t2.read(as_of_epoch=0).collect()} == {"a"}


# -- sorted compaction (data skipping) ---------------------------------

def test_compact_sort_within_clusters_rows(spark, tmp_path):
    """sort_within compaction writes each bucket file clustered by the
    sort key, so parquet row-group min/max stats become disjoint and
    point predicates skip row groups at scan time."""
    import os

    import pyarrow.parquet as pq

    table = _mor(spark, tmp_path, "zorder")
    rows = [
        (i + 1, "insert", f"conv-{i % 7:02d}", i // 7, "u", f"t{i}", "",
         "2025-01-01 00:00:00")
        for i in range(40)
    ]
    table.merge_batch(_batch(spark, rows[:20]), 0)
    table.merge_batch(_batch(spark, rows[20:]), 1)
    before = {(r["conv_id"], r["turn_idx"], r["text"])
              for r in table.read().collect()}
    table.compact(tombstone_horizon=0, sort_within=("conv_id", "turn_idx"))
    after = {(r["conv_id"], r["turn_idx"], r["text"])
             for r in table.read().collect()}
    assert after == before  # rewrite changes layout, never content

    for entry in os.listdir(table.data_dir):
        if not entry.startswith("bucket="):
            continue
        bdir = os.path.join(table.data_dir, entry)
        for fn in os.listdir(bdir):
            if not fn.endswith(".parquet"):
                continue
            col = pq.read_table(
                os.path.join(bdir, fn), columns=["conv_id", "turn_idx"]
            )
            pairs = list(zip(
                col.column("conv_id").to_pylist(),
                col.column("turn_idx").to_pylist(),
            ))
            assert pairs == sorted(pairs), f"{fn} not clustered"


def test_changes_across_schema_evolution(spark, tmp_path):
    """Incremental reads spanning an add-column boundary: pre-evolution
    epochs surface null for the new column."""
    import pyspark.sql.types as T

    root = str(tmp_path / "evo2")
    base_payload = ("conv_id", "turn_idx", "role", "text", "tool", "ts")
    t1 = BucketedUpsertTable(
        spark, root, n_buckets=4, merge_on_read=True, payload=base_payload
    )
    t1.merge_batch(_batch(spark, [
        (1, "insert", "a", 0, "u", "a0", "", "2025-01-01 00:00:00"),
    ]), 0)
    schema = T.StructType(
        list(_batch(spark, []).schema.fields)
        + [T.StructField("channel", T.StringType(), True)]
    )
    t2 = BucketedUpsertTable(
        spark, root, n_buckets=4, merge_on_read=True,
        payload=(*base_payload, "channel"), payload_schema=schema,
    )
    t2.merge_batch(
        _batch(spark, [
            (2, "insert", "b", 0, "u", "b0", "", "2025-01-01 00:01:00"),
        ]).withColumn("channel", F.lit("web")),
        1,
    )
    got = {r["conv_id"]: r["channel"]
           for r in t2.changes(since_epoch=-1).collect()}
    assert got == {"a": None, "b": "web"}


# -- expire_runs (bounded history) -------------------------------------

def test_expire_runs_keeps_recent_history(spark, tmp_path):
    table = _mor(spark, tmp_path, "exp")
    table.merge_batch(_batch(spark, [
        (1, "insert", "a", 0, "u", "a0", "", "2025-01-01 00:00:00"),
        (2, "insert", "b", 0, "u", "b0", "", "2025-01-01 00:00:01"),
    ]), 0)
    table.merge_batch(_batch(spark, [
        (3, "update", "a", 0, "u", "a1", "", "2025-01-01 00:01:00"),
    ]), 1)
    table.merge_batch(_batch(spark, [
        (4, "delete", "b", 0, None, None, None, "2025-01-01 00:02:00"),
    ]), 2)
    before = {(r["conv_id"], r["text"]) for r in table.read().collect()}
    as_of_1 = {r["conv_id"]: r["text"]
               for r in table.read(as_of_epoch=1).collect()}

    res = table.expire_runs(keep_after_epoch=0)
    assert res["kept_runs"] >= 2  # epochs 1 and 2 survive as runs

    # current state unchanged by the fold
    assert {(r["conv_id"], r["text"]) for r in table.read().collect()} == before
    # post-cutoff time travel still works and matches pre-expire
    assert {r["conv_id"]: r["text"]
            for r in table.read(as_of_epoch=1).collect()} == as_of_1
    # pre-cutoff snapshots are gone — loudly
    import pytest as _pytest
    with _pytest.raises(ValueError, match="cutoff"):
        table.read(as_of_epoch=0)
    # incremental reads above the cutoff still work; below refuse
    ch = {(r["conv_id"], r["op"]) for r in table.changes(1, 2).collect()}
    assert ch == {("b", "delete")}
    with _pytest.raises(ValueError, match="cutoff"):
        table.changes(-1, 2)


def test_expire_runs_preserves_tombstones(spark, tmp_path):
    """A delete folded into the base must stay a tombstone: a replayed
    pre-delete event cannot resurrect the key."""
    table = _mor(spark, tmp_path, "exp2")
    table.merge_batch(_batch(spark, [
        (1, "insert", "a", 0, "u", "a0", "", "2025-01-01 00:00:00"),
    ]), 0)
    table.merge_batch(_batch(spark, [
        (2, "delete", "a", 0, None, None, None, "2025-01-01 00:01:00"),
    ]), 1)
    table.merge_batch(_batch(spark, [
        (3, "insert", "c", 0, "u", "c0", "", "2025-01-01 00:02:00"),
    ]), 2)
    table.expire_runs(keep_after_epoch=1)
    # replay of the PRE-delete insert in a later epoch: LWW must keep
    # the tombstone (seq 1 < 2)
    table.merge_batch(_batch(spark, [
        (1, "insert", "a", 0, "u", "a0", "", "2025-01-01 00:00:00"),
    ]), 3)
    assert {r["conv_id"] for r in table.read().collect()} == {"c"}


# -- CoW retention window (round 5, VERDICT task #7) -------------------

def _cow_retained(spark, tmp_path, name, retain):
    return BucketedUpsertTable(
        spark, str(tmp_path / name), n_buckets=4, cow_retain_epochs=retain
    )


def test_cow_retention_time_travel(spark, tmp_path):
    """read(as_of_epoch) works on a copy-on-write table within the
    retention window and refuses loudly beyond it."""
    t = _cow_retained(spark, tmp_path, "cowr", retain=2)
    t.merge_batch(_batch(spark, [
        (1, "insert", "a", 0, "u", "a0", "", "2025-01-01 00:00:00"),
        (2, "insert", "b", 0, "u", "b0", "", "2025-01-01 00:00:01"),
    ]), 0)
    t.merge_batch(_batch(spark, [
        (3, "update", "a", 0, "u", "a1", "", "2025-01-01 00:01:00"),
        (4, "insert", "c", 0, "u", "c0", "", "2025-01-01 00:01:01"),
    ]), 1)
    t.merge_batch(_batch(spark, [
        (5, "delete", "b", 0, None, None, None, "2025-01-01 00:02:00"),
    ]), 2)

    def state(df):
        return {r["conv_id"]: r["text"] for r in df.collect()}

    # window = last 2 asides (epochs 1 and 2) -> travel to 0 and 1 works
    assert state(t.read(as_of_epoch=1)) == {"a": "a1", "b": "b0", "c": "c0"}
    assert state(t.read(as_of_epoch=0)) == {"a": "a0", "b": "b0"}
    assert state(t.read(as_of_epoch=2)) == state(t.read())

    # epoch 3 prunes epoch 1's aside -> travel to 0 now refuses
    t.merge_batch(_batch(spark, [
        (6, "update", "c", 0, "u", "c1", "", "2025-01-01 00:03:00"),
    ]), 3)
    with pytest.raises(ValueError, match="retention window"):
        t.read(as_of_epoch=0)
    assert state(t.read(as_of_epoch=1)) == {"a": "a1", "b": "b0", "c": "c0"}
    with pytest.raises(ValueError, match="not committed"):
        t.read(as_of_epoch=7)


def test_cow_retention_off_still_refuses(spark, tmp_path):
    t = _cow_retained(spark, tmp_path, "cowoff", retain=0)
    t.merge_batch(_batch(spark, [
        (1, "insert", "a", 0, "u", "a0", "", "2025-01-01 00:00:00"),
    ]), 0)
    with pytest.raises(ValueError, match="merge_on_read"):
        t.read(as_of_epoch=0)


def test_cow_retention_survives_reopen_and_drop_floor(spark, tmp_path):
    """Retained asides persist on disk: a reopened table object still
    time-travels; a later collection drop does not erase the earlier
    snapshot (floor applied is the one at E's commit)."""
    root = tmp_path / "cowreopen"
    t = BucketedUpsertTable(spark, str(root), n_buckets=4, cow_retain_epochs=4)
    t.merge_batch(_batch(spark, [
        (1, "insert", "a", 0, "u", "a0", "", "2025-01-01 00:00:00"),
        (2, "insert", "b", 0, "u", "b0", "", "2025-01-01 00:00:01"),
    ]), 0)
    t.merge_batch(_batch(spark, [
        (5, "drop", "", 0, None, None, None, "2025-01-01 00:01:00"),
        (6, "insert", "c", 0, "u", "c0", "", "2025-01-01 00:01:01"),
    ]), 1)
    re = BucketedUpsertTable(spark, str(root), n_buckets=4, cow_retain_epochs=4)
    assert {r["conv_id"] for r in re.read(as_of_epoch=0).collect()} == {"a", "b"}
    assert {r["conv_id"] for r in re.read(as_of_epoch=1).collect()} == {"c"}


# -- CoW-with-retention change feed (round-6 task #4) ------------------

def _cow_retained(spark, tmp_path, name="cowch", retain=8):
    return BucketedUpsertTable(
        spark, str(tmp_path / name), n_buckets=4, cow_retain_epochs=retain
    )


def test_cow_changes_feed_a_downstream_table(spark, tmp_path):
    """Mirror of test_changes_feed_a_downstream_table on a CoW table
    with epoch retention: a second sink tails the diff-based feed and
    converges to the same state, deletes included (the tombstone rides
    with its real seq)."""
    up = _cow_retained(spark, tmp_path, "up")
    up.merge_batch(_batch(spark, [
        (1, "insert", "a", 0, "u", "a0", "", "2025-01-01 00:00:00"),
        (2, "insert", "b", 0, "u", "b0", "", "2025-01-01 00:00:01"),
    ]), 0)
    up.merge_batch(_batch(spark, [
        (3, "update", "a", 0, "u", "a1", "", "2025-01-01 00:01:00"),
        (4, "delete", "b", 0, None, None, None, "2025-01-01 00:01:01"),
    ]), 1)
    down = BucketedUpsertTable(spark, str(tmp_path / "down"), n_buckets=4)
    for i, since in enumerate([-1, 0]):
        delta = up.changes(since, since + 1).drop("bucket")
        down.merge_batch(delta, i)
    assert (
        {(r["conv_id"], r["text"]) for r in down.read().collect()}
        == {(r["conv_id"], r["text"]) for r in up.read().collect()}
        == {("a", "a1")}
    )


def test_cow_changes_collapses_range_and_skips_untouched(spark, tmp_path):
    up = _cow_retained(spark, tmp_path, "rng")
    up.merge_batch(_batch(spark, [
        (1, "insert", "a", 0, "u", "a0", "", "2025-01-01 00:00:00"),
        (2, "insert", "b", 0, "u", "b0", "", "2025-01-01 00:00:01"),
    ]), 0)
    up.merge_batch(_batch(spark, [
        (3, "update", "a", 0, "u", "a1", "", "2025-01-01 00:01:00"),
    ]), 1)
    up.merge_batch(_batch(spark, [
        (4, "update", "a", 0, "u", "a2", "", "2025-01-01 00:02:00"),
    ]), 2)
    # (0, 2]: a touched twice collapses to final image; b untouched
    delta = {(r["conv_id"], r["text"], r["seq"])
             for r in up.changes(0, 2).collect()}
    assert delta == {("a", "a2", 4)}
    # empty range
    assert up.changes(2).count() == 0


def test_cow_changes_refusals(spark, tmp_path):
    plain = BucketedUpsertTable(spark, str(tmp_path / "plain"), n_buckets=4)
    plain.merge_batch(_batch(spark, [
        (1, "insert", "a", 0, "u", "a0", "", "2025-01-01 00:00:00"),
    ]), 0)
    with pytest.raises(ValueError, match="cow_retain_epochs"):
        plain.changes(-1)

    small = _cow_retained(spark, tmp_path, "small", retain=1)
    for e in range(4):
        small.merge_batch(_batch(spark, [
            (e + 1, "update" if e else "insert", "a", 0, "u", f"a{e}", "",
             "2025-01-01 00:00:00"),
        ]), e)
    # epoch-1 aside expired under retain=1 -> reconstruction refuses
    with pytest.raises(ValueError, match="retention"):
        small.changes(0, 2).count()
