"""YAML config entry point (reference viper config,
/root/reference/cmd/server/main.go:147-180) → EngineManager."""

import textwrap

import pytest

from aktuell_spark.config import load_manager, load_settings, parse_config


def _write(tmp_path, body: str) -> str:
    p = tmp_path / "config.yaml"
    p.write_text(textwrap.dedent(body))
    return str(p)


def test_parse_multi_database_reference_shape(tmp_path):
    # the reference's config.multi-database.yaml shape loads unchanged
    path = _write(
        tmp_path,
        """
        mongodb:
          uri: "mongodb://localhost:27017"
          databases:
            - name: "InventoryDB"
              collections: ["Products", "Orders"]
            - name: "LogsDB"
              collections: ["SystemLogs"]
        server: {host: localhost, port: 8080}
        logging: {level: info}
        """,
    )
    s = load_settings(path)
    assert s.databases.databases == {
        "InventoryDB": ["Products", "Orders"],
        "LogsDB": ["SystemLogs"],
    }
    # no explicit subscriptions -> one wildcard per configured namespace
    names = {sub.name for sub in s.subscriptions}
    assert names == {"InventoryDB.Products", "InventoryDB.Orders", "LogsDB.SystemLogs"}
    assert all(s.databases.is_valid_subscription(x.database, x.collection)
               for x in s.subscriptions)


def test_parse_legacy_single_database_shape():
    s = parse_config(
        {"mongodb": {"database": "aktuell", "collections": ["transcripts"]}}
    )
    assert s.databases.databases == {"aktuell": ["transcripts"]}


def test_parse_rejects_empty():
    with pytest.raises(ValueError, match="no databases"):
        parse_config({"mongodb": {}})
    with pytest.raises(ValueError, match="need a 'name'"):
        parse_config({"mongodb": {"databases": [{"collections": ["x"]}]}})


def test_load_manager_runs_end_to_end(spark, tmp_path):
    """--config path: two databases, explicit subscriptions, engine
    block; the manager materializes each subscription exactly-once."""
    from pyspark.sql import functions as F

    rows = [
        (1, "insert", "dbA", "transcripts", "a", 0, "user", "hi", None, "2025-01-01 00:00:00"),
        (2, "insert", "dbA", "transcripts", "a", 1, "assistant", "yo", None, "2025-01-01 00:00:01"),
        (3, "insert", "dbB", "logs", "b", 0, "user", "log line", None, "2025-01-01 00:00:02"),
        (4, "update", "dbA", "transcripts", "a", 1, "assistant", "yo!", None, "2025-01-01 00:00:03"),
    ]
    ddl = (
        "seq long, op string, database string, collection string, "
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts string"
    )
    feed = str(tmp_path / "feed")
    (
        spark.createDataFrame(rows, ddl)
        .withColumn("ts", F.to_timestamp("ts"))
        .withColumn("updated_fields", F.lit(None).cast("map<string,string>"))
        .withColumn("removed_fields", F.lit(None).cast("array<string>"))
        .write.parquet(feed)
    )

    path = _write(
        tmp_path,
        f"""
        mongodb:
          databases:
            - name: dbA
              collections: [transcripts]
            - name: dbB
              collections: [logs]
        engine:
          feed_dir: {feed}
          root: {tmp_path / 'tables'}
          checkpoint_dir: {tmp_path / 'ckpt'}
          n_buckets: 4
        subscriptions:
          - name: a_turns
            database: dbA
            collection: transcripts
          - name: b_logs
            database: dbB
            collection: logs
        """,
    )
    mgr, settings = load_manager(spark, path)
    mgr.run()
    a = {(r.conv_id, r.turn_idx): r.text for r in mgr.read("dbA", "a_turns").collect()}
    assert a == {("a", 0): "hi", ("a", 1): "yo!"}
    assert mgr.read("dbB", "b_logs").count() == 1
    stats = mgr.stats()
    # 3 dbA events collapse to 2 rows (insert+update of ("a",1) fold)
    assert stats["dbA"]["a_turns"]["merged_rows"] == 2


def test_load_manager_delta_mor_feed(spark, tmp_path):
    """The reference's common stream shape — updates WITHOUT post-images
    (no UpdateLookup, pkg/models/types.go:17-18) — deploys through the
    YAML entry point: ``engine.partial_updates`` + ``engine.merge_on_read``
    reach every per-subscription sink, and the materialization is
    byte-equivalent to the single-pipeline CLI path on the same feed."""
    from aktuell_spark.fixtures import gen_transcript_changes, gen_transcripts
    from aktuell_spark.streaming.pipeline import run_cdc_pipeline, write_change_feed

    t = gen_transcripts(spark, n_convs=12, avg_turns=6, hot_turns=20, seed=11)
    part = gen_transcript_changes(t, seed=11, partial_updates=True).localCheckpoint()
    feed = str(tmp_path / "feed")
    write_change_feed(part, feed, n_files=2)

    path = _write(
        tmp_path,
        f"""
        mongodb:
          databases:
            - name: aktuell
              collections: [transcripts]
        engine:
          feed_dir: {feed}
          root: {tmp_path / 'tables'}
          checkpoint_dir: {tmp_path / 'ckpt'}
          n_buckets: 4
          partial_updates: true
          merge_on_read: true
        subscriptions:
          - name: turns
            database: aktuell
            collection: transcripts
        """,
    )
    mgr, settings = load_manager(spark, path)
    assert settings.partial_updates and settings.merge_on_read
    mgr.run()
    got = mgr.read("aktuell", "turns")

    # reference result: the single-pipeline path (CoW) on the same feed
    _, table = run_cdc_pipeline(
        spark, feed, str(tmp_path / "ref_table"), str(tmp_path / "ref_ckpt"),
        n_buckets=4, partial_updates=True,
    )
    want = table.read()
    cols = sorted(set(got.columns) & set(want.columns))
    assert sorted(got.select(*cols).collect()) == sorted(want.select(*cols).collect())
    assert got.count() > 0


def test_load_manager_cli_overrides(spark, tmp_path):
    path = _write(
        tmp_path,
        """
        mongodb:
          databases: [{name: dbA, collections: []}]
        """,
    )
    with pytest.raises(ValueError, match="feed_dir missing"):
        load_manager(spark, path)
