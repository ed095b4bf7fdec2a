"""Round-6 ADVICE fixes, each with the failure mode it closes.

1. fanout epoch snapshot: an in-flight epoch must keep merging with the
   table set it started with while remove_subscription runs concurrently
   (no KeyError mid-foreachBatch); the physical drop defers to epoch end.
2. decode_wav_pcm: truncated data chunk returns None, never struct.error.
3. _read_cow_as_of: missing/corrupt later-epoch sidecar refuses loudly
   instead of silently serving current buckets as history.
4. token_budget_mix: Spark and oracle enumerate the SAME language set
   when the data carries a language outside MIX_WEIGHTS.
5. seed-epoch band exhaustion raises instead of silently colliding.
"""

from __future__ import annotations

import os
import threading

import pytest
from pyspark.sql import functions as F

from aktuell_spark.fixtures import gen_transcript_changes, gen_transcripts
from aktuell_spark.streaming.fanout import FanoutSink, Subscription


@pytest.fixture(scope="module")
def change_batch(spark):
    t = gen_transcripts(spark, n_convs=12, avg_turns=5, seed=61)
    return gen_transcript_changes(t, seed=61).localCheckpoint()


def test_concurrent_remove_does_not_kill_inflight_epoch(
    spark, change_batch, tmp_path
):
    """remove_subscription(drop_table=True) racing merge_batch: the
    epoch finishes with its snapshot (both tables merged), and the
    dropped table's directory is removed only after the epoch drains."""
    sink = FanoutSink(
        spark, str(tmp_path / "race"),
        [Subscription("a"), Subscription("b")], n_buckets=4,
    )
    table_b_root = sink.tables["b"].root
    started, release = threading.Event(), threading.Event()
    orig = sink.tables["a"].merge_batch

    def blocking_merge(df, epoch_id):
        started.set()
        assert release.wait(timeout=60)
        return orig(df, epoch_id)

    sink.tables["a"].merge_batch = blocking_merge

    errs: list[BaseException] = []

    def run_epoch():
        try:
            sink.merge_batch(change_batch, 0)
        except BaseException as e:  # noqa: BLE001 - surfaced to assert
            errs.append(e)

    th = threading.Thread(target=run_epoch)
    th.start()
    assert started.wait(timeout=60)
    # epoch is mid-flight (table a blocked); remove b with drop_table
    sink.remove_subscription("b", drop_table=True)
    # membership mutated immediately, but the physical drop is deferred
    assert "b" not in sink.tables
    assert os.path.isdir(table_b_root)
    release.set()
    th.join(timeout=120)
    assert not th.is_alive()
    assert errs == [], errs
    # epoch drained: deferred drop executed, table a holds the batch
    assert not os.path.isdir(table_b_root)
    assert sink.read("a").count() > 0


def test_truncated_wav_returns_none():
    from aktuell_spark.functions.multimodal import decode_wav_pcm, wav_bytes

    full = wav_bytes(60, sample_rate=8000, channels=1, seed=42)
    assert decode_wav_pcm(full) is not None
    # cut the payload mid-data-chunk: header parses, data is short
    truncated = full[: len(full) - 40]
    assert decode_wav_pcm(truncated) is None


def test_cow_as_of_refuses_on_missing_sidecar(spark, change_batch, tmp_path):
    from aktuell_spark.streaming.sink import BucketedUpsertTable

    t = BucketedUpsertTable(
        spark, str(tmp_path / "cow_sidecar"), n_buckets=4,
        cow_retain_epochs=4,
    )
    half = change_batch.filter(F.col("seq") % 2 == 0)
    rest = change_batch.filter(F.col("seq") % 2 == 1)
    t.merge_batch(half, 0)
    t.merge_batch(rest, 1)
    assert t.read(as_of_epoch=0).count() > 0  # healthy chain reconstructs
    os.remove(os.path.join(t.metrics_dir, "epoch-1.json"))
    with pytest.raises(ValueError, match="sidecar"):
        t.read(as_of_epoch=0).count()


def test_token_budget_mix_ignores_unweighted_language(spark, tmp_path):
    """A corpus language outside MIX_WEIGHTS must not diverge the Spark
    and oracle row sets (both enumerate weighted ∩ present only)."""
    import duckdb

    from aktuell_spark.queries import q_token_budget_mix, _token_budget_mix_sql

    src = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    extra = src.limit(7).withColumn("lang", F.lit("xx"))
    sf_dir = str(tmp_path / "mixsf")
    src.unionByName(extra).coalesce(1).write.parquet(f"{sf_dir}/documents.parquet")

    got = {
        r["lang"]: (r["lang_tokens"], r["rate"], r["n_docs_sampled"],
                    r["tokens_sampled"])
        for r in q_token_budget_mix(spark, sf_dir).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"parquet_scan('{sf_dir}/documents.parquet/*.parquet')"
    )
    want = {
        lang: (lt, float(rate), n, tok)
        for lang, lt, rate, n, tok in con.execute(
            _token_budget_mix_sql()
        ).fetchall()
    }
    assert "xx" not in got
    assert set(got) == set(want)
    for lang in want:
        g, w = got[lang], want[lang]
        assert g[0] == w[0] and g[2] == w[2] and g[3] == w[3], (lang, g, w)
        assert abs(g[1] - w[1]) < 1e-9, (lang, g, w)


def test_seed_epoch_band_guard(spark, tmp_path):
    sink = FanoutSink(
        spark, str(tmp_path / "band"), [Subscription("a")], n_buckets=2,
    )
    table = sink.tables["a"]
    fake = [sink.SEED_EPOCH_BASE - i for i in range(999_500)]
    table._committed_epochs = lambda: fake  # type: ignore[method-assign]
    with pytest.raises(RuntimeError, match="seed-epoch band"):
        sink._next_seed_epoch(table)
