"""Stream-maintained repeated-substring index: the live span table must
equal the batch repeated_substring_spans sweep on the final corpus —
for any slicing/arrival order (a later copy must RETRO-MARK the earlier
site: the 1→2 count transition), for changed-text redeliveries in both
directions (2→1 must unmark the surviving site), ignoring stale
redeliveries, across restarts, and across partial-commit replays (the
as-of-previous-epoch read machinery's whole point)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aktuell_spark.functions.dedupe import repeated_substring_spans
from aktuell_spark.streaming.span_index import (
    StreamingSpanIndex,
    run_span_index_stream,
)

L = 40
BOILER = "this exact license header is repeated verbatim!"  # 48 chars

ROWS = [
    (1, f"{BOILER} plus unique tail number one here"),
    (2, f"unique head two {BOILER} and further text"),
    (3, "entirely unique document with no repetition at all ok"),
    (4, f"third carrier starts now {BOILER} closing words"),
]


def _want(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return sorted(
        map(tuple, repeated_substring_spans(df, min_len=L).collect())
    )


def _got(index):
    return sorted(map(tuple, index.spans().collect()))


def _write(spark, base, rows):
    spark.createDataFrame(
        rows, "doc_id long, text string, seq long"
    ).coalesce(1).write.mode("append").parquet(f"{base}/feed")


def _run(spark, base):
    return run_span_index_stream(
        spark, f"{base}/feed", f"{base}/idx", f"{base}/ckpt",
        min_len=L, n_buckets=8, max_files_per_trigger=1,
    )[1]


def test_stream_equals_batch_any_order_with_retro_mark(spark, tmp_path):
    want = _want(spark, ROWS)
    assert len(want) == 3, "fixture must repeat; test is vacuous"
    seqd = [(i, t, i) for i, t in ROWS]
    slicings = {
        # doc 1 arrives ALONE first: its site is unique until doc 2
        # lands — the 1→2 transition must retro-mark doc 1's span
        "one_by_one": [[r] for r in seqd],
        "first_alone": [seqd[:1], seqd[1:]],
        "all_at_once": [seqd],
        "reversed": [[r] for r in reversed(seqd)],
    }
    for name, files in slicings.items():
        base = str(tmp_path / name)
        for chunk in files:
            _write(spark, base, chunk)
        index = _run(spark, base)
        assert _got(index) == want, name


def test_stream_equals_batch_on_real_corpus(spark, tmp_path):
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .localCheckpoint()
    )
    want = sorted(
        map(tuple, repeated_substring_spans(docs, min_len=50).collect())
    )
    assert want, "corpus fixture has no repeated spans; test is vacuous"
    base = str(tmp_path)
    feed = docs.withColumn("seq", F.col("doc_id").cast("long"))
    for p in (0, 1):
        feed.filter(F.col("doc_id") % 2 == p).coalesce(1).write.mode(
            "append"
        ).parquet(f"{base}/feed")
    _, index = run_span_index_stream(
        spark, f"{base}/feed", f"{base}/idx", f"{base}/ckpt",
        min_len=50, n_buckets=8, max_files_per_trigger=1,
    )
    assert _got(index) == want


def test_redelivery_transitions_restart_and_stale(spark, tmp_path):
    base = str(tmp_path)
    rows = {i: t for i, t in ROWS}
    _write(spark, base, [(i, t, i) for i, t in ROWS])
    index = _run(spark, base)
    assert _got(index) == _want(spark, list(rows.items()))
    # restart: no-op
    assert _got(_run(spark, base)) == _got(index)

    # doc 4 drops the boilerplate (3→2 copies: spans for 1 and 2 stay,
    # doc 4's vanish)
    rows[4] = "third carrier rewritten clean with fresh content"
    _write(spark, base, [(4, rows[4], 100)])
    index = _run(spark, base)
    assert _got(index) == _want(spark, list(rows.items()))
    assert 4 not in {r[0] for r in _got(index)}

    # doc 2 drops it too (2→1: doc 1's SURVIVING site must unmark)
    rows[2] = "second doc rewritten totally clean as well now"
    _write(spark, base, [(2, rows[2], 101)])
    index = _run(spark, base)
    assert _got(index) == _want(spark, list(rows.items()))
    assert _got(index) == []

    # doc 3 redelivered WITH the boilerplate (1→2: retro-mark doc 1)
    rows[3] = f"{BOILER} now lives in document three"
    _write(spark, base, [(3, rows[3], 102)])
    index = _run(spark, base)
    assert _got(index) == _want(spark, list(rows.items()))
    assert {r[0] for r in _got(index)} == {1, 3}

    # stale out-of-order redelivery: ignored
    _write(spark, base, [(3, "stale text without the header", 5)])
    index = _run(spark, base)
    assert _got(index) == _want(spark, list(rows.items()))


@pytest.mark.parametrize("crash_after", ["positions", "counts", "marked"])
def test_partial_commit_replay_converges(spark, tmp_path, crash_after):
    """Crash between table merges (everything up to and including
    ``crash_after`` committed, the rest not), then replay the batch:
    the as-of-previous-epoch reads must recompute identical deltas and
    transitions — the counts table especially must not double-apply."""
    index = StreamingSpanIndex(
        spark, str(tmp_path / "idx"), min_len=L, n_buckets=4
    )

    def batch(rows, epoch):
        index.merge_batch(
            spark.createDataFrame(rows, "doc_id long, text string, seq long"),
            epoch,
        )

    batch([(i, t, i) for i, t in ROWS], 0)
    # epoch 1: doc 2 drops the boilerplate (steady transition) AND a
    # new doc 5 brings a brand-new duplicate of doc 3's tail — both
    # count directions in the replayed epoch
    epoch1 = [
        (2, "second doc rewritten totally clean as well now", 101),
        (5, "entirely unique document with no repetition at all ok", 102),
    ]
    order = ["positions", "counts", "marked", "docs"]
    crash_table = getattr(index, order[order.index(crash_after) + 1])
    real = crash_table.merge_batch

    def dying(df, epoch_id):
        raise RuntimeError("injected crash between table merges")

    crash_table.merge_batch = dying
    with pytest.raises(RuntimeError, match="injected"):
        batch(epoch1, 1)
    crash_table.merge_batch = real
    batch(epoch1, 1)  # replay

    final = [
        (1, ROWS[0][1]),
        (2, epoch1[0][1]),
        (3, ROWS[2][1]),
        (4, ROWS[3][1]),
        (5, epoch1[1][1]),
    ]
    assert _got(index) == _want(spark, final)
    # count invariant: replay must not double-apply deltas
    got_cnt = {
        r[0]: r[1] for r in index.counts.read().collect()
    }
    from aktuell_spark.functions.dedupe import char_gram_positions

    want_cnt = {
        r[0]: r[1]
        for r in char_gram_positions(
            spark.createDataFrame(final, "doc_id long, text string"),
            "doc_id", "text", L,
        ).groupBy("h").count().collect()
    }
    assert got_cnt == want_cnt


def test_expire_then_keep_streaming(spark, tmp_path):
    """Maintenance cadence: fold old run files (expire) between epochs,
    then keep merging — the next epoch's as-of-previous reads must stay
    valid and the index must still equal the batch sweep (a full
    compact() would record its cutoff at the newest epoch and refuse
    them; `expire` is the safe entry point)."""
    index = StreamingSpanIndex(
        spark, str(tmp_path / "idx"), min_len=L, n_buckets=4
    )

    def batch(rows, epoch):
        index.merge_batch(
            spark.createDataFrame(rows, "doc_id long, text string, seq long"),
            epoch,
        )

    batch([(i, t, i) for i, t in ROWS[:2]], 0)
    batch([(i, t, i) for i, t in ROWS[2:]], 1)
    index.expire()  # folds epoch-0 runs; epoch 1 stays travelable
    # epoch 2 relies on as-of(1) count/position reads: doc 5 duplicates
    # doc 3's text (1->2 retro-mark of a site folded into the base)
    batch([(5, ROWS[2][1], 50)], 2)
    final = [*ROWS, (5, ROWS[2][1])]
    assert _got(index) == _want(spark, final)
    assert {r[0] for r in _got(index)} >= {3, 5}


def test_cleaned_matches_batch_strip(spark, tmp_path):
    from aktuell_spark.functions.dedupe import strip_repeated_spans

    base = str(tmp_path)
    seqd = [(i, t, i) for i, t in ROWS]
    _write(spark, base, seqd[:2])
    _write(spark, base, seqd[2:])
    index = _run(spark, base)
    want = sorted(
        map(
            tuple,
            strip_repeated_spans(
                spark.createDataFrame(ROWS, "doc_id long, text string"),
                min_len=L,
            ).collect(),
        )
    )
    assert sorted(map(tuple, index.cleaned().collect())) == want
    assert any(r[2] > 0 for r in want), "nothing stripped; vacuous"
