"""Stream-maintained MinHash-LSH dedup index: the live index must find
exactly the near-dup pairs the batch sweep finds on the final corpus —
for any batch slicing, across restarts, and for late-arriving
duplicates."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aktuell_spark.functions.dedupe import minhash_lsh_pairs
from aktuell_spark.streaming.dedup_index import run_dedup_index_stream


@pytest.fixture(scope="module")
def docs(spark):
    return (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .localCheckpoint()
    )


def _feed(docs):
    return docs.withColumn("seq", F.col("doc_id"))


def _pairs(df):
    return sorted(map(tuple, df.collect()))


def test_stream_pairs_equal_batch_for_any_slicing(spark, docs, tmp_path):
    want = _pairs(minhash_lsh_pairs(docs, threshold=0.2))
    assert want, "fixture corpus has no near-dup pairs; test is vacuous"
    for slices, name in ((2, "s2"), (5, "s5")):
        base = str(tmp_path / name)
        for i in range(slices):
            (
                _feed(docs.filter(F.col("doc_id") % slices == i))
                .coalesce(1).write.mode("append").parquet(f"{base}/feed")
            )
        _, index = run_dedup_index_stream(
            spark, f"{base}/feed", f"{base}/idx", f"{base}/ckpt",
            threshold=0.2, n_buckets=8, max_files_per_trigger=1,
        )
        assert _pairs(index.found_pairs()) == want, f"slicing {slices}"


def test_restart_is_noop_and_late_dup_found(spark, docs, tmp_path):
    base = str(tmp_path)
    first = docs.filter(F.col("doc_id") >= 10)
    _feed(first).coalesce(1).write.parquet(f"{base}/feed")
    _, index = run_dedup_index_stream(
        spark, f"{base}/feed", f"{base}/idx", f"{base}/ckpt",
        threshold=0.2, n_buckets=8,
    )
    before = _pairs(index.found_pairs())
    # restart on the same checkpoint: nothing new
    _, index = run_dedup_index_stream(
        spark, f"{base}/feed", f"{base}/idx", f"{base}/ckpt",
        threshold=0.2, n_buckets=8,
    )
    assert _pairs(index.found_pairs()) == before

    # generation 2: the held-back docs arrive later; the index must
    # discover exactly the pairs the batch sweep finds on the union
    late = docs.filter(F.col("doc_id") < 10)
    _feed(late).coalesce(1).write.mode("append").parquet(f"{base}/feed")
    _, index = run_dedup_index_stream(
        spark, f"{base}/feed", f"{base}/idx", f"{base}/ckpt",
        threshold=0.2, n_buckets=8,
    )
    want = _pairs(minhash_lsh_pairs(docs, threshold=0.2))
    assert _pairs(index.found_pairs()) == want


def _write_gen(spark, rows, feed):
    (
        spark.createDataFrame(rows, "doc_id long, text string, seq long")
        .coalesce(1).write.mode("append").parquet(feed)
    )


def test_changed_text_redelivery_retracts_stale_pairs(spark, tmp_path):
    """A doc redelivered with CHANGED text must (a) drop pairs its old
    text justified, (b) gain pairs its new text justifies, so the index
    equals the batch sweep on the LATEST corpus — the update contract
    (bands LWW + latest-text-by-seq corpus + tombstone retraction)."""
    base = str(tmp_path)
    ta = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    tb = "alpha beta gamma delta epsilon zeta eta theta iota lambda"
    tc = "one two three four five six seven eight nine ten"
    td = "one two three four five six seven eight nine eleven"
    gen1 = [(1, ta, 1), (2, tb, 2), (3, tc, 3), (4, td, 4)]
    _write_gen(spark, gen1, f"{base}/feed")
    _, index = run_dedup_index_stream(
        spark, f"{base}/feed", f"{base}/idx", f"{base}/ckpt",
        threshold=0.2, n_buckets=8,
    )
    before = {(a, b) for a, b, _ in index.found_pairs().collect()}
    assert (1, 2) in before and (3, 4) in before

    # doc 2's text changes family: exact dup of D now (guaranteed band
    # collision — no LSH luck), near-dup of C, unrelated to A
    te = td
    _write_gen(spark, [(2, te, 5)], f"{base}/feed")
    _, index = run_dedup_index_stream(
        spark, f"{base}/feed", f"{base}/idx", f"{base}/ckpt",
        threshold=0.2, n_buckets=8,
    )
    latest = spark.createDataFrame(
        [(1, ta), (2, te), (3, tc), (4, td)], "doc_id long, text string"
    )
    want = _pairs(minhash_lsh_pairs(latest, threshold=0.2))
    assert {(a, b) for a, b, _ in want} >= {(2, 3), (2, 4)}
    assert (1, 2) not in {(a, b) for a, b, _ in want}  # guard vacuity
    assert _pairs(index.found_pairs()) == want

    # idempotent-content redelivery: same text again (new seq) is a
    # no-op on the pair set
    _write_gen(spark, [(3, tc, 6)], f"{base}/feed")
    _, index = run_dedup_index_stream(
        spark, f"{base}/feed", f"{base}/idx", f"{base}/ckpt",
        threshold=0.2, n_buckets=8,
    )
    assert _pairs(index.found_pairs()) == want


def test_epoch_cost_is_candidate_bounded(spark, tmp_path, monkeypatch):
    """A small batch arriving against a LARGE standing corpus must not
    shingle-scan the corpus: every input to the shared shingle stage
    during the epoch is bounded by |batch| + |candidate docs|, not
    |standing docs| — the incremental-index contract (epoch cost flat
    as the corpus grows). Deterministic spy, no timing."""
    import aktuell_spark.functions.dedupe as dedupe_mod

    base = str(tmp_path)
    n_standing = 300
    gen1 = [
        (i, f"u{i}a u{i}b u{i}c u{i}d u{i}e u{i}f", i)
        for i in range(10, 10 + n_standing)
    ]
    _write_gen(spark, gen1, f"{base}/feed")
    run_dedup_index_stream(
        spark, f"{base}/feed", f"{base}/idx", f"{base}/ckpt",
        threshold=0.2, n_buckets=8,
    )

    seen_sizes = []
    real_shingles = dedupe_mod.shingles

    def spy(df, *a, **kw):
        seen_sizes.append(df.count())
        return real_shingles(df, *a, **kw)

    monkeypatch.setattr(dedupe_mod, "shingles", spy)
    # gen2: 3 docs, two of them exact dups of each other (guaranteed
    # band collision), none matching the standing corpus
    t1 = "red orange yellow green blue indigo violet pink"
    t2 = t1
    gen2 = [(1, t1, 1001), (2, t2, 1002), (3, "misc words only here", 1003)]
    _write_gen(spark, gen2, f"{base}/feed")
    _, index = run_dedup_index_stream(
        spark, f"{base}/feed", f"{base}/idx", f"{base}/ckpt",
        threshold=0.2, n_buckets=8,
    )
    assert (1, 2) in {(a, b) for a, b, _ in index.found_pairs().collect()}
    assert seen_sizes, "spy never fired; shingle stage not exercised"
    assert max(seen_sizes) <= 10, (
        f"shingle-stage input {max(seen_sizes)} rows — corpus-"
        f"proportional work leaked into the epoch (standing={n_standing})"
    )


def test_stale_redelivery_is_ignored(spark, tmp_path):
    """ADVICE r7 (high): an out-of-order redelivery whose seq is BELOW
    the standing doc_seq must be dropped by the gate — it must neither
    re-probe with the stale text nor tombstone standing pairs that are
    still valid on the latest corpus (the same gate the bm25/decontam/
    span indexes apply)."""
    base = str(tmp_path)
    ta = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    tb = "alpha beta gamma delta epsilon zeta eta theta iota lambda"
    _write_gen(spark, [(1, ta, 10), (2, tb, 20)], f"{base}/feed")
    _, index = run_dedup_index_stream(
        spark, f"{base}/feed", f"{base}/idx", f"{base}/ckpt",
        threshold=0.2, n_buckets=8,
    )
    want = _pairs(index.found_pairs())
    assert (1, 2) in {(a, b) for a, b, _ in want}

    # stale redelivery of doc 1 with UNRELATED text at an OLDER seq:
    # the latest corpus is unchanged, so the pair set must not move
    # and the docs table must keep the latest text
    _write_gen(
        spark,
        [(1, "zero unrelated words that share nothing at all here", 5)],
        f"{base}/feed",
    )
    _, index = run_dedup_index_stream(
        spark, f"{base}/feed", f"{base}/idx", f"{base}/ckpt",
        threshold=0.2, n_buckets=8,
    )
    assert _pairs(index.found_pairs()) == want
    kept = {r[0]: r[1] for r in index.docs.read().select("doc_id", "text").collect()}
    assert kept[1] == ta
