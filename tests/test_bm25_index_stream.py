"""Stream-maintained BM25 index: the live index must answer a query
exactly as the batch sweep on the final corpus — for any batch
slicing, across restarts, for changed-text redeliveries (postings
retraction), and ignoring stale out-of-order redeliveries."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aktuell_spark.functions.retrieval import bm25_topk
from aktuell_spark.streaming.bm25_index import run_bm25_index_stream

TERMS = ["spark", "merge", "join", "vector"]


@pytest.fixture(scope="module")
def docs(spark):
    return (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .localCheckpoint()
    )


def _want(spark, docs, topk=20):
    terms = spark.createDataFrame([(t,) for t in TERMS], "term string")
    return sorted(map(tuple, bm25_topk(docs, terms, topk=topk).collect()))


def _got(index, topk=20):
    return sorted(map(tuple, index.search(TERMS, topk=topk).collect()))


def _feed(docs):
    return docs.withColumn("seq", F.col("doc_id"))


def test_stream_index_equals_batch_for_any_slicing(spark, docs, tmp_path):
    want = _want(spark, docs)
    assert want, "fixture corpus matches no query term; test is vacuous"
    for slices in (2, 4):
        base = str(tmp_path / f"s{slices}")
        for i in range(slices):
            (
                _feed(docs.filter(F.col("doc_id") % slices == i))
                .coalesce(1).write.mode("append").parquet(f"{base}/feed")
            )
        _, index = run_bm25_index_stream(
            spark, f"{base}/feed", f"{base}/idx", f"{base}/ckpt",
            n_buckets=8, max_files_per_trigger=1,
        )
        assert _got(index) == want, f"slicing {slices}"


def test_restart_noop_and_changed_text_retracts_postings(spark, tmp_path):
    base = str(tmp_path)

    def write(rows):
        spark.createDataFrame(
            rows, "doc_id long, text string, seq long"
        ).coalesce(1).write.mode("append").parquet(f"{base}/feed")

    def run():
        _, idx = run_bm25_index_stream(
            spark, f"{base}/feed", f"{base}/idx", f"{base}/ckpt", n_buckets=8
        )
        return idx

    write([
        (1, "spark merge spark", 10),
        (2, "vector join vector join", 11),
        (3, "filler words only", 12),
    ])
    index = run()
    before = _got(index)
    assert {r[0] for r in before} == {1, 2}
    # restart on the same checkpoint: nothing changes
    assert _got(run()) == before

    # doc 1 redelivered: 'spark'/'merge' gone, 'join' appears → its old
    # postings must be tombstoned and scoring must use the new text
    write([(1, "join join join", 20)])
    index = run()
    latest = spark.createDataFrame(
        [(1, "join join join"),
         (2, "vector join vector join"),
         (3, "filler words only")],
        "doc_id long, text string",
    )
    assert _got(index) == _want(spark, latest)
    assert index.search(["spark", "merge"]).count() == 0  # fully retracted

    # stale out-of-order redelivery (seq 5 < standing 20): ignored
    write([(1, "spark spark spark", 5)])
    index = run()
    assert _got(index) == _want(spark, latest)


def test_search_reads_only_query_term_buckets(spark, docs, tmp_path):
    """The postings table is bucketed by term: a search must bucket-
    prune its scan (the inverted-list property — search IO is the query
    terms' posting lists, not the corpus)."""
    base = str(tmp_path)
    _feed(docs).coalesce(1).write.parquet(f"{base}/feed")
    _, index = run_bm25_index_stream(
        spark, f"{base}/feed", f"{base}/idx", f"{base}/ckpt", n_buckets=8
    )
    df = index.postings.lookup_many(TERMS)
    buckets = {index.postings.bucket_of(t) for t in TERMS}
    assert len(buckets) < 8, "terms hash to fewer buckets than exist"
    files = df.inputFiles()
    assert files, "scan reads no files"
    # every file the scan touches lives in a query term's bucket dir
    assert all(
        any(f"bucket={b}/" in f for b in buckets) for f in files
    ), (files, buckets)


def test_update_epoch_never_scans_or_rewrites_standing_postings(
    spark, tmp_path, monkeypatch
):
    """VERDICT r7 #1 (scale-safety): an update epoch against a large
    standing index must not read the term-bucketed postings table at
    all (retraction comes from the docs pre-image) and, with postings
    merge-on-read, must not rewrite any standing run file — per-epoch
    postings IO is O(batch), not O(inverted index). Deterministic file
    and spy checks, no timing."""
    import os

    from aktuell_spark.streaming.sink import BucketedUpsertTable

    base = str(tmp_path)

    def write(rows):
        spark.createDataFrame(
            rows, "doc_id long, text string, seq long"
        ).coalesce(1).write.mode("append").parquet(f"{base}/feed")

    # standing corpus: 200 docs over a wide vocabulary
    write([
        (i, f"w{i}a w{i}b w{i}c spark merge w{i}d", i)
        for i in range(10, 210)
    ])
    _, index = run_bm25_index_stream(
        spark, f"{base}/feed", f"{base}/idx", f"{base}/ckpt", n_buckets=8,
    )

    def snapshot(table):
        out = {}
        for entry in sorted(os.listdir(table.data_dir)):
            bdir = os.path.join(table.data_dir, entry)
            for fn in sorted(os.listdir(bdir)):
                p = os.path.join(bdir, fn)
                out[p] = (os.path.getsize(p), os.path.getmtime(p))
        return out

    before = snapshot(index.postings)

    postings_root = index.postings.root
    postings_reads = []
    real_read_raw = BucketedUpsertTable._read_raw

    def spy(self, *a, **kw):
        if self.root == postings_root:
            postings_reads.append((a, kw))
        return real_read_raw(self, *a, **kw)

    monkeypatch.setattr(BucketedUpsertTable, "_read_raw", spy)

    # update epoch: ONE standing doc redelivered with changed text
    # (drops the term "merge", keeps "spark")
    write([(10, "w10a w10b w10c spark w10x", 1000)])
    _, index = run_bm25_index_stream(
        spark, f"{base}/feed", f"{base}/idx", f"{base}/ckpt", n_buckets=8,
    )
    monkeypatch.setattr(BucketedUpsertTable, "_read_raw", real_read_raw)

    assert not postings_reads, (
        "update epoch read the postings table — retraction must come "
        f"from the docs pre-image ({len(postings_reads)} reads)"
    )
    after = snapshot(index.postings)
    changed = {
        p for p in before
        if p not in after or after[p] != before[p]
    }
    assert not changed, f"standing postings runs rewritten: {sorted(changed)[:5]}"
    # and the retraction itself worked: doc 10 no longer matches "merge"
    got = {r[0]: r[2] for r in index.search(["merge"], topk=500).collect()}
    assert 10 not in got

    # grow-corpus flat-epoch-cost pin: per-epoch merged_rows (lineage)
    # stays O(batch) as the standing corpus grows
    hist = {
        r[0]: r[1]
        for r in index.postings.history().select("epoch", "merged_rows").collect()
        if r[0] >= 0
    }
    assert hist[1] <= 20, f"update epoch wrote {hist[1]} postings rows"


def test_grow_corpus_epoch_cost_stays_batch_bounded(spark, tmp_path):
    """Per-epoch postings writes must track the BATCH, not the standing
    index: three constant-size generations into a growing corpus write
    ~constant rows per epoch (file-level check via the files() metadata
    table — MoR runs are epoch-tagged)."""
    base = str(tmp_path)

    def write(rows):
        spark.createDataFrame(
            rows, "doc_id long, text string, seq long"
        ).coalesce(1).write.mode("append").parquet(f"{base}/feed")

    per_gen = 50
    for g in range(3):
        write([
            (g * per_gen + i, f"g{g}x{i}a g{g}x{i}b spark join", g * per_gen + i)
            for i in range(per_gen)
        ])
    _, index = run_bm25_index_stream(
        spark, f"{base}/feed", f"{base}/idx", f"{base}/ckpt",
        n_buckets=8, max_files_per_trigger=1,
    )
    per_epoch = {
        r[0]: r[1]
        for r in index.postings.files()
        .groupBy("epoch").agg(F.sum("n_rows").alias("n"))
        .collect()
    }
    rows = [per_epoch[e] for e in (0, 1, 2)]
    assert max(rows) <= min(rows) * 1.2 + 8, (
        f"per-epoch postings rows not flat: {rows}"
    )


def test_compact_then_search_stays_green(spark, tmp_path):
    """Maintenance entry point for the now-MoR postings/docs tables:
    compact() folds the run files and the live search answers
    identically."""
    base = str(tmp_path)
    spark.createDataFrame(
        [(i, f"spark merge w{i}a w{i}b", i) for i in range(1, 40)],
        "doc_id long, text string, seq long",
    ).coalesce(1).write.mode("append").parquet(f"{base}/feed")
    _, index = run_bm25_index_stream(
        spark, f"{base}/feed", f"{base}/idx", f"{base}/ckpt", n_buckets=4,
    )
    before = _got(index)
    index.compact()
    assert _got(index) == before
    assert index.postings.max_runs_per_bucket() <= 1
