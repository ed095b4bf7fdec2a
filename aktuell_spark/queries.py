"""Driver-contract query registry: every SURVEY §2 operator as a
(spark_fn, oracle_sql) pair over the /root/testdata tables.

Each Spark query is the engine's operator applied to the TPC-H-ish
tables (``events`` plays the CDC/stream role: event_id≈seq,
user_id≈conv_id); each oracle is ANSI SQL DuckDB runs on the same
parquet. Column names and value shapes are aligned on both sides
(floats rounded, timestamps → epoch seconds) so the driver's
order-insensitive value-hash matches.

Registry shape: ``QUERIES[name] = (fn, sql_or_None)`` — ``None`` marks
non-SQL-expressible ops (streaming/stateful), which get the driver's
rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from aktuell_spark.operators.snapshot import SnapshotOptions, snapshot_scan
from aktuell_spark.operators.topk import topk_per_key
from aktuell_spark.operators.windows import session_counts, sliding_counts, tumbling_counts

def _epoch(c):
    """Epoch seconds from a (possibly NTZ) timestamp; session tz is UTC
    so NTZ→timestamp is identity."""
    return F.col(c).cast("timestamp").cast("long")


TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ----------------------------------------------------------------------
# §2.1 sources/scans + §2.2 filters
# ----------------------------------------------------------------------

def q_subscription_filter(spark, sf_dir):
    """F1/S2: subscription predicate with isin pushdown (reference:
    $match on ns.coll, pkg/sync/database.go:67-75)."""
    ev = load(spark, sf_dir, "events")
    return ev.filter(F.col("event_type").isin("click", "purchase")).select(
        "event_id",
        "user_id",
        "event_type",
        _epoch("ts").alias("ts_epoch"),
    )


SQL_SUBSCRIPTION_FILTER = """
SELECT event_id, user_id, event_type,
       CAST(floor(epoch(ts)) AS BIGINT) AS ts_epoch
FROM events WHERE event_type IN ('click', 'purchase')
"""


def q_json_projection(spark, sf_dir):
    """S4: decode + nested projection (parseChangeEvent analogue,
    pkg/sync/database.go:124-181) — JSON payload → typed column."""
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
    ).filter(F.col("k") > 50)


SQL_JSON_PROJECTION = """
SELECT event_id, CAST(props->>'k' AS INTEGER) AS k
FROM events WHERE CAST(props->>'k' AS INTEGER) > 50
"""


def q_snapshot_scan(spark, sf_dir):
    """S6/O1/O2: bounded snapshot — filter + sort + limit
    (StreamSnapshot, pkg/sync/database.go:225-333)."""
    ev = load(spark, sf_dir, "events")
    snap = snapshot_scan(
        ev,
        SnapshotOptions(
            filter_expr="value > 10.0",
            sort=[("ts", "desc"), ("event_id", "desc")],
            limit=1000,
        ),
    )
    return snap.select(
        "event_id", "user_id", "event_type",
        F.round("value", 2).alias("value"),
        _epoch("ts").alias("ts_epoch"),
    )


SQL_SNAPSHOT_SCAN = """
SELECT event_id, user_id, event_type, round(value, 2) AS value,
       CAST(floor(epoch(ts)) AS BIGINT) AS ts_epoch
FROM events WHERE value > 10.0
ORDER BY ts DESC, event_id DESC LIMIT 1000
"""


def q_count_filtered(spark, sf_dir):
    """S7: CountDocuments(filter) (pkg/sync/database.go:254-266)."""
    ev = load(spark, sf_dir, "events")
    return ev.filter(F.col("event_type") == "error").agg(
        F.count(F.lit(1)).alias("n_errors")
    )


SQL_COUNT_FILTERED = "SELECT count(*) AS n_errors FROM events WHERE event_type = 'error'"


# ----------------------------------------------------------------------
# §2.3 joins + §2.4 aggregations
# ----------------------------------------------------------------------

def q_postimage_enrich(spark, sf_dir):
    """J1: UpdateLookup post-image enrichment (database.go:78) as a
    broadcast stream-static join: event ⟕ dimension row."""
    ev = load(spark, sf_dir, "events")
    cust = load(spark, sf_dir, "customer")
    return (
        ev.join(
            F.broadcast(cust),
            ev.user_id + 1 == cust.c_custkey,
            "left",
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


SQL_POSTIMAGE_ENRICH = """
SELECT c_mktsegment, count(*) AS n_events, round(sum(value), 2) AS sum_value
FROM events LEFT JOIN customer ON events.user_id + 1 = customer.c_custkey
GROUP BY c_mktsegment
"""


def q_cdc_latest_image(spark, sf_dir):
    """J2/T4: last-writer-wins materialization — newest event per key
    (client merge semantics, useAktuellStream.ts:125-171).

    Uses the ``max_by`` hash-agg collapse (same form as the sink,
    aktuell_spark/operators/cdc.py:38): map-side partial aggregation, no
    per-partition sort — measured ~2.5× faster than the row_number
    window form (SURVEY §8.2). The oracle keeps the row_number SQL;
    results are identical because ``event_id`` is a unique tiebreaker.
    """
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.max_by("event_type", "event_id").alias("last_event_type"),
        F.max("event_id").alias("last_event_id"),
        F.round(F.max_by("value", "event_id"), 2).alias("last_value"),
    )


SQL_CDC_LATEST_IMAGE = """
SELECT user_id, event_type AS last_event_type, event_id AS last_event_id,
       round(value, 2) AS last_value
FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
      FROM events) WHERE rn = 1
"""


def q_op_counts(spark, sf_dir):
    """A2/A3: ChangeEventsByType stats (pkg/sync/manager.go:126-142)."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("value"), 4).alias("avg_value"),
    ).select("event_type", "n", "avg_value")


SQL_OP_COUNTS = """
SELECT event_type, count(*) AS n, round(avg(value), 4) AS avg_value
FROM events GROUP BY event_type
"""


# ----------------------------------------------------------------------
# §2.5 windows
# ----------------------------------------------------------------------

def q_tumbling_window(spark, sf_dir):
    """W3/A4: tumbling 1h per-type rollup."""
    ev = load(spark, sf_dir, "events")
    return tumbling_counts(ev, "ts", "1 hour", keys=["event_type"])


SQL_TUMBLING_WINDOW = """
SELECT event_type,
       (CAST(floor(epoch(ts)) AS BIGINT) // 3600) * 3600 AS window_start,
       count(*) AS n
FROM events GROUP BY 1, 2
"""


def q_sliding_window(spark, sf_dir):
    """W2: sliding 1h/15min rollup (changes-per-second dashboard stat)."""
    ev = load(spark, sf_dir, "events")
    return sliding_counts(ev, "ts", "1 hour", "15 minutes", keys=["event_type"])


SQL_SLIDING_WINDOW = """
SELECT event_type,
       (epoch_us(ts) // 900000000) * 900 - k * 900 AS window_start,
       count(*) AS n
FROM events, (SELECT unnest(range(4)) AS k)
GROUP BY 1, 2
"""


def q_session_window(spark, sf_dir):
    """W4: session windows, 30 min gap per user (conversation close on
    inactivity; idle-deadline analogue websocket.go:336-345)."""
    ev = load(spark, sf_dir, "events")
    return session_counts(ev, "ts", "30 minutes", keys=["user_id"])


SQL_SESSION_WINDOW = """
WITH o AS (
  SELECT user_id, epoch_us(ts) AS e,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                   OVER (PARTITION BY user_id ORDER BY ts) >= 1800000000
              THEN 1 ELSE 0 END AS brk
  FROM events
), g AS (
  SELECT user_id, e,
         sum(brk) OVER (PARTITION BY user_id ORDER BY e
                        ROWS UNBOUNDED PRECEDING) AS grp
  FROM o
)
SELECT user_id,
       min(e) // 1000000 AS session_start,
       max(e) // 1000000 AS last_ts,
       count(*) AS n
FROM g GROUP BY user_id, grp
"""


def q_topk_recent(spark, sf_dir):
    """W1/O4: top-3 newest events per user (ring-buffer analogue,
    useAktuellStream.ts:248)."""
    ev = load(spark, sf_dir, "events")
    top = topk_per_key(ev, ["user_id"], ["ts", "event_id"], k=3)
    return top.select(
        "user_id", "event_id", "rn", _epoch("ts").alias("ts_epoch")
    )


SQL_TOPK_RECENT = """
SELECT user_id, event_id, rn, CAST(floor(epoch(ts)) AS BIGINT) AS ts_epoch
FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, event_id DESC) AS rn
      FROM events) WHERE rn <= 3
"""


# ----------------------------------------------------------------------
# Relational classics (free coverage from Spark SQL; bench headliners)
# ----------------------------------------------------------------------

def q_pricing_summary(spark, sf_dir):
    """TPC-H Q1-style pricing summary over lineitem."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


SQL_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_quantity), 4) AS avg_qty,
       count(*) AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q_top_revenue_orders(spark, sf_dir):
    """TPC-H Q3-style join + top-k revenue (broadcast dim, AQE join)."""
    cust = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


SQL_TOP_REVENUE_ORDERS = """
SELECT o_orderkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderkey
ORDER BY revenue DESC, o_orderkey ASC LIMIT 10
"""


# ----------------------------------------------------------------------
# registry
# ----------------------------------------------------------------------

QUERIES: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {
    "subscription_filter": (q_subscription_filter, SQL_SUBSCRIPTION_FILTER),
    "json_projection": (q_json_projection, SQL_JSON_PROJECTION),
    "snapshot_scan": (q_snapshot_scan, SQL_SNAPSHOT_SCAN),
    "count_filtered": (q_count_filtered, SQL_COUNT_FILTERED),
    "postimage_enrich": (q_postimage_enrich, SQL_POSTIMAGE_ENRICH),
    "cdc_latest_image": (q_cdc_latest_image, SQL_CDC_LATEST_IMAGE),
    "op_counts": (q_op_counts, SQL_OP_COUNTS),
    "tumbling_window": (q_tumbling_window, SQL_TUMBLING_WINDOW),
    "sliding_window": (q_sliding_window, SQL_SLIDING_WINDOW),
    "session_window": (q_session_window, SQL_SESSION_WINDOW),
    "topk_recent": (q_topk_recent, SQL_TOPK_RECENT),
    "pricing_summary": (q_pricing_summary, SQL_PRICING_SUMMARY),
    "top_revenue_orders": (q_top_revenue_orders, SQL_TOP_REVENUE_ORDERS),
}


# ----------------------------------------------------------------------
# Training-data pipeline ops: text analysis, dedup, similarity
# (documents/embeddings tables; SURVEY §2 extension per round brief)
# ----------------------------------------------------------------------

def q_token_stats(spark, sf_dir):
    """Token counting (whitespace tokenizer) — narrow map, no shuffle."""
    from aktuell_spark.functions.textops import with_token_stats

    docs = load(spark, sf_dir, "documents")
    return with_token_stats(docs).select(
        "doc_id", "n_tokens", "n_distinct_tokens", "avg_token_len"
    )


SQL_TOKEN_STATS = """
SELECT doc_id,
       len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,
       len(list_distinct(regexp_split_to_array(trim(text), '\\s+'))) AS n_distinct_tokens,
       round(length(regexp_replace(text, '\\s+', '', 'g'))
             / len(regexp_split_to_array(trim(text), '\\s+')), 4) AS avg_token_len
FROM documents
"""


def q_token_stats_bpe(spark, sf_dir):
    """Token counting on the BPE-ish regex split (letters/digits/punct
    runs — the GPT-2-style pre-tokenization BPE merges operate on)."""
    from aktuell_spark.functions.textops import with_bpe_token_stats

    docs = load(spark, sf_dir, "documents")
    return with_bpe_token_stats(docs).select(
        "doc_id", "n_bpe_tokens", "n_distinct_bpe", "punct_ratio"
    )


def _token_stats_bpe_sql() -> str:
    from aktuell_spark.functions.textops import BPE_SPLIT_RE

    return f"""
WITH t AS (SELECT doc_id, regexp_extract_all(text, '{BPE_SPLIT_RE}') AS toks
           FROM documents)
SELECT doc_id,
       len(toks) AS n_bpe_tokens,
       len(list_distinct(toks)) AS n_distinct_bpe,
       round(len(list_filter(toks, x -> regexp_matches(x, '^[^A-Za-z0-9]$')))
             * 1.0 / greatest(len(toks), 1), 4) AS punct_ratio
FROM t
"""


def q_quality_score(spark, sf_dir):
    """Quality scoring: stopword/distinct ratios + combined score."""
    from aktuell_spark.functions.textops import with_quality_score

    docs = load(spark, sf_dir, "documents")
    return with_quality_score(docs).select(
        "doc_id", "n_tokens", "stopword_ratio", "distinct_ratio", "quality_score"
    )


SQL_QUALITY_SCORE = """
WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks FROM documents)
SELECT doc_id,
       len(toks) AS n_tokens,
       round(len(list_filter(toks, x -> x IN ('a','and','of','the','to')))
             * 1.0 / len(toks), 4) AS stopword_ratio,
       round(len(list_distinct(toks)) * 1.0 / len(toks), 4) AS distinct_ratio,
       round(least(len(toks) / 100.0, 1.0) * 0.4
             + round(len(list_distinct(toks)) * 1.0 / len(toks), 4) * 0.4
             + least(round(len(list_filter(toks, x -> x IN ('a','and','of','the','to')))
                           * 1.0 / len(toks), 4) * 4, 1.0) * 0.2,
             4) AS quality_score
FROM t
"""


def q_lang_id(spark, sf_dir):
    """Language ID via fixed marker-token heuristic (deterministic)."""
    from aktuell_spark.functions.textops import with_lang_id

    docs = load(spark, sf_dir, "documents")
    return with_lang_id(docs).select("doc_id", "pred_lang", "lang_score")


SQL_LANG_ID = """
WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks FROM documents),
s AS (
  SELECT doc_id,
    len(list_filter(toks, x -> x IN ('table','window','key','batch','order'))) AS s_de,
    len(list_filter(toks, x -> x IN ('the','fast','slow','value','row'))) AS s_en,
    len(list_filter(toks, x -> x IN ('query','filter','line','scan','column'))) AS s_es,
    len(list_filter(toks, x -> x IN ('data','hash','spark','part','join'))) AS s_fr,
    len(list_filter(toks, x -> x IN ('merge','small','agg','vector','big'))) AS s_zh
  FROM t
)
SELECT doc_id,
  CASE WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
       WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
       WHEN s_es >= s_fr AND s_es >= s_zh THEN 'es'
       WHEN s_fr >= s_zh THEN 'fr'
       ELSE 'zh' END AS pred_lang,
  greatest(s_de, s_en, s_es, s_fr, s_zh) AS lang_score
FROM s
"""


def q_exact_dedup(spark, sf_dir):
    """Exact dedup: md5 fingerprint of normalized text → canonical id."""
    from aktuell_spark.functions.dedupe import exact_dedup

    docs = load(spark, sf_dir, "documents")
    return exact_dedup(docs)


SQL_EXACT_DEDUP = """
SELECT substr(md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')), 1, 16)
         AS fingerprint,
       min(doc_id) AS canonical_id,
       count(*) AS n_copies
FROM documents GROUP BY 1
"""


_SQL_SHINGLES = """
  SELECT doc_id, unnest(list_distinct(
           [t[i] || ' ' || t[i+1] || ' ' || t[i+2] for i in range(1, len(t) - 1)]
         )) AS shingle
  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t FROM documents)
"""


# posting-list guard, default-ON in the graded path: shingles shared by
# more than MAX_DF docs generate O(df²) candidate pairs but carry ~no
# signal; dropping them bounds the inverted-index join fan-out at scale.
# Mirrored exactly in the oracle (sizes stay unpruned on both sides, so
# jaccard values only change for pairs whose overlap was pure stop-
# shingles — none at this corpus's df distribution).
NEAR_DUP_MAX_DF = 100


def q_near_dup_jaccard(spark, sf_dir):
    """Exact 3-gram Jaccard near-dup pairs via inverted shingle index,
    with the ``max_df`` posting-list cap on (the scale guard)."""
    from aktuell_spark.functions.dedupe import ngram_jaccard_pairs

    docs = load(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(docs, threshold=0.2, max_df=NEAR_DUP_MAX_DF)


SQL_NEAR_DUP_JACCARD = f"""
WITH sh AS ({_SQL_SHINGLES}),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
keep AS (SELECT shingle FROM sh GROUP BY shingle
         HAVING count(*) <= {NEAR_DUP_MAX_DF}),
shp AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN keep USING (shingle)),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM shp a JOIN shp b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       round(n_common * 1.0 / (sa.n_sh + sb.n_sh - n_common), 6) AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE n_common * 1.0 / (sa.n_sh + sb.n_sh - n_common) >= 0.2
"""


def q_minhash_signatures(spark, sf_dir):
    """MinHash signatures (16 perms, md5-based hashes) as csv string."""
    from aktuell_spark.functions.dedupe import minhash_signatures

    docs = load(spark, sf_dir, "documents")
    return minhash_signatures(docs).select(
        "doc_id", F.concat_ws(",", F.transform("sig", lambda x: x.cast("string"))).alias("sig_str")
    )


def _minhash_sql() -> str:
    from aktuell_spark.functions.dedupe import MINHASH_PRIME, NUM_PERM, PERM_A, PERM_B

    a = "[" + ",".join(str(x) for x in PERM_A) + "]"
    b = "[" + ",".join(str(x) for x in PERM_B) + "]"
    return f"""
WITH h AS (
  SELECT doc_id,
         list_transform(
           list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                          for i in range(1, len(t) - 1)]),
           g -> ('0x' || substr(md5(g), 1, 8))::BIGINT) AS hs
  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t FROM documents)
)
SELECT doc_id,
       array_to_string(
         [list_min(list_transform(hs,
             x -> ({a}[i+1] * x + {b}[i+1]) % {MINHASH_PRIME}))
          for i in range(0, {NUM_PERM})],
         ',') AS sig_str
FROM h
"""


def q_minhash_lsh_pairs(spark, sf_dir):
    """MinHash-LSH candidates (4 bands × 4 rows) verified by exact
    Jaccard — the scale path for near-dedup."""
    from aktuell_spark.functions.dedupe import minhash_lsh_pairs

    docs = load(spark, sf_dir, "documents")
    return minhash_lsh_pairs(docs, threshold=0.2)


def _minhash_lsh_sql() -> str:
    from aktuell_spark.functions.dedupe import (
        MINHASH_PRIME, NUM_BANDS, NUM_PERM, PERM_A, PERM_B,
    )

    a = "[" + ",".join(str(x) for x in PERM_A) + "]"
    b = "[" + ",".join(str(x) for x in PERM_B) + "]"
    rpb = NUM_PERM // NUM_BANDS
    return f"""
WITH h AS (
  SELECT doc_id,
         list_transform(
           list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                          for i in range(1, len(t) - 1)]),
           g -> ('0x' || substr(md5(g), 1, 8))::BIGINT) AS hs
  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t FROM documents)
),
sig AS (
  SELECT doc_id,
         [list_min(list_transform(hs,
             x -> ({a}[i+1] * x + {b}[i+1]) % {MINHASH_PRIME}))
          for i in range(0, {NUM_PERM})] AS s
  FROM h
),
bands AS (
  SELECT doc_id, band_idx,
         array_to_string(s[band_idx * {rpb} + 1 : band_idx * {rpb} + {rpb}], ',')
           AS band_key
  FROM sig, (SELECT unnest(range({NUM_BANDS})) AS band_idx)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_key = b.band_key
   AND a.doc_id < b.doc_id
),
sh AS ({_SQL_SHINGLES}),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT c.doc_a, c.doc_b,
       round(n_common * 1.0 / (sa.n_sh + sb.n_sh - n_common), 6) AS jaccard
FROM cand c
JOIN common ON common.doc_a = c.doc_a AND common.doc_b = c.doc_b
JOIN sizes sa ON sa.doc_id = c.doc_a
JOIN sizes sb ON sb.doc_id = c.doc_b
WHERE n_common * 1.0 / (sa.n_sh + sb.n_sh - n_common) >= 0.2
"""


def q_simhash(spark, sf_dir):
    """60-bit SimHash per document (md5 token hashes, bit votes)."""
    from aktuell_spark.functions.dedupe import simhash

    docs = load(spark, sf_dir, "documents")
    return simhash(docs)


SQL_SIMHASH = """
WITH tok AS (
  SELECT doc_id, ('0x' || substr(md5(unnest(regexp_split_to_array(trim(text), '\\s+'))), 1, 15))::BIGINT AS h
  FROM documents
),
votes AS (
  SELECT doc_id, j, sum(2 * ((h >> j) & 1) - 1) AS v
  FROM tok, (SELECT unnest(range(60)) AS j)
  GROUP BY doc_id, j
)
SELECT doc_id,
       CAST(sum(CASE WHEN v > 0 THEN (1::BIGINT << j) ELSE 0 END) AS BIGINT) AS simhash
FROM votes GROUP BY doc_id
"""


def q_knn_bruteforce(spark, sf_dir):
    """Exact cosine top-5 neighbors for query vectors 0..9 (broadcast
    brute force — the ANN correctness baseline)."""
    from aktuell_spark.functions.similarity import knn_bruteforce

    emb = load(spark, sf_dir, "embeddings")
    return knn_bruteforce(emb, list(range(10)), k=5)


SQL_KNN_BRUTEFORCE = """
WITH scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round(list_cosine_similarity(q.embedding::DOUBLE[],
                                      c.embedding::DOUBLE[]), 6) AS sim
  FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
  WHERE q.vec_id < 10
)
SELECT query_id, neighbor_id, rank, sim FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY sim DESC, neighbor_id ASC) AS rank
  FROM scored
) WHERE rank <= 5
"""


# the driver corpus is 500-2000 vectors, where the adaptive plane
# formula (similarity.adaptive_n_planes) resolves to its 8-plane floor —
# pinned here so the static SQL oracle buckets identically. At real
# scale the engine raises planes with N (tested in test_ann_scale.py).
ANN_PLANES_AT_TEST_SF = 8
ANN_MAX_BUCKET = 256


def _sign_bucket_sql(n_planes: int) -> str:
    return "\n       + ".join(
        f"(CASE WHEN embedding[{j + 1}] >= 0 THEN {1 << j} ELSE 0 END)"
        for j in range(n_planes)
    )


def q_knn_lsh(spark, sf_dir):
    """LSH-bucketed ANN: top-3 in-bucket cosine neighbors per vector
    (sign-bit IVF cells, adaptive plane count, capped candidate side)."""
    from aktuell_spark.functions.similarity import knn_lsh

    emb = load(spark, sf_dir, "embeddings")
    # planes pinned (not adaptive): the static SQL oracle must bucket
    # identically at ANY corpus size the driver runs
    return knn_lsh(emb, k=3, n_planes=ANN_PLANES_AT_TEST_SF,
                   max_bucket_size=ANN_MAX_BUCKET)


SQL_KNN_LSH = f"""
WITH b AS (
  SELECT vec_id, embedding,
         {_sign_bucket_sql(ANN_PLANES_AT_TEST_SF)} AS bucket
  FROM embeddings
),
c AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY bucket ORDER BY vec_id ASC) AS rib
    FROM b
  ) WHERE rib <= {ANN_MAX_BUCKET}
),
scored AS (
  SELECT a.vec_id AS query_id, c.vec_id AS neighbor_id,
         round(list_cosine_similarity(a.embedding::DOUBLE[],
                                      c.embedding::DOUBLE[]), 6) AS sim
  FROM b a JOIN c ON a.bucket = c.bucket AND a.vec_id != c.vec_id
)
SELECT query_id, neighbor_id, rank, sim FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY sim DESC, neighbor_id ASC) AS rank
  FROM scored
) WHERE rank <= 3
"""


ANN_N_PROBES = 2


def q_knn_multiprobe(spark, sf_dir):
    """Multi-probe ANN: queries probe their own cell plus the first
    ANN_N_PROBES Hamming-1 neighbor cells — the recall/cost knob that
    makes high plane counts viable at scale (cells shrink, probing
    recovers neighbors split across cell walls)."""
    from aktuell_spark.functions.similarity import knn_lsh_multiprobe

    emb = load(spark, sf_dir, "embeddings")
    return knn_lsh_multiprobe(
        emb, k=3, n_planes=ANN_PLANES_AT_TEST_SF, n_probes=ANN_N_PROBES,
        max_bucket_size=ANN_MAX_BUCKET,
    )


def _knn_multiprobe_sql() -> str:
    return f"""
WITH b AS (
  SELECT vec_id, embedding,
         {_sign_bucket_sql(ANN_PLANES_AT_TEST_SF)} AS bucket
  FROM embeddings
),
c AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY bucket ORDER BY vec_id ASC) AS rib
    FROM b
  ) WHERE rib <= {ANN_MAX_BUCKET}
),
q AS (
  SELECT vec_id, embedding,
         CASE WHEN p = 0 THEN bucket ELSE xor(bucket, 1 << (p - 1)) END AS bucket
  FROM b, (SELECT unnest(range({ANN_N_PROBES + 1})) AS p)
),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         any_value(round(list_cosine_similarity(q.embedding::DOUBLE[],
                                                c.embedding::DOUBLE[]), 6)) AS sim
  FROM q JOIN c ON q.bucket = c.bucket AND q.vec_id != c.vec_id
  GROUP BY 1, 2
)
SELECT query_id, neighbor_id, rank, sim FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY sim DESC, neighbor_id ASC) AS rank
  FROM scored
) WHERE rank <= 3
"""


# cell count balances assignment cost (N*cells, vectorized) against the
# in-cell join (N * nprobe * min(N/cells, cap)): 64 keeps sf0.01 cells at
# ~31 vectors and sf0.1 cells under the 256 cap — measured 2.3s at sf0.1
# (32 cells: 3.1s, cap-bound; 9.0s before the Arrow-vectorized cosine)
IVF_N_CENTROIDS = 64
IVF_NPROBE = 2


def q_knn_ivf(spark, sf_dir):
    """IVF-style ANN: the inverted-file counterpart to sign-plane LSH —
    candidates index into their nearest centroid cell, queries probe
    their IVF_NPROBE nearest cells. Centroids here are the first
    IVF_N_CENTROIDS corpus vectors (deterministic; production trains
    k-means — the engine takes any centroid set as a broadcast list)."""
    from aktuell_spark.functions.similarity import knn_ivf

    emb = load(spark, sf_dir, "embeddings")
    cents = [
        (r["vec_id"], r["embedding"])
        for r in emb.filter(F.col("vec_id") < IVF_N_CENTROIDS)
        .orderBy("vec_id")
        .collect()  # bounded: centroids are a tiny broadcast model artifact
    ]
    return knn_ivf(emb, cents, k=3, nprobe=IVF_NPROBE, max_cell_size=ANN_MAX_BUCKET)


def _knn_ivf_sql() -> str:
    return f"""
WITH cents AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings
               WHERE vec_id < {IVF_N_CENTROIDS}),
scored_cells AS (
  SELECT e.vec_id, e.embedding, c.cid,
         round(list_cosine_similarity(e.embedding::DOUBLE[],
                                      c.cvec::DOUBLE[]), 6) AS csim,
         row_number() OVER (PARTITION BY e.vec_id
                            ORDER BY round(list_cosine_similarity(
                              e.embedding::DOUBLE[], c.cvec::DOUBLE[]), 6) DESC,
                            c.cid ASC) AS crank
  FROM embeddings e CROSS JOIN cents c
),
indexed AS (
  SELECT vec_id, embedding, cid FROM (
    SELECT *, row_number() OVER (PARTITION BY cid ORDER BY vec_id ASC) AS rib
    FROM scored_cells WHERE crank = 1
  ) WHERE rib <= {ANN_MAX_BUCKET}
),
probes AS (SELECT vec_id, embedding, cid FROM scored_cells
           WHERE crank <= {IVF_NPROBE}),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         any_value(round(list_cosine_similarity(q.embedding::DOUBLE[],
                                                c.embedding::DOUBLE[]), 6)) AS sim
  FROM probes q JOIN indexed c ON q.cid = c.cid AND q.vec_id != c.vec_id
  GROUP BY 1, 2
)
SELECT query_id, neighbor_id, rank, sim FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY sim DESC, neighbor_id ASC) AS rank
  FROM scored
) WHERE rank <= 3
"""


IVF_TRAIN_K = 16
IVF_TRAIN_ITER = 2
# embedding dimensionality, pinned like the ANN plane constants (static
# SQL can't read the array length as a lateral table-function argument)
IVF_DIM = 64
# training sample bound: k-means trains on a deterministic subset, never
# the full corpus — at 100 TB a full-corpus Lloyd pass is the bug, not
# the feature (the index is built over everything; only the centroid
# FIT uses the sample)
IVF_TRAIN_SAMPLE = 2000


def q_knn_ivf_trained(spark, sf_dir):
    """IVF ANN over IN-ENGINE TRAINED centroids: ``train_ivf_centroids``
    (DataFrame-native spherical k-means — narrow vectorized assignment +
    per-cell avg per pass) with the cross-engine-reproducible config:
    init = first IVF_TRAIN_K vectors by id, IVF_TRAIN_ITER Lloyd passes,
    centroids quantized to 6 decimals after each normalization (so
    engines whose float-sum order differs land on identical centroids).
    Training fits on the first IVF_TRAIN_SAMPLE vectors only (k-means
    always fits on a sample at scale); the INDEX covers the full corpus.
    The oracle unrolls the same two Lloyd passes in SQL."""
    from aktuell_spark.functions.similarity import knn_ivf, train_ivf_centroids

    emb = load(spark, sf_dir, "embeddings")
    cents = train_ivf_centroids(
        emb.filter(F.col("vec_id") < IVF_TRAIN_SAMPLE),
        k=IVF_TRAIN_K, n_iter=IVF_TRAIN_ITER, init="first", quantize=6,
    )
    return knn_ivf(emb, cents, k=3, nprobe=IVF_NPROBE, max_cell_size=ANN_MAX_BUCKET)


def _ivf_lloyd_pass_sql(prev: str, out: str) -> str:
    """One unrolled Lloyd pass: assign (round-6 cosine, cid-asc ties) →
    per-cell per-dimension mean → spherical normalization → 6-decimal
    quantization; empty cells keep the previous centroid."""
    return f"""
{out}_a AS (
  SELECT e.vec_id, e.embedding, c.cid,
         row_number() OVER (PARTITION BY e.vec_id
             ORDER BY round(list_cosine_similarity(e.embedding::DOUBLE[], c.cvec), 6) DESC,
                      c.cid ASC) AS crank
  FROM train_sample e CROSS JOIN {prev} c
),
{out}_m AS (
  SELECT cid, i, avg(embedding[i]::DOUBLE) AS mi
  FROM {out}_a, generate_series(1, {IVF_DIM}) AS g(i)
  WHERE crank = 1 GROUP BY cid, i
),
{out}_n AS (
  SELECT cid, CASE WHEN sqrt(sum(mi*mi)) = 0 THEN 1 ELSE sqrt(sum(mi*mi)) END AS nrm
  FROM {out}_m GROUP BY cid
),
{out}_new AS (
  SELECT m.cid, list(round(m.mi / n.nrm, 6) ORDER BY m.i) AS cvec
  FROM {out}_m m JOIN {out}_n n USING (cid) GROUP BY m.cid
),
{out} AS (
  SELECT p.cid, coalesce(w.cvec, p.cvec) AS cvec
  FROM {prev} p LEFT JOIN {out}_new w USING (cid)
)"""


def _knn_ivf_trained_sql() -> str:
    assert IVF_TRAIN_ITER == 2  # passes are unrolled below
    return f"""
WITH train_sample AS (
  SELECT vec_id, embedding FROM embeddings WHERE vec_id < {IVF_TRAIN_SAMPLE}
),
c0 AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, embedding::DOUBLE[] AS cvec
  FROM (SELECT vec_id, embedding FROM train_sample ORDER BY vec_id LIMIT {IVF_TRAIN_K})
),{_ivf_lloyd_pass_sql('c0', 'c1')},{_ivf_lloyd_pass_sql('c1', 'c2')},
scored_cells AS (
  SELECT e.vec_id, e.embedding, c.cid,
         row_number() OVER (PARTITION BY e.vec_id
                            ORDER BY round(list_cosine_similarity(
                              e.embedding::DOUBLE[], c.cvec), 6) DESC,
                            c.cid ASC) AS crank
  FROM embeddings e CROSS JOIN c2 c
),
indexed AS (
  SELECT vec_id, embedding, cid FROM (
    SELECT *, row_number() OVER (PARTITION BY cid ORDER BY vec_id ASC) AS rib
    FROM scored_cells WHERE crank = 1
  ) WHERE rib <= {ANN_MAX_BUCKET}
),
probes AS (SELECT vec_id, embedding, cid FROM scored_cells
           WHERE crank <= {IVF_NPROBE}),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         any_value(round(list_cosine_similarity(q.embedding::DOUBLE[],
                                                c.embedding::DOUBLE[]), 6)) AS sim
  FROM probes q JOIN indexed c ON q.cid = c.cid AND q.vec_id != c.vec_id
  GROUP BY 1, 2
)
SELECT query_id, neighbor_id, rank, sim FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY sim DESC, neighbor_id ASC) AS rank
  FROM scored
) WHERE rank <= 3
"""


QUERIES.update(
    {
        "knn_ivf": (q_knn_ivf, _knn_ivf_sql()),
        "knn_ivf_trained": (q_knn_ivf_trained, _knn_ivf_trained_sql()),
        "knn_multiprobe": (q_knn_multiprobe, _knn_multiprobe_sql()),
        "token_stats": (q_token_stats, SQL_TOKEN_STATS),
        "token_stats_bpe": (q_token_stats_bpe, _token_stats_bpe_sql()),
        "quality_score": (q_quality_score, SQL_QUALITY_SCORE),
        "lang_id": (q_lang_id, SQL_LANG_ID),
        "exact_dedup": (q_exact_dedup, SQL_EXACT_DEDUP),
        "near_dup_jaccard": (q_near_dup_jaccard, SQL_NEAR_DUP_JACCARD),
        "minhash_signatures": (q_minhash_signatures, _minhash_sql()),
        "minhash_lsh_pairs": (q_minhash_lsh_pairs, _minhash_lsh_sql()),
        "simhash": (q_simhash, SQL_SIMHASH),
        "knn_bruteforce": (q_knn_bruteforce, SQL_KNN_BRUTEFORCE),
        "knn_lsh": (q_knn_lsh, SQL_KNN_LSH),
    }
)


def q_stateful_turn_tool_join(spark, sf_dir):
    """J3/T6: turns × tool-call events with per-conversation ordered
    buffers (batch mode of the stateful CEP operator; streaming variant
    exercised in tests). Rows-only check: not SQL-expressible — output
    includes CEP flush semantics (unmatched turns with null status)."""
    from aktuell_spark.fixtures import gen_tool_events, gen_transcripts
    from aktuell_spark.session import _ship_package
    from aktuell_spark.streaming.stateful import join_turns_tools_stateful

    _ship_package(spark)  # pandas-UDF closures need the pkg on workers

    t = gen_transcripts(spark, n_convs=40, avg_turns=10, hot_turns=60, seed=42)
    te = gen_tool_events(t, seed=42)
    return join_turns_tools_stateful(t, te)


QUERIES.update({"stateful_turn_tool_join": (q_stateful_turn_tool_join, None)})


def q_salted_agg(spark, sf_dir):
    """T7/skew: two-phase salted aggregation — must equal the plain
    groupBy exactly (oracle is the unsalted SQL)."""
    from aktuell_spark.operators.skew import salted_agg

    ev = load(spark, sf_dir, "events")
    out = salted_agg(
        ev, ["event_type"], {"value": "sum", "event_id": "count"},
        salt_buckets=16, salt_col="event_id",
    )
    return out.select(
        "event_type",
        F.round("sum_value", 2).alias("sum_value"),
        F.col("count_event_id").alias("n"),
    )


SQL_SALTED_AGG = """
SELECT event_type, round(sum(value), 2) AS sum_value, count(event_id) AS n
FROM events GROUP BY event_type
"""


def q_multimodal_features(spark, sf_dir):
    """Multimodal plumbing: binary payloads → mapInPandas feature
    extraction (stubbed codec). Rows-only: payload synthesis + Arrow
    batching are the operator under test, not SQL semantics."""
    from aktuell_spark.functions.multimodal import extract_features, synthesize_media
    from aktuell_spark.session import _ship_package

    _ship_package(spark)  # mapInPandas closure needs the pkg on workers
    media = synthesize_media(spark, n=256, seed=42)
    feats = extract_features(media)
    return feats.select(
        "media_id", "mime", "n_bytes",
        F.concat_ws(",", F.transform("feature", lambda x: F.round(x, 6).cast("string"))).alias("feature_str"),
    )


def q_media_meta(spark, sf_dir):
    """REAL multimodal codec path: synthesized decodable PNG/WAV blobs →
    Arrow-batched header decode (PNG IHDR with CRC check, WAV RIFF chunk
    walk — stdlib struct/zlib only). Rows-only: blob synthesis uses zlib,
    which SQL can't reproduce; corrupt payloads surface as valid=false
    rows rather than job failures."""
    from aktuell_spark.functions.multimodal import extract_media_meta, synthesize_real_media
    from aktuell_spark.session import _ship_package

    _ship_package(spark)
    media = synthesize_real_media(spark, n=256, seed=42)
    return extract_media_meta(media)


QUERIES.update(
    {
        "salted_agg": (q_salted_agg, SQL_SALTED_AGG),
        "multimodal_features": (q_multimodal_features, None),
        "media_meta": (q_media_meta, None),
    }
)


# ----------------------------------------------------------------------
# Relational completions (SURVEY §2.4/§2.7: distinct, rollup, set ops,
# pivot — absent in the reference, free from Spark SQL; exposed so the
# engine is a drop-in for reporting workloads over the same tables)
# ----------------------------------------------------------------------

def q_distinct_users(spark, sf_dir):
    """DISTINCT over a projection."""
    ev = load(spark, sf_dir, "events")
    return ev.select("user_id", "event_type").distinct()


SQL_DISTINCT_USERS = "SELECT DISTINCT user_id, event_type FROM events"


def q_rollup_report(spark, sf_dir):
    """ROLLUP (event_type, hour-of-day) with grouping ids."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.withColumn("hod", F.hour(F.col("ts").cast("timestamp")))
        .rollup("event_type", "hod")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.grouping_id().alias("gid"),  # must live inside agg()
        )
        .select("event_type", "hod", "n", "sum_value", "gid")
    )


SQL_ROLLUP_REPORT = """
SELECT event_type, hod, count(*) AS n, round(sum(value), 2) AS sum_value,
       GROUPING(event_type, hod) AS gid
FROM (SELECT *, CAST(hour(ts) AS INT) AS hod FROM events)
GROUP BY ROLLUP(event_type, hod)
"""


def q_set_ops(spark, sf_dir):
    """UNION / INTERSECT / EXCEPT over user cohorts: users who click AND
    purchase, minus users who ever error."""
    ev = load(spark, sf_dir, "events")
    clickers = ev.filter(
        (F.col("event_type") == "click") & (F.col("value") > 150)
    ).select("user_id")
    buyers = ev.filter(
        (F.col("event_type") == "purchase") & (F.col("value") > 150)
    ).select("user_id")
    errorers = ev.filter(
        (F.col("event_type") == "error") & (F.col("value") > 250)
    ).select("user_id")
    return clickers.intersect(buyers).exceptAll(errorers.distinct()).select("user_id")


SQL_SET_OPS = """
(SELECT DISTINCT user_id FROM events WHERE event_type = 'click' AND value > 150
 INTERSECT
 SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase' AND value > 150)
EXCEPT ALL
SELECT DISTINCT user_id FROM events WHERE event_type = 'error' AND value > 250
"""


def q_pivot_counts(spark, sf_dir):
    """PIVOT: per-user event-type count matrix."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .pivot("event_type", ["click", "view", "purchase", "signup", "error"])
        .count()
        .na.fill(0)
    )


SQL_PIVOT_COUNTS = """
SELECT user_id,
       count(*) FILTER (WHERE event_type = 'click') AS click,
       count(*) FILTER (WHERE event_type = 'view') AS view,
       count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
       count(*) FILTER (WHERE event_type = 'signup') AS signup,
       count(*) FILTER (WHERE event_type = 'error') AS error
FROM events GROUP BY user_id
"""


QUERIES.update(
    {
        "distinct_users": (q_distinct_users, SQL_DISTINCT_USERS),
        "rollup_report": (q_rollup_report, SQL_ROLLUP_REPORT),
        "set_ops": (q_set_ops, SQL_SET_OPS),
        "pivot_counts": (q_pivot_counts, SQL_PIVOT_COUNTS),
    }
)


def q_embedding_near_dup(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs (dedup family): candidate
    pairs from sign-bucket LSH cells (adaptive planes + capped candidate
    side), kept when cosine >= 0.4 (no planted near-dups in this corpus;
    0.4 captures the same-label tail)."""
    from aktuell_spark.functions.similarity import embedding_near_dup_pairs

    emb = load(spark, sf_dir, "embeddings")
    return embedding_near_dup_pairs(
        emb, threshold=0.4, n_planes=ANN_PLANES_AT_TEST_SF,
        max_bucket_size=ANN_MAX_BUCKET,
    )


SQL_EMBEDDING_NEAR_DUP = f"""
WITH b AS (
  SELECT vec_id, embedding,
         {_sign_bucket_sql(ANN_PLANES_AT_TEST_SF)} AS bucket
  FROM embeddings
),
c AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY bucket ORDER BY vec_id ASC) AS rib
    FROM b
  ) WHERE rib <= {ANN_MAX_BUCKET}
)
SELECT a.vec_id AS vec_a, c.vec_id AS vec_b,
       round(list_cosine_similarity(a.embedding::DOUBLE[],
                                    c.embedding::DOUBLE[]), 6) AS sim
FROM b a JOIN c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
WHERE round(list_cosine_similarity(a.embedding::DOUBLE[],
                                   c.embedding::DOUBLE[]), 6) >= 0.4
"""


def q_distinct_count(spark, sf_dir):
    """Exact distinct aggregation (A-family): distinct users per type."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


SQL_DISTINCT_COUNT = """
SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
FROM events GROUP BY event_type
"""


QUERIES.update(
    {
        "embedding_near_dup": (q_embedding_near_dup, SQL_EMBEDDING_NEAR_DUP),
        "distinct_count": (q_distinct_count, SQL_DISTINCT_COUNT),
    }
)


def q_snapshot_batches(spark, sf_dir):
    """O3: snapshot pagination without skip/limit re-scans — one sorted
    read tagged with batch_id (replaces the reference's O(n²) skip
    pagination, database.go:276-326)."""
    from aktuell_spark.operators.snapshot import SnapshotOptions, snapshot_with_batches

    ev = load(spark, sf_dir, "events")
    snap = snapshot_with_batches(
        ev,
        SnapshotOptions(
            filter_expr="event_type = 'purchase'",
            sort=[("ts", "desc"), ("event_id", "desc")],
            limit=500,
            batch_size=100,
        ),
    )
    return snap.select("event_id", "batch_id")


SQL_SNAPSHOT_BATCHES = """
SELECT event_id, CAST((rn - 1) // 100 AS INT) AS batch_id FROM (
  SELECT event_id, row_number() OVER (ORDER BY ts DESC, event_id DESC) AS rn
  FROM events WHERE event_type = 'purchase'
  ORDER BY ts DESC, event_id DESC LIMIT 500
)
"""


def q_rate_per_second(spark, sf_dir):
    """W2: events/sec over sliding windows (dashboard changesPerSecond,
    react-client/src/types/aktuell.ts:66)."""
    from aktuell_spark.operators.windows import rate_per_second

    ev = load(spark, sf_dir, "events")
    return rate_per_second(ev, "ts", "60 seconds", "10 seconds").select(
        "window_start", "n", "rate_per_sec"
    )


SQL_RATE_PER_SECOND = """
SELECT (epoch_us(ts) // 10000000) * 10 - k * 10 AS window_start,
       count(*) AS n,
       round(count(*) / 60.0, 4) AS rate_per_sec
FROM events, (SELECT unnest(range(6)) AS k)
GROUP BY 1
"""


QUERIES.update(
    {
        "snapshot_batches": (q_snapshot_batches, SQL_SNAPSHOT_BATCHES),
        "rate_per_second": (q_rate_per_second, SQL_RATE_PER_SECOND),
    }
)


def q_regional_revenue(spark, sf_dir):
    """TPC-H Q5-style multi-join tree (region⋈nation⋈customer⋈orders⋈
    lineitem⋈supplier) — exercises Catalyst join reordering + AQE;
    small dims broadcast automatically."""
    region = load(spark, sf_dir, "region")
    nation = load(spark, sf_dir, "nation")
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .groupBy("r_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


SQL_REGIONAL_REVENUE = """
SELECT r_name, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey
GROUP BY r_name, n_name
"""


def q_users_with_purchases(spark, sf_dir):
    """EXISTS via left-semi join: customers that have a high-value
    purchase event (semi joins never duplicate the left side)."""
    ev = load(spark, sf_dir, "events")
    cust = load(spark, sf_dir, "customer")
    hot = ev.filter((F.col("event_type") == "purchase") & (F.col("value") > 200)).select(
        (F.col("user_id") + 1).alias("k")
    )
    return cust.join(hot, cust.c_custkey == hot.k, "left_semi").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


SQL_USERS_WITH_PURCHASES = """
SELECT c_custkey, c_name, c_mktsegment FROM customer
WHERE EXISTS (SELECT 1 FROM events
              WHERE event_type = 'purchase' AND value > 200
                AND user_id + 1 = c_custkey)
"""


QUERIES.update(
    {
        "regional_revenue": (q_regional_revenue, SQL_REGIONAL_REVENUE),
        "users_with_purchases": (q_users_with_purchases, SQL_USERS_WITH_PURCHASES),
    }
)


def q_partial_update_materialize(spark, sf_dir):
    """S3 (completed): post-image reconstruction from partial updates —
    the reference's no-UpdateLookup CDC case (updateDescription only,
    pkg/models/types.go:17-18 vs SetFullDocument at database.go:78).

    Feed derived from ``events``: each user's first event (by event_id)
    is an insert with a full payload; every later event is a DELTA-only
    update (``updated_fields`` sets text, no post-image), and every
    update with event_id % 5 == 0 also removes the tool field. The
    engine folds the chains with ``reconstruct_post_images``; the oracle
    folds them in plain SQL.
    """
    from aktuell_spark.operators.cdc import reconstruct_post_images

    ev = load(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(F.min("event_id").alias("first_id"))
    evj = ev.join(first, "user_id")
    is_first = F.col("event_id") == F.col("first_id")
    vtext = F.concat(F.lit("v"), F.col("event_id").cast("string"))
    nul = F.lit(None).cast("string")
    changes = evj.select(
        F.col("event_id").alias("seq"),
        F.when(is_first, F.lit("insert")).otherwise(F.lit("update")).alias("op"),
        F.col("user_id").cast("string").alias("conv_id"),
        F.lit(0).alias("turn_idx"),
        F.when(is_first, F.col("event_type")).otherwise(nul).alias("role"),
        F.when(is_first, vtext).otherwise(nul).alias("text"),
        F.when(is_first, F.col("event_id").cast("string")).otherwise(nul).alias("tool"),
        F.when(~is_first, F.create_map(F.lit("text"), vtext)).alias("updated_fields"),
        F.when(
            ~is_first & (F.col("event_id") % 5 == 0), F.array(F.lit("tool"))
        ).alias("removed_fields"),
        F.col("ts").cast("timestamp").alias("ts"),
    )
    out = reconstruct_post_images(changes, key=("conv_id", "turn_idx"))
    return out.select(
        "conv_id",
        F.col("role").alias("last_role"),
        F.col("text").alias("last_text"),
        F.col("tool").alias("last_tool"),
        F.col("seq").alias("last_seq"),
        _epoch("ts").alias("ts_epoch"),
    )


SQL_PARTIAL_UPDATE_MATERIALIZE = """
WITH f AS (SELECT user_id, min(event_id) AS first_id FROM events GROUP BY user_id),
b AS (SELECT e.user_id, e.event_type, e.event_id
      FROM events e JOIN f ON e.user_id = f.user_id AND e.event_id = f.first_id),
upd AS (SELECT e.user_id, e.event_id FROM events e
        JOIN f ON e.user_id = f.user_id WHERE e.event_id > f.first_id),
last_upd AS (SELECT user_id, max(event_id) AS last_id FROM upd GROUP BY user_id),
removed AS (SELECT DISTINCT user_id FROM upd WHERE event_id % 5 = 0),
last_ts AS (SELECT user_id, arg_max(ts, event_id) AS lts FROM events GROUP BY user_id)
SELECT CAST(b.user_id AS VARCHAR) AS conv_id,
       b.event_type AS last_role,
       'v' || CAST(COALESCE(lu.last_id, b.event_id) AS VARCHAR) AS last_text,
       CASE WHEN r.user_id IS NOT NULL THEN NULL
            ELSE CAST(b.event_id AS VARCHAR) END AS last_tool,
       COALESCE(lu.last_id, b.event_id) AS last_seq,
       CAST(floor(epoch(lt.lts)) AS BIGINT) AS ts_epoch
FROM b
LEFT JOIN last_upd lu ON b.user_id = lu.user_id
LEFT JOIN removed r ON b.user_id = r.user_id
JOIN last_ts lt ON b.user_id = lt.user_id
"""


def q_drop_mid_feed(spark, sf_dir):
    """Collection ``drop`` mid-feed (reference op enum
    pkg/models/types.go:101-108; Mongo semantics: drop removes every
    document). Feed derived from ``events``: one insert per event keyed
    by user, plus a drop marker at seq = max(event_id)/2 — only keys
    whose newest event outlives the drop survive.
    """
    from aktuell_spark.operators.cdc import apply_collection_ops, collapse_last_writer_wins

    ev = load(spark, sf_dir, "events")
    inserts = ev.select(
        F.col("event_id").alias("seq"),
        F.lit("insert").alias("op"),
        F.col("user_id").cast("string").alias("conv_id"),
        F.concat(F.lit("v"), F.col("event_id").cast("string")).alias("text"),
    )
    drop_row = ev.agg((F.max("event_id") / 2).cast("long").alias("seq")).select(
        "seq",
        F.lit("drop").alias("op"),
        F.lit("").alias("conv_id"),
        F.lit(None).cast("string").alias("text"),
    )
    feed = inserts.unionByName(drop_row)
    alive = apply_collection_ops(feed)
    out = collapse_last_writer_wins(alive, key=("conv_id",), order_col="seq")
    return out.select(
        "conv_id",
        F.col("text").alias("last_text"),
        F.col("seq").alias("last_seq"),
    )


SQL_DROP_MID_FEED = """
SELECT CAST(user_id AS VARCHAR) AS conv_id,
       'v' || CAST(max(event_id) AS VARCHAR) AS last_text,
       max(event_id) AS last_seq
FROM events
WHERE event_id > (SELECT max(event_id) // 2 FROM events)
GROUP BY user_id
"""


def q_multi_subscription_routing(spark, sf_dir):
    """One event → N subscribers (hub fan-out,
    /root/reference/pkg/server/websocket.go:226-293), batch form: a
    SINGLE scan routes each event to every matching subscription via an
    exploded match array (never N scans), then per-(subscription, key)
    LWW. Subscriptions overlap deliberately — sub_a matches
    click/purchase, sub_b matches value > 200 — so one event can land
    in both, like one change event reaching multiple websocket clients.
    """
    ev = load(spark, sf_dir, "events")
    matches = F.array(
        F.when(F.col("event_type").isin("click", "purchase"), F.lit("sub_a")),
        F.when(F.col("value") > 200, F.lit("sub_b")),
    )
    routed = ev.withColumn(
        "sub", F.explode(F.filter(matches, lambda x: x.isNotNull()))
    )
    return routed.groupBy("sub", "user_id").agg(
        F.max("event_id").alias("last_event_id"),
        F.max_by("event_type", "event_id").alias("last_event_type"),
        F.count(F.lit(1)).alias("n_delivered"),
    )


SQL_MULTI_SUBSCRIPTION_ROUTING = """
SELECT 'sub_a' AS sub, user_id,
       max(event_id) AS last_event_id,
       arg_max(event_type, event_id) AS last_event_type,
       count(*) AS n_delivered
FROM events WHERE event_type IN ('click', 'purchase') GROUP BY user_id
UNION ALL
SELECT 'sub_b' AS sub, user_id,
       max(event_id) AS last_event_id,
       arg_max(event_type, event_id) AS last_event_type,
       count(*) AS n_delivered
FROM events WHERE value > 200 GROUP BY user_id
"""


def q_value_percentiles(spark, sf_dir):
    """Exact percentile aggregation (interpolated, matches SQL
    quantile_cont) — the reporting companion to the sketch variant."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("value", F.lit(0.95)), 4).alias("p95"),
        F.round(F.percentile("value", F.lit(0.99)), 4).alias("p99"),
    )


SQL_VALUE_PERCENTILES = """
SELECT event_type,
       round(quantile_cont(value, 0.5), 4) AS p50,
       round(quantile_cont(value, 0.95), 4) AS p95,
       round(quantile_cont(value, 0.99), 4) AS p99
FROM events GROUP BY event_type
"""


def q_hll_distinct(spark, sf_dir):
    """HyperLogLog distinct sketch (approx_count_distinct) — rows-only:
    sketch estimates are engine-specific; the pytest suite bounds the
    relative error against the exact count instead."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users")
    )


QUERIES.update(
    {
        "partial_update_materialize": (
            q_partial_update_materialize,
            SQL_PARTIAL_UPDATE_MATERIALIZE,
        ),
        "drop_mid_feed": (q_drop_mid_feed, SQL_DROP_MID_FEED),
        "multi_subscription_routing": (
            q_multi_subscription_routing,
            SQL_MULTI_SUBSCRIPTION_ROUTING,
        ),
        "value_percentiles": (q_value_percentiles, SQL_VALUE_PERCENTILES),
        "hll_distinct": (q_hll_distinct, None),
    }
)


# ----------------------------------------------------------------------
# round 3: residual dynamic payload fields + rename read-path aliasing
# ----------------------------------------------------------------------
def q_residual_projection(spark, sf_dir):
    """Residual dynamic payload fields (reference's schemaless document
    map, pkg/models/types.go:16): delta keys outside the fixed columns
    fold into the ``extra`` map — ``updated_fields['k']`` upserts
    ``extra['k']``, ``removed_fields`` deletes.

    Feed derived from ``events``: each user's first event inserts with
    ``extra = {'k': props.k, 'origin': 'seed'}``; every later event is a
    partial update whose ``updated_fields`` sets the RESIDUAL key ``k``,
    and events with event_id % 7 == 0 remove the residual ``origin``.
    """
    from aktuell_spark.operators.cdc import reconstruct_post_images

    ev = load(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(F.min("event_id").alias("first_id"))
    evj = ev.join(first, "user_id")
    is_first = F.col("event_id") == F.col("first_id")
    kval = F.get_json_object("props", "$.k")
    nul = F.lit(None).cast("string")
    changes = evj.select(
        F.col("event_id").alias("seq"),
        F.when(is_first, F.lit("insert")).otherwise(F.lit("update")).alias("op"),
        F.col("user_id").cast("string").alias("conv_id"),
        F.lit(0).alias("turn_idx"),
        F.when(is_first, F.col("event_type")).otherwise(nul).alias("role"),
        F.when(is_first, F.lit("t0")).otherwise(nul).alias("text"),
        nul.alias("tool"),
        F.when(~is_first, F.create_map(F.lit("k"), kval)).alias("updated_fields"),
        F.when(
            ~is_first & (F.col("event_id") % 7 == 0), F.array(F.lit("origin"))
        ).alias("removed_fields"),
        F.col("ts").cast("timestamp").alias("ts"),
        F.when(
            is_first,
            F.create_map(F.lit("k"), kval, F.lit("origin"), F.lit("seed")),
        ).alias("extra"),
    )
    out = reconstruct_post_images(changes, key=("conv_id", "turn_idx"))
    return out.select(
        "conv_id",
        F.element_at("extra", F.lit("k")).alias("k_val"),
        F.element_at("extra", F.lit("origin")).alias("origin"),
        F.col("seq").alias("last_seq"),
    )


SQL_RESIDUAL_PROJECTION = """
WITH f AS (SELECT user_id, min(event_id) AS first_id FROM events GROUP BY user_id)
SELECT CAST(e.user_id AS VARCHAR) AS conv_id,
       arg_max(json_extract_string(e.props, '$.k'), e.event_id) AS k_val,
       CASE WHEN max(CASE WHEN e.event_id > f.first_id AND e.event_id % 7 = 0
                          THEN 1 ELSE 0 END) = 1
            THEN NULL ELSE 'seed' END AS origin,
       max(e.event_id) AS last_seq
FROM events e JOIN f ON e.user_id = f.user_id
GROUP BY e.user_id
"""


def q_rename_routing(spark, sf_dir):
    """Rename read-path aliasing (reference op enum
    pkg/models/types.go:101-108): a collection rename moves documents,
    so pre-rename events must resolve to the NEW name.

    Feed derived from ``events``: 'click' events stream into collection
    ``clicks_v1`` until seq mid = max(event_id) div 2, where a rename
    marker (extra['to'] = 'clicks') switches the namespace; later clicks
    arrive as ``clicks``. All other events are ``misc``.
    ``resolve_renames`` routes every click — old or new — to ``clicks``.
    """
    from aktuell_spark.operators.cdc import resolve_renames

    ev = load(spark, sf_dir, "events")
    mid = ev.agg(F.max("event_id")).collect()[0][0] // 2  # 1-row collect
    is_click = F.col("event_type") == "click"
    coll = F.when(
        is_click & (F.col("event_id") < mid), F.lit("clicks_v1")
    ).when(is_click, F.lit("clicks")).otherwise(F.lit("misc"))
    nul = F.lit(None).cast("string")
    data = ev.select(
        F.col("event_id").alias("seq"),
        F.lit("insert").alias("op"),
        coll.alias("collection"),
        F.col("user_id").cast("string").alias("conv_id"),
        F.lit(None).cast("map<string,string>").alias("extra"),
    )
    marker = spark.range(1).select(
        F.lit(mid).cast("long").alias("seq"),
        F.lit("rename").alias("op"),
        F.lit("clicks_v1").alias("collection"),
        nul.alias("conv_id"),
        F.create_map(F.lit("to"), F.lit("clicks")).alias("extra"),
    )
    feed = data.unionByName(marker)
    resolved = resolve_renames(feed).filter(F.col("op") != "rename")
    return resolved.groupBy(F.col("collection_resolved").alias("collection")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("conv_id").alias("n_users"),
        F.max("seq").alias("max_seq"),
    )


SQL_RENAME_ROUTING = """
WITH m AS (SELECT max(event_id) // 2 AS mid FROM events)
SELECT CASE WHEN event_type = 'click' THEN 'clicks' ELSE 'misc' END AS collection,
       count(*) AS n_events,
       count(DISTINCT user_id) AS n_users,
       max(event_id) AS max_seq
FROM events, m
GROUP BY 1
"""


QUERIES.update(
    {
        "residual_projection": (q_residual_projection, SQL_RESIDUAL_PROJECTION),
        "rename_routing": (q_rename_routing, SQL_RENAME_ROUTING),
    }
)


# ----------------------------------------------------------------------
# round 3 widening: as-of join, PII scrub, deterministic sampling
# ----------------------------------------------------------------------
def q_asof_join(spark, sf_dir):
    """AS-OF join (operators/asof.py): attach the most recent purchase
    at or before each click, per user — the union + last-non-null
    window composition (one shuffle on the key), checked against
    DuckDB's native ASOF JOIN. Right side deduped to one row per
    (user, ts) so tie-breaking is engine-independent."""
    from aktuell_spark.operators.asof import asof_join

    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "event_id", F.col("ts").cast("timestamp").alias("ts")
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.col("ts").cast("timestamp").alias("ts"))
        .agg(F.max("value").alias("pvalue"))
    )
    out = asof_join(
        clicks, purchases, on=["user_id"], left_ts="ts", right_ts="ts",
        right_cols=["ts", "pvalue"],
    )
    return out.select(
        "user_id",
        "event_id",
        F.round("pvalue_asof", 2).alias("last_purchase"),
        F.col("ts_asof").cast("long").alias("purchase_ts_epoch"),
    )


SQL_ASOF_JOIN = """
WITH c AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'click'),
p AS (SELECT user_id, ts, max(value) AS pvalue FROM events
      WHERE event_type = 'purchase' GROUP BY user_id, ts)
SELECT c.user_id,
       c.event_id,
       round(p.pvalue, 2) AS last_purchase,
       CAST(floor(epoch(p.ts)) AS BIGINT) AS purchase_ts_epoch
FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND p.ts <= c.ts
"""


def q_pii_scrub(spark, sf_dir):
    """PII scrubbing (functions/textops.py::scrub_pii): emails, intl
    phones, and IPv4 literals become typed placeholders — JVM-side
    regexp chain, no Python. PII is synthesized onto every third
    document (the corpus has none) so the oracle checks real
    replacements, not no-ops."""
    from aktuell_spark.functions.textops import with_pii_scrub

    d = load(spark, sf_dir, "documents")
    injected = d.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact u"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com or +1 415 555 0100 from 10.0.0.1"),
            ),
        ).otherwise(F.col("text")),
    )
    return with_pii_scrub(injected).select("doc_id", "had_pii", "text_scrubbed")


SQL_PII_SCRUB = """
WITH injected AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0
              THEN text || ' contact u' || CAST(doc_id AS VARCHAR)
                   || '@example.com or +1 415 555 0100 from 10.0.0.1'
              ELSE text END AS text
  FROM documents
)
SELECT doc_id,
       scrubbed <> text AS had_pii,
       scrubbed AS text_scrubbed
FROM (
  SELECT doc_id, text,
         regexp_replace(regexp_replace(regexp_replace(text,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
           '\\+[0-9][0-9 ()-]{6,}[0-9]', '<PHONE>', 'g'),
           '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b', '<IP>', 'g')
         AS scrubbed
  FROM injected
)
"""


def q_deterministic_sample(spark, sf_dir):
    """Engine-independent sampling audit (functions/sampling.py):
    membership = md5(key) prefix < threshold, so the exact same rows
    are selected on any cluster size, retry, or engine — here DuckDB
    reproduces the sample bit-for-bit. rate=0.1 -> threshold '1999'
    (pinned in the oracle like the ANN plane constants)."""
    from aktuell_spark.functions.sampling import stratified_counts

    d = load(spark, sf_dir, "documents")
    return stratified_counts(d, key="doc_id", stratum="source", rate=0.1)


SQL_DETERMINISTIC_SAMPLE = """
SELECT source,
       count(*) AS n_total,
       CAST(sum(CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '1999'
                THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
       round(sum(CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '1999'
                      THEN 1 ELSE 0 END) * 1.0 / count(*), 4) AS realized_rate
FROM documents
GROUP BY source
"""


QUERIES.update(
    {
        "asof_join": (q_asof_join, SQL_ASOF_JOIN),
        "pii_scrub": (q_pii_scrub, SQL_PII_SCRUB),
        "deterministic_sample": (q_deterministic_sample, SQL_DETERMINISTIC_SAMPLE),
    }
)


# ----------------------------------------------------------------------
# Round-4 widening: CEP sequence detection, SCD2 history, winnowing
# fingerprints
# ----------------------------------------------------------------------

def q_cep_funnel(spark, sf_dir):
    """CEP pattern detection (operators/cep.py): contiguous
    view→click→purchase funnels per user within 48 h — the
    MATCH_RECOGNIZE-style primitive the reference's one-event-at-a-time
    handler chain (pkg/client/client.go:299-326) cannot express. One
    keyed shuffle; every step is a lead over the same window."""
    from aktuell_spark.operators.cep import detect_sequence

    ev = load(spark, sf_dir, "events")
    return detect_sequence(
        ev,
        steps=["event_type = 'view'", "event_type = 'click'",
               "event_type = 'purchase'"],
        key_col="user_id", order_col="event_id", ts_col="ts",
        within_seconds=172_800,
    )


SQL_CEP_FUNNEL = """
WITH o AS (
  SELECT user_id, event_id, ts,
         event_type,
         lead(event_type, 1) OVER w AS e1,
         lead(event_type, 2) OVER w AS e2,
         lead(event_id, 2)   OVER w AS end_event_id,
         lead(ts, 2)         OVER w AS end_ts
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
)
SELECT user_id, event_id AS start_event_id, ts AS start_ts,
       end_event_id, end_ts,
       CAST(floor(epoch(end_ts)) AS BIGINT)
         - CAST(floor(epoch(ts)) AS BIGINT) AS span_seconds
FROM o
WHERE event_type = 'view' AND e1 = 'click' AND e2 = 'purchase'
  AND CAST(floor(epoch(end_ts)) AS BIGINT)
        - CAST(floor(epoch(ts)) AS BIGINT) <= 172800
"""


def q_scd2_history(spark, sf_dir):
    """SCD type-2 history (operators/history.py): every key version
    with its validity interval — the time-travel view the reference's
    in-place client merge cannot answer (useAktuellStream.ts:133-165).
    One keyed shuffle; row_number + lead share a single window node."""
    from aktuell_spark.operators.history import scd2_history

    ev = load(spark, sf_dir, "events")
    h = scd2_history(ev, key=("user_id",), order_col="event_id",
                     op_col="event_type")
    return h.select(
        "user_id", "version",
        F.col("event_type").alias("op"),
        F.round("value", 2).alias("value"),
        "valid_from", "valid_to", "is_current",
    )


SQL_SCD2_HISTORY = """
SELECT user_id,
       row_number() OVER w AS version,
       event_type AS op,
       round(value, 2) AS value,
       event_id AS valid_from,
       lead(event_id) OVER w AS valid_to,
       (lead(event_id) OVER w IS NULL AND event_type <> 'delete') AS is_current
FROM events WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
"""


# pair-query guards, pinned for the static oracle (production passes
# them per corpus): the synthetic docs share a heavy vocabulary (median
# fingerprint appears in 3 docs, p90 in 30), so a permissive min_shared
# degenerates toward all-pairs — 10/6 keeps the pair set the near-dup
# tail (24 pairs at sf0.01, 6 at sf0.1)
WINNOW_MIN_SHARED = 6
WINNOW_MAX_DF = 10


def q_winnow_fingerprints(spark, sf_dir):
    """Winnowing fingerprints (functions/winnow.py — MOSS rolling-hash
    document fingerprinting): sorted distinct window-min k-gram hashes,
    bit-for-bit reproduced by the oracle (md5-hex hashes compare
    lexicographically in both engines)."""
    from aktuell_spark.functions.winnow import with_winnow_fingerprints

    d = load(spark, sf_dir, "documents")
    fp = with_winnow_fingerprints(d.select("doc_id", "text"))
    return fp.select(
        "doc_id",
        F.size("fingerprints").alias("n_fps"),
        F.concat_ws(",", "fingerprints").alias("fps_str"),
    )


def _winnow_norm_sql() -> str:
    from aktuell_spark.functions.winnow import WINNOW_K, WINNOW_W

    return f"""
n AS (
  SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS t
  FROM documents
),
h AS (
  SELECT doc_id,
         [substring(md5(substring(t, i, {WINNOW_K})), 1, 8)
          FOR i IN range(1, len(t) - {WINNOW_K} + 2)] AS hs
  FROM n WHERE len(t) >= {WINNOW_K}
),
m AS (
  SELECT doc_id,
         CASE WHEN len(hs) < {WINNOW_W} THEN [list_min(hs)]
              ELSE [list_min(hs[i : i + {WINNOW_W} - 1])
                    FOR i IN range(1, len(hs) - {WINNOW_W} + 2)]
         END AS mins
  FROM h
),
fps AS (SELECT doc_id, list_sort(list_distinct(mins)) AS fps FROM m)"""


def _winnow_fingerprints_sql() -> str:
    return f"""
WITH {_winnow_norm_sql()}
SELECT doc_id, len(fps) AS n_fps, array_to_string(fps, ',') AS fps_str
FROM fps
"""


def q_winnow_pairs(spark, sf_dir):
    """Winnowing overlap pairs: inverted fingerprint index join with the
    max_df stop-fingerprint guard — shared-substring detection without
    pairwise comparison (same never-all-pairs shape as MinHash-LSH)."""
    from aktuell_spark.functions.winnow import winnow_overlap_pairs

    d = load(spark, sf_dir, "documents")
    return winnow_overlap_pairs(
        d.select("doc_id", "text"),
        min_shared=WINNOW_MIN_SHARED, max_df=WINNOW_MAX_DF,
    )


def _winnow_pairs_sql() -> str:
    return f"""
WITH {_winnow_norm_sql()},
fp AS (SELECT doc_id, unnest(fps) AS fp FROM fps),
kept AS (SELECT fp FROM fp GROUP BY fp HAVING count(*) <= {WINNOW_MAX_DF})
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared_fps
FROM fp a JOIN kept USING (fp) JOIN fp b USING (fp)
WHERE a.doc_id < b.doc_id
GROUP BY 1, 2
HAVING count(*) >= {WINNOW_MIN_SHARED}
"""


QUERIES.update(
    {
        "cep_funnel": (q_cep_funnel, SQL_CEP_FUNNEL),
        "scd2_history": (q_scd2_history, SQL_SCD2_HISTORY),
        "winnow_fingerprints": (q_winnow_fingerprints, _winnow_fingerprints_sql()),
        "winnow_pairs": (q_winnow_pairs, _winnow_pairs_sql()),
    }
)


# ----------------------------------------------------------------------
# Round-4 widening, part 2: Gopher repetition filters, benchmark
# decontamination, int8-quantized ANN
# ----------------------------------------------------------------------

def q_gopher_repetition(spark, sf_dir):
    """Gopher-style per-doc repetition filters (top-2/3-gram char
    coverage, duplicate-5-gram char coverage) with the published flag
    thresholds. Zero-shuffle narrow map (Arrow pandas UDF emits exact
    integer numerators; fractions/flags derived JVM-side)."""
    from aktuell_spark.functions.textops import with_repetition_stats

    docs = load(spark, sf_dir, "documents")
    return with_repetition_stats(docs).select(
        "doc_id", "n_tokens", "top2gram_frac", "top3gram_frac",
        "dup5gram_frac", "flag_repetitive",
    )


def _gopher_gram_sql(n: int) -> str:
    """One unnested-gram CTE body for word n-grams (1-indexed DuckDB)."""
    joined = " || ' ' || ".join(
        f"toks[i+{k}]" if k else "toks[i]" for k in range(n)
    )
    hi = f"len(toks) - {n - 2}" if n > 1 else "len(toks) + 1"
    return (
        f"SELECT doc_id, unnest([{joined} FOR i IN range(1, {hi})]) AS g\n"
        f"  FROM t WHERE len(toks) >= {n}"
    )


def _gopher_repetition_sql() -> str:
    from aktuell_spark.functions.textops import (
        REP_TOP2_THRESH, REP_TOP3_THRESH, REP_DUP5_THRESH,
    )

    (t2n, t2d), (t3n, t3d), (d5n, d5d) = (
        REP_TOP2_THRESH, REP_TOP3_THRESH, REP_DUP5_THRESH,
    )
    gram5 = " || ' ' || ".join(
        f"toks[i+{k}]" if k else "toks[i]" for k in range(5)
    )
    return f"""
WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks,
         length(regexp_replace(trim(text), '\\s+', '', 'g')) AS total_chars
  FROM documents
),
g2 AS ({_gopher_gram_sql(2)}),
a2 AS (
  SELECT doc_id, max(c * chars) AS top2_chars FROM (
    SELECT doc_id, count(*) AS c, length(g) - 1 AS chars
    FROM g2 GROUP BY doc_id, g
  ) GROUP BY doc_id
),
g3 AS ({_gopher_gram_sql(3)}),
a3 AS (
  SELECT doc_id, max(c * chars) AS top3_chars FROM (
    SELECT doc_id, count(*) AS c, length(g) - 2 AS chars
    FROM g3 GROUP BY doc_id, g
  ) GROUP BY doc_id
),
g5 AS (
  SELECT doc_id,
         unnest(range(1, len(toks) - 3)) AS i,
         unnest([{gram5} FOR i IN range(1, len(toks) - 3)]) AS g
  FROM t WHERE len(toks) >= 5
),
dup5 AS (SELECT doc_id, g FROM g5 GROUP BY doc_id, g HAVING count(*) >= 2),
cov5 AS (
  SELECT DISTINCT doc_id, j FROM (
    SELECT g5.doc_id, unnest(range(g5.i, g5.i + 5)) AS j
    FROM g5 JOIN dup5 USING (doc_id, g))
),
a5 AS (
  SELECT cov5.doc_id,
         CAST(sum(length(t.toks[cov5.j])) AS BIGINT) AS dup5_chars
  FROM cov5 JOIN t ON cov5.doc_id = t.doc_id GROUP BY cov5.doc_id
),
j AS (
  SELECT t.doc_id, len(toks) AS n_tokens, total_chars,
         coalesce(top2_chars, 0) AS top2_chars,
         coalesce(top3_chars, 0) AS top3_chars,
         coalesce(dup5_chars, 0) AS dup5_chars
  FROM t LEFT JOIN a2 USING (doc_id) LEFT JOIN a3 USING (doc_id)
         LEFT JOIN a5 USING (doc_id)
)
SELECT doc_id, n_tokens,
  CASE WHEN total_chars > 0
       THEN least(round(top2_chars * 1.0 / total_chars, 4), 1.0) ELSE 0.0
  END AS top2gram_frac,
  CASE WHEN total_chars > 0
       THEN least(round(top3_chars * 1.0 / total_chars, 4), 1.0) ELSE 0.0
  END AS top3gram_frac,
  CASE WHEN total_chars > 0
       THEN least(round(dup5_chars * 1.0 / total_chars, 4), 1.0) ELSE 0.0
  END AS dup5gram_frac,
  (top2_chars * {t2n} > total_chars * {t2d}
   OR top3_chars * {t3n} > total_chars * {t3d}
   OR dup5_chars * {d5n} > total_chars * {d5d}) AS flag_repetitive
FROM j
"""


DECONTAM_N = 8  # word n-gram length (published pipelines use 8..13)


def q_decontaminate(spark, sf_dir):
    """Benchmark decontamination: training docs sharing any word 8-gram
    with the (deterministic, doc_id % 17 == 0) benchmark subset. One
    equi-join on 16-hex md5 gram hashes + one groupBy — never pairwise."""
    from aktuell_spark.functions.dedupe import contamination_overlap

    docs = load(spark, sf_dir, "documents")
    return contamination_overlap(
        docs, F.col("doc_id") % 17 == 0, n=DECONTAM_N
    )


def _decontaminate_sql(n: int = DECONTAM_N) -> str:
    joined = " || ' ' || ".join(
        f"toks[i+{k}]" if k else "toks[i]" for k in range(n)
    )
    return f"""
WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
  FROM documents
),
g AS (
  SELECT doc_id, doc_id % 17 = 0 AS is_bench,
         unnest(list_distinct(
           [{joined} FOR i IN range(1, len(toks) - {n - 2})])) AS g
  FROM t WHERE len(toks) >= {n}
),
h AS (SELECT doc_id, is_bench, substring(md5(g), 1, 16) AS gh FROM g),
bench AS (SELECT DISTINCT gh FROM h WHERE is_bench),
per_doc AS (
  SELECT doc_id, count(*) AS n_grams FROM h WHERE NOT is_bench
  GROUP BY doc_id
),
hits AS (
  SELECT doc_id, count(*) AS n_overlap_grams
  FROM h JOIN bench USING (gh) WHERE NOT is_bench GROUP BY doc_id
)
SELECT doc_id, n_overlap_grams, n_grams,
       round(n_overlap_grams * 1.0 / n_grams, 4) AS overlap_frac
FROM hits JOIN per_doc USING (doc_id)
"""


def q_ann_quantized(spark, sf_dir):
    """Top-5 cosine neighbors for query vectors 0..9 computed entirely
    on int8-quantized vectors (integer dot products, per-vector scale
    cancels in cosine). The compression leg of the ANN family — 4×
    fewer vector bytes on the scan at corpus scale."""
    from aktuell_spark.functions.similarity import knn_quantized

    emb = load(spark, sf_dir, "embeddings")
    return knn_quantized(emb, list(range(10)), k=5)


SQL_ANN_QUANTIZED = """
WITH v AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
),
s AS (
  SELECT vec_id, v,
         CASE WHEN amax > 0 THEN 127.0 / amax ELSE 0.0 END AS scale
  FROM (SELECT vec_id, v, list_max([abs(x) FOR x IN v]) AS amax FROM v)
),
q AS (
  SELECT vec_id,
         [CAST(floor(x * scale + 0.5) AS BIGINT) FOR x IN v] AS qv
  FROM s
),
qn AS (SELECT vec_id, qv, list_dot_product(qv, qv) AS nrm FROM q),
scored AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         CASE WHEN a.nrm > 0 AND b.nrm > 0
              THEN round(list_dot_product(a.qv, b.qv)
                         / (sqrt(a.nrm) * sqrt(b.nrm)), 6)
              ELSE 0.0 END AS sim
  FROM qn a JOIN qn b ON a.vec_id != b.vec_id
  WHERE a.vec_id < 10
)
SELECT query_id, neighbor_id, rank, sim FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY sim DESC, neighbor_id ASC) AS rank
  FROM scored
) WHERE rank <= 5
"""


QUERIES.update(
    {
        "gopher_repetition": (q_gopher_repetition, _gopher_repetition_sql()),
        "decontaminate": (q_decontaminate, _decontaminate_sql()),
        "ann_quantized": (q_ann_quantized, SQL_ANN_QUANTIZED),
    }
)


def q_dedup_clusters(spark, sf_dir):
    """Near-dup clusters: connected components (hash-min label
    propagation, one shuffle per round, rounds = cluster diameter) over
    the exact-Jaccard pair graph. cluster_id = min doc_id of the
    component — the canonical survivor under keep-first dedup."""
    from aktuell_spark.functions.dedupe import ngram_jaccard_pairs
    from aktuell_spark.operators.components import dedup_clusters

    docs = load(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, threshold=0.2, max_df=NEAR_DUP_MAX_DF)
    return dedup_clusters(pairs)


def _dedup_clusters_sql() -> str:
    # the pair graph is the (already-green) near_dup_jaccard oracle,
    # nested as a subquery; components via recursive min-label walk —
    # min over every vertex that reaches v == component minimum.
    return f"""
WITH RECURSIVE pairs AS (
  SELECT doc_a, doc_b FROM ({SQL_NEAR_DUP_JACCARD}) jp
),
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs
),
walk(v, l) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM edges) s
  UNION
  SELECT e.v, w.l FROM walk w JOIN edges e ON e.u = w.v
),
comp AS (SELECT v AS doc_id, min(l) AS cluster_id FROM walk GROUP BY v)
SELECT doc_id, cluster_id,
       count(*) OVER (PARTITION BY cluster_id) AS cluster_size
FROM comp
"""


QUERIES.update(
    {"dedup_clusters": (q_dedup_clusters, _dedup_clusters_sql())}
)


def q_dedup_clusters_star(spark, sf_dir):
    """Same cluster semantics as dedup_clusters but via the
    O(log n)-round large-star/small-star path (Kiveris et al.,
    MapReduce'14) — the high-diameter-safe variant for graphs where
    hash-min's diameter-bounded rounds would exhaust (chained
    templates at 100 TB). Identical labels by construction (component
    min), so it shares dedup_clusters' oracle verbatim
    (operators/components.py:_star_components)."""
    from aktuell_spark.functions.dedupe import ngram_jaccard_pairs
    from aktuell_spark.operators.components import dedup_clusters

    docs = load(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, threshold=0.2, max_df=NEAR_DUP_MAX_DF)
    return dedup_clusters(pairs, algorithm="star")


QUERIES.update(
    {"dedup_clusters_star": (q_dedup_clusters_star, _dedup_clusters_sql())}
)


# balanced-mix rates: downsample the dominant language, keep all of the
# rarest; everything else at the default. Pinned here so the static SQL
# oracle carries the identical CASE thresholds.
STRAT_RATES = {"en": 0.2, "zh": 1.0}
STRAT_DEFAULT = 0.5


def q_stratified_sample(spark, sf_dir):
    """Per-stratum deterministic sampling (balanced training mix):
    en downsampled to 0.2, zh kept whole, rest at 0.5 — membership is
    md5(doc_id)-prefix vs a per-lang threshold, so the exact same rows
    survive on any cluster size, retry, or engine. Zero shuffle."""
    from aktuell_spark.functions.sampling import stratified_sample

    d = load(spark, sf_dir, "documents")
    return stratified_sample(
        d, key="doc_id", stratum="lang", rates=STRAT_RATES,
        default_rate=STRAT_DEFAULT,
    ).select("doc_id", "lang", "source")


def _stratified_sample_sql() -> str:
    def thr(rate: float) -> str:
        return "g" if rate >= 1.0 else format(int(rate * 0x10000), "04x")

    cases = " ".join(
        f"WHEN lang = '{s}' THEN '{thr(r)}'"
        for s, r in sorted(STRAT_RATES.items())
    )
    return f"""
SELECT doc_id, lang, source FROM documents
WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 4)
      < CASE {cases} ELSE '{thr(STRAT_DEFAULT)}' END
"""


PACK_TARGET = 512
PACK_SHARDS = 64


def q_pack_sequences(spark, sf_dir):
    """Sequence packing (concat-then-chunk): docs sharded by
    doc_id % 64, ordered by id within the shard, assigned to the
    512-token pack their first token lands in. ONE shuffle on the shard
    key, then partition-local window sums — a global ordering would
    serialize the corpus through one partition."""
    from aktuell_spark.functions.packing import pack_sequences

    d = load(spark, sf_dir, "documents")
    return pack_sequences(d, target_tokens=PACK_TARGET, n_shards=PACK_SHARDS)


def _pack_sequences_sql() -> str:
    return f"""
WITH d AS (
  SELECT doc_id, doc_id % {PACK_SHARDS} AS shard,
         len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens
  FROM documents
),
o AS (
  SELECT doc_id, shard, n_tokens,
         CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                                  ROWS UNBOUNDED PRECEDING) - n_tokens
              AS BIGINT) AS start_offset
  FROM d
)
SELECT doc_id, shard, n_tokens, start_offset,
       start_offset // {PACK_TARGET} AS pack_id
FROM o
"""


def q_tfidf_top_terms(spark, sf_dir):
    """Top-3 salient terms per doc by the log-free tf·N/df weight
    (ln ranks identically but transcendental bit-parity across engines
    is not guaranteed — the score stays integer until one double
    division). explode → two map-side-combinable groupBys → one term
    equi-join → per-doc top-k window."""
    from aktuell_spark.functions.tfidf import tfidf_top_terms

    d = load(spark, sf_dir, "documents")
    return tfidf_top_terms(d, k=3)


SQL_TFIDF_TOP_TERMS = """
WITH terms AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY doc_id, term),
dfreq AS (SELECT term, count(*) AS term_df FROM tf GROUP BY term),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, dfreq.term_df,
         round(tf.tf * n.n_docs * 1.0 / dfreq.term_df, 4) AS score
  FROM tf JOIN dfreq USING (term) CROSS JOIN n
)
SELECT doc_id, term, tf, term_df, score, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY doc_id
                               ORDER BY score DESC, term ASC) AS rank
  FROM scored
) WHERE rank <= 3
"""


QUERIES.update(
    {
        "stratified_sample": (q_stratified_sample, _stratified_sample_sql()),
        "pack_sequences": (q_pack_sequences, _pack_sequences_sql()),
        "tfidf_top_terms": (q_tfidf_top_terms, SQL_TFIDF_TOP_TERMS),
    }
)


def q_dedup_corpus(spark, sf_dir):
    """The dedup story end-to-end: the SURVIVING corpus after keep-first
    near-dup collapse — every doc whose cluster canonical (component-min
    doc_id) is itself, i.e. singletons plus one representative per
    near-dup cluster. left_anti join against the non-canonical members;
    at scale the cluster table is a fraction of the corpus and
    AQE broadcasts it."""
    from aktuell_spark.functions.dedupe import ngram_jaccard_pairs
    from aktuell_spark.operators.components import dedup_clusters

    docs = load(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, threshold=0.2, max_df=NEAR_DUP_MAX_DF)
    dupes = dedup_clusters(pairs).filter(
        F.col("doc_id") != F.col("cluster_id")
    )
    return docs.join(dupes.select("doc_id"), "doc_id", "left_anti").select(
        "doc_id", "lang", "source"
    )


def _dedup_corpus_sql() -> str:
    return f"""
WITH RECURSIVE pairs AS (
  SELECT doc_a, doc_b FROM ({SQL_NEAR_DUP_JACCARD}) jp
),
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs
),
walk(v, l) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM edges) s
  UNION
  SELECT e.v, w.l FROM walk w JOIN edges e ON e.u = w.v
),
comp AS (SELECT v AS doc_id, min(l) AS cluster_id FROM walk GROUP BY v)
SELECT d.doc_id, d.lang, d.source
FROM documents d
WHERE d.doc_id NOT IN (SELECT doc_id FROM comp WHERE doc_id != cluster_id)
"""


QUERIES.update({"dedup_corpus": (q_dedup_corpus, _dedup_corpus_sql())})


INTERVAL_JOIN_UPPER = 86_400  # clicks within one day after an error


def q_interval_join(spark, sf_dir):
    """Interval (range) join planned as an equi-join: every click by
    the same user within [0, 86400] s AFTER an error. Time is quantized
    into span-width buckets, the left side explodes into the fixed 2
    candidate buckets, and the exact range refines after a plain
    shuffled equi-join — linear work, never a nested loop
    (plan-asserted; a naive theta-join plans BroadcastNestedLoopJoin)."""
    from aktuell_spark.operators.interval import interval_join

    ev = load(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    out = interval_join(
        errors, clicks, lower=0, upper=INTERVAL_JOIN_UPPER, key="user_id"
    )
    return out.select(
        F.col("l_event_id").alias("error_id"),
        F.col("r_event_id").alias("click_id"),
        F.col("l_user_id").alias("user_id"),
        "gap_seconds",
    )


def _interval_join_sql() -> str:
    return f"""
WITH errors AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'),
clicks AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click')
SELECT a.event_id AS error_id, b.event_id AS click_id,
       a.user_id AS user_id,
       (epoch_us(b.ts) - epoch_us(a.ts)) // 1000000 AS gap_seconds
FROM errors a JOIN clicks b
  ON a.user_id = b.user_id
 AND epoch_us(b.ts) - epoch_us(a.ts) BETWEEN 0 AND CAST({INTERVAL_JOIN_UPPER} AS BIGINT) * 1000000
"""


QUERIES.update({"interval_join": (q_interval_join, _interval_join_sql())})


def q_turn_tool_join_native(spark, sf_dir):
    """J3's NATIVE expression: the built-in (stream-)stream event-time
    join with key equality + bounded time range — state O(window), not
    O(stream). Batch mode of the same logical plan (rows-only: the
    fixture is engine-generated; the streaming variant is pytest-proved
    equal to this batch result in test_stream_stream_native.py)."""
    from aktuell_spark.fixtures import gen_tool_events, gen_transcripts
    from aktuell_spark.streaming.native_join import join_turns_tools_native

    t = gen_transcripts(spark, n_convs=40, avg_turns=10, hot_turns=60, seed=42)
    te = gen_tool_events(t, seed=42)
    return join_turns_tools_native(t, te)


QUERIES.update({"turn_tool_join_native": (q_turn_tool_join_native, None)})


def q_funnel_rate(spark, sf_dir):
    """Funnel conversion rate (the dashboard number the per-match CEP
    output feeds): distinct users completing view→click→purchase within
    48 h over distinct active users. Composes detect_sequence with two
    1-row aggregates — the CEP output is reused, not recomputed
    per-metric."""
    from aktuell_spark.operators.cep import detect_sequence

    ev = load(spark, sf_dir, "events")
    matches = detect_sequence(
        ev,
        steps=["event_type = 'view'", "event_type = 'click'",
               "event_type = 'purchase'"],
        key_col="user_id", order_col="event_id", ts_col="ts",
        within_seconds=172_800,
    )
    totals = ev.agg(
        F.countDistinct("user_id").alias("n_users"),
    )
    conv = matches.agg(
        F.countDistinct("user_id").alias("n_converted"),
        F.count(F.lit(1)).alias("n_matches"),
    )
    return totals.crossJoin(conv).select(
        "n_users", "n_converted", "n_matches",
        F.round(F.col("n_converted") / F.col("n_users"), 4).alias("conversion_rate"),
    )


SQL_FUNNEL_RATE = f"""
WITH m AS ({SQL_CEP_FUNNEL}),
t AS (SELECT count(DISTINCT user_id) AS n_users FROM events),
c AS (SELECT count(DISTINCT user_id) AS n_converted, count(*) AS n_matches FROM m)
SELECT t.n_users, c.n_converted, c.n_matches,
       round(c.n_converted * 1.0 / t.n_users, 4) AS conversion_rate
FROM t CROSS JOIN c
"""


QUERIES.update({"funnel_rate": (q_funnel_rate, SQL_FUNNEL_RATE)})


def q_top_paths(spark, sf_dir):
    """Path analysis: the 20 most frequent 3-step event-type paths
    (per-user order by event_id) — the navigation-flow rollup product
    analytics runs on clickstreams. One keyed window (both leads share
    it) + one map-side-combinable count; top-k via a single global
    TakeOrdered, deterministic tie-break on the path string."""
    ev = load(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("event_id")
    paths = (
        ev.select(
            "user_id", "event_id", "event_type",
            F.lead("event_type", 1).over(w).alias("e1"),
            F.lead("event_type", 2).over(w).alias("e2"),
        )
        .filter(F.col("e1").isNotNull() & F.col("e2").isNotNull())
        .select(
            F.concat_ws(">", "event_type", "e1", "e2").alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("path").asc())
        .limit(20)
    )


SQL_TOP_PATHS = """
WITH o AS (
  SELECT user_id, event_type,
         lead(event_type, 1) OVER w AS e1,
         lead(event_type, 2) OVER w AS e2
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
)
SELECT event_type || '>' || e1 || '>' || e2 AS path, count(*) AS n
FROM o WHERE e1 IS NOT NULL AND e2 IS NOT NULL
GROUP BY 1 ORDER BY n DESC, path ASC LIMIT 20
"""


def q_cohort_retention(spark, sf_dir):
    """Weekly cohort retention: users grouped by their first active
    week; for each (cohort, weeks-since) cell, how many distinct users
    were active. Two shuffles (first-week per user, then the cell
    count) — the standard retention matrix, engine-deterministic
    because week indexes are integer epoch-day arithmetic (no timezone
    or date-bin library divergence)."""
    ev = load(spark, sf_dir, "events")
    day = F.floor(F.unix_micros(F.to_utc_timestamp(F.col("ts"), "UTC"))
                  / (86_400 * 1_000_000))
    e = ev.select("user_id", F.floor(day / 7).alias("week"))
    first = e.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        e.join(first, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("weeks_since"),
        )
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


SQL_COHORT_RETENTION = """
WITH e AS (
  SELECT user_id,
         (CAST(epoch_us(ts) AS BIGINT) // 86400000000) // 7 AS week
  FROM events
),
first AS (SELECT user_id, min(week) AS cohort_week FROM e GROUP BY user_id)
SELECT cohort_week, week - cohort_week AS weeks_since,
       count(DISTINCT e.user_id) AS n_active
FROM e JOIN first USING (user_id)
GROUP BY 1, 2
"""


QUERIES.update(
    {
        "top_paths": (q_top_paths, SQL_TOP_PATHS),
        "cohort_retention": (q_cohort_retention, SQL_COHORT_RETENTION),
    }
)


CURATE_MIN_QUALITY = 0.45


def q_curate_corpus(spark, sf_dir):
    """The curation pipeline END-TO-END: one query composing the
    corpus-hygiene family — quality floor, Gopher repetition flags,
    near-dup keep-first survivors, benchmark decontamination — into the
    final training-corpus manifest. Every stage is the SAME operator
    the standalone graded queries run; this proves they compose.
    Scale shape: three narrow scoring maps + the two already-bounded
    join pipelines (components, gram-hash overlap), stitched by
    semi/anti joins on doc_id — no new shuffle classes."""
    from aktuell_spark.functions.dedupe import (
        contamination_overlap,
        ngram_jaccard_pairs,
    )
    from aktuell_spark.functions.textops import (
        with_quality_score,
        with_repetition_stats,
    )
    from aktuell_spark.operators.components import dedup_clusters

    docs = load(spark, sf_dir, "documents")
    quality = with_quality_score(docs).select(
        "doc_id", "n_tokens", "quality_score"
    )
    rep = with_repetition_stats(docs).select("doc_id", "flag_repetitive")
    pairs = ngram_jaccard_pairs(docs, threshold=0.2, max_df=NEAR_DUP_MAX_DF)
    dupes = dedup_clusters(pairs).filter(
        F.col("doc_id") != F.col("cluster_id")
    ).select("doc_id")
    contaminated = contamination_overlap(
        docs, F.col("doc_id") % 17 == 0, n=DECONTAM_N
    ).select("doc_id")
    return (
        docs.select("doc_id", "lang", "source")
        .join(quality, "doc_id")
        .join(rep, "doc_id")
        .filter(
            (F.col("quality_score") >= CURATE_MIN_QUALITY)
            & ~F.col("flag_repetitive")
        )
        .join(dupes, "doc_id", "left_anti")
        .join(contaminated, "doc_id", "left_anti")
        .select("doc_id", "lang", "source", "n_tokens", "quality_score")
    )


def _curate_corpus_sql() -> str:
    return f"""
SELECT d.doc_id, d.lang, d.source, q.n_tokens, q.quality_score
FROM documents d
JOIN ({SQL_QUALITY_SCORE}) q ON d.doc_id = q.doc_id
JOIN ({_gopher_repetition_sql()}) g ON d.doc_id = g.doc_id
WHERE q.quality_score >= {CURATE_MIN_QUALITY}
  AND NOT g.flag_repetitive
  AND d.doc_id IN (SELECT doc_id FROM ({_dedup_corpus_sql()}) s)
  AND d.doc_id NOT IN (SELECT doc_id FROM ({_decontaminate_sql()}) c)
"""


QUERIES.update({"curate_corpus": (q_curate_corpus, _curate_corpus_sql())})


# ----------------------------------------------------------------------
# Round-5: merged family queries + registry windowing.
#
# The driver's correctness gate grades the FIRST 50 entries of
# ``__spark_entry__.queries()`` in insertion order. Round 4 grew the
# registry to 72, pushing every round-4 operator out of the graded
# window (VERDICT r4 #1). Fix: (a) the previously-ungraded queries move
# to the HEAD of the registry, and (b) near-duplicate per-operator
# queries fold into merged family queries (union/join of the SAME
# underlying operators and the SAME oracle SQL blocks), so the whole
# registry fits in 50 entries WITHOUT losing value-verification for any
# operator. The individual queries stay importable (and benchable) in
# ``EXTRA_QUERIES``.
# ----------------------------------------------------------------------

def q_windows_rollup(spark, sf_dir):
    """Window family in ONE graded query: tumbling 1h (W3/A4), sliding
    1h/15m (A4), and the 60s/10s events-per-second rate (W2), unioned
    under a ``kind`` tag. Each leg is the SAME operator as its former
    standalone query; the oracle unions the same three SQL blocks."""
    nul_s = F.lit(None).cast("string")
    nul_d = F.lit(None).cast("double")
    t = q_tumbling_window(spark, sf_dir).select(
        F.lit("tumbling").alias("kind"), "event_type", "window_start",
        "n", nul_d.alias("rate_per_sec"),
    )
    s = q_sliding_window(spark, sf_dir).select(
        F.lit("sliding").alias("kind"), "event_type", "window_start",
        "n", nul_d.alias("rate_per_sec"),
    )
    r = q_rate_per_second(spark, sf_dir).select(
        F.lit("rate").alias("kind"), nul_s.alias("event_type"),
        "window_start", "n", "rate_per_sec",
    )
    return t.unionByName(s).unionByName(r)


SQL_WINDOWS_ROLLUP = f"""
SELECT 'tumbling' AS kind, event_type, window_start, n,
       CAST(NULL AS DOUBLE) AS rate_per_sec
FROM ({SQL_TUMBLING_WINDOW})
UNION ALL
SELECT 'sliding' AS kind, event_type, window_start, n,
       CAST(NULL AS DOUBLE) AS rate_per_sec
FROM ({SQL_SLIDING_WINDOW})
UNION ALL
SELECT 'rate' AS kind, CAST(NULL AS VARCHAR) AS event_type,
       window_start, n, rate_per_sec
FROM ({SQL_RATE_PER_SECOND})
"""


def q_textops_profile(spark, sf_dir):
    """Scalar text-function family in ONE graded query: whitespace +
    BPE-ish token stats, quality score, language ID (all narrow
    zero-shuffle maps over the same scan) joined with the PII scrub leg
    (which runs on the PII-injected copy, exactly as its former
    standalone query did)."""
    from aktuell_spark.functions.textops import (
        with_bpe_token_stats,
        with_lang_id,
        with_quality_score,
        with_token_stats,
    )

    docs = load(spark, sf_dir, "documents")
    prof = with_lang_id(
        with_quality_score(with_bpe_token_stats(with_token_stats(docs)))
    ).select(
        "doc_id", "n_tokens", "n_distinct_tokens", "avg_token_len",
        "n_bpe_tokens", "n_distinct_bpe", "punct_ratio",
        "stopword_ratio", "distinct_ratio", "quality_score",
        "pred_lang", "lang_score",
    )
    pii = q_pii_scrub(spark, sf_dir)
    return prof.join(pii, "doc_id")


def _textops_profile_sql() -> str:
    return f"""
SELECT t.doc_id, t.n_tokens, t.n_distinct_tokens, t.avg_token_len,
       b.n_bpe_tokens, b.n_distinct_bpe, b.punct_ratio,
       q.stopword_ratio, q.distinct_ratio, q.quality_score,
       l.pred_lang, l.lang_score, p.had_pii, p.text_scrubbed
FROM ({SQL_TOKEN_STATS}) t
JOIN ({_token_stats_bpe_sql()}) b USING (doc_id)
JOIN ({SQL_QUALITY_SCORE}) q USING (doc_id)
JOIN ({SQL_LANG_ID}) l USING (doc_id)
JOIN ({SQL_PII_SCRUB}) p USING (doc_id)
"""


def q_dedup_pairs_all(spark, sf_dir):
    """Dedup family in ONE graded query, normalized to a generic
    (method, id_a, id_b, val_num, val_str) shape: exact fingerprint
    groups, 3-gram Jaccard pairs, MinHash signatures, MinHash-LSH
    verified pairs, SimHash values, and embedding-cosine near-dup pairs
    — each leg the SAME operator + oracle SQL as its former standalone
    query. 64-bit values (simhash) travel as strings: a DOUBLE would
    silently lose bits past 2^53."""
    nul_s = F.lit(None).cast("string")
    nul_d = F.lit(None).cast("double")

    def leg(df, method, id_a, id_b, val_num, val_str):
        return df.select(
            F.lit(method).alias("method"),
            id_a.cast("string").alias("id_a"),
            (id_b.cast("string") if id_b is not None else nul_s).alias("id_b"),
            (val_num.cast("double") if val_num is not None else nul_d).alias("val_num"),
            (val_str if val_str is not None else nul_s).alias("val_str"),
        )

    c = F.col
    legs = [
        leg(q_exact_dedup(spark, sf_dir), "exact",
            c("fingerprint"), c("canonical_id"), c("n_copies"), None),
        leg(q_near_dup_jaccard(spark, sf_dir), "jaccard",
            c("doc_a"), c("doc_b"), c("jaccard"), None),
        leg(q_minhash_signatures(spark, sf_dir), "minhash_sig",
            c("doc_id"), None, None, c("sig_str")),
        leg(q_minhash_lsh_pairs(spark, sf_dir), "minhash_lsh",
            c("doc_a"), c("doc_b"), c("jaccard"), None),
        leg(q_simhash(spark, sf_dir), "simhash",
            c("doc_id"), None, None, c("simhash").cast("string")),
        leg(q_embedding_near_dup(spark, sf_dir), "embedding",
            c("vec_a"), c("vec_b"), c("sim"), None),
    ]
    out = legs[0]
    for other in legs[1:]:
        out = out.unionByName(other)
    return out


def _dedup_pairs_all_sql() -> str:
    def leg(sql, method, id_a, id_b, val_num, val_str):
        return f"""
SELECT '{method}' AS method,
       CAST({id_a} AS VARCHAR) AS id_a,
       {f'CAST({id_b} AS VARCHAR)' if id_b else 'CAST(NULL AS VARCHAR)'} AS id_b,
       {f'CAST({val_num} AS DOUBLE)' if val_num else 'CAST(NULL AS DOUBLE)'} AS val_num,
       {val_str if val_str else 'CAST(NULL AS VARCHAR)'} AS val_str
FROM ({sql})"""

    return "\nUNION ALL".join([
        leg(SQL_EXACT_DEDUP, "exact", "fingerprint", "canonical_id", "n_copies", None),
        leg(SQL_NEAR_DUP_JACCARD, "jaccard", "doc_a", "doc_b", "jaccard", None),
        leg(_minhash_sql(), "minhash_sig", "doc_id", None, None, "sig_str"),
        leg(_minhash_lsh_sql(), "minhash_lsh", "doc_a", "doc_b", "jaccard", None),
        leg(SQL_SIMHASH, "simhash", "doc_id", None, None, "CAST(simhash AS VARCHAR)"),
        leg(SQL_EMBEDDING_NEAR_DUP, "embedding", "vec_a", "vec_b", "sim", None),
    ])


def q_knn_methods(spark, sf_dir):
    """ANN family in ONE graded query: brute-force cosine (the
    correctness baseline), sign-plane LSH, multi-probe LSH, IVF over
    fixed centroids, and IVF over in-engine-trained k-means centroids —
    all five emit (query_id, neighbor_id, rank, sim) and union under a
    ``method`` tag. Same operators + oracle SQL as the former
    standalone queries."""
    legs = [
        ("bruteforce", q_knn_bruteforce),
        ("lsh", q_knn_lsh),
        ("multiprobe", q_knn_multiprobe),
        ("ivf", q_knn_ivf),
        ("ivf_trained", q_knn_ivf_trained),
    ]
    out = None
    for method, fn in legs:
        df = fn(spark, sf_dir).select(
            F.lit(method).alias("method"),
            "query_id", "neighbor_id", "rank", "sim",
        )
        out = df if out is None else out.unionByName(df)
    return out


def _knn_methods_sql() -> str:
    legs = [
        ("bruteforce", SQL_KNN_BRUTEFORCE),
        ("lsh", SQL_KNN_LSH),
        ("multiprobe", _knn_multiprobe_sql()),
        ("ivf", _knn_ivf_sql()),
        ("ivf_trained", _knn_ivf_trained_sql()),
    ]
    return "\nUNION ALL".join(
        f"\nSELECT '{m}' AS method, query_id, neighbor_id, rank, sim FROM ({sql})"
        for m, sql in legs
    )


# -- oracle upgrades (VERDICT r4 "What's wrong" #3) --------------------

HLL_TOLERANCE = 0.05  # 2.5 sigma at rsd=0.02 — generous, deterministic


def q_hll_distinct_checked(spark, sf_dir):
    """HyperLogLog distinct, now ORACLE-CHECKABLE: emits the exact
    distinct count (which DuckDB recomputes) plus a boolean asserting
    the HLL estimate landed within HLL_TOLERANCE of it (which the
    oracle pins to TRUE — a sketch blowing its error bound turns the
    row red instead of hiding behind rows-only)."""
    ev = load(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users_exact"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("_approx"),
    )
    within = (
        F.abs(F.col("_approx") - F.col("n_users_exact"))
        <= F.lit(HLL_TOLERANCE) * F.col("n_users_exact")
    )
    return agg.select(
        "event_type", "n_users_exact", within.alias("approx_within_tol")
    )


SQL_HLL_DISTINCT_CHECKED = """
SELECT event_type, count(DISTINCT user_id) AS n_users_exact,
       TRUE AS approx_within_tol
FROM events GROUP BY event_type
"""


MEDIA_META_N = 256


def q_media_meta_checked(spark, sf_dir):
    """REAL multimodal codec path, now ORACLE-CHECKABLE: the synthesized
    PNG/WAV fixtures are closed-form in media_id (dims/rates/sample
    counts are arithmetic on the id; every 8th payload is corrupt), so
    DuckDB reproduces the full expected decode table from ``range(n)``
    — the Spark side must round-trip synthesize → encode → Arrow-batched
    header decode to the same rows. ``n_bytes`` is excluded (zlib
    stream length is not SQL-expressible); everything else is graded."""
    from aktuell_spark.functions.multimodal import (
        extract_media_meta,
        synthesize_real_media,
    )
    from aktuell_spark.session import _ship_package

    _ship_package(spark)
    media = synthesize_real_media(spark, n=MEDIA_META_N, seed=42)
    return extract_media_meta(media).select(
        "media_id", "mime", "valid", "width", "height",
        "channels", "bit_depth", "sample_rate", "n_samples",
    )


def _media_meta_checked_sql() -> str:
    # mirrors synthesize_real_media: i%8==7 -> corrupt PNG; even -> PNG
    # (w=4+i%13, h=3+i%7, 8-bit RGB); odd -> WAV (1+i%2 ch,
    # 8000*(1+i%3) Hz, 16-bit, 50+i%40 samples)
    return f"""
SELECT i AS media_id,
  CASE WHEN i % 2 = 0 OR i % 8 = 7 THEN 'image/png' ELSE 'audio/wav' END AS mime,
  (i % 8 <> 7) AS valid,
  CAST(CASE WHEN i % 8 <> 7 AND i % 2 = 0 THEN 4 + i % 13 END AS INTEGER) AS width,
  CAST(CASE WHEN i % 8 <> 7 AND i % 2 = 0 THEN 3 + i % 7 END AS INTEGER) AS height,
  CAST(CASE WHEN i % 8 = 7 THEN NULL
            WHEN i % 2 = 0 THEN 3 ELSE 1 + i % 2 END AS INTEGER) AS channels,
  CAST(CASE WHEN i % 8 = 7 THEN NULL
            WHEN i % 2 = 0 THEN 8 ELSE 16 END AS INTEGER) AS bit_depth,
  CAST(CASE WHEN i % 8 <> 7 AND i % 2 = 1 THEN 8000 * (1 + i % 3) END AS INTEGER) AS sample_rate,
  CAST(CASE WHEN i % 8 <> 7 AND i % 2 = 1 THEN 50 + i % 40 END AS INTEGER) AS n_samples
FROM range({MEDIA_META_N}) t(i)
"""


# ----------------------------------------------------------------------
# Merged-family + oracle-upgrade registrations. The final window
# selection (head/tail rotation) happens at the BOTTOM of this module,
# after every query is defined — see "Final registry" there.
# ----------------------------------------------------------------------

QUERIES.update(
    {
        "windows_rollup": (q_windows_rollup, SQL_WINDOWS_ROLLUP),
        "textops_profile": (q_textops_profile, _textops_profile_sql()),
        "dedup_pairs_all": (q_dedup_pairs_all, _dedup_pairs_all_sql()),
        "knn_methods": (q_knn_methods, _knn_methods_sql()),
    }
)
# oracle upgrades replace the rows-only variants under the same name
QUERIES["hll_distinct"] = (q_hll_distinct_checked, SQL_HLL_DISTINCT_CHECKED)
QUERIES["media_meta"] = (q_media_meta_checked, _media_meta_checked_sql())

DRIVER_WINDOW = 50

EXTRA_QUERIES: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {}


def q_media_content(spark, sf_dir):
    """DEEP media decode (beyond headers): inflate the first PNG
    scanline + read the first WAV PCM samples, emitting exact-integer
    stats. The fixture blobs are closed-form in media_id, so the DuckDB
    oracle recomputes the expected pixel/sample stats from arithmetic —
    a mismatch anywhere in synthesize → zlib/PCM encode → Arrow-batched
    decode turns the row red. Lives in EXTRA_QUERIES (the graded window
    is full); verified by tools/check_oracle.py --extra and pytest."""
    from aktuell_spark.functions.multimodal import (
        extract_media_content,
        synthesize_real_media,
    )
    from aktuell_spark.session import _ship_package

    _ship_package(spark)
    media = synthesize_real_media(spark, n=MEDIA_META_N, seed=42)
    return extract_media_content(media)


def _media_content_sql() -> str:
    from aktuell_spark.functions.multimodal import PCM_STAT_SAMPLES

    # mirrors synthesize_real_media + png_bytes/wav_bytes closed forms:
    # PNG row 0 byte x = (x*31 + seed+i) % 256 over 3*width bytes;
    # WAV sample j = ((j*997 + seed+i) % 65536) - 32768, seed = 42
    return f"""
WITH m AS (SELECT unnest(range({MEDIA_META_N})) AS i),
png AS (
  SELECT i, CAST(sum((x * 31 + 42 + i) % 256) AS BIGINT) AS px_sum,
         CAST(count(*) AS INTEGER) AS n_px
  FROM (SELECT i, unnest(range(3 * (4 + i % 13))) AS x
        FROM m WHERE i % 2 = 0 AND i % 8 <> 7)
  GROUP BY i
),
wav AS (
  SELECT i, CAST(max(abs(v)) AS INTEGER) AS pcm_peak,
         CAST(sum(v * v) AS BIGINT) AS pcm_sumsq,
         CAST(count(*) AS INTEGER) AS n_pcm
  FROM (
    SELECT i, ((j * 997 + 42 + i) % 65536) - 32768 AS v
    FROM (SELECT i, unnest(range(least({PCM_STAT_SAMPLES},
                   (50 + i % 40) * (1 + i % 2)))) AS j
          FROM m WHERE i % 2 = 1 AND i % 8 <> 7)
  )
  GROUP BY i
)
SELECT m.i AS media_id,
  CASE WHEN m.i % 2 = 0 OR m.i % 8 = 7 THEN 'image/png' ELSE 'audio/wav' END AS mime,
  (m.i % 8 <> 7) AS valid_deep,
  png.px_sum, png.n_px, wav.pcm_peak, wav.pcm_sumsq, wav.n_pcm
FROM m LEFT JOIN png ON m.i = png.i LEFT JOIN wav ON m.i = wav.i
"""


EXTRA_QUERIES["media_content"] = (q_media_content, _media_content_sql())


def q_stream_curate(spark, sf_dir):
    """Streaming corpus curation, value-verified cross-engine: the
    documents table is replayed AS A STREAM (file source, availableNow)
    through the in-stream scoring + exactly-once fingerprint-keyed
    dedup sink (streaming/curation.py), and the MATERIALIZED table is
    compared against a pure-SQL DuckDB oracle — quality floor +
    Gopher repetition gate + min-doc_id-per-fingerprint keep-first.
    The oracle covers the whole streaming path: a defect anywhere in
    trigger slicing, the foreachBatch merge, or the keep-first order
    trick (order_col = -doc_id) turns the row red. The three
    stream_cdc_* graded queries stay rows-only by design; this one
    shows a streaming materialization CAN be oracle-graded when its
    semantics are SQL-expressible."""
    import os
    import tempfile

    from aktuell_spark.streaming.curation import run_curation_stream

    base = tempfile.mkdtemp(prefix="aktuell_stream_curate_")
    # FileStreamSource requires a DIRECTORY feed (its basePath must be
    # a dir); the sf tables are single parquet files, so stage the file
    # into a feed dir — zero-copy, exactly how a real shard feed lands
    feed = os.path.join(base, "feed")
    os.makedirs(feed)
    os.symlink(
        os.path.join(sf_dir, "documents.parquet"),
        os.path.join(feed, "documents.parquet"),
    )
    _, table = run_curation_stream(
        spark,
        feed,
        os.path.join(base, "table"),
        os.path.join(base, "ckpt"),
        min_quality=CURATE_MIN_QUALITY,
        n_buckets=8,
        await_termination=True,
    )
    return table.read().select(
        "fingerprint", "doc_id", "lang", "source", "n_tokens",
        "quality_score",
    )


def _stream_curate_sql() -> str:
    return f"""
WITH q AS ({SQL_QUALITY_SCORE}),
     g AS ({_gopher_repetition_sql()}),
     kept AS (
       SELECT substr(md5(regexp_replace(lower(trim(d.text)), '\\s+', ' ', 'g')), 1, 16)
                AS fingerprint,
              d.doc_id, d.lang, d.source,
              CAST(q.n_tokens AS INTEGER) AS n_tokens, q.quality_score
       FROM documents d
       JOIN q ON d.doc_id = q.doc_id
       JOIN g ON d.doc_id = g.doc_id
       WHERE q.quality_score >= {CURATE_MIN_QUALITY} AND NOT g.flag_repetitive
     )
SELECT fingerprint, doc_id, lang, source, n_tokens, quality_score
FROM kept
QUALIFY row_number() OVER (PARTITION BY fingerprint ORDER BY doc_id) = 1
"""


EXTRA_QUERIES["stream_curate"] = (q_stream_curate, _stream_curate_sql())


def q_doc_clusters(spark, sf_dir):
    """Corpus clustering (the topic-bucketing stage of a training-data
    pipeline): spherical k-means centroids trained on the first
    IVF_TRAIN_SAMPLE vectors (the sample-bounded 100 TB shape —
    training state is k×dim on the driver, never the corpus), then ONE
    narrow Arrow-batched assignment pass over the full corpus and a
    single map-side-combinable groupBy for per-cluster stats. Reuses
    the trained-IVF machinery end-to-end (train_ivf_centroids +
    ivf_assign with the cross-engine-reproducible config), so the
    DuckDB oracle re-derives the SAME centroids with the unrolled
    Lloyd-pass SQL and re-aggregates. avg_sim quantizes per-row to 6
    decimals before the mean and the mean to 3, so float sum-order
    differences between engines cannot flip the hash."""
    from aktuell_spark.functions.similarity import (
        cosine6,
        ivf_assign,
        train_ivf_centroids,
    )

    emb = load(spark, sf_dir, "embeddings")
    cents = train_ivf_centroids(
        emb.filter(F.col("vec_id") < IVF_TRAIN_SAMPLE),
        k=IVF_TRAIN_K, n_iter=IVF_TRAIN_ITER, init="first", quantize=6,
    )
    cent_df = spark.createDataFrame(
        [(int(cid), [float(x) for x in vec]) for cid, vec in cents],
        "cell int, cvec array<double>",
    )
    assigned = ivf_assign(emb, cents, nprobe=1).join(
        F.broadcast(cent_df), "cell"
    )
    sims = assigned.withColumn(
        "sim", cosine6(F.col("embedding").cast("array<double>"), F.col("cvec"))
    )
    return sims.groupBy("cell").agg(
        F.count("*").alias("n_members"),
        F.min("vec_id").alias("min_vec_id"),
        F.round(F.avg("sim"), 3).alias("avg_sim"),
    )


def _doc_clusters_sql() -> str:
    assert IVF_TRAIN_ITER == 2
    return f"""
WITH train_sample AS (
  SELECT vec_id, embedding FROM embeddings WHERE vec_id < {IVF_TRAIN_SAMPLE}
),
c0 AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, embedding::DOUBLE[] AS cvec
  FROM (SELECT vec_id, embedding FROM train_sample ORDER BY vec_id LIMIT {IVF_TRAIN_K})
),{_ivf_lloyd_pass_sql('c0', 'c1')},{_ivf_lloyd_pass_sql('c1', 'c2')},
assigned AS (
  SELECT vec_id, cid,
         round(list_cosine_similarity(embedding::DOUBLE[], cvec), 6) AS sim,
         row_number() OVER (PARTITION BY vec_id
             ORDER BY round(list_cosine_similarity(embedding::DOUBLE[], cvec), 6) DESC,
                      cid ASC) AS crank
  FROM embeddings CROSS JOIN c2
)
SELECT CAST(cid AS INTEGER) AS cell, count(*) AS n_members,
       min(vec_id) AS min_vec_id, round(avg(sim), 3) AS avg_sim
FROM assigned WHERE crank = 1 GROUP BY cid
"""


EXTRA_QUERIES["doc_clusters"] = (q_doc_clusters, _doc_clusters_sql())


EXPORT_SALT_SPAN = 1024


def q_conversation_export(spark, sf_dir):
    """Conversation export — the training-example serialization shape:
    one row per conversation with its FULL ordered event log packed
    into a single string (the batch form of the streaming engine's O4
    stable-per-turn-ordering guarantee, and the per-row invariant
    BASELINE.json pins: per-turn text equality under stable turn
    ordering). Scale shape: ONE shuffle (groupBy conv) with map-side
    partial collect_list, then partition-local array_sort + transform —
    the per-conversation sort never becomes a global sort, so 10^12
    turns cost O(turns) + one keyed exchange. array_sort on
    struct(event_id, ...) orders by the unique event_id, so the packed
    string is deterministic and the DuckDB oracle (string_agg ORDER BY
    event_id) reproduces it byte-for-byte. Round 6: runs the salted
    two-phase path (functions/sft.py:export_conversations) so one
    pathologically hot conversation spreads its render across
    n_turns/EXPORT_SALT_SPAN tasks — byte-identical output, pinned by
    tests/test_salted_export.py."""
    from aktuell_spark.functions.sft import export_conversations

    ev = load(spark, sf_dir, "events")
    seg = F.concat_ws("@", F.col("event_type"), F.col("event_id").cast("string"))
    packed = export_conversations(
        ev, seg, conv_col="user_id", order_col="event_id", sep="|",
        salt_span=EXPORT_SALT_SPAN,
    )
    return packed.select(
        F.col("user_id").alias("conv_id"), "n_events",
        F.col("first_o").alias("first_event_id"),
        F.col("last_o").alias("last_event_id"),
        F.col("log").alias("event_log"),
    )


SQL_CONVERSATION_EXPORT = """
SELECT user_id AS conv_id,
       count(*) AS n_events,
       min(event_id) AS first_event_id,
       max(event_id) AS last_event_id,
       string_agg(event_type || '@' || event_id, '|' ORDER BY event_id)
         AS event_log
FROM events GROUP BY user_id
"""


EXTRA_QUERIES["conversation_export"] = (
    q_conversation_export, SQL_CONVERSATION_EXPORT,
)


N_EXPORT_SHARDS = 8


def q_export_shards(spark, sf_dir):
    """Training-shard manifest — the delivery stage: conversations
    (from conversation_export) assigned to N_EXPORT_SHARDS shards by
    the engine-portable md5 shard function (operators/sharding.py),
    then ONE map-side-combinable groupBy for the per-shard manifest a
    dataloader verifies against. content_hash folds the md5 prefix of
    each packed event_log into a per-shard sum, so any dropped,
    duplicated, or reordered-within-conversation event flips it —
    cross-engine reproducible because both engines agree on md5 bytes
    and the packed string is deterministic (array_sort on unique
    event_id). Scale shape: one narrow hash per row + the single keyed
    exchange conversation_export already pays; the manifest is
    n_shards rows."""
    from aktuell_spark.operators.sharding import shard_id

    conv = q_conversation_export(spark, sf_dir)
    content_h = F.conv(
        F.substring(F.md5(F.col("event_log")), 1, 8), 16, 10
    ).cast("long")
    return (
        conv.withColumn("shard", shard_id(F.col("conv_id"), N_EXPORT_SHARDS))
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_convs"),
            F.sum("n_events").alias("n_events"),
            F.sum(F.length("event_log")).alias("total_chars"),
            F.sum(content_h).alias("content_hash"),
        )
    )


SQL_EXPORT_SHARDS = f"""
WITH conv AS (
  SELECT user_id AS conv_id,
         count(*) AS n_events,
         string_agg(event_type || '@' || event_id, '|' ORDER BY event_id)
           AS event_log
  FROM events GROUP BY user_id
)
SELECT CAST(('0x' || substr(md5(conv_id::VARCHAR), 1, 8))::UBIGINT
            % {N_EXPORT_SHARDS} AS INTEGER) AS shard,
       count(*) AS n_convs,
       CAST(sum(n_events) AS BIGINT) AS n_events,
       CAST(sum(length(event_log)) AS BIGINT) AS total_chars,
       CAST(sum(('0x' || substr(md5(event_log), 1, 8))::UBIGINT) AS BIGINT)
         AS content_hash
FROM conv GROUP BY 1
"""


EXTRA_QUERIES["export_shards"] = (q_export_shards, SQL_EXPORT_SHARDS)


def q_sft_spans(spark, sf_dir):
    """SFT loss-mask spans over the transcript table: each conversation
    rendered as `<|role|>text\\n` turns in stable order, emitting the
    [start, end) character range of every loss-active ("click") turn.
    One keyed shuffle; window arithmetic is partition-local; the span
    table is exact integers so the mask itself is value-verified, not
    just the rendered text (functions/sft.py)."""
    from aktuell_spark.functions.sft import sft_spans

    ev = load(spark, sf_dir, "events")
    return sft_spans(
        ev, conv_col="user_id", order_col="event_id",
        role_col="event_type", text_col="props", loss_role="click",
    ).withColumnRenamed("user_id", "conv_id")


SQL_SFT_SPANS = """
WITH seg AS (
  SELECT user_id AS conv_id, event_id, event_type,
         length('<|' || event_type || '|>' || coalesce(props, '')
                || chr(10)) AS seg_chars
  FROM events
), off AS (
  SELECT conv_id, event_id, event_type, seg_chars,
         sum(seg_chars) OVER (PARTITION BY conv_id ORDER BY event_id)
           - seg_chars AS start_char,
         sum(seg_chars) OVER (PARTITION BY conv_id) AS total_chars
  FROM seg
)
SELECT conv_id,
       CAST(row_number() OVER (PARTITION BY conv_id ORDER BY event_id)
            AS BIGINT) AS span_idx,
       CAST(start_char AS BIGINT) AS start_char,
       CAST(start_char + seg_chars AS BIGINT) AS end_char,
       CAST(seg_chars AS BIGINT) AS seg_chars,
       CAST(total_chars AS BIGINT) AS total_chars
FROM off WHERE event_type = 'click'
"""


EXTRA_QUERIES["sft_spans"] = (q_sft_spans, SQL_SFT_SPANS)


# 90/10 split by md5 of the CLUSTER canonical — near-dup cluster members
# can never straddle train/val. naive_leaked_docs counts the docs a
# doc-level hash split WOULD have leaked across the boundary.
SPLIT_MOD, SPLIT_TRAIN = 10, 9


def q_leakage_split(spark, sf_dir):
    """Leakage-safe train/val split: hash the near-dup CLUSTER id
    (connected-components canonical; singletons are their own cluster)
    so every near-duplicate lands on the same side of the split.
    Composes the already-bounded pair + CC pipelines with one extra
    left join (cluster table is a fraction of the corpus — AQE
    broadcasts it) and one map-side-combinable groupBy."""
    from aktuell_spark.functions.dedupe import ngram_jaccard_pairs
    from aktuell_spark.operators.components import dedup_clusters
    from aktuell_spark.operators.sharding import shard_id

    docs = load(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, threshold=0.2, max_df=NEAR_DUP_MAX_DF)
    comp = dedup_clusters(pairs).select("doc_id", "cluster_id")
    full = docs.join(comp, "doc_id", "left").withColumn(
        "cluster_id", F.coalesce("cluster_id", "doc_id")
    )
    csplit = F.when(
        shard_id(F.col("cluster_id"), SPLIT_MOD) < SPLIT_TRAIN, "train"
    ).otherwise("val")
    nsplit = F.when(
        shard_id(F.col("doc_id"), SPLIT_MOD) < SPLIT_TRAIN, "train"
    ).otherwise("val")
    return (
        full.withColumn("split", csplit)
        .withColumn("naive_leaked", (nsplit != csplit).cast("long"))
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("cluster_id").alias("n_clusters"),
            F.sum("n_chars").alias("n_chars"),
            F.sum("naive_leaked").alias("naive_leaked_docs"),
        )
    )


def _leakage_split_sql() -> str:
    return f"""
WITH RECURSIVE pairs AS (
  SELECT doc_a, doc_b FROM ({SQL_NEAR_DUP_JACCARD}) jp
),
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs
),
walk(v, l) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM edges) s
  UNION
  SELECT e.v, w.l FROM walk w JOIN edges e ON e.u = w.v
),
comp AS (SELECT v AS doc_id, min(l) AS cluster_id FROM walk GROUP BY v),
fullc AS (
  SELECT d.doc_id, d.n_chars,
         coalesce(c.cluster_id, d.doc_id) AS cluster_id
  FROM documents d LEFT JOIN comp c USING (doc_id)
),
lab AS (
  SELECT *,
    CASE WHEN ('0x' || substr(md5(CAST(cluster_id AS VARCHAR)), 1, 8))::UBIGINT
              % {SPLIT_MOD} < {SPLIT_TRAIN}
         THEN 'train' ELSE 'val' END AS split,
    CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
              % {SPLIT_MOD} < {SPLIT_TRAIN}
         THEN 'train' ELSE 'val' END AS nsplit
  FROM fullc
)
SELECT split,
       count(*) AS n_docs,
       count(DISTINCT cluster_id) AS n_clusters,
       CAST(sum(n_chars) AS BIGINT) AS n_chars,
       CAST(sum(CASE WHEN nsplit != split THEN 1 ELSE 0 END) AS BIGINT)
         AS naive_leaked_docs
FROM lab GROUP BY split
"""


EXTRA_QUERIES["leakage_split"] = (q_leakage_split, _leakage_split_sql())


PACK_SPAN_TARGET = 2048
PACK_SPAN_SHARDS = 8


def q_packed_sft_spans(spark, sf_dir):
    """SFT mask × sequence packing: every loss span mapped into the
    packed-stream coordinates a dataloader consumes — shard, pack_id,
    absolute [start, end) in the shard's concat stream. Pure window
    arithmetic after conversation/shard-keyed shuffles; all-integer
    output so the packed mask is value-verified cross-engine
    (functions/sft.py packed_sft_spans)."""
    from aktuell_spark.functions.sft import packed_sft_spans

    ev = load(spark, sf_dir, "events")
    return packed_sft_spans(
        ev, target_chars=PACK_SPAN_TARGET, conv_col="user_id",
        order_col="event_id", role_col="event_type", text_col="props",
        loss_role="click", n_shards=PACK_SPAN_SHARDS,
    ).withColumnRenamed("user_id", "conv_id")


def _packed_sft_spans_sql() -> str:
    return f"""
WITH seg AS (
  SELECT user_id AS conv_id, event_id, event_type,
         length('<|' || event_type || '|>' || coalesce(props, '')
                || chr(10)) AS seg_chars
  FROM events
), off AS (
  SELECT conv_id, event_id, event_type, seg_chars,
         sum(seg_chars) OVER (PARTITION BY conv_id ORDER BY event_id)
           - seg_chars AS start_char
  FROM seg
), spans AS (
  SELECT conv_id,
         CAST(row_number() OVER (PARTITION BY conv_id ORDER BY event_id)
              AS BIGINT) AS span_idx,
         start_char, start_char + seg_chars AS end_char
  FROM off WHERE event_type = 'click'
), clen AS (
  SELECT conv_id, sum(seg_chars) AS conv_chars,
         ('0x' || substr(md5(conv_id::VARCHAR), 1, 8))::UBIGINT
           % {PACK_SPAN_SHARDS} AS shard
  FROM seg GROUP BY conv_id
), starts AS (
  SELECT conv_id, shard,
         sum(conv_chars) OVER (PARTITION BY shard ORDER BY conv_id)
           - conv_chars AS conv_start
  FROM clen
)
SELECT s.conv_id, s.span_idx, CAST(st.shard AS BIGINT) AS shard,
       CAST((st.conv_start + s.start_char) // {PACK_SPAN_TARGET}
            AS BIGINT) AS pack_id,
       CAST(st.conv_start + s.start_char AS BIGINT) AS abs_start,
       CAST(st.conv_start + s.end_char AS BIGINT) AS abs_end
FROM spans s JOIN starts st USING (conv_id)
"""


EXTRA_QUERIES["packed_sft_spans"] = (q_packed_sft_spans, _packed_sft_spans_sql())


def q_media_pixels(spark, sf_dir):
    """FULL media decode: every PNG scanline unfiltered across all five
    PNG filter types (fixtures cycle y % 5 — Sub/Up/Average/Paeth all
    exercised) and every WAV PCM sample read. The oracle recomputes
    pixel sums, filter bitmasks, and full-stream PCM stats from the
    fixtures' closed forms — a defect anywhere in filter → deflate →
    inflate → unfilter flips a value."""
    from aktuell_spark.functions.multimodal import (
        extract_media_pixels,
        synthesize_filtered_media,
    )
    from aktuell_spark.session import _ship_package

    _ship_package(spark)
    media = synthesize_filtered_media(spark, n=MEDIA_META_N, seed=42)
    return extract_media_pixels(media)


def _media_pixels_sql() -> str:
    # closed forms: PNG pixel (x,y) = (x*31 + y*17 + 42+i) % 256 over
    # 3*(4+i%13) × (3+i%7); filters y%5 -> mask = (1 << min(h,5)) - 1;
    # WAV: ((j*997 + 42+i) % 65536) - 32768 over ALL
    # (50+i%40)*(1+i%2) samples
    return f"""
WITH m AS (SELECT unnest(range({MEDIA_META_N})) AS i),
png AS (
  SELECT i, CAST(sum((x * 31 + y * 17 + 42 + i) % 256) AS BIGINT) AS px_sum,
         CAST(count(*) AS BIGINT) AS n_px
  FROM (
    SELECT i, y, unnest(range(3 * (4 + i % 13))) AS x
    FROM (SELECT i, unnest(range(3 + i % 7)) AS y
          FROM m WHERE i % 2 = 0 AND i % 8 <> 7)
  )
  GROUP BY i
),
wav AS (
  SELECT i, CAST(max(abs(v)) AS INTEGER) AS pcm_peak,
         CAST(sum(v * v) AS BIGINT) AS pcm_sumsq,
         CAST(count(*) AS INTEGER) AS n_pcm
  FROM (
    SELECT i, ((j * 997 + 42 + i) % 65536) - 32768 AS v
    FROM (SELECT i, unnest(range((50 + i % 40) * (1 + i % 2))) AS j
          FROM m WHERE i % 2 = 1 AND i % 8 <> 7)
  )
  GROUP BY i
)
SELECT m.i AS media_id,
  CASE WHEN m.i % 2 = 0 OR m.i % 8 = 7 THEN 'image/png' ELSE 'audio/wav' END AS mime,
  (m.i % 8 <> 7) AS valid_deep,
  png.px_sum, png.n_px,
  CAST(CASE WHEN m.i % 2 = 0 AND m.i % 8 <> 7 THEN 3 + m.i % 7 END
       AS INTEGER) AS n_rows,
  CAST(CASE WHEN m.i % 2 = 0 AND m.i % 8 <> 7
            THEN (1 << least(3 + m.i % 7, 5)) - 1 END
       AS INTEGER) AS filters_mask,
  wav.pcm_peak, wav.pcm_sumsq, wav.n_pcm
FROM m LEFT JOIN png ON m.i = png.i LEFT JOIN wav ON m.i = wav.i
"""


EXTRA_QUERIES["media_pixels"] = (q_media_pixels, _media_pixels_sql())


def q_preference_pairs(spark, sf_dir):
    """DPO/RLHF preference pairs over the transcript table: per
    conversation, highest-value vs lowest-value "click" turn
    (deterministic id tiebreaks), with the score margin. One keyed
    shuffle; the best/worst legs and their join share the conversation
    partitioning (functions/sft.py preference_pairs)."""
    from aktuell_spark.functions.sft import preference_pairs

    ev = load(spark, sf_dir, "events")
    return preference_pairs(
        ev, conv_col="user_id", id_col="event_id",
        role_col="event_type", score_col="value", loss_role="click",
    ).withColumnRenamed("user_id", "conv_id")


SQL_PREFERENCE_PAIRS = """
WITH cand AS (
  SELECT user_id AS conv_id, event_id, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY value DESC, event_id ASC) AS rb,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY value ASC, event_id ASC) AS rw,
         count(*) OVER (PARTITION BY user_id) AS n
  FROM events WHERE event_type = 'click'
)
SELECT b.conv_id,
       b.event_id AS chosen_id,
       w.event_id AS rejected_id,
       round(b.value, 6) AS chosen_score,
       round(w.value, 6) AS rejected_score,
       round(b.value - w.value, 6) AS margin
FROM (SELECT * FROM cand WHERE rb = 1 AND n >= 2) b
JOIN (SELECT * FROM cand WHERE rw = 1) w USING (conv_id)
WHERE b.value > w.value
"""


EXTRA_QUERIES["preference_pairs"] = (q_preference_pairs, SQL_PREFERENCE_PAIRS)


CURRICULUM_BINS = 4  # quality quartile bins (closed-form thresholds)
CURRICULUM_SHARDS = 8


def q_curriculum_order(spark, sf_dir):
    """Curriculum ordering: within each training shard, docs are
    ordered hardest-last — descending quality bin (floor(score*BINS),
    clamped), md5(doc_id) tiebreak so the order is deterministic and
    engine-reproducible with no global sort. ord is the position a
    sequential dataloader reads; one narrow scoring map + one
    shard-keyed window."""
    from pyspark.sql import Window

    from aktuell_spark.functions.textops import with_quality_score
    from aktuell_spark.operators.sharding import shard_id

    docs = with_quality_score(load(spark, sf_dir, "documents"))
    binned = docs.select(
        "doc_id",
        F.least(
            F.floor(F.col("quality_score") * CURRICULUM_BINS),
            F.lit(CURRICULUM_BINS - 1),
        ).cast("int").alias("bin"),
        shard_id(F.col("doc_id"), CURRICULUM_SHARDS).alias("shard"),
        F.md5(F.col("doc_id").cast("string")).alias("_tie"),
    )
    w = Window.partitionBy("shard").orderBy(F.desc("bin"), F.asc("_tie"))
    return binned.withColumn(
        "ord", F.row_number().over(w).cast("long")
    ).select("doc_id", "shard", "bin", "ord")


def _curriculum_order_sql() -> str:
    return f"""
WITH q AS ({SQL_QUALITY_SCORE}),
b AS (
  SELECT doc_id,
         CAST(least(floor(quality_score * {CURRICULUM_BINS}),
                    {CURRICULUM_BINS - 1}) AS INTEGER) AS bin,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
              % {CURRICULUM_SHARDS} AS INTEGER) AS shard,
         md5(CAST(doc_id AS VARCHAR)) AS tie
  FROM q
)
SELECT doc_id, shard, bin,
       CAST(row_number() OVER (PARTITION BY shard
                               ORDER BY bin DESC, tie ASC) AS BIGINT) AS ord
FROM b
"""


EXTRA_QUERIES["curriculum_order"] = (q_curriculum_order, _curriculum_order_sql())


# target training mixture by TOKEN share (not doc count): weights must
# be literals so the static SQL oracle derives identical thresholds
MIX_BUDGET = 8_000
MIX_WEIGHTS = {"en": 0.2, "zh": 0.1, "es": 0.1, "de": 0.1, "fr": 0.5}


def q_token_budget_mix(spark, sf_dir):
    """Token-budget mixture control: per-language sampling rates derived
    from the DATA (rate = budget x weight / lang_tokens, clamped to 1)
    so the sampled corpus hits a target token mixture, then the
    deterministic md5 stratified sampler applies them. The per-language
    totals are a k-row driver collect (k = #languages — bounded like
    the IVF centroid models); membership stays a pure key-hash
    function, so the identical rows survive on any cluster size or
    engine. Two map-side-combinable aggs + one narrow filter; fr's
    weight intentionally overshoots its corpus so the rate-1.0
    keep-all path is exercised."""
    from aktuell_spark.functions.sampling import stratified_sample

    docs = load(spark, sf_dir, "documents")
    toks = F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long")
    d = docs.select("doc_id", "lang", toks.alias("n_tok"))
    totals = {
        r["lang"]: r["t"]
        for r in d.groupBy("lang").agg(F.sum("n_tok").alias("t")).collect()
    }
    rates = {
        s: min(1.0, (MIX_BUDGET * w) / totals[s])
        for s, w in MIX_WEIGHTS.items()
        if s in totals
    }
    sampled = stratified_sample(
        d, key="doc_id", stratum="lang", rates=rates, default_rate=0.0
    )
    samp = sampled.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs_sampled"),
        F.sum("n_tok").alias("tokens_sampled"),
    )
    rate_col = F.lit(None).cast("double")
    for s, r in sorted(rates.items()):
        rate_col = F.when(F.col("lang") == s, F.lit(r)).otherwise(rate_col)
    return (
        d.groupBy("lang")
        .agg(F.sum("n_tok").alias("lang_tokens"))
        # enumerate exactly the rate-covered (weighted ∩ present)
        # languages — the same set the oracle's totals⋈weights join
        # emits — so a data language outside MIX_WEIGHTS can never
        # diverge the row sets (round-6 ADVICE fix)
        .filter(F.col("lang").isin([*rates] or ["<no-weighted-lang>"]))
        .join(samp, "lang", "left")
        .select(
            "lang",
            "lang_tokens",
            F.round(rate_col, 6).alias("rate"),
            F.coalesce("n_docs_sampled", F.lit(0)).cast("long").alias("n_docs_sampled"),
            F.coalesce("tokens_sampled", F.lit(0)).cast("long").alias("tokens_sampled"),
        )
    )


def _token_budget_mix_sql() -> str:
    vals = ", ".join(f"('{s}', {w})" for s, w in sorted(MIX_WEIGHTS.items()))
    return f"""
WITH w(lang, wgt) AS (VALUES {vals}),
tok AS (
  SELECT doc_id, lang,
         CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tok
  FROM documents
),
tot AS (SELECT lang, CAST(sum(n_tok) AS BIGINT) AS lang_tokens
        FROM tok GROUP BY lang),
thr AS (
  SELECT t.lang, t.lang_tokens,
         least(1.0, ({MIX_BUDGET} * w.wgt) / t.lang_tokens) AS rate,
         CAST(floor(least(1.0, ({MIX_BUDGET} * w.wgt) / t.lang_tokens)
                    * 65536) AS BIGINT) AS t16
  FROM tot t JOIN w ON t.lang = w.lang
),
samp AS (
  SELECT k.lang, k.n_tok
  FROM tok k JOIN thr ON k.lang = thr.lang
  WHERE thr.rate >= 1.0
     OR ('0x' || substr(md5(CAST(k.doc_id AS VARCHAR)), 1, 4))::UBIGINT
        < thr.t16
)
SELECT thr.lang, thr.lang_tokens, round(thr.rate, 6) AS rate,
       CAST(count(s.n_tok) AS BIGINT) AS n_docs_sampled,
       CAST(coalesce(sum(s.n_tok), 0) AS BIGINT) AS tokens_sampled
FROM thr LEFT JOIN samp s ON thr.lang = s.lang
GROUP BY thr.lang, thr.lang_tokens, thr.rate
"""


EXTRA_QUERIES["token_budget_mix"] = (q_token_budget_mix, _token_budget_mix_sql())


def q_changes_cow(spark, sf_dir):
    """Incremental change feed from a COPY-ON-WRITE table with epoch
    retention (streaming/sink.py:_changes_cow — round-6 closure of the
    CoW/MoR changes() parity gap): the events table becomes a two-epoch
    CDC load (split at the seq midpoint, 'error' events are deletes)
    into a cow_retain_epochs table, and changes(0, 1) — the per-key net
    change of epoch 1 computed by diffing the retained epoch-0 state
    against head on (key, seq) — is value-verified against a pure-SQL
    state diff. Tombstones surface with their REAL delete seqs because
    CoW buckets physically keep delete rows until compaction. Scale
    shape: the diff reads only sidecar-recorded touched buckets and
    pays one anti-join keyed on (bucket, key, seq)."""
    import os
    import tempfile

    from aktuell_spark.streaming.sink import BucketedUpsertTable

    ev = load(spark, sf_dir, "events")
    is_del = F.col("event_type") == "error"
    ch = ev.select(
        F.col("user_id").cast("string").alias("conv_id"),
        (F.col("event_id") % 7).cast("int").alias("turn_idx"),
        F.when(~is_del, F.col("event_type")).alias("role"),
        F.when(~is_del, F.col("props")).alias("text"),
        F.lit(None).cast("string").alias("tool"),
        F.col("ts"),
        F.col("event_id").alias("seq"),
        F.when(is_del, F.lit("delete")).otherwise(F.lit("upsert")).alias("op"),
    )
    mid = ch.agg(F.max("seq")).collect()[0][0] // 2
    base = tempfile.mkdtemp(prefix="aktuell_changes_cow_")
    table = BucketedUpsertTable(
        spark, os.path.join(base, "t"), n_buckets=8, cow_retain_epochs=4
    )
    table.merge_batch(ch.filter(F.col("seq") <= mid), 0)
    table.merge_batch(ch.filter(F.col("seq") > mid), 1)
    return table.changes(0, 1).drop("bucket")


SQL_CHANGES_COW = """
WITH ch AS (
  SELECT CAST(user_id AS VARCHAR) AS conv_id,
         CAST(event_id % 7 AS INTEGER) AS turn_idx,
         CASE WHEN event_type = 'error' THEN NULL ELSE event_type END AS role,
         CASE WHEN event_type = 'error' THEN NULL ELSE props END AS text,
         CAST(NULL AS VARCHAR) AS tool,
         ts, event_id AS seq,
         CASE WHEN event_type = 'error' THEN 'delete' ELSE 'upsert' END AS op
  FROM events
),
mid AS (SELECT max(seq) // 2 AS m FROM ch),
s1 AS (
  SELECT * FROM (
    SELECT ch.*, row_number() OVER (
      PARTITION BY conv_id, turn_idx ORDER BY seq DESC) AS rn
    FROM ch)
  WHERE rn = 1
),
s0 AS (
  SELECT * FROM (
    SELECT ch.*, row_number() OVER (
      PARTITION BY conv_id, turn_idx ORDER BY seq DESC) AS rn
    FROM ch WHERE seq <= (SELECT m FROM mid))
  WHERE rn = 1
)
SELECT conv_id, turn_idx, role, text, tool, ts, seq, op
FROM s1
WHERE NOT EXISTS (
  SELECT 1 FROM s0
  WHERE s0.conv_id = s1.conv_id AND s0.turn_idx = s1.turn_idx
    AND s0.seq = s1.seq
)
"""


EXTRA_QUERIES["changes_cow"] = (q_changes_cow, SQL_CHANGES_COW)


def q_ann_incremental(spark, sf_dir):
    """ANN over a STREAM-MAINTAINED index (streaming/ann_index.py —
    round-6 task: the LSH index kept live by the CDC stream instead of
    batch-built per query): the embeddings table is replayed as a
    vector-event feed through the exactly-once vec_id-keyed index sink
    (cells assigned in-stream), then the top-3 in-cell join runs
    against the MATERIALIZED index. Oracle = the batch knn_lsh SQL
    verbatim: a stream-built index must answer identically to a
    batch-built one, and any defect in feed slicing, the index merge,
    or cell assignment turns the row red."""
    import os
    import tempfile

    from aktuell_spark.streaming.ann_index import (
        knn_from_index,
        run_ann_index_stream,
    )

    base = tempfile.mkdtemp(prefix="aktuell_ann_idx_")
    feed = os.path.join(base, "feed")
    emb = load(spark, sf_dir, "embeddings")
    (
        emb.select(
            "vec_id", "embedding",
            F.lit("insert").alias("op"),
            F.col("vec_id").cast("long").alias("seq"),
        )
        .write.parquet(feed)
    )
    _, table = run_ann_index_stream(
        spark, feed, os.path.join(base, "table"), os.path.join(base, "ckpt"),
        n_planes=ANN_PLANES_AT_TEST_SF, n_buckets=8,
        max_files_per_trigger=1,
    )
    return knn_from_index(table, k=3, max_bucket_size=ANN_MAX_BUCKET)


EXTRA_QUERIES["ann_incremental"] = (q_ann_incremental, SQL_KNN_LSH)


# ----------------------------------------------------------------------
# round 6: retrieval + semantic dedup + corpus-LM perplexity
# ----------------------------------------------------------------------

BM25_TERMS = ("spark", "vector", "merge")
BM25_K1, BM25_B, BM25_TOPK = 1.2, 0.75, 50


def q_bm25_search(spark, sf_dir):
    """BM25 top-k retrieval over the documents table (Robertson/Lucene
    idf: ln(1 + (N - df + .5)/(df + .5))) for a fixed query-term set —
    the text-retrieval stage of a curation pipeline (find documents
    about X to up/down-sample). Scale shape: per-doc tf/dl are narrow
    higher-order-function maps (zero shuffle); N/avgdl/df fold into ONE
    1-row aggregate broadcast back; top-k is TakeOrderedAndProject
    (never a global sort); the rank window runs over <= k rows."""
    docs = load(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    d = docs.select("doc_id", toks.alias("t")).withColumn(
        "dl", F.size("t").cast("double")
    )
    def _tf(term):
        # one-arg lambda on purpose: a second (defaulted) parameter
        # would make pyspark bind the higher-order (element, index) form
        return F.size(F.filter("t", lambda x: x == F.lit(term)))

    tf = [
        _tf(term).cast("double").alias(f"tf{i}")
        for i, term in enumerate(BM25_TERMS)
    ]
    d = d.select("doc_id", "dl", *tf)
    stats = d.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf{i}") > 0).cast("double")).alias(f"df{i}")
            for i in range(len(BM25_TERMS))
        ],
    )
    j = d.crossJoin(F.broadcast(stats))
    score = F.lit(0.0)
    for i in range(len(BM25_TERMS)):
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col(f"df{i}") + 0.5) / (F.col(f"df{i}") + 0.5)
        )
        norm = F.col(f"tf{i}") + BM25_K1 * (
            1.0 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl")
        )
        score = score + idf * F.col(f"tf{i}") * (BM25_K1 + 1.0) / norm
    scored = j.select("doc_id", score.alias("s")).filter(F.col("s") > 0)
    topk = scored.orderBy(F.col("s").desc(), F.col("doc_id").asc()).limit(
        BM25_TOPK
    )
    w = Window.orderBy(F.col("s").desc(), F.col("doc_id").asc())
    return topk.select(
        "doc_id",
        F.row_number().over(w).alias("rank"),
        F.round("s", 6).alias("score"),
    )


def _bm25_sql() -> str:
    terms = ", ".join(f"('{t}')" for t in BM25_TERMS)
    return f"""
WITH q(term) AS (VALUES {terms}),
d AS (
  SELECT doc_id,
         regexp_split_to_array(lower(trim(text)), '\\s+') AS t,
         CAST(len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS DOUBLE) AS dl
  FROM documents
),
stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM d),
tf AS (
  SELECT d.doc_id, d.dl, q.term,
         CAST(len(list_filter(d.t, x -> x = q.term)) AS DOUBLE) AS tf
  FROM d CROSS JOIN q
),
df AS (SELECT term, CAST(count(*) FILTER (tf > 0) AS DOUBLE) AS df
       FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         sum(ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
             * tf.tf * ({BM25_K1} + 1.0)
             / (tf.tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * tf.dl / s.avgdl))
         ) AS s
  FROM tf JOIN df USING (term) CROSS JOIN stats s
  GROUP BY tf.doc_id
)
SELECT doc_id,
       CAST(row_number() OVER (ORDER BY s DESC, doc_id ASC) AS INTEGER) AS rank,
       round(s, 6) AS score
FROM scored WHERE s > 0
ORDER BY s DESC, doc_id ASC LIMIT {BM25_TOPK}
"""


EXTRA_QUERIES["bm25_search"] = (q_bm25_search, _bm25_sql())


SEMDEDUP_K = 8
SEMDEDUP_TAU = 0.35
SEMDEDUP_CAP = 256


def q_semdedup(spark, sf_dir):
    """SemDeDup-style semantic dedup (Abbas et al. 2023 shape, public
    method): assign every embedding to its nearest of K deterministic
    seed centroids (the K lowest vec_ids — reproducible cross-engine,
    the stand-in for sampled k-means centroids the way trained-IVF
    already demonstrates), then WITHIN each cluster mark any vector
    whose cosine to a lower-id member reaches tau as a semantic
    duplicate. Scale shape: assignment is an N x K broadcast join
    (IVF-assign class); the dup test joins only within clusters with
    the same deterministic per-cluster candidate cap as the ANN
    family — never corpus-wide all-pairs."""
    from aktuell_spark.functions.semdedup import semdedup

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cents = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        # bounded: K rows — the centroid model, not the data
        for r in emb.filter(F.col("vec_id") < SEMDEDUP_K).collect()
    ]
    return semdedup(emb, cents, tau=SEMDEDUP_TAU, cap=SEMDEDUP_CAP)


def _semdedup_sql() -> str:
    return f"""
WITH e AS (SELECT vec_id, embedding FROM embeddings),
cent AS (SELECT vec_id AS cent_id, embedding AS cvec FROM e
         WHERE vec_id < {SEMDEDUP_K}),
sims AS (
  SELECT e.vec_id, e.embedding, c.cent_id,
         round(list_cosine_similarity(e.embedding::DOUBLE[],
                                      c.cvec::DOUBLE[]), 6) AS csim
  FROM e CROSS JOIN cent c
),
assigned AS (
  SELECT vec_id, embedding, cent_id AS cluster FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id
                                 ORDER BY csim DESC, cent_id ASC) AS rn
    FROM sims) WHERE rn = 1
),
cand AS (
  SELECT cluster AS c2, vec_id AS cand_id, embedding AS cand_vec FROM (
    SELECT *, row_number() OVER (PARTITION BY cluster
                                 ORDER BY vec_id ASC) AS rib
    FROM assigned) WHERE rib <= {SEMDEDUP_CAP}
)
SELECT a.vec_id, a.cluster,
       EXISTS (
         SELECT 1 FROM cand c
         WHERE c.c2 = a.cluster AND c.cand_id < a.vec_id
           AND round(list_cosine_similarity(a.embedding::DOUBLE[],
                                            c.cand_vec::DOUBLE[]), 6)
               >= {SEMDEDUP_TAU}
       ) AS is_dup
FROM assigned a
"""


EXTRA_QUERIES["semdedup"] = (q_semdedup, _semdedup_sql())


LM_ALPHA = 0.5


def q_perplexity_lm(spark, sf_dir):
    """Corpus-LM perplexity filtering (the CCNet/KenLM stage, public
    method): a word-bigram language model with add-alpha smoothing is
    trained ON THE CORPUS ITSELF — two map-side-combinable groupBys
    (bigram counts, unigram context counts) plus one 1-row vocab count
    — and every document is scored by its bigrams' mean negative log
    probability; perplexity = exp of that. High-perplexity docs are the
    out-of-distribution/gibberish candidates a curation pass drops.
    Scale shape: ONE explode of adjacent-token pairs (narrow), model
    counts shuffle on bigram/unigram keys (map-side combined), scoring
    re-joins the exploded bigrams to the model on the same keys, and
    the per-doc fold is a keyed avg. No driver-side model: the LM
    lives in DataFrames end-to-end."""
    docs = load(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    d = docs.select("doc_id", toks.alias("t")).filter(F.size("t") >= 2)
    bg = d.select(
        "doc_id",
        F.explode(
            F.arrays_zip(
                F.slice("t", 1, F.size("t") - 1).alias("w1"),
                F.slice("t", 2, F.size("t") - 1).alias("w2"),
            )
        ).alias("b"),
    ).select("doc_id", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    c12 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    vocab = bg.agg(
        F.countDistinct("w2").cast("double").alias("v")
    )
    p = (
        bg.join(c12, ["w1", "w2"]).join(c1, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            F.log(
                (F.col("c12") + F.lit(LM_ALPHA))
                / (F.col("c1") + F.lit(LM_ALPHA) * F.col("v"))
            ).alias("lp"),
        )
    )
    return p.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.round(F.exp(-F.avg("lp")), 4).alias("perplexity"),
    )


SQL_PERPLEXITY_LM = f"""
WITH d AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS t
  FROM documents
),
bg AS (
  SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
  FROM d, unnest(range(1, len(t))) AS u(i)
  WHERE len(t) >= 2
),
c12 AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY w1, w2),
c1 AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY w1),
vocab AS (SELECT CAST(count(DISTINCT w2) AS DOUBLE) AS v FROM bg)
SELECT bg.doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       round(exp(-avg(ln((c12.c12 + {LM_ALPHA})
                         / (c1.c1 + {LM_ALPHA} * vocab.v)))), 4)
         AS perplexity
FROM bg JOIN c12 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN vocab
GROUP BY bg.doc_id
"""


EXTRA_QUERIES["perplexity_lm"] = (q_perplexity_lm, SQL_PERPLEXITY_LM)


REPEATED_SPAN_LEN = 50  # chars; Lee et al. use 50 BPE tokens


def q_repeated_spans(spark, sf_dir):
    """Exact repeated-substring spans (Lee et al. 2021 exact-substring
    dedup, gram-hash-join form): every maximal character span that is
    part of a >= 50-char substring occurring at two or more (doc, pos)
    sites in the corpus — the verbatim-boilerplate detector that
    complements the document-level (MinHash) and sampled (winnowing)
    dedup legs. Linear gram explode + one count>=2 groupBy + per-doc
    island merge; never pairwise."""
    from aktuell_spark.functions.dedupe import repeated_substring_spans

    docs = load(spark, sf_dir, "documents")
    return repeated_substring_spans(docs, min_len=REPEATED_SPAN_LEN)


def _repeated_spans_sql() -> str:
    L = REPEATED_SPAN_LEN
    return f"""
WITH t AS (SELECT doc_id, text FROM documents),
g AS (
  SELECT doc_id, i AS pos,
         substring(md5(substring(text, i, {L})), 1, 16) AS h
  FROM t CROSS JOIN unnest(range(1, greatest(length(text) - {L} + 2, 1))) AS u(i)
),
rep AS (SELECT h FROM g GROUP BY h HAVING count(*) >= 2),
p AS (SELECT doc_id, pos FROM g JOIN rep USING (h)),
isl AS (
  SELECT doc_id, pos,
         CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= {L}
              THEN 0 ELSE 1 END AS brk
  FROM p
),
grp AS (
  SELECT doc_id, pos, sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS gid
  FROM isl
)
SELECT doc_id, min(pos) AS span_start, max(pos) + {L} - 1 AS span_end,
       max(pos) + {L} - min(pos) AS span_len
FROM grp GROUP BY doc_id, gid
"""


EXTRA_QUERIES["repeated_spans"] = (q_repeated_spans, _repeated_spans_sql())


def q_strip_repeated(spark, sf_dir):
    """Cleaned corpus from exact-substring dedup: every repeated span
    (see `repeated_spans`) cut out of its document — one row per input
    doc with the cleaned text and removed-char count. The cut is a
    single `aggregate` fold over each doc's sorted span array; docs
    with no repeated spans pass through untouched."""
    from aktuell_spark.functions.dedupe import strip_repeated_spans

    docs = load(spark, sf_dir, "documents")
    return strip_repeated_spans(docs, min_len=REPEATED_SPAN_LEN)


def _strip_repeated_sql() -> str:
    L = REPEATED_SPAN_LEN
    return f"""
WITH t AS (SELECT doc_id, text FROM documents),
g AS (
  SELECT doc_id, i AS pos,
         substring(md5(substring(text, i, {L})), 1, 16) AS h
  FROM t CROSS JOIN unnest(range(1, greatest(length(text) - {L} + 2, 1))) AS u(i)
),
rep AS (SELECT h FROM g GROUP BY h HAVING count(*) >= 2),
p AS (SELECT doc_id, pos FROM g JOIN rep USING (h)),
isl AS (
  SELECT doc_id, pos,
         CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= {L}
              THEN 0 ELSE 1 END AS brk
  FROM p
),
grp AS (
  SELECT doc_id, pos, sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS gid
  FROM isl
),
sp AS (
  SELECT doc_id, min(pos) AS s, max(pos) + {L} - 1 AS e
  FROM grp GROUP BY doc_id, gid
),
seg AS (
  SELECT doc_id,
         coalesce(lag(e) OVER (PARTITION BY doc_id ORDER BY s), 0) + 1 AS a,
         s - 1 AS b
  FROM sp
  UNION ALL
  SELECT sp.doc_id, max(e) + 1 AS a, length(t.text) AS b
  FROM sp JOIN t USING (doc_id) GROUP BY sp.doc_id, length(t.text)
),
cleaned AS (
  SELECT seg.doc_id,
         string_agg(substring(t.text, a, greatest(b - a + 1, 0)), ''
                    ORDER BY a) AS clean_text
  FROM seg JOIN t USING (doc_id) GROUP BY seg.doc_id
),
rem AS (SELECT doc_id, sum(e - s + 1) AS n_removed_chars FROM sp GROUP BY doc_id)
SELECT t.doc_id,
       coalesce(c.clean_text, t.text) AS clean_text,
       coalesce(r.n_removed_chars, 0) AS n_removed_chars
FROM t LEFT JOIN cleaned c USING (doc_id) LEFT JOIN rem r USING (doc_id)
"""


EXTRA_QUERIES["strip_repeated"] = (q_strip_repeated, _strip_repeated_sql())


def q_span_incremental(spark, sf_dir):
    """Repeated-substring spans from the STREAM-MAINTAINED span index
    (streaming/span_index.py — the sixth incremental index, and the
    first COUNTED one: a gram-start position is marked iff its gram's
    corpus-wide site count is >= 2, so arriving docs retro-mark other
    docs' standing positions on the 1->2 transition and redeliveries
    unmark survivors on 2->1). The documents table replays as a
    two-generation feed; the live span table must equal the batch
    repeated_spans sweep on the final corpus — oracle = the batch spans
    SQL verbatim. A defect anywhere in feed slicing, count-delta
    arithmetic, transition marking, retraction, or the as-of-previous-
    epoch replay reads turns the row red."""
    import os
    import tempfile

    from aktuell_spark.streaming.span_index import run_span_index_stream

    base = tempfile.mkdtemp(prefix="aktuell_span_idx_")
    feed = os.path.join(base, "feed")
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "text", F.col("doc_id").cast("long").alias("seq")
    )
    for parity in (0, 1):
        (
            docs.filter(F.col("doc_id") % 2 == parity)
            .coalesce(1).write.mode("append").parquet(feed)
        )
    _, index = run_span_index_stream(
        spark, feed, os.path.join(base, "idx"), os.path.join(base, "ckpt"),
        min_len=REPEATED_SPAN_LEN, n_buckets=8, max_files_per_trigger=1,
    )
    return index.spans()


EXTRA_QUERIES["span_incremental"] = (q_span_incremental, _repeated_spans_sql())


# ----------------------------------------------------------------------
# round 7: SemDeDup + BM25 promoted to first-class library operators
# (VERDICT r6 "Next round" #4/#5): trained corpus-scaled centroids and
# a terms-DataFrame query interface.
# ----------------------------------------------------------------------

SEMDEDUP_TRAIN_K = 12  # literal so the oracle can unroll the training;
# the LIBRARY default scales K with the corpus (semdedup_k = ceil sqrt N,
# pinned by tests/test_semdedup.py) — a real curation pass passes k=None
SEMDEDUP_TRAIN_SAMPLE = IVF_TRAIN_SAMPLE


def q_semdedup_trained(spark, sf_dir):
    """SemDeDup with IN-ENGINE TRAINED centroids (functions/semdedup.py
    — the library promotion of round 6's seed-centroid prototype):
    spherical k-means on the first SEMDEDUP_TRAIN_SAMPLE vectors
    (first-k init, 6-decimal quantization — the cross-engine-
    reproducible config knn_ivf_trained established), then the capped
    within-cluster duplicate test over the FULL corpus. The oracle
    unrolls the same two Lloyd passes in SQL."""
    from aktuell_spark.functions.semdedup import semdedup_trained

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return semdedup_trained(
        emb, k=SEMDEDUP_TRAIN_K, tau=SEMDEDUP_TAU, cap=SEMDEDUP_CAP,
        train_sample=SEMDEDUP_TRAIN_SAMPLE, n_iter=IVF_TRAIN_ITER,
    )


def _semdedup_trained_sql() -> str:
    assert IVF_TRAIN_ITER == 2  # passes are unrolled below
    return f"""
WITH train_sample AS (
  SELECT vec_id, embedding FROM embeddings
  WHERE vec_id < {SEMDEDUP_TRAIN_SAMPLE}
),
c0 AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid,
         embedding::DOUBLE[] AS cvec
  FROM (SELECT vec_id, embedding FROM train_sample
        ORDER BY vec_id LIMIT {SEMDEDUP_TRAIN_K})
),{_ivf_lloyd_pass_sql('c0', 'c1')},{_ivf_lloyd_pass_sql('c1', 'c2')},
assigned AS (
  SELECT vec_id, embedding, cid AS cluster FROM (
    SELECT e.vec_id, e.embedding, c.cid,
           row_number() OVER (PARTITION BY e.vec_id
               ORDER BY round(list_cosine_similarity(
                 e.embedding::DOUBLE[], c.cvec), 6) DESC,
                        c.cid ASC) AS crank
    FROM embeddings e CROSS JOIN c2 c) WHERE crank = 1
),
cand AS (
  SELECT cluster AS cc, vec_id AS cand_id, embedding AS cand_vec FROM (
    SELECT *, row_number() OVER (PARTITION BY cluster
                                 ORDER BY vec_id ASC) AS rib
    FROM assigned) WHERE rib <= {SEMDEDUP_CAP}
)
SELECT a.vec_id, a.cluster,
       EXISTS (
         SELECT 1 FROM cand c
         WHERE c.cc = a.cluster AND c.cand_id < a.vec_id
           AND round(list_cosine_similarity(a.embedding::DOUBLE[],
                                            c.cand_vec::DOUBLE[]), 6)
               >= {SEMDEDUP_TAU}
       ) AS is_dup
FROM assigned a
"""


EXTRA_QUERIES["semdedup_trained"] = (q_semdedup_trained, _semdedup_trained_sql())


# 12 query terms — the terms-DataFrame interface (functions/retrieval.py)
# replaces round 6's 3-term per-column prototype
BM25T_TERMS = (
    "batch", "filter", "hash", "join", "merge", "query",
    "scan", "sort", "spark", "stream", "vector", "window",
)


def q_bm25_topk(spark, sf_dir):
    """BM25 top-k with the query terms as a DATAFRAME joined on term
    (functions/retrieval.py — the library promotion of round 6's
    fixed-term prototype): one token explode + broadcast term join +
    map-side-combinable tf groupBy; 1-row corpus stats broadcast; top-k
    stays TakeOrderedAndProject. Ranking orders by the ROUNDED score so
    float-summation order can never flip a rank across engines."""
    from aktuell_spark.functions.retrieval import bm25_topk

    docs = load(spark, sf_dir, "documents")
    terms = spark.createDataFrame([(t,) for t in BM25T_TERMS], "term string")
    return bm25_topk(docs, terms, k1=BM25_K1, b=BM25_B, topk=BM25_TOPK)


def _bm25_topk_sql() -> str:
    terms = ", ".join(f"('{t}')" for t in BM25T_TERMS)
    return f"""
WITH q(term) AS (VALUES {terms}),
d AS (
  SELECT doc_id,
         regexp_split_to_array(lower(trim(text)), '\\s+') AS t,
         CAST(len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS DOUBLE) AS dl
  FROM documents
),
stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM d),
tok AS (SELECT doc_id, dl, unnest(t) AS term FROM d),
tf AS (
  SELECT doc_id, dl, term, CAST(count(*) AS DOUBLE) AS tf
  FROM tok JOIN q USING (term) GROUP BY doc_id, dl, term
),
df AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         round(sum(ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
             * tf.tf * ({BM25_K1} + 1.0)
             / (tf.tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * tf.dl / s.avgdl))
         ), 6) AS score
  FROM tf JOIN df USING (term) CROSS JOIN stats s
  GROUP BY tf.doc_id
)
SELECT doc_id,
       CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INTEGER) AS rank,
       score
FROM scored
ORDER BY score DESC, doc_id ASC LIMIT {BM25_TOPK}
"""


EXTRA_QUERIES["bm25_topk"] = (q_bm25_topk, _bm25_topk_sql())


def q_bm25_incremental(spark, sf_dir):
    """BM25 top-k from the STREAM-MAINTAINED inverted index
    (streaming/bm25_index.py — the fourth incremental index): the
    documents table is replayed as a two-generation feed; each
    micro-batch is tokenized in-stream and merged exactly-once into the
    term-bucketed postings table + the doc-length table; the search is
    a bucket-pruned postings read + the SAME shared scoring stage the
    batch path uses. The live index must answer the 12-term query
    exactly as the batch sweep on the final corpus — oracle = the batch
    BM25 SQL verbatim. A defect anywhere in feed slicing, the postings
    merge, retraction, doc-length LWW, or stats turns the row red."""
    import os
    import tempfile

    from aktuell_spark.streaming.bm25_index import run_bm25_index_stream

    base = tempfile.mkdtemp(prefix="aktuell_bm25_idx_")
    feed = os.path.join(base, "feed")
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "text", F.col("doc_id").cast("long").alias("seq")
    )
    for parity in (0, 1):
        (
            docs.filter(F.col("doc_id") % 2 == parity)
            .coalesce(1).write.mode("append").parquet(feed)
        )
    _, index = run_bm25_index_stream(
        spark, feed, os.path.join(base, "idx"), os.path.join(base, "ckpt"),
        n_buckets=8, max_files_per_trigger=1,
    )
    return index.search(list(BM25T_TERMS), k1=BM25_K1, b=BM25_B, topk=BM25_TOPK)


EXTRA_QUERIES["bm25_incremental"] = (q_bm25_incremental, _bm25_topk_sql())


def q_decontam_incremental(spark, sf_dir):
    """Contamination report from the STREAM-MAINTAINED decontamination
    index (streaming/decontam_index.py — the fifth incremental index):
    the documents table is replayed as a two-generation feed in which
    benchmark docs (doc_id % 17 == 0) and training docs arrive
    interleaved; each micro-batch's grams merge exactly-once into the
    bucketed posting tables, training docs probe the standing benchmark
    gram set and new benchmark grams retro-probe the standing training
    postings (bucket-pruned). The live hits table must equal the batch
    contamination_overlap sweep on the final corpus — oracle = the
    batch decontamination SQL verbatim. A defect anywhere in feed
    slicing, either probe direction, retraction, or the denominators
    turns the row red. Grading runs n=4 grams (the library default
    stays the published 8): short grams contaminate densely at sf0.01
    (38 rows vs 2), so the value hash exercises both probe directions
    and the denominators over many docs instead of two."""
    import os
    import tempfile

    from aktuell_spark.streaming.decontam_index import (
        run_decontam_index_stream,
    )

    base = tempfile.mkdtemp(prefix="aktuell_decontam_idx_")
    feed = os.path.join(base, "feed")
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "text", F.col("doc_id").cast("long").alias("seq")
    )
    for parity in (0, 1):
        (
            docs.filter(F.col("doc_id") % 2 == parity)
            .coalesce(1).write.mode("append").parquet(feed)
        )
    _, index = run_decontam_index_stream(
        spark, feed, os.path.join(base, "idx"), os.path.join(base, "ckpt"),
        bench_pred=lambda c: c % 17 == 0, n=4,
        n_buckets=8, max_files_per_trigger=1,
    )
    return index.contamination()


EXTRA_QUERIES["decontam_incremental"] = (
    q_decontam_incremental, _decontaminate_sql(n=4)
)


def q_dedup_incremental(spark, sf_dir):
    """Near-dup pairs from the STREAM-MAINTAINED MinHash-LSH index
    (streaming/dedup_index.py): the documents table is replayed as a
    two-generation feed through the exactly-once band/docs/pairs
    tables — each micro-batch is banded in-stream and probed against
    the standing index (one band-key equi-join, |batch|-proportional),
    verified with the shared exact-Jaccard stage. Every near-dup pair
    has a later-arriving member, so the stream discovers exactly the
    batch sweep's pairs; oracle = the batch MinHash SQL verbatim. A
    defect anywhere in feed slicing, the index merge, the probe join,
    or the verification turns the row red."""
    import os
    import tempfile

    from aktuell_spark.streaming.dedup_index import run_dedup_index_stream

    base = tempfile.mkdtemp(prefix="aktuell_dedup_idx_")
    feed = os.path.join(base, "feed")
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "text", F.col("doc_id").cast("long").alias("seq")
    )
    for parity in (0, 1):
        (
            docs.filter(F.col("doc_id") % 2 == parity)
            .coalesce(1).write.mode("append").parquet(feed)
        )
    _, index = run_dedup_index_stream(
        spark, feed, os.path.join(base, "idx"), os.path.join(base, "ckpt"),
        threshold=0.2, n_buckets=8, max_files_per_trigger=1,
    )
    return index.found_pairs()


QUERIES["dedup_incremental"] = (q_dedup_incremental, _minhash_lsh_sql())


def q_cluster_incremental(spark, sf_dir):
    """Near-dup clusters from the STREAM-MAINTAINED component index
    (streaming/cluster_index.py — pair stream → live cluster table,
    never re-clustering the corpus): the exact-Jaccard pair graph is
    replayed as a two-generation feed; each micro-batch compresses the
    standing clusters it touches to star edges and runs bounded-
    subgraph connected components. The final table must equal batch CC
    over ALL pairs — oracle = dedup_clusters' recursive-SQL oracle
    verbatim (cluster sizes joined on read)."""
    import os
    import tempfile

    from aktuell_spark.functions.dedupe import ngram_jaccard_pairs
    from aktuell_spark.streaming.cluster_index import run_cluster_index_stream

    docs = load(spark, sf_dir, "documents")
    # localCheckpoint: the pair job is the expensive upstream and feeds
    # TWO parity-sliced feed writes — materialize it once, not per write
    pairs = ngram_jaccard_pairs(
        docs, threshold=0.2, max_df=NEAR_DUP_MAX_DF
    ).withColumn(
        "seq", (F.col("doc_a") * 100_000 + F.col("doc_b")).cast("long")
    ).select("doc_a", "doc_b", "seq").localCheckpoint()
    base = tempfile.mkdtemp(prefix="aktuell_cluster_idx_")
    feed = os.path.join(base, "feed")
    for parity in (0, 1):
        (
            pairs.filter(F.col("doc_a") % 2 == parity)
            .coalesce(1).write.mode("append").parquet(feed)
        )
    _, index = run_cluster_index_stream(
        spark, feed, os.path.join(base, "idx"), os.path.join(base, "ckpt"),
        n_buckets=8, max_files_per_trigger=1,
    )
    comp = index.read()
    sizes = comp.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return comp.join(sizes, "cluster_id").select(
        F.col("vertex").alias("doc_id"), "cluster_id", "cluster_size"
    )


QUERIES["cluster_incremental"] = (q_cluster_incremental, _dedup_clusters_sql())


# ----------------------------------------------------------------------
# Final registry: exactly DRIVER_WINDOW entries. ROTATION POLICY,
# round-7 form (every registered query now has at least one driver row,
# so "never graded" generalizes to STALEST-FIRST): the head block holds
# the queries whose most recent driver row is OLDEST — this round the 26
# queries last graded in CORRECTNESS_r04 plus the 2 brand-new round-7
# library operators (semdedup_trained, bm25_topk) — and the tail
# re-grades the two incremental indexes whose code changed materially
# this round plus a refresh of the r5-graded block. Everything rotated
# out stays importable, benched, and green under
# tools/check_oracle.py --extra. tests/test_registry_window.py pins the
# policy (head not graded in the last two rounds, r6 head rotated out,
# exact fit). ``__spark_entry__`` inserts the three stream_cdc_*
# rows-only entries after the head block (STREAM_INSERT_AFTER), keeping
# the total at 50.
# ----------------------------------------------------------------------

# the r6 head (all driver-proven in CORRECTNESS_r06) — kept for the
# rotation-policy pin
PREV_ROUND_HEAD = (
    "media_pixels", "media_content", "stream_curate", "doc_clusters",
    "conversation_export", "export_shards", "sft_spans",
    "packed_sft_spans", "preference_pairs", "curriculum_order",
    "token_budget_mix", "leakage_split",
    "dedup_clusters_star", "changes_cow", "ann_incremental",
    "bm25_search", "semdedup", "perplexity_lm", "dedup_incremental",
    "cluster_incremental",
)

# head: 30 queries — the 26 whose last driver row is round 4 (stalest
# in the registry) + the 4 new round-7 operators (two library
# promotions + the stream-maintained BM25 and decontamination indexes)
_HEAD = (
    "distinct_count", "distinct_users", "embedding_near_dup",
    "exact_dedup", "knn_bruteforce", "knn_ivf", "knn_ivf_trained",
    "knn_lsh", "knn_multiprobe", "lang_id", "minhash_lsh_pairs",
    "minhash_signatures", "near_dup_jaccard", "pii_scrub",
    "pricing_summary", "quality_score", "rate_per_second",
    "regional_revenue", "set_ops", "simhash", "sliding_window",
    "token_stats", "token_stats_bpe", "top_revenue_orders",
    "tumbling_window", "users_with_purchases",
    "semdedup_trained", "bm25_topk", "bm25_incremental",
    "decontam_incremental",
)
# __spark_entry__ inserts stream_cdc_materialize / _mor / _mor_partial
# here (3 entries)
STREAM_INSERT_AFTER = _HEAD[-1]

# tail (17): the two stream-maintained indexes re-graded after their
# round-7 changes (candidate-bounded dedup verification + retraction;
# checkpointed pair job), then a refresh of the r5-graded block
# (last rows in CORRECTNESS_r05) — note `decontaminate` grades the
# BATCH sweep in the same window as its incremental twin above
_TAIL = (
    "dedup_incremental", "cluster_incremental",
    "ann_quantized", "cep_funnel", "cohort_retention", "decontaminate",
    "dedup_clusters", "dedup_corpus", "deterministic_sample",
    "funnel_rate", "gopher_repetition", "interval_join",
    "scd2_history", "stratified_sample",
    "tfidf_top_terms", "winnow_fingerprints",
    "winnow_pairs",
)
# pivot_counts, rollup_report, top_paths, pack_sequences,
# turn_tool_join_native (rows-only) sit this round out in favor of
# oracle-bearing slots; the whole r6 window rotates to EXTRA_QUERIES
# (still benched + --extra-green)

assert len(_HEAD) + 3 + len(_TAIL) == DRIVER_WINDOW, (len(_HEAD), len(_TAIL))
assert not (set(_HEAD) & set(_TAIL))

_ALL_QUERIES = {**QUERIES, **EXTRA_QUERIES}
QUERIES = {name: _ALL_QUERIES[name] for name in (*_HEAD, *_TAIL)}
EXTRA_QUERIES = {
    k: v for k, v in _ALL_QUERIES.items() if k not in QUERIES
}
