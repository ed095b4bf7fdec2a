"""Deterministic synthetic transcript + CDC fixtures, generated in-engine.

Mirrors the reference's test-data generators
(/root/reference/examples/generator/main.go:31-80 — insert/update/delete
loop over a demo collection; /root/reference/scripts/mongo-quick.sh) but
re-expressed over the transcript payload mandated by BASELINE.json
``input_hint``: (conv_id, turn_idx, role, text, tool, ts).

Everything is pure DataFrame code seeded through ``xxhash64`` — no
driver-side loops, no RNG state — so the same (scale, seed) always yields
byte-identical tables at any parallelism, which is what lets the
checkpoint-restart tests assert byte-identical output.

Fixture properties guaranteed (per FIXTURES.md §2):
- ~5% duplicate events (same ``seq`` — redelivery after reconnect,
  reference analogue: blind resubscribe, pkg/client/client.go:469-485);
- ~2% late events (``ts`` two hours older than arrival position);
- insert→update→update→delete chains per key (last-writer-wins MERGE
  exercise; reference merge: useAktuellStream.ts:125-171);
- hot keys: conversations 0-2 carry a disproportionate share of turns
  (skew/salting tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# deterministic mini-vocabulary for turn text
_VOCAB = [
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
    "oscar", "papa", "quebec", "romeo", "sierra", "tango", "uniform",
    "victor", "whiskey", "xray", "yankee", "zulu", "spark", "stream",
    "window", "merge", "state", "checkpoint",
]
_ROLES = ["user", "assistant", "system", "tool"]
_TOOLS = ["", "", "", "search", "python", "browser", "calculator"]
_BASE_TS = "2025-01-01 00:00:00"


def _h(*cols, seed: int):
    """Deterministic 64-bit hash column over *cols* + seed."""
    return F.xxhash64(*cols, F.lit(seed))


def gen_transcripts(
    spark: SparkSession,
    n_convs: int = 100,
    avg_turns: int = 12,
    hot_turns: int = 400,
    n_hot: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Current-state transcripts table (FIXTURES.md §1).

    conv 0..n_hot-1 are hot (``hot_turns`` turns each); the rest get
    ``avg_turns ± 50%``. Partition-friendly: generated from spark.range,
    scales linearly to any size without driver involvement.
    """
    convs = (
        spark.range(n_convs)
        .withColumn("conv_id", F.concat(F.lit("c"), F.format_string("%06d", "id")))
        .withColumn(
            "n_turns",
            F.when(F.col("id") < n_hot, F.lit(hot_turns)).otherwise(
                (F.lit(avg_turns // 2)) + F.pmod(_h("id", seed=seed), F.lit(avg_turns))
            ),
        )
    )
    turns = convs.select(
        "conv_id",
        F.col("id").alias("_cid"),
        F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("turn_idx"),
    ).withColumn("turn_idx", F.col("turn_idx").cast("int"))

    hk = _h("conv_id", "turn_idx", seed=seed)
    n_words = (F.lit(4) + F.pmod(_h("conv_id", "turn_idx", seed=seed + 1), F.lit(10)))
    vocab = F.array(*[F.lit(w) for w in _VOCAB])
    text = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(0), n_words - 1),
            lambda i: F.element_at(
                vocab, (F.pmod(F.xxhash64(F.col("conv_id"), F.col("turn_idx"), i, F.lit(seed + 2)), F.lit(len(_VOCAB))) + 1).cast("int")
            ),
        ),
    )
    role = F.element_at(
        F.array(*[F.lit(r) for r in _ROLES]),
        (F.pmod(hk, F.lit(len(_ROLES))) + 1).cast("int"),
    )
    tool = F.element_at(
        F.array(*[F.lit(t) for t in _TOOLS]),
        (F.pmod(_h("conv_id", "turn_idx", seed=seed + 3), F.lit(len(_TOOLS))) + 1).cast("int"),
    )
    # event time: conversations start staggered, turns every ~30s + jitter
    ts = (
        F.to_timestamp(F.lit(_BASE_TS))
        + F.make_interval(secs=F.col("_cid") * 17)
        + F.make_interval(secs=F.col("turn_idx") * 30)
        + F.make_interval(secs=F.pmod(_h("conv_id", "turn_idx", seed=seed + 4), F.lit(10)))
    )
    return turns.select(
        "conv_id",
        "turn_idx",
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        ts.alias("ts"),
    )


def gen_transcript_changes(
    transcripts: DataFrame,
    seed: int = 42,
    update_pct: int = 30,
    update2_pct: int = 10,
    delete_pct: int = 10,
    dup_pct: int = 5,
    late_pct: int = 2,
    seq_mode: str = "arrival",
    partial_updates: bool = False,
    remove_tool_pct: int = 0,
) -> DataFrame:
    """CDC event stream over *transcripts* (FIXTURES.md §2).

    Emits full post-images on update (the reference enables
    ``SetFullDocument(UpdateLookup)``, pkg/sync/database.go:78) plus the
    partial ``updated_fields`` map mirroring
    ``updateDescription.updatedFields`` (pkg/models/types.go:17).

    ``partial_updates=True`` flips updates to the no-UpdateLookup case:
    payload columns are null and ONLY ``updated_fields`` /
    ``removed_fields`` carry the change — same logical stream, so a
    partial feed materialized with post-image reconstruction must equal
    the full feed's materialization byte-for-byte.
    ``remove_tool_pct``: that share of second-wave updates additionally
    drops the ``tool`` field (``removed_fields=['tool']``; full mode
    mirrors it as a null-tool post-image).

    ``seq`` is a strictly-increasing arrival-order key standing in for the
    stringified resume token (pkg/sync/database.go:176-178). At fixture
    scale it is a global row_number; in production ``seq`` comes from the
    source (Kafka offset / Iceberg snapshot sequence) and is never
    computed with a global sort.
    """
    t = transcripts
    base = t.select(
        "conv_id", "turn_idx", "role", "text", "tool", "ts",
        F.col("ts").alias("base_time"),
    )

    inserts = base.select(
        F.lit("insert").alias("op"),
        "conv_id", "turn_idx", "role", "text", "tool", "ts", "base_time",
        F.lit(None).cast("map<string,string>").alias("updated_fields"),
        F.lit(None).cast("array<string>").alias("removed_fields"),
        F.lit(0).alias("op_rank"),
    )

    def _mk_update(
        suffix: str, delay_s: int, rank: int, pct: int, hseed: int, remove_pct: int = 0
    ) -> DataFrame:
        sel = base.filter(F.pmod(_h("conv_id", "turn_idx", seed=hseed), F.lit(100)) < pct)
        new_text = F.concat(F.col("text"), F.lit(f" [{suffix}]"))
        new_ts = F.col("base_time") + F.make_interval(secs=F.lit(delay_s))
        removes_tool = F.pmod(_h("conv_id", "turn_idx", seed=hseed + 100), F.lit(100)) < F.lit(
            remove_pct
        )
        removed = F.when(removes_tool, F.array(F.lit("tool"))).otherwise(
            F.lit(None).cast("array<string>")
        )
        nul = F.lit(None).cast("string")
        return sel.select(
            F.lit("update").alias("op"),
            "conv_id", "turn_idx",
            (nul if partial_updates else F.col("role")).alias("role"),
            (nul if partial_updates else new_text).alias("text"),
            (
                nul
                if partial_updates
                else F.when(removes_tool, nul).otherwise(F.col("tool"))
            ).alias("tool"),
            new_ts.alias("ts"),
            new_ts.alias("base_time"),
            F.create_map(F.lit("text"), new_text).alias("updated_fields"),
            removed.alias("removed_fields"),
            F.lit(rank).alias("op_rank"),
        )

    upd1 = _mk_update("rev2", 3600, 1, update_pct, seed + 10)
    upd2 = _mk_update("rev3", 7200, 2, update2_pct, seed + 11, remove_pct=remove_tool_pct)

    del_ts = F.col("base_time") + F.make_interval(secs=F.lit(10800))
    deletes = base.filter(
        F.pmod(_h("conv_id", "turn_idx", seed=seed + 12), F.lit(100)) < delete_pct
    ).select(
        F.lit("delete").alias("op"),
        "conv_id", "turn_idx",
        F.lit(None).cast("string").alias("role"),
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("string").alias("tool"),
        del_ts.alias("ts"),
        del_ts.alias("base_time"),
        F.lit(None).cast("map<string,string>").alias("updated_fields"),
        F.lit(None).cast("array<string>").alias("removed_fields"),
        F.lit(3).alias("op_rank"),
    )

    events = inserts.unionByName(upd1).unionByName(upd2).unionByName(deletes)

    if seq_mode == "arrival":
        # arrival order := (base_time, tie-breakers) → seq. Fixture-scale
        # only: a global row_number implies a single-partition sort, fine
        # at test SF, replaced by source offsets at scale.
        from pyspark.sql import Window

        w = Window.orderBy("base_time", "conv_id", "turn_idx", "op_rank")
        events = events.withColumn("seq", F.row_number().over(w).cast("long"))
    elif seq_mode == "hash":
        # bench-scale mode, no global sort: LWW correctness needs only
        # (a) uniqueness and (b) per-key monotonicity across a key's
        # insert→update→delete chain. 61 hash bits identify the key
        # (collisions ~k²/2^62, negligible) and the low 2 bits carry the
        # chain position. Global order is arbitrary — irrelevant to the
        # final materialized state.
        key_hash = F.abs(_h("conv_id", "turn_idx", seed=seed + 30)) % F.lit(1 << 61)
        events = events.withColumn(
            "seq", (F.shiftleft(key_hash, 2) + F.col("op_rank")).cast("long")
        )
    else:
        raise ValueError(f"unknown seq_mode {seq_mode!r}")

    # ~late_pct% of events carry an event time 2h older than their arrival
    # position (exercises watermark drop policy, SURVEY §2.5 W5)
    late = F.pmod(_h("seq", seed=seed + 13), F.lit(100)) < late_pct
    events = events.withColumn(
        "ts", F.when(late, F.col("ts") - F.make_interval(hours=F.lit(2))).otherwise(F.col("ts"))
    )

    # ~dup_pct% redelivered verbatim (same seq) — dropDuplicates fodder
    dups = events.filter(F.pmod(_h("seq", seed=seed + 14), F.lit(100)) < dup_pct)
    events = events.unionByName(dups)

    # residual dynamic payload: inserts carry a small deterministic map
    # (the reference's schemaless document fields, pkg/models/types.go:16)
    extra = F.when(
        F.col("op") == "insert",
        F.create_map(F.lit("origin"), F.concat(F.lit("fixture-"), F.col("role"))),
    ).otherwise(F.lit(None).cast("map<string,string>"))
    return events.select(
        "seq", "op",
        F.lit("aktuell").alias("database"),
        F.lit("transcripts").alias("collection"),
        "conv_id", "turn_idx", "role", "text", "tool",
        "updated_fields", "removed_fields", "ts",
        extra.alias("extra"),
    )


def inject_collection_op(
    events: DataFrame,
    op: str,
    seq: int,
    ts,
    database: str = "aktuell",
    collection: str = "transcripts",
    to_collection: str | None = None,
) -> DataFrame:
    """Union one collection-level op row (``drop``/``rename``) into a
    change feed (reference op enum: pkg/models/types.go:101-108).

    The sentinel key ('', -1) satisfies the non-null key schema; the
    sink strips marker rows from the payload. ``seq`` must be unique in
    the feed if the watermark-dedupe mode is used; the sink MERGE path
    does not care. A rename carries its target namespace as
    ``extra['to']`` (the Mongo change-stream ``to`` field).
    """
    from aktuell_spark.schemas import CHANGE_SCHEMA

    assert op in ("drop", "rename"), op
    extra = {"to": to_collection} if to_collection else None
    spark = events.sparkSession
    row = (seq, op, database, collection, "", -1, None, None, None, None, None, ts, extra)
    return events.unionByName(
        spark.createDataFrame([row], CHANGE_SCHEMA), allowMissingColumns=True
    )


def gen_tool_events(transcripts: DataFrame, seed: int = 42) -> DataFrame:
    """Tool-call event stream (FIXTURES.md §3) — stateful-join partner.

    One event per transcript turn that names a tool; ts lands within
    ±60s of the turn's event time.
    """
    t = transcripts.filter(F.col("tool") != "")
    status = F.element_at(
        F.array(F.lit("ok"), F.lit("ok"), F.lit("ok"), F.lit("error"), F.lit("timeout")),
        (F.pmod(_h("conv_id", "turn_idx", seed=seed + 20), F.lit(5)) + 1).cast("int"),
    )
    delta = F.pmod(_h("conv_id", "turn_idx", seed=seed + 21), F.lit(120)) - 60
    return t.select(
        "conv_id", "turn_idx", "tool",
        F.concat_ws("-", "conv_id", "turn_idx", F.lit("call")).alias("call_id"),
        status.alias("status"),
        (F.col("ts") + F.make_interval(secs=delta)).alias("ts"),
    )
