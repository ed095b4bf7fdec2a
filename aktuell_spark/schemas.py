"""Canonical schemas (FIXTURES.md §§1-3; reference envelope:
/root/reference/pkg/models/types.go:10-21)."""

from __future__ import annotations

from pyspark.sql import types as T

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
        # residual dynamic payload: the reference's documents are
        # schemaless (map[string]interface{}, pkg/models/types.go:16);
        # fields outside the fixed transcript columns ride here
        T.StructField("extra", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

CHANGE_SCHEMA = T.StructType(
    [
        T.StructField("seq", T.LongType(), False),
        T.StructField("op", T.StringType(), False),
        T.StructField("database", T.StringType(), True),
        T.StructField("collection", T.StringType(), True),
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("updated_fields", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("removed_fields", T.ArrayType(T.StringType()), True),
        T.StructField("ts", T.TimestampType(), False),
        # residual dynamic payload fields (schemaless document columns
        # beyond the fixed transcript set; delta keys in updated_fields
        # that name no fixed column fold into this map). For a rename
        # marker (op='rename') the target collection travels as
        # extra['to'] (Mongo change-stream 'to' namespace).
        T.StructField("extra", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

TOOL_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("tool", T.StringType(), True),
        T.StructField("call_id", T.StringType(), False),
        T.StructField("status", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), False),
    ]
)
