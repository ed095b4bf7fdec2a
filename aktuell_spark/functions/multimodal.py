"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed by Arrow-batched ``mapInPandas``.

Images/audio/video ride as ``binary`` columns next to typed metadata
(mime, width/height, duration). The Spark-side machinery — schema,
partition sizing, UDF signature, batch shape — is real and tested; the
actual codec calls are stubbed (this container ships no image/audio
libs) behind ``decode_stub`` with a deterministic fake, and raise
``NotImplementedError`` when a real codec is requested.

Scale: ``mapInPandas`` streams Arrow batches; binary payloads never
materialize on the driver. Partition sizing for blob tables should be
row-count based (``maxRecordsPerFile`` / salted repartition), not byte
based, because blob sizes dominate row width.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("mime", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("mime", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)

_FEATURE_DIM = 8


def synthesize_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table: payload = repeatable pseudo-random
    bytes derived from (id, seed); mime cycles through image/audio."""
    # size partitions to rows: tiny tables shouldn't pay one Python
    # worker spin-up per core in the downstream mapInPandas
    n_parts = max(1, min(spark.sparkContext.defaultParallelism, n // 64))
    return (
        spark.range(0, n, 1, n_parts)
        .withColumn("media_id", F.col("id"))
        .withColumn(
            "mime",
            F.element_at(
                F.array(F.lit("image/png"), F.lit("audio/wav"), F.lit("video/mp4")),
                (F.pmod(F.col("id"), F.lit(3)) + 1).cast("int"),
            ),
        )
        .withColumn(
            "payload",
            F.unhex(F.repeat(F.substring(F.md5(F.concat(F.col("id"), F.lit(seed))), 1, 16), 8)),
        )
        .withColumn(
            "meta",
            F.create_map(F.lit("source"), F.lit("synthetic"), F.lit("seed"), F.lit(str(seed))),
        )
        .select("media_id", "mime", "payload", "meta")
    )


def decode_stub(payload: bytes, mime: str) -> list[float]:
    """Deterministic fake decode: feature = normalized byte histogram
    over _FEATURE_DIM buckets. Swap for a real codec (PIL/librosa/ffmpeg)
    in production; those imports are intentionally absent here."""
    if payload is None:
        return [0.0] * _FEATURE_DIM
    if not mime.split("/")[0] in ("image", "audio", "video"):
        raise NotImplementedError(f"no codec for mime {mime!r}")
    buckets = [0] * _FEATURE_DIM
    for b in payload:
        buckets[b % _FEATURE_DIM] += 1
    total = max(sum(buckets), 1)
    return [round(b / total, 6) for b in buckets]


def extract_features(df: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Arrow-batched: each pandas batch decodes vectorized-per-row inside
    the worker (the real implementation would call into a native codec
    releasing the GIL). Output drops the payload — features only.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode_stub(p, m) for p, m in zip(pdf["payload"], pdf["mime"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "feature": feats,
                }
            )

    return df.mapInPandas(fn, schema=FEATURE_SCHEMA)
