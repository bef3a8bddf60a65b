"""Multimodal (image/audio/video) column plumbing (SURVEY §2.D).

Media travel as opaque ``binary`` columns (the agnostic type system has
first-class ``binary`` — reference ``glue_spark_dict.json:34-37``) next to a
typed metadata struct. Decode/feature-extraction runs as Arrow-batched
``mapInPandas`` so bytes never round-trip through Python row-at-a-time.

The actual codec step is STUBBED (no image/audio libraries in this
environment): ``decode_fn=None`` uses a deterministic fake decoder so the
Spark-side plumbing — schema, batch shape, partition sizing — is real and
testable. Swap in a real decoder (PIL/librosa/ffmpeg) via ``decode_fn``.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator
from typing import TYPE_CHECKING

from pyspark.sql import functions as F
from pyspark.sql import types as T

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd
    from pyspark.sql import DataFrame

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content_sha256", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def _fake_decode(content: bytes, feature_dim: int) -> list[float]:
    """Deterministic stand-in for a real decoder: hashes the bytes into a
    unit-scale feature vector. Replace with a real codec in production."""
    if content is None:
        return [0.0] * feature_dim
    digest = hashlib.sha256(content).digest()
    raw = (digest * ((feature_dim * 4) // len(digest) + 1))[: feature_dim * 4]
    return [
        int.from_bytes(raw[i * 4 : i * 4 + 4], "big") / float(0xFFFFFFFF)
        for i in range(feature_dim)
    ]


def extract_features(
    df: "DataFrame",
    feature_dim: int = 16,
    decode_fn: Callable[[bytes], list[float]] | None = None,
    batch_hint: int | None = None,
) -> "DataFrame":
    """binary column → feature vectors via Arrow-batched ``mapInPandas``.

    Scale notes: batches arrive as Arrow record batches (no per-row Python
    overhead); media bytes are large, so upstream partitions should be sized
    by bytes not rows — use ``df.repartition(n)`` with
    ``spark.sql.files.maxPartitionBytes`` tuned down for media tables.
    """
    import pandas as pd  # local import: executors need it, driver may not

    decode = decode_fn or (lambda b: _fake_decode(b, feature_dim))

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "content_sha256": [
                        hashlib.sha256(b).hexdigest() if b is not None else None
                        for b in pdf["content"]
                    ],
                    "n_bytes": [len(b) if b is not None else 0 for b in pdf["content"]],
                    "feature": [decode(b) for b in pdf["content"]],
                }
            )

    return df.mapInPandas(batches, schema=FEATURE_SCHEMA)


def media_stats(df: "DataFrame") -> "DataFrame":
    """JVM-side stats over the binary column — no Python needed for sizing/
    fingerprinting (md5/length are built-ins that accept binary)."""
    return df.select(
        "media_id",
        F.length("content").alias("n_bytes"),
        F.md5("content").alias("content_md5"),
        F.col("meta.mime").alias("mime"),
    )


def synthetic_media(spark, n: int = 64) -> "DataFrame":
    """Deterministic fake media table for tests (no media libs needed)."""
    rows = []
    for i in range(n):
        payload = hashlib.sha256(f"media-{i}".encode()).digest() * (i % 5 + 1)
        rows.append(
            (
                i,
                bytearray(payload),
                {"mime": "image/fake", "width": 64 + i, "height": 64, "duration_ms": None},
            )
        )
    # size partitions to the data: a tiny table spread over local[32]'s 32
    # default slices would spin up one Python worker per ~2 rows in
    # mapInPandas — batch shape matters as much as code (see module doc)
    return spark.createDataFrame(rows, MEDIA_SCHEMA).coalesce(max(1, n // 16))
