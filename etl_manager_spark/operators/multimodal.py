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
    """Deterministic stand-in for a real decoder: hashes the content into a
    feature vector. Replace with a real codec in production.

    Stub-design notes (both choices exist so the driver's DuckDB oracle can
    reproduce the stub exactly in SQL):
    * hashes the lowercase-hex rendering of the bytes, not the raw bytes —
      DuckDB's sha256() is VARCHAR-only;
    * maps each 32-bit word u into [0.5, 1) via ``0.5 + u / 2^33`` — in that
      range both engines JSON-print the (float32-rounded) value as the same
      plain shortest-round-trip decimal; values near 0 would hit the
      engines' differing scientific-notation styles (``1.0E-9`` vs
      ``1e-9``)."""
    if content is None:
        # missing payload → NULL feature (not a fabricated zero vector:
        # every NULL-content row would become a perfect similarity match
        # of every other, while n_bytes correctly reports NULL)
        return None
    digest_hex = hashlib.sha256(content.hex().encode()).hexdigest()
    raw = (digest_hex * ((feature_dim * 8) // len(digest_hex) + 1))[: feature_dim * 8]
    return [
        0.5 + int(raw[i * 8 : i * 8 + 8], 16) / float(2**33)
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
                    # NULL content → NULL n_bytes (not 0): matches
                    # media_stats' LENGTH(content) semantics, so the two
                    # paths agree and 0-byte real payloads stay
                    # distinguishable from missing ones
                    "n_bytes": [
                        len(b) if b is not None else None for b in pdf["content"]
                    ],
                    # NULL content never reaches the decoder: real
                    # codecs (PIL/librosa/ffmpeg) crash on None, and the
                    # SQL convention is NULL-in → NULL-out
                    "feature": [
                        decode(b) if b is not None else None
                        for b in pdf["content"]
                    ],
                }
            )

    return df.mapInPandas(batches, schema=FEATURE_SCHEMA)


def media_stats(df: "DataFrame", fingerprint: str = "md5") -> "DataFrame":
    """JVM-side stats over the binary column — no Python needed for sizing/
    fingerprinting (md5/length/hex are built-ins that accept binary).

    ``fingerprint="md5"`` hashes the raw bytes (canonical);
    ``fingerprint="hex_md5"`` hashes the lowercase-hex rendering instead —
    same discriminating power, but computable by engines whose hash
    functions are string-only (DuckDB md5() takes VARCHAR, not BLOB), which
    is what the oracle-checked workload uses."""
    if fingerprint == "md5":
        fp = F.md5("content")
    elif fingerprint == "hex_md5":
        fp = F.md5(F.lower(F.hex("content")))
    else:
        raise ValueError(f"unknown fingerprint mode: {fingerprint!r}")
    return df.select(
        "media_id",
        F.length("content").alias("n_bytes"),
        fp.alias("content_md5"),
        F.col("meta.mime").alias("mime"),
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def _fake_resize(content: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in for a real resampler: stretches a sha256
    stream of the source content to the target raster size (w·h·3 RGB
    bytes). Replace via ``resize_fn``. Hashes the lowercase-hex rendering
    of the bytes (not the raw bytes) so the DuckDB oracle — whose sha256()
    is VARCHAR-only — can reproduce the stub in SQL."""
    if content is None:
        return None
    need = width * height * 3
    digest = hashlib.sha256(content.hex().encode()).digest()
    return (digest * (need // len(digest) + 1))[:need]


def resize_media(
    df: "DataFrame",
    width: int,
    height: int,
    resize_fn: Callable[[bytes, int, int], bytes] | None = None,
) -> "DataFrame":
    """binary → binary resize via Arrow-batched ``mapInPandas``. The codec
    is stubbed (``_fake_resize``); the Spark side — schema, batch shape,
    bytes-sized partitioning — is the part that matters here and is real.
    Output partitions carry w·h·3 bytes per row: repartition upstream so a
    task's output stays well under executor memory at the target size."""
    import pandas as pd

    resize = resize_fn or _fake_resize

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "content": [
                        resize(b, width, height) if b is not None else None
                        for b in pdf["content"]
                    ],
                    "width": width,
                    "height": height,
                }
            )

    return df.mapInPandas(batches, schema=RESIZED_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("ts_ms", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(
    df: "DataFrame",
    every_ms: int = 1000,
    decode_frame_fn: Callable[[bytes, int], bytes] | None = None,
) -> "DataFrame":
    """Video frame sampling: one input row fans out to one row per sampled
    timestamp (0, every_ms, … < meta.duration_ms) — the 1→N batch shape a
    real ffmpeg-backed sampler needs, with the frame decode stubbed
    deterministically (sha256 of ``hex(content) ‖ ':' ‖ frame_idx`` — hex
    not raw bytes so DuckDB's VARCHAR-only sha256 can reproduce it).
    Rows without a duration (stills) yield no frames.

    Scale: fan-out multiplies rows by duration/every_ms — repartition
    BEFORE sampling so the post-explosion partitions stay bounded, and
    filter on meta.duration_ms early (pushed to the scan)."""
    import pandas as pd

    def fake_frame(content: bytes, idx: int) -> bytes:
        return hashlib.sha256(f"{(content or b'').hex()}:{idx}".encode()).digest()

    decode = decode_frame_fn or fake_frame

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            ids, idxs, tss, frames = [], [], [], []
            for mid, content, meta in zip(
                pdf["media_id"], pdf["content"], pdf["meta"]
            ):
                duration = meta.get("duration_ms") if meta is not None else None
                if duration is None:
                    continue
                for i, ts in enumerate(range(0, int(duration), every_ms)):
                    ids.append(mid)
                    idxs.append(i)
                    tss.append(ts)
                    frames.append(
                        decode(content, i) if content is not None else None
                    )
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "ts_ms": tss, "frame": frames}
            )

    return df.mapInPandas(batches, schema=FRAME_SCHEMA)


def perceptual_hash(df: "DataFrame", bits: int = 16) -> "DataFrame":
    """Per-media perceptual-hash bits from the (stubbed) decoded features —
    the image-dedup primitive: a real deployment thresholds DCT
    coefficients (pHash); here each of ``bits`` fake-decoded feature words
    votes its high bit, preserving the property that matters for the
    PLUMBING: similar decodes → small Hamming distance, and the whole
    computation is JVM-side column arithmetic (sha2/substring/conv — no
    Python), so it pipelines inside the scan and any engine reproduces it.

    Bit j is set iff feature word j ≥ 2³¹ — i.e. the fake-decode value
    0.5 + u/2³³ exceeds 0.75 — so the hash is exactly reproducible from
    the hex stream in SQL. Returns (media_id, phash long).

    Feed the result to ``operators.dedup.hamming_near_dup_pairs`` for the
    banded near-dup join (never all-pairs)."""
    raw = F.substring(
        F.repeat(F.sha2(F.lower(F.hex("content")), 256), (bits * 8) // 64 + 1),
        1,
        bits * 8,
    )
    bit_terms = [
        F.when(
            F.conv(F.substring(raw, 8 * j + 1, 8), 16, 10).cast("long")
            >= F.lit(2**31),
            F.lit(1 << j).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
        for j in range(bits)
    ]
    phash = bit_terms[0]
    for t in bit_terms[1:]:
        phash = phash + t
    # NULL content → NULL phash (each when() condition is NULL and would
    # fall through to otherwise(0), making every missing payload a
    # Hamming-0 clique member in the downstream dedup join)
    phash = F.when(F.col("content").isNotNull(), phash)
    return df.select("media_id", phash.alias("phash"))


def synthetic_media(spark, n: int = 64) -> "DataFrame":
    """Deterministic fake media table for tests (no media libs needed):
    every third row is a fake video with a duration, the rest are stills.

    Generated entirely JVM-side (``range`` + sha2/repeat/unhex): the
    payload is sha256("media-{i}") repeated (i%5+1) times, identical
    bytes to the hashlib construction but with no local-collection
    pickling — ``createDataFrame`` with binary+struct rows takes the
    pickled-RDD path and spins Python workers just to materialize the
    table (~1.8 s per execution for 64 rows, re-paid by every consumer
    of this un-cacheable local plan)."""
    i = F.col("id")
    is_video = i % 3 == 0
    return (
        spark.range(n)
        .select(
            F.col("id").alias("media_id"),
            F.expr(
                "unhex(repeat(sha2(concat('media-', CAST(id AS STRING)), 256),"
                " CAST(id % 5 + 1 AS INT)))"
            ).alias("content"),
            F.struct(
                F.when(is_video, F.lit("video/fake"))
                .otherwise("image/fake")
                .alias("mime"),
                (F.lit(64) + i).cast("int").alias("width"),
                F.lit(64).cast("int").alias("height"),
                F.when(is_video, F.lit(2500) + F.lit(1000) * (i % 4))
                .cast("int")
                .alias("duration_ms"),
            ).alias("meta"),
        )
        # size partitions to the data: a tiny table spread over local[32]'s
        # 32 default slices would spin up one Python worker per ~2 rows in
        # mapInPandas — batch shape matters as much as code (see module doc)
        .coalesce(max(1, n // 16))
    )
