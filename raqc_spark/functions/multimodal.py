"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as ``binary`` columns with a typed
metadata struct; decode / feature-extract run as Arrow-batched pandas UDFs
over ``mapInPandas``. The decode step itself is STUBBED in this container
(no image/audio libs — round rules) behind ``HAVE_CODECS``: with libs absent
a deterministic fake feature vector is derived from the payload bytes, so
the Spark-side plumbing (schema, batching, partitioning) is fully real and
tested while the codec call is the only swap-in point.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # pragma: no cover - not present in this container
    import PIL.Image  # noqa: F401

    HAVE_CODECS = True
except Exception:
    HAVE_CODECS = False

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("media_type", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def documents_as_media(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Treat utf-8 text payloads as opaque binary media — the schema/partition
    shape is identical for real image/audio bytes."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.lit("text/plain").alias("media_type"),
        F.octet_length(F.col(text_col)).cast("long").alias("n_bytes"),
    )


def media_as_code_table(media: DataFrame) -> DataFrame:
    """Map a MEDIA_SCHEMA frame onto the engine's code-table shape so the
    ENTIRE contract machinery (run_contract, checkpoint/resume, verdict
    sinks) runs over media tables unchanged (VERDICT r3 task 6):

    - ``repo``    <- media_type  (the partitioning dimension: verdicts
      roll up per media type, the analogue of per-repo)
    - ``path``    <- media/<media_id>
    - ``commit``  <- constant snapshot tag (media tables are single-version)
    - ``lang``    <- media_type  (the default media_bounds type_col)
    - ``content`` <- payload     (binary; length() counts BYTES on binary,
      so the derived content_length is the true payload size)
    """
    return media.select(
        F.col("media_type").alias("repo"),
        F.concat(F.lit("media/"), F.col("media_id").cast("string")).alias(
            "path"
        ),
        F.lit("snapshot").alias("commit"),
        F.col("media_type").alias("lang"),
        F.col("payload").alias("content"),
    )


def default_media_contract(
    min_bytes: int = 1,
    max_bytes: int = 10_000_000,
    allowed_types: tuple[str, ...] = (
        "text/plain", "image/png", "image/jpeg", "audio/wav", "video/mp4",
    ),
):
    """Contract for a media table mapped through ``media_as_code_table``:
    payload presence/size bounds + media-type allow-list (media_bounds,
    fused into the one-scan stats pass) plus the generic integrity checks
    that make sense for single-version media (nulls, uniqueness)."""
    from raqc_spark.contract import Check, Contract, PartitionSpec, Threshold

    return Contract(
        checks=(
            Check("schema", "schema"),
            Check("media_payload_bounds", "media_bounds", column="content",
                  threshold=Threshold("le", 0.0),
                  params=(("min_bytes", min_bytes),
                          ("max_bytes", max_bytes),
                          ("type_col", "lang"),
                          ("allowed_types", allowed_types))),
            Check("null_rate_payload", "null_rate", column="content",
                  threshold=Threshold("le", 0.0)),
            Check("uniqueness", "uniqueness",
                  params=(("keys", ("repo", "path")),)),
        ),
        partition_spec=PartitionSpec(key="repo", num_partitions=4),
        # content is BINARY here; the schema check asserts string types, so
        # it covers the metadata columns and media_bounds owns the payload
        schema_columns=("repo", "path", "commit", "lang"),
    )


def _decode_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Arrow batch -> features. Real codec path gated on HAVE_CODECS."""
    if HAVE_CODECS:  # pragma: no cover
        raise NotImplementedError(
            "real image/audio decode not wired in this container"
        )
    feats = []
    for payload in pdf["payload"]:
        if payload is None:
            feats.append(None)
            continue
        b = bytes(payload)
        # deterministic fake 8-dim feature from byte statistics
        feats.append(
            [
                float(len(b)),
                float(b[0]) if b else 0.0,
                float(b[-1]) if b else 0.0,
                float(sum(b[:64]) % 997),
                float(min(b) if b else 0),
                float(max(b) if b else 0),
                float(len(set(b[:256]))),
                float((len(b) * 2654435761) % 1000003),
            ]
        )
    return pd.DataFrame(
        {
            "media_id": pdf["media_id"],
            "n_bytes": pdf["n_bytes"],
            "feature": feats,
        }
    )


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_payload", T.BinaryType(), True),
    ]
)


def sample_frames(
    media: DataFrame, num_frames: int = 4, batch_rows: int = 256
) -> DataFrame:
    """Frame sampling (video analogue): emit ``num_frames`` evenly-spaced
    frames per media row via ``mapInPandas`` — a 1->N Arrow-batched expansion,
    the exact plumbing a video decoder needs. Codec-gated like decode: with
    no codec libs, a frame is a deterministic byte slice of the payload.
    Scale note: output fan-out is num_frames×rows; repartition downstream if
    frames feed a shuffle, and never collect payload columns."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                ids, idxs, frames = [], [], []
                for mid, payload in zip(chunk["media_id"], chunk["payload"]):
                    if payload is None:
                        continue
                    if HAVE_CODECS:  # pragma: no cover
                        raise NotImplementedError(
                            "real video frame decode not wired in this container"
                        )
                    b = bytes(payload)
                    step = max(1, len(b) // num_frames)
                    for i in range(num_frames):
                        ids.append(mid)
                        idxs.append(i)
                        frames.append(b[i * step : i * step + min(64, step)])
                yield pd.DataFrame(
                    {"media_id": ids, "frame_idx": idxs, "frame_payload": frames}
                )

    return media.mapInPandas(run, schema=FRAME_SCHEMA)


def resize_media(media: DataFrame, target_bytes: int = 256) -> DataFrame:
    """Resize plumbing (image analogue): payload -> bounded-size payload.
    With codecs absent this is a deterministic truncation; the schema,
    Arrow batching and column shapes match a real thumbnailer."""
    if HAVE_CODECS:  # pragma: no cover
        raise NotImplementedError(
            "real image resize not wired in this container"
        )
    # pure Column expr fallback — no Python at all for the stub
    return media.withColumn(
        "payload", F.substring(F.col("payload"), 1, target_bytes)
    ).withColumn("n_bytes", F.least(F.col("n_bytes"), F.lit(target_bytes).cast("long")))


def extract_features(media: DataFrame, batch_rows: int = 1024) -> DataFrame:
    """mapInPandas feature extraction — Arrow-batched, partition-parallel.
    At scale, repartition upstream so each task holds O(batch) payloads in
    memory (payloads are the wide column; never groupBy them)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                yield _decode_batch(pdf.iloc[start : start + batch_rows])

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)
