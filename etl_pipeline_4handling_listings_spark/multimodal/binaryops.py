"""Multimodal columns: images/audio/video as opaque binary + metadata.

Design for a 100 TB multimodal pipeline:

- content rides in a ``binary`` column (parquet BYTE_ARRAY — scans
  prune it unless projected);
- cheap metadata (size, magic-byte format sniff, content hash) is
  computed JVM-side with built-in expressions — no Python touches
  the bytes;
- decode / feature-extract runs as Arrow-batched ``mapInPandas``
  so bytes cross to Python once per batch, partitions bound memory.

The actual pixel/sample decode is STUBBED: codec libraries (PIL,
ffmpeg, torchaudio) are not in this container. The stub is
deterministic (dimensions derived from a stable content hash) so
the Spark-side plumbing — schemas, batching, partition sizing,
UDF signatures — is real and testable; swap ``_decode_stub`` for a
real decoder in production (marked below).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# magic-byte prefixes → format label (hex, uppercase)
_MAGIC = {
    "89504E47": "png",
    "FFD8FF": "jpeg",
    "47494638": "gif",
    "52494646": "riff",  # wav/avi container
    "00000018": "mp4",
    "00000020": "mp4",
    "494433": "mp3",
}


def sniff_format(content: Column) -> Column:
    """Format label from magic bytes — pure JVM expression."""
    head = F.upper(F.hex(F.substring(content, 1, 4)))
    expr = F.lit("unknown")
    for magic, label in sorted(_MAGIC.items(), key=lambda kv: -len(kv[0])):
        expr = F.when(head.startswith(magic), F.lit(label)).otherwise(expr)
    return expr


def attach_binary_metadata(
    df: DataFrame, content_col: str = "content"
) -> DataFrame:
    """Append size/format/hash metadata columns, all JVM-side."""
    c = F.col(content_col)
    return df.select(
        "*",
        F.length(c).alias(f"{content_col}_size"),
        sniff_format(c).alias(f"{content_col}_format"),
        F.sha2(c, 256).alias(f"{content_col}_sha256"),
    )


IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("mean_luma", T.DoubleType()),
    ]
)


def _decode_stub(content: bytes) -> tuple[int, int, int, float]:
    """Deterministic stand-in for a real image decode.

    PRODUCTION: replace with e.g.
        from PIL import Image; img = Image.open(io.BytesIO(content))
    Dimensions/luma here derive from a stable content hash so tests
    are reproducible without codec libraries.
    """
    h = hashlib.sha256(content or b"").digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    channels = 3 if h[2] % 4 else 1
    mean_luma = round(h[3] / 255.0, 6)
    return width, height, channels, mean_luma


def decode_images(
    df: DataFrame,
    id_col: str = "item_id",
    content_col: str = "content",
    batch_partitions: int | None = None,
) -> DataFrame:
    """Decode image bytes → feature columns via Arrow-batched
    ``mapInPandas``. Output: (id, width, height, channels, mean_luma).

    ``batch_partitions`` bounds per-task memory the same way the
    reference sizes its API batches (transform.py:504-520) — at
    100 TB you size it so each partition's binary payload fits the
    executor's Arrow buffer budget.
    """
    src = df.select(id_col, content_col)
    if batch_partitions:
        src = src.repartition(batch_partitions)
    out_schema = T.StructType(
        [src.schema[id_col]] + list(IMAGE_FEATURES_SCHEMA.fields)
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            feats = [
                _decode_stub(bytes(b) if b is not None else b"")
                for b in pdf[content_col]
            ]
            fdf = pd.DataFrame(
                feats, columns=["width", "height", "channels", "mean_luma"]
            )
            fdf.insert(0, id_col, pdf[id_col].values)
            yield fdf

    return src.mapInPandas(run, schema=out_schema)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("frame_index", T.IntegerType()),
        T.StructField("frame_sha256", T.StringType()),
    ]
)


def sample_video_frames(
    df: DataFrame,
    num_frames: int = 4,
    id_col: str = "item_id",
    content_col: str = "content",
) -> DataFrame:
    """One row per sampled frame via ``mapInPandas`` fan-out
    (UDTF-shaped: input row → num_frames output rows).

    PRODUCTION: replace the hash-sliced stub with an ffmpeg/pyav
    keyframe extractor; the row-explosion plumbing stays identical.
    """
    src = df.select(id_col, content_col)
    out_schema = T.StructType([src.schema[id_col]] + list(FRAME_SCHEMA.fields))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for rid, content in zip(pdf[id_col], pdf[content_col]):
                data = bytes(content) if content is not None else b""
                for i in range(num_frames):
                    frame = hashlib.sha256(data + i.to_bytes(4, "big")).hexdigest()
                    rows.append((rid, i, frame))
            yield pd.DataFrame(rows, columns=[id_col, "frame_index", "frame_sha256"])

    return src.mapInPandas(run, schema=out_schema)
