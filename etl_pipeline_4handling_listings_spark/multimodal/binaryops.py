"""Multimodal columns: images/audio/video as opaque binary + metadata.

Design for a 100 TB multimodal pipeline:

- content rides in a ``binary`` column (parquet BYTE_ARRAY — scans
  prune it unless projected);
- cheap metadata (size, magic-byte format sniff, content hash) is
  computed JVM-side with built-in expressions — no Python touches
  the bytes;
- decode / feature-extract runs as Arrow-batched ``mapInPandas``
  so bytes cross to Python once per batch, partitions bound memory.

Pixel decode is an optional dependency: when Pillow imports, image
bytes are decoded for real (``_decode_pil``); otherwise a
deterministic stub (dimensions derived from a stable content hash)
keeps the Spark-side plumbing — schemas, batching, partition
sizing, UDF signatures — real and testable without codec
libraries. ffmpeg/torchaudio (video/audio) stay stub-only.
"""

from __future__ import annotations

import hashlib
import io
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # optional codec dependency — absent in this container
    from PIL import Image as _PILImage
except ImportError:
    _PILImage = None

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
    """Deterministic stand-in for a real image decode (no Pillow).

    Dimensions/luma derive from a stable content hash so tests are
    reproducible without codec libraries.
    """
    h = hashlib.sha256(content or b"").digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    channels = 3 if h[2] % 4 else 1
    mean_luma = round(h[3] / 255.0, 6)
    return width, height, channels, mean_luma


def _decode_pil(content: bytes) -> tuple[int, int, int, float]:
    """Real decode via Pillow: dimensions + mean luminance."""
    img = _PILImage.open(io.BytesIO(content))
    channels = len(img.getbands())
    luma = img.convert("L")
    hist = luma.histogram()
    total = sum(hist)
    mean = sum(i * c for i, c in enumerate(hist)) / total / 255.0 if total else 0.0
    return img.width, img.height, channels, round(mean, 6)


#: active decoder — Pillow when importable, deterministic stub otherwise
default_decoder = _decode_pil if _PILImage is not None else _decode_stub


def decode_images(
    df: DataFrame,
    id_col: str = "item_id",
    content_col: str = "content",
    batch_partitions: int | None = None,
    decoder=None,
) -> DataFrame:
    """Decode image bytes → feature columns via Arrow-batched
    ``mapInPandas``. Output: (id, width, height, channels, mean_luma).

    ``decoder``: ``bytes -> (w, h, channels, mean_luma)``; defaults
    to :data:`default_decoder` (Pillow when installed, else the
    deterministic stub).

    ``batch_partitions`` bounds per-task memory the same way the
    reference sizes its API batches (transform.py:504-520) — at
    100 TB you size it so each partition's binary payload fits the
    executor's Arrow buffer budget.
    """
    decode = decoder if decoder is not None else default_decoder
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
                decode(bytes(b) if b is not None else b"")
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
                    # ASCII frame tag (not raw index bytes) so the
                    # signature is reproducible from any engine's
                    # UTF-8 string hash — see the mm_frame_sample
                    # DuckDB oracle
                    frame = hashlib.sha256(
                        data + f"#frame{i}".encode()
                    ).hexdigest()
                    rows.append((rid, i, frame))
            yield pd.DataFrame(rows, columns=[id_col, "frame_index", "frame_sha256"])

    return src.mapInPandas(run, schema=out_schema)


# ---------------------------------------------------------------------
# Audio: PCM frame features (the torchaudio/soundfile batch shape)
# ---------------------------------------------------------------------

AUDIO_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("frame_index", T.IntegerType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("peak", T.LongType()),
        T.StructField("rms", T.DoubleType()),
    ]
)


def synthesize_pcm16(
    df: DataFrame,
    n_samples: int = 320,
    id_col: str = "item_id",
) -> DataFrame:
    """Deterministic 16-bit little-endian PCM synth per item.

    Sample formula ``s[i] = ((id*7919 + i*31) % 2003) - 1001`` —
    pure integer arithmetic any engine can replay, so downstream
    decode kernels are hash-certifiable without codec libraries.
    Stands in for reading real audio bytes from object storage; the
    binary column shape (one blob per row) is identical.
    """
    import numpy as np

    src = df.select(id_col)
    out_schema = T.StructType(
        [src.schema[id_col], T.StructField("content", T.BinaryType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        idx = np.arange(n_samples, dtype=np.int64)
        for pdf in batches:
            if pdf.empty:
                continue
            blobs = [
                ((int(rid) * 7919 + idx * 31) % 2003 - 1001)
                .astype("<i2")
                .tobytes()
                for rid in pdf[id_col]
            ]
            yield pd.DataFrame({id_col: pdf[id_col].values, "content": blobs})

    return src.mapInPandas(run, schema=out_schema)


def audio_frame_rms(
    df: DataFrame,
    frame_size: int = 64,
    id_col: str = "item_id",
    content_col: str = "content",
) -> DataFrame:
    """Decode 16-bit LE PCM bytes -> fixed-size frame features
    (peak amplitude, RMS) via Arrow-batched ``mapInPandas``.

    The decode (``np.frombuffer``) and the per-frame reduction are
    the exact batch shape a real loudness / VAD / silence-trim
    stage runs at 100 TB: bytes cross to Python once per Arrow
    batch, frames never materialize as rows JVM-side. Integer
    sum-of-squares (exact in int64), one double division + sqrt,
    RMS quantized on the 1e-6 grid (portable-rounding convention).
    PRODUCTION: swap ``np.frombuffer`` for soundfile/ffmpeg decode;
    the plumbing, schema, and partition sizing stay identical.
    """
    import numpy as np

    src = df.select(id_col, content_col)
    out_schema = T.StructType(
        [src.schema[id_col]] + list(AUDIO_FRAME_SCHEMA.fields)
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for rid, content in zip(pdf[id_col], pdf[content_col]):
                data = bytes(content) if content is not None else b""
                # truncated/corrupt blobs may be odd-length; trim to
                # a whole number of 16-bit samples instead of letting
                # np.frombuffer raise and fail the whole job — same
                # semantics as the tested partial-frame drop
                data = data[: len(data) // 2 * 2]
                samples = np.frombuffer(data, dtype="<i2").astype(np.int64)
                for f in range(0, len(samples) // frame_size):
                    fr = samples[f * frame_size : (f + 1) * frame_size]
                    sumsq = int((fr * fr).sum())
                    rms = float(np.sqrt(sumsq / float(frame_size)))
                    rms = float(np.floor(rms * 1000000 + 0.5) / 1000000)
                    rows.append(
                        (rid, f, len(fr), int(np.abs(fr).max()), rms)
                    )
            yield pd.DataFrame(
                rows,
                columns=[id_col, "frame_index", "n_samples", "peak", "rms"],
            )

    return src.mapInPandas(run, schema=out_schema)
