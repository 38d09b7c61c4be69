"""Delta deletion-vector codec — the PUBLIC on-disk format, pure
Python, no delta-spark.

Implements exactly what the open Delta protocol specifies
(PROTOCOL.md "Deletion Vectors" + the RoaringFormatSpec it points
at), so :func:`deltalog.read_delta` can apply DVs written by ANY
modern Delta client instead of refusing them (the reference
pipeline's curated store enables DVs routinely —
mls_listings_curated.py:321-368 — so adoption of an external table
hits this first):

- **Z85** (ZeroMQ base85, 4-byte blocks -> 5 chars): encodes the
  UUID inside ``pathOrInlineDv`` for ``storageType='u'`` and the
  whole serialized bitmap for ``storageType='i'``.
- **32-bit RoaringBitmap, portable format** (RoaringFormatSpec):
  array / bitmap / run containers, both serial cookies.
- **64-bit portable RoaringBitmap array**: 8-byte LE bitmap count,
  then per bucket a 4-byte LE key + one 32-bit portable bitmap.
- **DV data blob**: 4-byte LE magic ``1681511377`` + the 64-bit
  portable bitmap.
- **DV file framing**: 1 version byte (=1), then per stored DV a
  4-byte BE length, the data blob, and a 4-byte BE CRC-32 of the
  blob. A descriptor's ``offset`` points at the length field.

The write half exists so tests can fabricate foreign DV logs
byte-for-byte and so the store can emit spec DVs later; the read
half is what the foreign-table reader uses. Decode runs on
EXECUTORS (mapInPandas over the descriptor list): total deleted-row
cardinality is data-scale, not metadata-scale, so the driver never
holds the expanded indexes.
"""

from __future__ import annotations

import os
import struct
import uuid as _uuid
import zlib

DV_MAGIC = 1681511377
_FILE_FORMAT_VERSION = 1

_SERIAL_COOKIE_NO_RUN = 12346
_SERIAL_COOKIE = 12347
_NO_OFFSET_THRESHOLD = 4

_Z85_ALPHABET = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_DECODE = {c: i for i, c in enumerate(_Z85_ALPHABET)}


# ---------------------------------------------------------------------
# Z85
# ---------------------------------------------------------------------


def z85_encode(data: bytes) -> str:
    """Z85 over 4-byte big-endian blocks; input is zero-padded to a
    multiple of 4 (the caller trims on decode via the known byte
    length, exactly like Delta's Base85Codec)."""
    if len(data) % 4:
        data = data + b"\x00" * (4 - len(data) % 4)
    out = []
    for i in range(0, len(data), 4):
        (block,) = struct.unpack(">I", data[i : i + 4])
        chars = []
        for _ in range(5):
            chars.append(_Z85_ALPHABET[block % 85])
            block //= 85
        out.extend(reversed(chars))
    return "".join(out)


def z85_decode(text: str, n_bytes: int | None = None) -> bytes:
    if len(text) % 5:
        raise ValueError(
            f"Z85 length {len(text)} is not a multiple of 5"
        )
    out = bytearray()
    for i in range(0, len(text), 5):
        block = 0
        for c in text[i : i + 5]:
            try:
                block = block * 85 + _Z85_DECODE[c]
            except KeyError:
                raise ValueError(
                    f"invalid Z85 character {c!r}"
                ) from None
        out.extend(struct.pack(">I", block))
    return bytes(out[:n_bytes]) if n_bytes is not None else bytes(out)


# ---------------------------------------------------------------------
# 32-bit roaring (portable)
# ---------------------------------------------------------------------


def _serialize_roaring32(values: list[int]) -> bytes:
    """Portable 32-bit serialization; containers are chosen per the
    spec's cardinality rule (array <= 4096 < bitmap) — run
    containers are never WRITTEN (legal: the no-run cookie) but are
    read."""
    containers: dict[int, list[int]] = {}
    for v in sorted(set(values)):
        if not 0 <= v <= 0xFFFFFFFF:
            raise ValueError(f"value {v} out of uint32 range")
        containers.setdefault(v >> 16, []).append(v & 0xFFFF)
    keys = sorted(containers)
    out = bytearray()
    out += struct.pack("<II", _SERIAL_COOKIE_NO_RUN, len(keys))
    for k in keys:
        out += struct.pack("<HH", k, len(containers[k]) - 1)
    # offset header (mandatory for the no-run cookie)
    pos = len(out) + 4 * len(keys)
    for k in keys:
        out += struct.pack("<I", pos)
        card = len(containers[k])
        pos += 2 * card if card <= 4096 else 8192
    for k in keys:
        lows = containers[k]
        if len(lows) <= 4096:
            out += struct.pack(f"<{len(lows)}H", *lows)
        else:
            words = [0] * 1024
            for low in lows:
                words[low >> 6] |= 1 << (low & 63)
            out += struct.pack("<1024Q", *words)
    return bytes(out)


def _deserialize_roaring32(buf: bytes, pos: int) -> tuple[list[int], int]:
    """Returns (sorted values, next position). Reads both cookies
    and all three container types sequentially (the offset header is
    skipped, not trusted)."""
    (cookie,) = struct.unpack_from("<I", buf, pos)
    run_bits = b""
    if (cookie & 0xFFFF) == _SERIAL_COOKIE:
        n = (cookie >> 16) + 1
        pos += 4
        nbytes = (n + 7) // 8
        run_bits = buf[pos : pos + nbytes]
        pos += nbytes
        has_offsets = n >= _NO_OFFSET_THRESHOLD
    elif cookie == _SERIAL_COOKIE_NO_RUN:
        (n,) = struct.unpack_from("<I", buf, pos + 4)
        pos += 8
        has_offsets = True
    else:
        raise ValueError(f"bad roaring cookie {cookie}")
    keys_cards = []
    for _ in range(n):
        k, cm1 = struct.unpack_from("<HH", buf, pos)
        keys_cards.append((k, cm1 + 1))
        pos += 4
    if has_offsets:
        pos += 4 * n  # read sequentially instead
    values: list[int] = []
    for i, (k, card) in enumerate(keys_cards):
        base = k << 16
        is_run = bool(run_bits and (run_bits[i // 8] >> (i % 8)) & 1)
        if is_run:
            (n_runs,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            for _ in range(n_runs):
                start, length = struct.unpack_from("<HH", buf, pos)
                pos += 4
                values.extend(
                    base + v for v in range(start, start + length + 1)
                )
        elif card <= 4096:
            lows = struct.unpack_from(f"<{card}H", buf, pos)
            pos += 2 * card
            values.extend(base + v for v in lows)
        else:
            words = struct.unpack_from("<1024Q", buf, pos)
            pos += 8192
            for wi, w in enumerate(words):
                while w:
                    low = w & -w
                    values.append(base + (wi << 6) + low.bit_length() - 1)
                    w ^= low
    return values, pos


# ---------------------------------------------------------------------
# 64-bit portable array + DV blob
# ---------------------------------------------------------------------


def serialize_dv(indexes: list[int]) -> bytes:
    """Row indexes -> DV data blob (magic + 64-bit portable roaring)."""
    buckets: dict[int, list[int]] = {}
    for v in sorted(set(indexes)):
        if v < 0:
            raise ValueError(f"negative row index {v}")
        buckets.setdefault(v >> 32, []).append(v & 0xFFFFFFFF)
    out = bytearray(struct.pack("<I", DV_MAGIC))
    out += struct.pack("<q", len(buckets))
    for key in sorted(buckets):
        out += struct.pack("<i", key)
        out += _serialize_roaring32(buckets[key])
    return bytes(out)


def deserialize_dv(blob: bytes) -> list[int]:
    """DV data blob -> sorted row indexes."""
    (magic,) = struct.unpack_from("<I", blob, 0)
    if magic != DV_MAGIC:
        raise ValueError(
            f"bad deletion-vector magic {magic} (want {DV_MAGIC})"
        )
    (n,) = struct.unpack_from("<q", blob, 4)
    pos = 12
    values: list[int] = []
    for _ in range(n):
        (key,) = struct.unpack_from("<i", blob, pos)
        pos += 4
        lows, pos = _deserialize_roaring32(blob, pos)
        values.extend((key << 32) + v for v in lows)
    return values


# ---------------------------------------------------------------------
# DV files + descriptors
# ---------------------------------------------------------------------


def write_dv_file(
    table_path: str, indexes: list[int], prefix: str = ""
) -> dict:
    """Write a single-DV file under ``table_path`` in the spec
    layout and return its add.deletionVector descriptor fields
    (storageType 'u')."""
    return write_dv_blob(
        table_path, serialize_dv(indexes), len(set(indexes)), prefix
    )


def write_dv_blob(
    table_path: str, blob: bytes, cardinality: int, prefix: str = ""
) -> dict:
    """Write one ALREADY-SERIALIZED bitmap (``serialize_dv`` output,
    e.g. built on an executor so the index list never lands on the
    driver) as a spec DV file and return its descriptor."""
    u = _uuid.uuid4()
    ddir = os.path.join(table_path, prefix) if prefix else table_path
    os.makedirs(ddir, exist_ok=True)
    fpath = os.path.join(ddir, f"deletion_vector_{u}.bin")
    with open(fpath, "wb") as f:
        f.write(bytes([_FILE_FORMAT_VERSION]))
        offset = f.tell()
        f.write(struct.pack(">i", len(blob)))
        f.write(blob)
        f.write(struct.pack(">I", zlib.crc32(blob) & 0xFFFFFFFF))
    return {
        "storageType": "u",
        "pathOrInlineDv": prefix + z85_encode(u.bytes),
        "offset": offset,
        "sizeInBytes": len(blob),
        "cardinality": cardinality,
    }


def inline_dv_descriptor(indexes: list[int]) -> dict:
    """Descriptor for an INLINE ('i') deletion vector."""
    blob = serialize_dv(indexes)
    return {
        "storageType": "i",
        "pathOrInlineDv": z85_encode(blob),
        "sizeInBytes": len(blob),
        "cardinality": len(set(indexes)),
    }


def dv_file_path(table_path: str, path_or_inline: str) -> str:
    """Resolve a 'u' descriptor to its absolute file path: the last
    20 chars are the Z85 UUID, anything before is the random dir
    prefix."""
    if len(path_or_inline) < 20:
        raise ValueError(
            f"'u' pathOrInlineDv too short: {path_or_inline!r}"
        )
    prefix, enc = path_or_inline[:-20], path_or_inline[-20:]
    u = _uuid.UUID(bytes=z85_decode(enc, 16))
    return os.path.join(table_path, prefix, f"deletion_vector_{u}.bin")


def load_dv_indexes(
    table_path: str,
    storage_type: str,
    path_or_inline: str,
    offset: int | None,
    size_in_bytes: int | None,
) -> list[int]:
    """Decode one descriptor to its row indexes. 'i' decodes the
    Z85 payload directly; 'u' resolves the UUID file under the
    table root; 'p' opens the absolute path. File reads verify the
    length field and the CRC-32 trailer."""
    if storage_type == "i":
        return deserialize_dv(z85_decode(path_or_inline, size_in_bytes))
    if storage_type == "u":
        fpath = dv_file_path(table_path, path_or_inline)
    elif storage_type == "p":
        fpath = path_or_inline
    else:
        raise ValueError(
            f"unknown deletionVector.storageType {storage_type!r}"
        )
    with open(fpath, "rb") as f:
        off = offset if offset is not None else 1  # after version byte
        f.seek(off)
        (length,) = struct.unpack(">i", f.read(4))
        if size_in_bytes is not None and length != size_in_bytes:
            raise ValueError(
                f"DV length field {length} != descriptor sizeInBytes "
                f"{size_in_bytes} at {fpath}:{off}"
            )
        blob = f.read(length)
        (crc,) = struct.unpack(">I", f.read(4))
        if zlib.crc32(blob) & 0xFFFFFFFF != crc:
            raise ValueError(f"DV checksum mismatch at {fpath}:{off}")
    return deserialize_dv(blob)
