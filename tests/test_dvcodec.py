"""Deletion-vector codec unit tests — byte-level, no Spark.

The codec implements the PUBLIC Delta formats (PROTOCOL.md
"Deletion Vectors" + RoaringFormatSpec): Z85, portable 32/64-bit
RoaringBitmap, the DV data blob (magic + bitmap) and the DV file
framing (version byte / BE length / blob / BE CRC-32). Foreign
interop is the point, so the tests include hand-built byte
fixtures for the shapes OUR serializer never writes (run
containers, the 12347 cookie) but foreign writers do.
"""

from __future__ import annotations

import struct
import zlib

import pytest

from etl_pipeline_4handling_listings_spark.sources.dvcodec import (
    DV_MAGIC,
    deserialize_dv,
    dv_file_path,
    inline_dv_descriptor,
    load_dv_indexes,
    serialize_dv,
    write_dv_file,
    z85_decode,
    z85_encode,
)


def test_z85_spec_vector():
    # the ZeroMQ spec 32/Z85 reference test case
    data = bytes([0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B])
    assert z85_encode(data) == "HelloWorld"
    assert z85_decode("HelloWorld") == data


def test_z85_padding_roundtrip():
    import os

    for n in list(range(1, 22)) + [16]:
        b = os.urandom(n)
        assert z85_decode(z85_encode(b), n) == b


def test_dv_blob_roundtrip_all_container_shapes():
    cases = [
        [0],
        [0, 1, 5, 65535, 65536],          # two array containers
        list(range(5000)),                 # bitmap container
        [2**33, 2**33 + 7, 3],             # two 64-bit buckets
        list(range(0, 200000, 3)),         # mixed containers
    ]
    for idxs in cases:
        assert deserialize_dv(serialize_dv(idxs)) == sorted(set(idxs))


def test_dv_blob_bad_magic_is_named():
    blob = bytearray(serialize_dv([1, 2]))
    blob[0] ^= 0xFF
    with pytest.raises(ValueError, match="magic"):
        deserialize_dv(bytes(blob))


def _roaring64_with_run_container(runs: list[tuple[int, int]]) -> bytes:
    """Hand-built foreign bytes: one 32-bit bitmap under key 0 using
    the 12347 run cookie — the shape delta-spark/RoaringBitmap java
    writes after runOptimize(), which our serializer never emits."""
    n = 1
    body = bytearray()
    body += struct.pack("<I", 12347 | ((n - 1) << 16))
    body += bytes([0b1])  # container 0 is a run container
    card = sum(length + 1 for _, length in runs)
    body += struct.pack("<HH", 0, card - 1)
    # n < 4 with the run cookie: no offset header
    body += struct.pack("<H", len(runs))
    for start, length in runs:
        body += struct.pack("<HH", start, length)
    return (
        struct.pack("<I", DV_MAGIC) + struct.pack("<q", 1)
        + struct.pack("<i", 0) + bytes(body)
    )


def test_foreign_run_container_decodes():
    blob = _roaring64_with_run_container([(10, 2), (100, 0)])
    assert deserialize_dv(blob) == [10, 11, 12, 100]


def test_dv_file_roundtrip_and_uuid_path(tmp_path):
    d = str(tmp_path)
    desc = write_dv_file(d, [1, 3, 70000], prefix="ab")
    assert desc["storageType"] == "u"
    assert desc["cardinality"] == 3
    # path resolution: last 20 chars are the Z85 uuid
    p = dv_file_path(d, desc["pathOrInlineDv"])
    assert p.startswith(d) and p.endswith(".bin") and "/ab/" in p
    got = load_dv_indexes(
        d, "u", desc["pathOrInlineDv"], desc["offset"], desc["sizeInBytes"]
    )
    assert got == [1, 3, 70000]
    # default offset (1, after the version byte) also resolves
    assert load_dv_indexes(
        d, "u", desc["pathOrInlineDv"], None, desc["sizeInBytes"]
    ) == [1, 3, 70000]


def test_dv_file_crc_mismatch_is_named(tmp_path):
    d = str(tmp_path)
    desc = write_dv_file(d, [5])
    p = dv_file_path(d, desc["pathOrInlineDv"])
    raw = bytearray(open(p, "rb").read())
    raw[-1] ^= 0xFF  # corrupt the checksum
    open(p, "wb").write(bytes(raw))
    with pytest.raises(ValueError, match="checksum"):
        load_dv_indexes(
            d, "u", desc["pathOrInlineDv"], desc["offset"],
            desc["sizeInBytes"],
        )


def test_inline_descriptor_roundtrip():
    desc = inline_dv_descriptor([9, 2**34])
    assert desc["storageType"] == "i"
    got = load_dv_indexes(
        "/nowhere", "i", desc["pathOrInlineDv"], None, desc["sizeInBytes"]
    )
    assert got == [9, 2**34]


def test_multi_dv_file_offsets(tmp_path):
    """A DV file may hold several DVs; each descriptor's offset
    points at its own length field."""
    import os

    d = str(tmp_path)
    blobs = [serialize_dv([1, 2]), serialize_dv([7]), serialize_dv([0, 9])]
    fpath = os.path.join(d, "deletion_vector_multi.bin")
    offsets = []
    with open(fpath, "wb") as f:
        f.write(bytes([1]))
        for blob in blobs:
            offsets.append(f.tell())
            f.write(struct.pack(">i", len(blob)))
            f.write(blob)
            f.write(struct.pack(">I", zlib.crc32(blob) & 0xFFFFFFFF))
    for blob, off, want in zip(
        blobs, offsets, [[1, 2], [7], [0, 9]]
    ):
        got = load_dv_indexes(d, "p", fpath, off, len(blob))
        assert got == want
