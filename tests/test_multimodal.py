"""Tests for the multimodal binary-column plumbing (stubbed decode)."""

from __future__ import annotations

import hashlib

from etl_pipeline_4handling_listings_spark.multimodal import (
    attach_binary_metadata,
    decode_images,
    sample_video_frames,
)

PNG = b"\x89PNG\r\n\x1a\n" + b"\x00" * 32
JPEG = b"\xff\xd8\xff\xe0" + b"\x11" * 16
NOISE = b"\x01\x02\x03\x04\x05"


def _df(spark):
    return spark.createDataFrame(
        [(1, bytearray(PNG)), (2, bytearray(JPEG)), (3, bytearray(NOISE)), (4, None)],
        "item_id INT, content BINARY",
    )


def test_attach_binary_metadata(spark):
    out = {r["item_id"]: r for r in attach_binary_metadata(_df(spark)).collect()}
    assert out[1]["content_format"] == "png"
    assert out[2]["content_format"] == "jpeg"
    assert out[3]["content_format"] == "unknown"
    assert out[1]["content_size"] == len(PNG)
    assert out[1]["content_sha256"] == hashlib.sha256(PNG).hexdigest()
    assert out[4]["content_size"] is None


def test_decode_images_stub_deterministic(spark):
    from etl_pipeline_4handling_listings_spark.multimodal.binaryops import (
        _decode_stub,
    )

    # pin the stub so the assertion holds whether or not Pillow is
    # installed; default_decoder dispatch is covered separately
    out = decode_images(_df(spark), batch_partitions=2, decoder=_decode_stub).collect()
    assert len(out) == 4
    again = decode_images(
        _df(spark), batch_partitions=2, decoder=_decode_stub
    ).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
    by_id = {r["item_id"]: r for r in out}
    assert 64 <= by_id[1]["width"] < 256
    assert by_id[1]["channels"] in (1, 3)
    assert 0.0 <= by_id[1]["mean_luma"] <= 1.0


def test_decode_images_default_and_injected_decoder(spark):
    import etl_pipeline_4handling_listings_spark.multimodal.binaryops as b

    # default path runs with whatever decoder resolved at import
    # (Pillow if installed, stub otherwise) — same schema either way
    out = decode_images(_df(spark)).collect()
    assert len(out) == 4
    assert set(out[0].asDict()) == {
        "item_id", "width", "height", "channels", "mean_luma",
    }
    if b._PILImage is not None:
        # with Pillow, a real 1x1 PNG must decode to true dimensions
        import io

        img = b._PILImage.new("RGB", (5, 7))
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        df = spark.createDataFrame(
            [(1, bytearray(buf.getvalue()))], "item_id INT, content BINARY"
        )
        row = decode_images(df).collect()[0]
        assert (row["width"], row["height"]) == (5, 7)

    # injection: any bytes -> features callable plugs in
    fixed = decode_images(
        _df(spark), decoder=lambda content: (1, 2, 3, 0.5)
    ).collect()
    assert all((r["width"], r["height"], r["channels"]) == (1, 2, 3) for r in fixed)


def test_sample_video_frames_fanout(spark):
    out = sample_video_frames(_df(spark), num_frames=3).collect()
    assert len(out) == 12  # 4 items x 3 frames
    frames = [r for r in out if r["item_id"] == 1]
    assert sorted(r["frame_index"] for r in frames) == [0, 1, 2]
    assert len({r["frame_sha256"] for r in frames}) == 3
