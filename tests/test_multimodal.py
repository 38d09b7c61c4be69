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


def test_audio_pcm_synth_decode_matches_formula(spark):
    """The np.frombuffer decode path must reproduce the sample
    formula exactly: peak is an exact integer, RMS the quantized
    sqrt of an exact int64 sum of squares."""
    import math

    from etl_pipeline_4handling_listings_spark.multimodal.binaryops import (
        audio_frame_rms,
        synthesize_pcm16,
    )

    ids = spark.createDataFrame([(3,), (17,)], "item_id BIGINT")
    pcm = synthesize_pcm16(ids, n_samples=128)
    blobs = {r["item_id"]: bytes(r["content"]) for r in pcm.collect()}
    assert all(len(b) == 256 for b in blobs.values())  # int16 LE

    out = audio_frame_rms(pcm, frame_size=64).collect()
    assert len(out) == 4  # 2 items x 2 frames
    for row in out:
        rid, f = row["item_id"], row["frame_index"]
        samples = [
            ((rid * 7919 + i * 31) % 2003) - 1001
            for i in range(f * 64, (f + 1) * 64)
        ]
        assert row["n_samples"] == 64
        assert row["peak"] == max(abs(s) for s in samples)
        rms = math.sqrt(sum(s * s for s in samples) / 64.0)
        assert row["rms"] == math.floor(rms * 1000000 + 0.5) / 1000000


def test_audio_frame_rms_drops_trailing_partial_frame(spark):
    from etl_pipeline_4handling_listings_spark.multimodal.binaryops import (
        audio_frame_rms,
        synthesize_pcm16,
    )

    ids = spark.createDataFrame([(1,)], "item_id BIGINT")
    pcm = synthesize_pcm16(ids, n_samples=100)  # 1 full frame + 36
    out = audio_frame_rms(pcm, frame_size=64).collect()
    assert [r["frame_index"] for r in out] == [0]


def test_audio_frame_rms_odd_length_blob_truncates(spark):
    """ADVICE round-4: an odd-length (truncated/corrupt) blob must
    not fail the job — trim to whole samples, same contract as the
    partial-frame drop."""
    from etl_pipeline_4handling_listings_spark.multimodal.binaryops import (
        audio_frame_rms,
    )

    odd = bytes(range(129))  # 129 bytes -> 64 samples
    pcm = spark.createDataFrame(
        [(1, odd), (2, b"\x01")], "item_id BIGINT, content BINARY"
    )
    out = audio_frame_rms(pcm, frame_size=64).collect()
    # item 1 yields exactly one 64-sample frame; item 2 yields none
    assert [(r["item_id"], r["frame_index"]) for r in out] == [(1, 0)]
    assert out[0]["n_samples"] == 64
