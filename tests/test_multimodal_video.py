"""Real stdlib AVI codec (operators/multimodal.py, round 9): RIFF
encode/decode round-trip, DIB stride/bottom-up reconstruction pinned
against hand-built containers (including top-down negative-height and
odd-size-chunk variants our writer never emits), the decode_media video
branch and frame-sampled features end-to-end on Spark, and the loud
NotImplementedError for compressed/non-8-bit AVIs."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from cernbox_migration_database_spark.operators import multimodal as M


def _rand_frames(n, h, w, seed):
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 256, (h, w)).astype(np.uint8) for _ in range(n)]


def test_avi_round_trip_exact_with_stride_padding():
    # w=5 forces a 3-byte row pad (stride 8) — the decoder must drop it
    frames = _rand_frames(4, 3, 5, 11)
    w, h, usec, out = M._avi_decode(M._avi_encode(frames))
    assert (w, h, usec, len(out)) == (5, 3, 100000, 4)
    for a, b in zip(frames, out):
        assert np.array_equal(a, b)
    # stride-free width (multiple of 4) and a single degenerate 1x1 frame
    frames = _rand_frames(2, 2, 8, 12)
    assert np.array_equal(M._avi_decode(M._avi_encode(frames))[3][1], frames[1])
    one = [np.array([[77]], dtype=np.uint8)]
    assert np.array_equal(M._avi_decode(M._avi_encode(one))[3][0], one[0])


def test_avi_frames_stored_bottom_up_on_the_wire():
    """DIB rows are written bottom-up: the first stored row of the first
    movi chunk must be the image's LAST row — pinned on the raw bytes so
    a decoder that skips the flip cannot pass by symmetry."""
    frame = np.arange(15, dtype=np.uint8).reshape(3, 5)  # asymmetric
    raw = M._avi_encode([frame])
    movi = raw.find(b"00db")
    stride = (5 + 3) & ~3
    stored_first = np.frombuffer(
        raw[movi + 8 : movi + 8 + stride], dtype=np.uint8
    )[:5]
    assert np.array_equal(stored_first, frame[-1])
    # and the pad bytes are zero
    assert raw[movi + 8 + 5 : movi + 8 + stride] == b"\x00\x00\x00"


def test_avi_decode_top_down_negative_height():
    """A negative biHeight in strf means top-down row order (DIB spec);
    our writer never emits it, so patch one in and check the decoder
    skips the flip."""
    frame = np.arange(8, dtype=np.uint8).reshape(2, 4)
    raw = bytearray(M._avi_encode([frame]))
    strf = raw.find(b"strf")
    # biHeight is the third field of BITMAPINFOHEADER (offset 8+4+4)
    off = strf + 8 + 8
    (bh,) = struct.unpack("<i", raw[off : off + 4])
    assert bh == 2
    raw[off : off + 4] = struct.pack("<i", -2)
    _, _, _, out = M._avi_decode(bytes(raw))
    # stored order is bottom-up (writer), reader now treats it as top-down
    assert np.array_equal(out[0], frame[::-1])


def test_avi_decode_skips_unknown_odd_sized_chunks():
    """RIFF chunks pad to even offsets; an unknown odd-length chunk spliced
    before movi must be skipped with its pad byte, not desync the walk."""
    frames = _rand_frames(2, 2, 4, 13)
    raw = M._avi_encode(frames)
    movi = raw.find(b"LIST", raw.find(b"movi") - 8)
    junk = b"JUNK" + struct.pack("<I", 3) + b"abc" + b"\x00"
    patched = raw[:movi] + junk + raw[movi:]
    patched = patched[:4] + struct.pack("<I", len(patched) - 8) + patched[8:]
    w, h, usec, out = M._avi_decode(patched)
    assert len(out) == 2 and np.array_equal(out[0], frames[0])


def test_avi_decode_rejects_non_avi_and_unsupported():
    with pytest.raises(ValueError, match="bad RIFF"):
        M._avi_decode(b"garbage-not-a-riff-container")
    with pytest.raises(ValueError, match="bad RIFF"):
        M._avi_decode(M._png_encode(np.zeros((2, 2), dtype=np.uint8)))
    raw = bytearray(M._avi_encode(_rand_frames(1, 2, 4, 14)))
    strf = raw.find(b"strf")
    off = strf + 8 + 14  # biBitCount field
    raw[off : off + 2] = struct.pack("<H", 24)
    with pytest.raises(NotImplementedError, match="8-bit"):
        M._avi_decode(bytes(raw))
    with pytest.raises(ValueError, match="at least one frame"):
        M._avi_encode([])
    with pytest.raises(ValueError, match="share dimensions"):
        M._avi_encode(
            [np.zeros((2, 3), dtype=np.uint8), np.zeros((3, 2), dtype=np.uint8)]
        )


def test_synthesize_video_geometry_and_rolled_frames(spark):
    """Frame f of the synthesized AVI is the padded byte grid rolled down
    by f rows: pixel j == padded[(j + f*w) mod (w*h)] — verified against
    really-decoded frames."""
    text = "abcdefghijklmnopqrstuvwxy"  # 25 bytes -> w=9, h=3, nf=3
    df = spark.createDataFrame([(4, text)], "doc_id long, text string")
    row = M.synthesize_video(df).collect()[0]
    assert (row.media_type, row.width, row.height) == ("video/avi", 9, 3)
    assert row.duration_ms == 300
    w, h, usec, frames = M._avi_decode(bytes(row.blob))
    assert (w, h, len(frames)) == (9, 3, 3)
    padded = np.zeros(27, dtype=np.uint8)
    padded[:25] = np.frombuffer(text.encode(), dtype=np.uint8)
    for f in range(3):
        assert np.array_equal(frames[f].ravel(), np.roll(padded, -f * 9))


def test_decode_media_real_video_branch(spark):
    text = "x" * 30  # w=14, h=3, nf=4 -> 400 ms
    df = spark.createDataFrame([(2, text)], "doc_id long, text string")
    out = M.decode_media(M.synthesize_video(df), fake=False).collect()[0]
    assert (out.media_type, out.width, out.height) == ("video/avi", 14, 3)
    assert out.duration_ms == 400
    # mean over all frames: 30 'x' bytes + 12 zero pads per frame
    assert out.mean_luma == pytest.approx((120 * 30 / 42) / 255.0)


def test_video_frame_features_by_hand(spark):
    """2x3 grid, 2 frames, every=1: position-weighted sums recomputed by
    hand from the roll construction."""
    # a multi-row grid is needed to prove the row flip; build the frames
    # directly rather than through synthesize_video's length-derived dims
    padded = np.frombuffer(b"abcdef", dtype=np.uint8)
    frames = [np.roll(padded, -f * 3).reshape(2, 3) for f in range(2)]
    blob = M._avi_encode(frames)
    media = spark.createDataFrame(
        [(7, bytearray(blob), "video/avi")],
        "media_id long, blob binary, media_type string",
    )
    rows = {
        r.frame_idx: r
        for r in M.video_frame_features(media, every=1).collect()
    }
    assert set(rows) == {0, 1}
    for f, frame in enumerate(frames):
        g = frame.astype(np.int64)
        r = rows[f]
        assert (r.n_frames, r.width, r.height) == (2, 3, 2)
        assert r.sum_px == g.sum() and r.peak_px == g.max()
        assert r.row_weighted == (np.array([[1], [2]]) * g).sum()
        assert r.col_weighted == (np.array([[1, 2, 3]]) * g).sum()
    # sampling: every=2 keeps only frame 0
    sampled = M.video_frame_features(media, every=2).collect()
    assert [r.frame_idx for r in sampled] == [0]
    with pytest.raises(ValueError, match="every"):
        M.video_frame_features(media, every=0)


def test_video_frame_features_non_avi_raises(spark):
    media = spark.createDataFrame(
        [(1, bytearray(b"notavi"), "image/png")],
        "media_id long, blob binary, media_type string",
    )
    with pytest.raises(Exception, match="video/avi"):
        M.video_frame_features(media).collect()
