"""Real stdlib codecs (operators/multimodal.py, round 9): PNG encode/decode
round-trip including all five scanline filters, WAV round-trip, the real
decode_media/perceptual_hash branches end-to-end on Spark, and the loud
NotImplementedError for formats this environment has no codec for."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from cernbox_migration_database_spark.operators import multimodal as M


def _rand_gray(h, w, seed):
    return np.random.default_rng(seed).integers(0, 256, (h, w)).astype(np.uint8)


def test_png_round_trip_exact():
    px = _rand_gray(13, 37, 7)
    w, h, out = M._png_decode(M._png_encode(px))
    assert (w, h) == (37, 13)
    assert np.array_equal(out, px)
    # degenerate 1x1
    one = np.array([[200]], dtype=np.uint8)
    assert np.array_equal(M._png_decode(M._png_encode(one))[2], one)


def _png_with_filters(px: np.ndarray, ftypes: list[int]) -> bytes:
    """Hand-encode a PNG choosing the filter type per scanline — exercises
    the decoder's Sub/Up/Average/Paeth reconstruction against scanlines
    our own encoder (always filter 0) never emits."""
    h, w = px.shape
    raw = bytearray()
    prev = np.zeros(w, dtype=np.int32)
    for r in range(h):
        line = px[r].astype(np.int32)
        ft = ftypes[r % len(ftypes)]
        raw.append(ft)
        for x in range(w):
            a = int(line[x - 1]) if x else 0
            b = int(prev[x])
            c = int(prev[x - 1]) if x else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            raw.append((int(line[x]) - pred) & 0xFF)
        prev = line

    def chunk(tag, payload):
        return (
            struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_png_decoder_reconstructs_all_filter_types():
    px = _rand_gray(10, 17, 21)
    for ftypes in ([1], [2], [3], [4], [0, 1, 2, 3, 4]):
        w, h, out = M._png_decode(_png_with_filters(px, ftypes))
        assert (w, h) == (17, 10)
        assert np.array_equal(out, px), f"filters {ftypes}"


def test_png_decoder_rejects_unsupported():
    with pytest.raises(ValueError):
        M._png_decode(b"GIF89a not a png")
    rgb_ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0)

    def chunk(tag, payload):
        return (
            struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    rgb = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", rgb_ihdr)
    with pytest.raises(NotImplementedError):
        M._png_decode(rgb)


def test_wav_round_trip_exact():
    payload = bytes(range(256)) * 3
    rate, n, frames = M._wav_decode(M._wav_encode(payload))
    assert (rate, n) == (M._WAV_RATE, len(payload))
    assert frames == payload
    # empty audio
    rate, n, frames = M._wav_decode(M._wav_encode(b""))
    assert n == 0 and frames == b""


def test_decode_media_real_on_spark(spark):
    docs = spark.createDataFrame(
        [(0, "abcdefgh" * 13), (1, "hello world"), (2, ""), (3, "x" * 8000)],
        "doc_id long, text string",
    )
    media = M.synthesize_media(docs)
    out = {r["media_id"]: r for r in M.decode_media(media, fake=False).collect()}
    assert len(out) == 4
    # even ids: PNG dims follow the length formulas, luma = padded-byte mean
    n0 = 8 * 13
    w0 = n0 % 96 + 8
    h0 = -(-n0 // w0)
    assert (out[0]["width"], out[0]["height"]) == (w0, h0)
    raw0 = np.zeros(w0 * h0, dtype=np.uint8)
    raw0[:n0] = np.frombuffer(("abcdefgh" * 13).encode(), dtype=np.uint8)
    assert out[0]["mean_luma"] == pytest.approx(raw0.mean() / 255.0)
    assert out[0]["duration_ms"] is None
    # empty doc -> 1-row PNG of zero pixels
    assert (out[2]["width"], out[2]["height"]) == (8, 1)
    assert out[2]["mean_luma"] == 0.0
    # odd ids: WAV duration from the frame count at 8 kHz
    assert out[1]["duration_ms"] == len("hello world") * 1000 // 8000
    assert out[3]["duration_ms"] == 1000
    assert out[3]["width"] is None and out[3]["height"] is None
    samples = np.frombuffer("hello world".encode(), dtype=np.uint8)
    assert out[1]["mean_luma"] == pytest.approx(samples.mean() / 255.0)


def test_decode_media_real_unknown_type_raises(spark):
    # image/jpeg graduated to a builtin decoder in r12 — MP3 is the
    # canonical still-unsupported type naming the injection point
    media = spark.createDataFrame(
        [(1, b"\xff\xfb\x90\x00", "audio/mp3", None, None, None)],
        M.MEDIA_META_SCHEMA,
    )
    with pytest.raises(Exception, match="audio/mp3"):
        M.decode_media(media, fake=False).collect()


def test_real_phash_near_dup_contract(spark):
    """One flipped pixel must land within small Hamming distance of the
    original; an unrelated image must sit far away — the contract the
    banded pairing relies on, now through REAL PNG decode."""
    base = _rand_gray(32, 48, 3)
    near = base.copy()
    near[5, 7] ^= 0x80
    far = _rand_gray(32, 48, 99)
    media = spark.createDataFrame(
        [
            (0, M._png_encode(base), "image/png", None, None, None),
            (1, M._png_encode(near), "image/png", None, None, None),
            (2, M._png_encode(far), "image/png", None, None, None),
        ],
        M.MEDIA_META_SCHEMA,
    )
    hashes = {
        r["media_id"]: r["phash"]
        for r in M.perceptual_hash(media, fake=False).collect()
    }

    def ham(a, b):
        return sum(x != y for x, y in zip(a, b))

    assert ham(hashes[0], hashes[1]) <= 3
    assert ham(hashes[0], hashes[2]) >= 10
    # and the banded pair query finds exactly the near pair
    pairs = M.phash_near_dup_pairs(
        M.perceptual_hash(media, fake=False), max_hamming=3
    ).collect()
    assert [(p["ia"], p["ib"]) for p in pairs] == [(0, 1)]


def test_audio_features_match_hand_computation(spark):
    """audio_features must recover the exact PCM payload through the real
    WAV container: every integer feature equals a hand computation over
    the pre-encode bytes."""
    payload = b"Abz 09!Abz"  # crosses the 64 midline several times
    df = spark.createDataFrame(
        [(1, M._wav_encode(payload), "audio/wav")],
        "media_id long, blob binary, media_type string",
    )
    row = M.audio_features(df).collect()[0]
    v = list(payload)
    below = [x < 64 for x in v]
    assert row["n_samples"] == len(v)
    assert row["duration_ms"] == len(v) * 1000 // 8000
    assert row["peak_amp"] == max(v)
    assert row["min_amp"] == min(v)
    assert row["sum_amp"] == sum(v)
    assert row["energy"] == sum((x - 64) ** 2 for x in v)
    assert row["crossings"] == sum(
        1 for a, b in zip(below, below[1:]) if a != b
    )


def test_audio_features_empty_payload_and_non_wav(spark):
    df = spark.createDataFrame(
        [(1, M._wav_encode(b""), "audio/wav")],
        "media_id long, blob binary, media_type string",
    )
    row = M.audio_features(df).collect()[0]
    assert (row["n_samples"], row["energy"], row["crossings"]) == (0, 0, 0)
    bad = spark.createDataFrame(
        [(2, b"\x89PNG", "image/png")],
        "media_id long, blob binary, media_type string",
    )
    with pytest.raises(Exception, match="audio/wav"):
        M.audio_features(bad).collect()


def test_image_features_position_weights_by_hand(spark):
    """image_features must place every decoded byte on its exact grid
    cell: position-weighted sums equal a hand computation over a known
    2x3 grid."""
    import numpy as np

    g = np.array([[10, 20, 30], [40, 50, 60]], dtype=np.uint8)
    df = spark.createDataFrame(
        [(1, M._png_encode(g), "image/png")],
        "media_id long, blob binary, media_type string",
    )
    row = M.image_features(df).collect()[0]
    assert (row["width"], row["height"], row["n_px"]) == (3, 2, 6)
    assert row["sum_px"] == 210 and row["peak_px"] == 60
    # rows weighted 1,2: 1*(10+20+30) + 2*(40+50+60) = 60 + 300
    assert row["row_weighted"] == 360
    # cols weighted 1,2,3: 1*(10+40) + 2*(20+50) + 3*(30+60)
    assert row["col_weighted"] == 50 + 140 + 270
    bad = spark.createDataFrame(
        [(2, M._wav_encode(b"x"), "audio/wav")],
        "media_id long, blob binary, media_type string",
    )
    import pytest as _pytest

    with _pytest.raises(Exception, match="image/png"):
        M.image_features(bad).collect()


def test_decoder_injection_contract(spark):
    """r10 verdict item 8: JPEG/MP3/H.264 stay loud stubs in this
    sandbox, but production plugs a decoder in WITHOUT editing the
    operator — the injection point must run the callable inside the
    executor-side Arrow batch, keep n_bytes/sha operator-computed, take
    precedence over builtins for its type, and leave unknown types loud.
    The decoders here are LOCAL functions (cloudpickle ships them by
    value); a production cluster uses module-level functions from a
    shipped package instead."""

    def _fake_jpeg_decoder(raw: bytes):
        # bytes in, (width, height, mean_luma, duration_ms) out —
        # values the test recomputes from the payload
        return (
            len(raw) % 7 + 1,
            len(raw) % 5 + 1,
            (raw[0] if raw else 0) / 255.0,
            None,
        )

    def _fake_png_override(raw: bytes):
        return (1, 1, 0.5, None)

    payload = b"\xff\xd8\xff\xe0fakejpegbytes"
    media = spark.createDataFrame(
        [
            (1, payload, "image/jpeg", None, None, None),
            (2, b"\xff\xd8", "image/jpeg", None, None, None),
        ],
        M.MEDIA_META_SCHEMA,
    )
    out = {
        r["media_id"]: r
        for r in M.decode_media(
            media, fake=False, decoders={"image/jpeg": _fake_jpeg_decoder}
        ).collect()
    }
    import hashlib

    for mid, raw in ((1, payload), (2, b"\xff\xd8")):
        w, h, luma, dur = _fake_jpeg_decoder(raw)
        r = out[mid]
        assert (r["width"], r["height"]) == (w, h)
        assert r["mean_luma"] == pytest.approx(luma)
        assert r["duration_ms"] is None
        # content identity is the OPERATOR's, not the decoder's
        assert r["n_bytes"] == len(raw)
        assert r["sha"] == hashlib.sha256(raw).hexdigest()

    # an injected decoder overrides the builtin for its media type
    docs = spark.createDataFrame([(0, "abc")], "doc_id long, text string")
    png = M.synthesize_media(docs)
    r2 = M.decode_media(
        png, fake=False, decoders={"image/png": _fake_png_override}
    ).collect()[0]
    assert (r2["width"], r2["height"], r2["mean_luma"]) == (1, 1, 0.5)

    # types with neither builtin nor injection stay loud, naming the point
    mp3 = spark.createDataFrame(
        [(9, b"ID3", "audio/mp3", None, None, None)], M.MEDIA_META_SCHEMA
    )
    with pytest.raises(Exception, match="decoders="):
        M.decode_media(
            mp3, fake=False, decoders={"image/jpeg": _fake_jpeg_decoder}
        ).collect()


# ---------------------------------------------------------------------------
# Baseline JPEG (operators/jpeg.py, round 12)
# ---------------------------------------------------------------------------

from cernbox_migration_database_spark.operators import jpeg as J


def test_jpeg_round_trip_dims_exact_and_luma_bounded():
    """Dimensions must round-trip exactly; mean luma within the DC
    quantization bound (Annex K q[0,0]=16 -> per-block mean error <= 8,
    so well under 4/255 normalized for multi-block noise images)."""
    for (h, w, seed) in [(8, 8, 1), (5, 13, 2), (24, 17, 3), (1, 100, 4),
                         (64, 64, 5)]:
        px = _rand_gray(h, w, seed)
        blob = J.jpeg_encode(px)
        w2, h2, y = J.jpeg_decode(blob)
        assert (w2, h2) == (w, h)
        assert y.shape == (h, w)
        assert abs(float(y.mean()) - float(px.mean())) < 4.0
    # smooth gradient: DCT-friendly, mean near-exact
    grad = np.tile(np.arange(64, dtype=np.uint8) * 4, (32, 1))
    _, _, y = J.jpeg_decode(J.jpeg_encode(grad))
    assert abs(float(y.mean()) - float(grad.mean())) < 0.5


def test_jpeg_spec_parity_pins():
    """Constants a complementary encoder/decoder bug could not fake:
    the DQT payload must be the famous Annex K luminance table in zigzag
    order, and a flat-gray block's entropy data must be exactly the
    spec codes DC-size-0 ('00') + EOB ('1010') + 1-padding = 0x2B."""
    blob = J.jpeg_encode(np.full((8, 8), 128, dtype=np.uint8))
    i = blob.index(b"\xff\xdb")
    assert list(blob[i + 5 : i + 13]) == [16, 11, 12, 14, 12, 10, 16, 14]
    s = blob.index(b"\xff\xda")
    ln = int.from_bytes(blob[s + 2 : s + 4], "big")
    assert blob[s + 2 + ln : blob.index(b"\xff\xd9")] == b"\x2b"


def _seg(marker, payload):
    return struct.pack(">HH", marker, len(payload) + 2) + payload


def _tables():
    dqt = bytes([0]) + bytes(
        int(J._QUANT_LUMA.reshape(-1)[J._ZIGZAG[i]]) for i in range(64)
    )
    dht = (
        bytes([0x00]) + bytes(J._DC_BITS) + bytes(J._DC_VALS)
        + bytes([0x10]) + bytes(J._AC_BITS) + bytes(J._AC_VALS)
    )
    return dqt, dht


def test_jpeg_decodes_restart_markers():
    """Hand-assembled two-MCU file with DRI=1: flat MCU (0x2B), RST0,
    flat MCU — the decoder must byte-align, consume the marker, reset
    DC predictions, and reconstruct 16x8 of flat gray."""
    dqt, dht = _tables()
    sof = struct.pack(">BHHB", 8, 8, 16, 1) + bytes([1, 0x11, 0])
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    blob = (
        b"\xff\xd8" + _seg(0xFFDB, dqt) + _seg(0xFFC0, sof)
        + _seg(0xFFC4, dht) + _seg(0xFFDD, struct.pack(">H", 1))
        + _seg(0xFFDA, sos) + b"\x2b\xff\xd0\x2b" + b"\xff\xd9"
    )
    w, h, y = J.jpeg_decode(blob)
    assert (w, h) == (16, 8) and y.shape == (8, 16)
    assert np.all(y == 128)


def test_jpeg_decodes_420_subsampled_color():
    """Hand-assembled 4:2:0 YCbCr file (Y 2x2, Cb/Cr 1x1; one 16x16
    MCU = 4+1+1 flat blocks, 6x6 bits + padding): chroma blocks must be
    entropy-consumed to keep bit position while only the luma plane
    reconstructs."""
    dqt, dht = _tables()
    sof = struct.pack(">BHHB", 8, 16, 16, 3) + bytes(
        [1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0]
    )
    sos = bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0])
    # 6 flat blocks of '001010' then 1111 padding
    bits = "001010" * 6 + "1111"
    ent = int(bits, 2).to_bytes(5, "big")
    blob = (
        b"\xff\xd8" + _seg(0xFFDB, dqt) + _seg(0xFFC0, sof)
        + _seg(0xFFC4, dht) + _seg(0xFFDA, sos) + ent + b"\xff\xd9"
    )
    w, h, y = J.jpeg_decode(blob)
    assert (w, h) == (16, 16) and y.shape == (16, 16)
    assert np.all(y == 128)


def test_jpeg_progressive_raises_loudly():
    px = _rand_gray(8, 8, 9)
    blob = bytearray(J.jpeg_encode(px))
    i = blob.index(b"\xff\xc0")
    blob[i + 1] = 0xC2  # SOF0 -> SOF2 (progressive)
    with pytest.raises(NotImplementedError, match="decoders="):
        J.jpeg_decode(bytes(blob))


def test_jpeg_text_payload_luma_tracks_source(spark):
    """The synthesize_jpeg -> decode_media(fake=False) executor path:
    dims match the length formula and decoded mean luma tracks the
    padded payload mean within the DC quant bound."""
    rows = [(i, f"doc {i} " + "payload " * (i % 7)) for i in range(12)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["media_id"]: r
        for r in M.decode_media(
            M.synthesize_jpeg(df), fake=False
        ).collect()
    }
    for i, text in rows:
        raw = text.encode()
        w = len(raw) % 40 + 8
        h = max(1, -(-len(raw) // w))
        r = out[i]
        assert (r["width"], r["height"]) == (w, h)
        padded_mean = sum(raw) / (w * h)
        assert abs(r["mean_luma"] * 255.0 - padded_mean) < 4.0, (i, r)


def test_jpeg_phash_near_dup_contract(spark):
    """perceptual_hash(fake=False) over JPEG blobs: a one-byte payload
    corruption stays within small Hamming distance; a disjoint payload
    does not (the contract the banded pairing relies on)."""
    base = ("lorem ipsum dolor sit amet " * 12).encode()
    tweaked = bytearray(base)
    tweaked[17] ^= 0x04
    other = bytes(reversed(base))
    arrs = []
    for payload in (base, bytes(tweaked), other):
        w = len(payload) % 40 + 8
        h = max(1, -(-len(payload) // w))
        arr = np.zeros(w * h, dtype=np.uint8)
        arr[: len(payload)] = np.frombuffer(payload, dtype=np.uint8)
        arrs.append(J.jpeg_encode(arr.reshape(h, w)))
    df = spark.createDataFrame(
        [(i, b, "image/jpeg") for i, b in enumerate(arrs)],
        "media_id long, blob binary, media_type string",
    )
    hashes = {
        r["media_id"]: r["phash"]
        for r in M.perceptual_hash(df, fake=False).collect()
    }
    ham = lambda a, b: sum(x != y for x, y in zip(a, b))  # noqa: E731
    assert ham(hashes[0], hashes[1]) <= 8
    assert ham(hashes[0], hashes[2]) > 8
