"""Pure-Python baseline JPEG codec for the multimodal decode boundary.

Closes the engine's last honest media stub (r11 verdict item 6): the
``decode_media`` branch for ``image/jpeg`` used to raise
NotImplementedError naming the ``decoders=`` injection point; this
module bundles the baseline path so a lossy format flows through the
existing differential with NO external library. Same posture as the
stdlib PNG/WAV/AVI codecs in operators/multimodal.py: deterministic,
dependency-free (numpy only — already an Arrow requirement), honest
about scope.

Scope — ITU-T T.81 baseline sequential DCT, 8-bit:

* decoder: SOF0 frames, Huffman entropy coding (DHT), 8-bit quant
  tables (DQT), interleaved scans, component sampling factors (e.g.
  4:2:0 — chroma blocks are entropy-decoded to keep bit position, only
  the luma plane is reconstructed, which is exactly what the decode
  contract needs: width/height/mean_luma), restart markers (DRI/RSTn).
  Progressive (SOF2), arithmetic coding, 12-bit precision, and
  non-interleaved multi-scan files raise loudly — inject a full decoder
  via ``decode_media(decoders=...)`` for those.
* encoder: grayscale (one component, 4:4:4) with the Annex K luminance
  quantization and Huffman tables — the fixture writer that makes the
  decoder's round-trip testable in this container.

The DCT/IDCT pair is the orthonormal matrix form (float64); encode
quantization is the only lossy step, so decoded DIMENSIONS are exact
and the mean-luma error is bounded by the DC quant step (Annex K
q[0,0]=16 → per-block mean error ≤ 8/255) — the tolerance the tests
pin. Runs ON EXECUTORS inside Arrow mapInPandas batches; everything is
per-blob local work.
"""

from __future__ import annotations

import math
import struct

import numpy as np

# ITU-T T.81 Annex K.1 — luminance quantization table (natural order)
_QUANT_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int32,
)

# Annex K.3 — standard luminance Huffman tables: (#codes per length 1..16,
# symbol values)
_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# zigzag scan: _ZIGZAG[i] = flat natural-order index of the i-th zigzag
# coefficient
_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


def _dct_mat() -> np.ndarray:
    m = np.zeros((8, 8))
    for k in range(8):
        s = math.sqrt(1 / 8) if k == 0 else math.sqrt(2 / 8)
        for i in range(8):
            m[k, i] = s * math.cos(math.pi * (2 * i + 1) * k / 16)
    return m


_DCT = _dct_mat()


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple]:
    """symbol -> (code, length) per the JPEG canonical code construction."""
    out: dict[int, tuple] = {}
    code = 0
    idx = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[idx]] = (code, length)
            code += 1
            idx += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple, int]:
    """(length, code) -> symbol, for the bit-at-a-time decoder walk."""
    return {
        (length, code): sym
        for sym, (code, length) in _canonical_codes(bits, vals).items()
    }


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec
        return bytes(self.out)


def _magnitude(v: int) -> tuple[int, int]:
    """(size, amplitude bits): JPEG coefficient coding — negatives are
    stored as value-1 in ``size`` low bits (one's-complement style)."""
    if v == 0:
        return 0, 0
    size = int(v).bit_length() if v > 0 else int(-v).bit_length()
    amp = v if v > 0 else v + (1 << size) - 1
    return size, amp


def jpeg_encode(gray: "np.ndarray") -> bytes:
    """Grayscale baseline JFIF bytes for a (h, w) uint8 array — Annex K
    luminance quant + Huffman tables, one component, no subsampling."""
    gray = np.asarray(gray, dtype=np.uint8)
    h, w = gray.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.empty((ph, pw), dtype=np.float64)
    padded[:h, :w] = gray
    padded[h:, :w] = gray[h - 1 : h, :]  # edge-replicate padding
    padded[:, w:] = padded[:, w - 1 : w]
    dc_codes = _canonical_codes(_DC_BITS, _DC_VALS)
    ac_codes = _canonical_codes(_AC_BITS, _AC_VALS)
    bw = _BitWriter()
    prev_dc = 0
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            block = padded[by : by + 8, bx : bx + 8] - 128.0
            coef = _DCT @ block @ _DCT.T
            q = np.round(coef / _QUANT_LUMA).astype(np.int64)
            zz = q.reshape(-1)[_ZIGZAG]
            # DC: differential
            size, amp = _magnitude(int(zz[0]) - prev_dc)
            prev_dc = int(zz[0])
            code, length = dc_codes[size]
            bw.write(code, length)
            if size:
                bw.write(amp, size)
            # AC: run-length
            run = 0
            last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
            for i in range(1, 64):
                v = int(zz[i])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, length = ac_codes[0xF0]  # ZRL
                    bw.write(code, length)
                    run -= 16
                size, amp = _magnitude(v)
                code, length = ac_codes[(run << 4) | size]
                bw.write(code, length)
                bw.write(amp, size)
                run = 0
            if last_nz < 63:
                code, length = ac_codes[0x00]  # EOB
                bw.write(code, length)
    data = bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    qt = bytes([0]) + bytes(
        int(_QUANT_LUMA.reshape(-1)[_ZIGZAG[i]]) for i in range(64)
    )
    sof = struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0])
    dht = (
        bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS)
        + bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_VALS)
    )
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    return (
        b"\xff\xd8"  # SOI
        + seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
        + seg(0xFFDB, qt)
        + seg(0xFFC0, sof)
        + seg(0xFFC4, dht)
        + seg(0xFFDA, sos)
        + data
        + b"\xff\xd9"  # EOI
    )


class _BitReader:
    """MSB-first entropy-data reader with 0xFF00 unstuffing; RSTn markers
    surface via ``sync_restart`` (byte-align + consume)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartPending()
            else:
                # EOI or another marker mid-scan: pad with 1s (spec-legal
                # at end of scan)
                self.acc = (self.acc << 8) | 0xFF
                self.nbits += 8
                return
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if not self.nbits:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def sync_restart(self) -> None:
        """Byte-align and consume the expected RSTn marker — skipping
        pad bytes, stuffed FF00 pairs, and FF fill bytes on the way."""
        self.acc = 0
        self.nbits = 0
        while True:
            if self.data[self.pos] != 0xFF:
                self.pos += 1
                continue
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:  # stuffed data byte, not a marker
                self.pos += 2
                continue
            if nxt == 0xFF:  # fill byte
                self.pos += 1
                continue
            break
        nxt = self.data[self.pos + 1]
        if not 0xD0 <= nxt <= 0xD7:
            raise ValueError(f"expected RST marker, found FF{nxt:02X}")
        self.pos += 2


class _RestartPending(Exception):
    """Raised by the bit reader when an RSTn arrives mid-read — callers
    only see it if the stream is malformed (restart inside a block)."""


def _receive_extend(br: _BitReader, size: int) -> int:
    if size == 0:
        return 0
    v = br.bits(size)
    if v < (1 << (size - 1)):
        v -= (1 << size) - 1
    return v


def _huff_decode(br: _BitReader, table: dict[tuple, int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in entropy stream")


def jpeg_decode(data: bytes):
    """(width, height, luma_plane uint8) from baseline JFIF bytes. The
    luma plane is the Y component cropped to the frame size (at its own
    sampling resolution for subsampled files); chroma blocks are entropy-
    decoded to keep bit position but never reconstructed."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple, dict] = {}
    frame = None
    restart_interval = 0
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        ln = struct.unpack(">H", data[pos + 2 : pos + 4])[0]
        payload = data[pos + 4 : pos + 2 + ln]
        pos += 2 + ln
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0xF
                if pq:
                    raise NotImplementedError(
                        "16-bit quantization tables (extended JPEG) — "
                        "inject a full decoder via decode_media(decoders=)"
                    )
                t = np.zeros(64, dtype=np.int32)
                for i in range(64):
                    t[_ZIGZAG[i]] = payload[p + 1 + i]
                qtables[tq] = t.reshape(8, 8)
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(payload):
                tc, th = payload[p] >> 4, payload[p] & 0xF
                bits = list(payload[p + 1 : p + 17])
                n = sum(bits)
                vals = list(payload[p + 17 : p + 17 + n])
                htables[(tc, th)] = _decode_table(bits, vals)
                p += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (baseline DCT)
            prec, h, w, nc = struct.unpack(">BHHB", payload[:6])
            if prec != 8:
                raise NotImplementedError(
                    f"{prec}-bit precision — inject a full decoder via "
                    "decode_media(decoders=)"
                )
            comps = []
            for i in range(nc):
                cid, samp, tq = payload[6 + 3 * i : 9 + 3 * i]
                comps.append(
                    {"id": cid, "h": samp >> 4, "v": samp & 0xF, "tq": tq}
                )
            frame = {"w": w, "h": h, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline frame (SOF{marker - 0xC0}) — progressive/"
                "arithmetic JPEG needs a full decoder; inject one via "
                "decode_media(decoders=)"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", payload[:2])[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = payload[0]
            scan = []
            for i in range(ns):
                cs, tt = payload[1 + 2 * i : 3 + 2 * i]
                comp = next(
                    c for c in frame["comps"] if c["id"] == cs
                )
                scan.append(
                    {**comp, "dc": tt >> 4, "ac": tt & 0xF}
                )
            if len(scan) != len(frame["comps"]):
                raise NotImplementedError(
                    "non-interleaved multi-scan baseline JPEG — inject a "
                    "full decoder via decode_media(decoders=)"
                )
            return _decode_scan(
                data, pos, frame, scan, qtables, htables, restart_interval
            )
        # other markers (APPn, COM) are skipped
    raise ValueError("no scan found (truncated JPEG?)")


def _decode_scan(data, pos, frame, scan, qtables, htables, ri):
    w, h = frame["w"], frame["h"]
    hmax = max(c["h"] for c in scan)
    vmax = max(c["v"] for c in scan)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    luma = scan[0]
    yw, yh = mcux * 8 * luma["h"], mcuy * 8 * luma["v"]
    yplane = np.zeros((yh, yw), dtype=np.float64)
    yquant = qtables[luma["tq"]].astype(np.float64)
    br = _BitReader(data, pos)
    preds = {c["id"]: 0 for c in scan}
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if ri and mcu_count and mcu_count % ri == 0:
                br.sync_restart()
                preds = {c["id"]: 0 for c in scan}
            mcu_count += 1
            for c in scan:
                dc_t = htables[(0, c["dc"])]
                ac_t = htables[(1, c["ac"])]
                for v in range(c["v"]):
                    for hh in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int64)
                        size = _huff_decode(br, dc_t)
                        preds[c["id"]] += _receive_extend(br, size)
                        zz[0] = preds[c["id"]]
                        k = 1
                        while k < 64:
                            sym = _huff_decode(br, ac_t)
                            if sym == 0x00:  # EOB
                                break
                            run, size = sym >> 4, sym & 0xF
                            if size == 0:
                                if run != 15:
                                    raise ValueError(
                                        f"bad AC symbol {sym:02x}"
                                    )
                                k += 16  # ZRL
                                continue
                            k += run
                            if k > 63:
                                raise ValueError("AC run past block end")
                            zz[k] = _receive_extend(br, size)
                            k += 1
                        if c is luma:
                            blk = np.zeros(64, dtype=np.float64)
                            blk[_ZIGZAG] = zz
                            coef = blk.reshape(8, 8) * yquant
                            px = _DCT.T @ coef @ _DCT + 128.0
                            by = (my * luma["v"] + v) * 8
                            bx = (mx * luma["h"] + hh) * 8
                            yplane[by : by + 8, bx : bx + 8] = px
    # crop to the component's own resolution for the frame size
    cw = -(-w * luma["h"] // hmax)
    ch = -(-h * luma["v"] // vmax)
    out = np.clip(np.round(yplane[:ch, :cw]), 0, 255).astype(np.uint8)
    return w, h, out


def decode_features(raw: bytes):
    """``decode_media(decoders=)``-contract adapter — and the builtin
    branch: (width, height, mean_luma in [0,1], duration_ms=None)."""
    w, h, y = jpeg_decode(raw)
    return w, h, float(y.mean()) / 255.0, None
