"""Pure-numpy baseline JPEG codec (the in-container codec fallback).

The production decode path for ``image/jpeg`` is Pillow
(stages/media.py:real_decode); this container ships no codec libraries,
so the probe falls through to THIS module — a from-scratch baseline
sequential DCT JPEG implementation built only on numpy and the public
ITU-T.81 spec:

- :func:`decode_jpeg` — baseline (SOF0) decoder: DQT/DHT/SOF0/SOS/DRI
  markers, interleaved MCUs, per-component sampling factors (1-2 with
  nearest-neighbor upsampling, i.e. 4:4:4 / 4:2:2 / 4:2:0), restart
  markers, byte-unstuffing, dequantize → inverse zigzag → 8×8 IDCT-II →
  level shift, and YCbCr→RGB (JFIF full-range) for 3-component scans.
- :func:`encode_jpeg` — a minimal valid baseline encoder (grayscale or
  4:4:4 color, Annex-K example quantization tables scaled by quality,
  spec Table K.3-K.6 Huffman tables) so tests can mint REAL JPEG
  payloads without any external library and round-trip them through the
  decoder (decode(encode(x)) ≈ x within quantization error).

Reference parity note: the reference repo has no media pipeline at all —
this exists for the multimodal-column suite (SURVEY.md §2 media ops),
where the decode step was previously an honest NotImplementedError stub
when Pillow is absent.

All loops below are per-BLOCK / per-symbol (entropy coding is inherently
sequential); the vectorized parts are the DCT (one (n,8,8) einsum per
component) and the pixel-plane assembly.  Media payloads enter Ray
through small-batch actor pools (stages/media.py), so the per-image cost
here is the kernel cost, not a dataset-scan cost.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# Shared tables
# ---------------------------------------------------------------------------

# zigzag scan order: ZIGZAG[k] = (row-major) index of the k-th scanned coef
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# ITU-T.81 Annex K.1 example quantization tables (luma, chroma)
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64).reshape(8, 8)
QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64).reshape(8, 8)

# spec Tables K.3-K.6: (BITS counts per code length 1..16, HUFFVAL)
_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
            list(range(12)))
_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
              list(range(12)))
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
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
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix C: X = C @ x (per axis)."""
    k = np.arange(8)
    C = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16.0)
    C[0] *= 1.0 / np.sqrt(2.0)
    return C * 0.5


_C = _dct_matrix()


def _canonical_codes(bits: list[int], vals: list[int]):
    """(BITS, HUFFVAL) → {symbol: (code, length)} canonical Huffman."""
    codes = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            codes[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return codes


def _decode_table(bits: list[int], vals: list[int]):
    """(BITS, HUFFVAL) → per-length (min_code, max_code, first_index)
    arrays for the canonical sequential decode of F.2.2.3."""
    mincode = np.zeros(17, np.int64)
    maxcode = np.full(17, -1, np.int64)
    valptr = np.zeros(17, np.int64)
    code = 0
    k = 0
    for ln in range(1, 17):
        n = bits[ln - 1]
        valptr[ln] = k
        mincode[ln] = code
        maxcode[ln] = code + n - 1 if n else -1
        code = (code + n) << 1
        k += n
    return mincode, maxcode, valptr, np.asarray(vals, np.int64)


# ---------------------------------------------------------------------------
# Bit I/O with 0xFF byte stuffing
# ---------------------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)          # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)      # 1-fill to byte boundary


class _BitReader:
    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos                          # byte position
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1                   # stuffed byte
            else:
                # hit a marker mid-entropy-data: feed zero bits (the
                # spec's truncated-stream behavior); rewind so the
                # marker scanner sees it.
                self.pos -= 1
                b = 0
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bits(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1
        return v

    def align_and_expect_rst(self) -> None:
        """Byte-align and consume an RSTn marker (restart interval)."""
        self.acc = 0
        self.nbits = 0
        while self.data[self.pos] != 0xFF:
            self.pos += 1
        while self.data[self.pos] == 0xFF:
            self.pos += 1
        m = self.data[self.pos]
        if not (0xD0 <= m <= 0xD7):
            raise ValueError(f"expected RST marker, got {m:02x}")
        self.pos += 1


def _extend(v: int, t: int) -> int:
    """F.2.2.1 EXTEND: map t low bits to the signed amplitude."""
    return v - (1 << t) + 1 if v < (1 << (t - 1)) else v


def _huff_decode(br: _BitReader, table) -> int:
    mincode, maxcode, valptr, vals = table
    code = br.bits(1)
    for ln in range(1, 17):
        if maxcode[ln] >= 0 and code <= maxcode[ln]:
            return int(vals[valptr[ln] + code - mincode[ln]])
        code = (code << 1) | br.bits(1)
    raise ValueError("invalid Huffman code")


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------

def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline-sequential JPEG → uint8 array (h, w) gray or (h, w, 3) RGB."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, tuple] = {}
    huff_ac: dict[int, tuple] = {}
    frame = None
    restart_interval = 0
    planes = None

    while pos < len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:                      # EOI
            break
        seglen = struct.unpack(">H", data[pos:pos + 2])[0]
        seg = data[pos + 2:pos + seglen]
        if marker == 0xDB:                      # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                p += 1
                if pq:
                    tbl = np.frombuffer(seg[p:p + 128],
                                        dtype=">u2").astype(np.int64)
                    p += 128
                else:
                    tbl = np.frombuffer(seg[p:p + 64],
                                        dtype=np.uint8).astype(np.int64)
                    p += 64
                q = np.zeros(64, np.int64)
                q[ZIGZAG] = tbl
                qt[tq] = q.reshape(8, 8)
        elif marker == 0xC4:                    # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                bits = list(seg[p + 1:p + 17])
                n = sum(bits)
                vals = list(seg[p + 17:p + 17 + n])
                tbl = _decode_table(bits, vals)
                (huff_ac if tc else huff_dc)[th] = tbl
                p += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline(+ext seq)
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15,
                              "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline sequential (SOF0) supported")
        elif marker == 0xDD:                    # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:                    # SOS
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                comp = next(x for x in frame["comps"] if x["id"] == cs)
                scan.append({**comp, "dc": tt >> 4, "ac": tt & 15})
            planes = _decode_scan(data, pos + seglen, frame, scan, qt,
                                  huff_dc, huff_ac, restart_interval)
            break
        pos += seglen

    if planes is None:
        raise ValueError("no SOS segment found")
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    full = []
    for comp, plane in zip(frame["comps"], planes):
        # nearest-neighbor upsample to full resolution, crop to (h, w)
        ry, rx = vmax // comp["v"], hmax // comp["h"]
        up = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        full.append(up[:h, :w])
    if len(full) == 1:
        return np.clip(np.round(full[0]) + 128, 0, 255).astype(np.uint8)
    y, cb, cr = (f + 128.0 for f in full[:3])
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, b], axis=-1)),
                   0, 255).astype(np.uint8)


def _decode_scan(data, pos, frame, scan, qt, huff_dc, huff_ac,
                 restart_interval):
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in scan)
    vmax = max(c["v"] for c in scan)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    # per-component quantized-coefficient block grids
    grids = []
    for c in scan:
        bw, bh = mcux * c["h"], mcuy * c["v"]
        grids.append(np.zeros((bh, bw, 64), np.int64))
    br = _BitReader(data, pos)
    pred = [0] * len(scan)
    n_mcu = mcux * mcuy
    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            br.align_and_expect_rst()
            pred = [0] * len(scan)
        my, mx = divmod(m, mcux)
        for ci, c in enumerate(scan):
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    blk = grids[ci][my * c["v"] + by, mx * c["h"] + bx]
                    t = _huff_decode(br, huff_dc[c["dc"]])
                    diff = _extend(br.bits(t), t) if t else 0
                    pred[ci] += diff
                    blk[0] = pred[ci]
                    k = 1
                    while k < 64:
                        rs = _huff_decode(br, huff_ac[c["ac"]])
                        r, s = rs >> 4, rs & 15
                        if s == 0:
                            if r == 15:
                                k += 16        # ZRL
                                continue
                            break               # EOB
                        k += r
                        blk[k] = _extend(br.bits(s), s)
                        k += 1
    # dequantize + inverse zigzag + IDCT, one vectorized pass per comp
    planes = []
    for c, grid in zip(scan, grids):
        bh, bw, _ = grid.shape
        q = qt[c["tq"]]
        coef = np.zeros((bh * bw, 64), np.float64)
        coef[:, ZIGZAG] = grid.reshape(-1, 64)
        coef = coef.reshape(-1, 8, 8) * q[None, :, :]
        # IDCT-II: x = C.T @ X @ C
        px = np.einsum("ij,njk,kl->nil", _C.T, coef, _C, optimize=True)
        plane = (px.reshape(bh, bw, 8, 8)
                 .transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8))
        planes.append(plane)
    return planes


# ---------------------------------------------------------------------------
# Encoder (grayscale or 4:4:4 color, quality-scaled Annex-K tables)
# ---------------------------------------------------------------------------

def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * s + 50) // 100, 1, 255)


def _encode_block(bw: _BitWriter, block: np.ndarray, q: np.ndarray,
                  dc_codes, ac_codes, pred: int) -> int:
    coef = _C @ (block - 128.0) @ _C.T
    qz = np.round(coef / q).astype(np.int64).reshape(-1)[ZIGZAG]
    # DC
    diff = int(qz[0]) - pred
    t = int(diff != 0 and int(abs(diff)).bit_length())
    code, ln = dc_codes[t]
    bw.put(code, ln)
    if t:
        amp = diff if diff > 0 else diff + (1 << t) - 1
        bw.put(amp, t)
    # AC
    run = 0
    nz = np.nonzero(qz[1:])[0]
    last = nz[-1] + 1 if len(nz) else 0
    for k in range(1, last + 1):
        v = int(qz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]           # ZRL
            bw.put(code, ln)
            run -= 16
        s = int(abs(v)).bit_length()
        code, ln = ac_codes[(run << 4) | s]
        bw.put(code, ln)
        amp = v if v > 0 else v + (1 << s) - 1
        bw.put(amp, s)
        run = 0
    if last < 63:
        code, ln = ac_codes[0x00]               # EOB
        bw.put(code, ln)
    return int(qz[0])


def encode_jpeg(img: np.ndarray, quality: int = 85) -> bytes:
    """uint8 (h, w) gray or (h, w, 3) RGB → baseline JFIF bytes."""
    img = np.asarray(img)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if gray:
        planes = [img.astype(np.float64)]
        qts = [(_scaled_quant(QUANT_LUMA, quality), 0)]
        tabs = [(_DC_LUMA, _AC_LUMA, 0)]
    else:
        x = img.astype(np.float64)
        r, g, b = x[..., 0], x[..., 1], x[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, cb, cr]
        qts = [(_scaled_quant(QUANT_LUMA, quality), 0),
               (_scaled_quant(QUANT_CHROMA, quality), 1),
               (_scaled_quant(QUANT_CHROMA, quality), 1)]
        tabs = [(_DC_LUMA, _AC_LUMA, 0),
                (_DC_CHROMA, _AC_CHROMA, 1), (_DC_CHROMA, _AC_CHROMA, 1)]

    out = bytearray(b"\xff\xd8")                # SOI
    out += (b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00"
            + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1) + bytes([0, 0]))
    # DQT (distinct tables only)
    seen = {}
    for q, tq in qts:
        if tq in seen:
            continue
        seen[tq] = q
        zz = q.reshape(-1)[ZIGZAG].astype(np.uint8).tobytes()
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) + zz
    # SOF0
    nc = len(planes)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([nc])
    for ci, (_, tq) in enumerate(qts):
        sof += bytes([ci + 1, 0x11, tq])        # 1x1 sampling everywhere
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    # DHT
    emitted = set()
    enc_tabs = []
    for (dc, ac, th) in tabs:
        dcc = _canonical_codes(*dc)
        acc = _canonical_codes(*ac)
        enc_tabs.append((dcc, acc))
        for tc, (bits, vals) in ((0, dc), (1, ac)):
            if (tc, th) in emitted:
                continue
            emitted.add((tc, th))
            body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
            out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    # SOS
    sos = bytes([nc])
    for ci, (_, _, th) in enumerate(tabs):
        sos += bytes([ci + 1, (th << 4) | th])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    bw = _BitWriter()
    bh8 = -(-h // 8)
    bw8 = -(-w // 8)
    padded = []
    for p in planes:
        pp = np.empty((bh8 * 8, bw8 * 8))
        pp[:h, :w] = p
        pp[h:, :w] = p[h - 1:h, :]              # edge-replicate padding
        pp[:, w:] = pp[:, w - 1:w]
        padded.append(pp)
    pred = [0] * nc
    for my in range(bh8):
        for mx in range(bw8):
            for ci in range(nc):
                blk = padded[ci][my * 8:my * 8 + 8, mx * 8:mx * 8 + 8]
                pred[ci] = _encode_block(
                    bw, blk, qts[ci][0].astype(np.float64),
                    enc_tabs[ci][0], enc_tabs[ci][1], pred[ci])
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"                          # EOI
    return bytes(out)
