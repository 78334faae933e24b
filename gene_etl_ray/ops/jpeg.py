"""Pure-python baseline JPEG codec (grayscale AND 3-component color,
sequential DCT).

The container has no PIL/libjpeg, but baseline JFIF is a fully public
format (ITU-T T.81): 8×8 block DCT → quantization (Annex K.1/K.2
tables, libjpeg quality scaling) → zigzag → DPCM DC + run-length AC →
canonical Huffman (Annex K.3 tables) → byte-stuffed entropy stream.
This module implements exactly that, both directions, so the multimodal
stages (`ops/multimodal.py`) can decode/resize the dominant web image
format with REAL bytes instead of a declared stub; the
NotImplementedError slot narrows to progressive JPEG / MP3 / video.

Scope (documented contract): 8-bit baseline sequential (SOF0),
grayscale (1 component) and YCbCr color (3 components, interleaved
scan, any sampling factors in {1, 2} — 4:4:4 / 4:2:2 / 4:2:0), optional
restart intervals on decode. The color encoder emits the standard web
shape: 4:2:0 subsampled YCbCr (BT.601 full-range JFIF matrix), Annex
K.1 luma + K.2 chroma quantization, K.3 luma + chroma Huffman tables.
Progressive (SOF2), arithmetic coding and non-interleaved
multi-component scans raise NotImplementedError at the exact call site
a libjpeg decoder slots into. Only the ENCODER here ever produces
fixture bytes, but the decoder parses the real marker structure so any
conforming baseline sequential JPEG decodes.

Reference parity note: the reference engine has no media path at all
(brief-driven component); the codec cites only the public standard.
"""

from __future__ import annotations

import numpy as np

# --- Annex K.1 luminance quantization table (natural order) ---
QUANT_LUMA = np.array(
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

# --- Annex K.2 chrominance quantization table (natural order) ---
QUANT_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int32,
)

# zigzag scan: ZIGZAG[i] = natural index of the i-th zigzag coefficient
_z = np.arange(64).reshape(8, 8)
_order = []
for s in range(15):
    diag = [(i, s - i) for i in range(8) if 0 <= s - i < 8]
    if s % 2 == 0:
        diag = diag[::-1]
    _order += diag
ZIGZAG = np.array([_z[i, j] for i, j in _order], dtype=np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

# --- Annex K.3 luminance Huffman tables: (bits[1..16], huffval) ---
DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))
AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_VALS = [
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

# --- Annex K.3 chrominance Huffman tables ---
DC_BITS_C = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_VALS_C = list(range(12))
AC_BITS_C = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_VALS_C = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
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
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# orthogonal 8-point DCT basis with the JPEG 1/4·c(u)c(v) normalization:
# T[u, x] = c(u)/2 · cos((2x+1)uπ/16); FDCT = T f Tᵀ, IDCT = Tᵀ F T
_x = np.arange(8)
_T = 0.5 * np.cos((2 * _x[None, :] + 1) * _x[:, None] * np.pi / 16.0)
_T[0] /= np.sqrt(2.0)


def _quant_table(quality: int, base: np.ndarray | None = None) -> np.ndarray:
    """libjpeg quality scaling of an Annex K table (K.1 luma default)."""
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = ((QUANT_LUMA if base is None else base) * scale + 50) // 100
    return np.clip(q, 1, 255).astype(np.int32)


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """value -> (code, length), canonical construction (T.81 C.2)."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


_DC_ENC = _huff_codes(DC_BITS, DC_VALS)
_AC_ENC = _huff_codes(AC_BITS, AC_VALS)


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill per T.81 F.1.2.3
        return bytes(self.buf)


def _magnitude(v: int) -> tuple[int, int]:
    """(category, appended bits) for a DC diff / AC value."""
    s = int(abs(v)).bit_length()
    bits = v if v >= 0 else v + (1 << s) - 1
    return s, bits


def _encode_data_unit(
    bw: _BitWriter,
    block: np.ndarray,
    q: np.ndarray,
    dc_enc: dict,
    ac_enc: dict,
    prev_dc: int,
) -> int:
    """FDCT → quantize → zigzag → Huffman one 8×8 level-shifted block;
    returns the new DC predictor. Shared by the gray and color encoders
    (per T.81 F.1.2 — the per-data-unit procedure is component-agnostic,
    only the tables and the predictor differ)."""
    coefs = _T @ block @ _T.T
    zq = np.rint(coefs / q).astype(np.int64).ravel()[ZIGZAG]
    diff = int(zq[0]) - prev_dc
    s, bits = _magnitude(diff)
    code, ln = dc_enc[s]
    bw.write(code, ln)
    if s:
        bw.write(bits, s)
    nz = np.nonzero(zq[1:])[0]
    pos = 0
    for i in nz:
        run = int(i) - pos
        while run > 15:
            code, ln = ac_enc[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        s, bits = _magnitude(int(zq[1 + i]))
        code, ln = ac_enc[(run << 4) | s]
        bw.write(code, ln)
        bw.write(bits, s)
        pos = int(i) + 1
    if pos < 63:
        code, ln = ac_enc[0x00]  # EOB
        bw.write(code, ln)
    return int(zq[0])


def jpeg_encode_gray(arr: np.ndarray, quality: int = 85) -> bytes:
    """Baseline sequential grayscale JFIF bytes for a (h, w) uint8 array."""
    arr = np.asarray(arr)
    if arr.ndim != 2 or arr.dtype != np.uint8:
        raise ValueError("jpeg_encode_gray expects a 2-D uint8 array")
    h, w = arr.shape
    if not h or not w or h > 65535 or w > 65535:
        raise ValueError("image dimensions out of JPEG range")
    q = _quant_table(quality)
    # edge-replicate pad to 8×8 multiples
    ph, pw = -h % 8, -w % 8
    img = np.pad(arr.astype(np.float64) - 128.0, ((0, ph), (0, pw)), mode="edge")
    bw = _BitWriter()
    prev_dc = 0
    for by in range(0, img.shape[0], 8):
        for bx in range(0, img.shape[1], 8):
            prev_dc = _encode_data_unit(
                bw, img[by : by + 8, bx : bx + 8], q,
                _DC_ENC, _AC_ENC, prev_dc)
    scan = bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload

    def dht(tc_th: int, bits: list[int], vals: list[int]) -> bytes:
        return bytes([tc_th] + bits + vals)

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0]) + bytes(int(v) for v in q.ravel()[ZIGZAG]))
    out += seg(0xC0, bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
               + bytes([1, 1, 0x11, 0]))
    out += seg(0xC4, dht(0x00, DC_BITS, DC_VALS))
    out += seg(0xC4, dht(0x10, AC_BITS, AC_VALS))
    out += seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


_DC_ENC_C = _huff_codes(DC_BITS_C, DC_VALS_C)
_AC_ENC_C = _huff_codes(AC_BITS_C, AC_VALS_C)

# BT.601 full-range RGB↔YCbCr (the JFIF matrix, T.871 §7)
_RGB2Y = np.array([0.299, 0.587, 0.114])
_RGB2CB = np.array([-0.168735892, -0.331264108, 0.5])
_RGB2CR = np.array([0.5, -0.418687589, -0.081312411])


def jpeg_encode_color(arr: np.ndarray, quality: int = 85) -> bytes:
    """Baseline sequential 4:2:0 YCbCr JFIF bytes for a (h, w, 3) uint8
    RGB array — the dominant web-JPEG shape (3 components, Y at 2×2
    sampling, chroma quartered). Interleaved single scan: each MCU is
    four Y data units (2×2), one Cb, one Cr, each component carrying its
    own DPCM DC predictor (T.81 A.2.3)."""
    arr = np.asarray(arr)
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError("jpeg_encode_color expects a (h, w, 3) uint8 array")
    h, w = arr.shape[:2]
    if not h or not w or h > 65535 or w > 65535:
        raise ValueError("image dimensions out of JPEG range")
    rgb = arr.astype(np.float64)
    y = rgb @ _RGB2Y - 128.0
    cb = rgb @ _RGB2CB
    cr = rgb @ _RGB2CR
    # pad to full 16×16 MCUs (edge replicate), then 2×2-mean subsample
    # the chroma planes (the 4:2:0 downsample)
    ph, pw = -h % 16, -w % 16
    y = np.pad(y, ((0, ph), (0, pw)), mode="edge")
    cb = np.pad(cb, ((0, ph), (0, pw)), mode="edge")
    cr = np.pad(cr, ((0, ph), (0, pw)), mode="edge")
    H, W = y.shape
    cb2 = cb.reshape(H // 2, 2, W // 2, 2).mean(axis=(1, 3))
    cr2 = cr.reshape(H // 2, 2, W // 2, 2).mean(axis=(1, 3))
    qy = _quant_table(quality)
    qc = _quant_table(quality, QUANT_CHROMA)
    bw = _BitWriter()
    dcy = dcb = dcr = 0
    for my in range(0, H, 16):
        for mx in range(0, W, 16):
            for r in (0, 8):
                for c in (0, 8):
                    dcy = _encode_data_unit(
                        bw, y[my + r : my + r + 8, mx + c : mx + c + 8],
                        qy, _DC_ENC, _AC_ENC, dcy)
            cy, cx = my // 2, mx // 2
            dcb = _encode_data_unit(
                bw, cb2[cy : cy + 8, cx : cx + 8], qc,
                _DC_ENC_C, _AC_ENC_C, dcb)
            dcr = _encode_data_unit(
                bw, cr2[cy : cy + 8, cx : cx + 8], qc,
                _DC_ENC_C, _AC_ENC_C, dcr)
    scan = bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload

    def dht(tc_th: int, bits: list[int], vals: list[int]) -> bytes:
        return bytes([tc_th] + bits + vals)

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0]) + bytes(int(v) for v in qy.ravel()[ZIGZAG]))
    out += seg(0xDB, bytes([1]) + bytes(int(v) for v in qc.ravel()[ZIGZAG]))
    out += seg(
        0xC0,
        bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
        + bytes([3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )
    out += seg(0xC4, dht(0x00, DC_BITS, DC_VALS))
    out += seg(0xC4, dht(0x10, AC_BITS, AC_VALS))
    out += seg(0xC4, dht(0x01, DC_BITS_C, DC_VALS_C))
    out += seg(0xC4, dht(0x11, AC_BITS_C, AC_VALS_C))
    out += seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    """MSB-first reader over the de-stuffed entropy segment."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self, need: int) -> None:
        while self.nbits < need:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG entropy stream")
            self.acc = (self.acc << 8) | self.data[self.pos]
            self.pos += 1
            self.nbits += 8

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        self._fill(n)
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1
        return v


def _huff_decoder(bits: list[int], vals: list[int]):
    """(mincode, maxcode, valptr) fast canonical decode (T.81 F.2.2.3)."""
    mincode, maxcode, valptr = [0] * 17, [-1] * 17, [0] * 17
    code, k = 0, 0
    for length in range(1, 17):
        if bits[length - 1]:
            valptr[length] = k
            mincode[length] = code
            code += bits[length - 1]
            k += bits[length - 1]
            maxcode[length] = code - 1
        else:
            maxcode[length] = -1
        code <<= 1

    def decode(br: _BitReader) -> int:
        code = br.read(1)
        for length in range(1, 17):
            if maxcode[length] != -1 and code <= maxcode[length]:
                return vals[valptr[length] + code - mincode[length]]
            if length < 16:
                code = (code << 1) | br.read(1)
        raise ValueError("invalid JPEG Huffman code")

    return decode


def _extend(bits: int, s: int) -> int:
    if s == 0:
        return 0
    return bits if bits >= (1 << (s - 1)) else bits - (1 << s) + 1


def jpeg_decode(data: bytes) -> np.ndarray:
    """Decode baseline sequential JPEG bytes: (h, w) uint8 for a
    grayscale image, (h, w, 3) uint8 RGB for a 3-component YCbCr image
    (interleaved scan, component sampling factors in {1, 2} — covers
    4:4:4 / 4:2:2 / 4:2:0).

    Raises NotImplementedError for progressive (SOF2) / arithmetic /
    non-interleaved multi-component scans — the exact slot a libjpeg
    binding fills."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], object] = {}
    h = w = 0
    comps: list[tuple[int, int, int, int]] = []  # (cid, hf, vf, tq)
    restart_interval = 0
    while pos < len(data):
        if pos + 1 >= len(data):
            raise ValueError("truncated JPEG (marker cut off)")
        if data[pos] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        marker = data[pos + 1]
        if marker == 0xFF:  # T.81 B.1.1.2: optional 0xFF fill bytes
            pos += 1
            continue
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        ln = int.from_bytes(data[pos : pos + 2], "big")
        payload = data[pos + 2 : pos + ln]
        if marker == 0xDB:  # DQT (possibly several tables)
            p = 0
            while p < len(payload):
                pq, tq_id = payload[p] >> 4, payload[p] & 0xF
                p += 1
                if pq == 0:
                    t = np.frombuffer(payload[p : p + 64], np.uint8).astype(np.int32)
                    p += 64
                else:
                    t = np.frombuffer(
                        payload[p : p + 128], ">u2").astype(np.int32)
                    p += 128
                nat = np.empty(64, np.int32)
                nat[ZIGZAG] = t
                qtables[tq_id] = nat.reshape(8, 8)
        elif marker == 0xC4:  # DHT (possibly several tables)
            p = 0
            while p < len(payload):
                tc, th = payload[p] >> 4, payload[p] & 0xF
                bits = list(payload[p + 1 : p + 17])
                n = sum(bits)
                vals = list(payload[p + 17 : p + 17 + n])
                huff[(tc, th)] = _huff_decoder(bits, vals)
                p += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            if payload[0] != 8:
                raise NotImplementedError("only 8-bit JPEG supported")
            h = int.from_bytes(payload[1:3], "big")
            w = int.from_bytes(payload[3:5], "big")
            ncomp = payload[5]
            if ncomp not in (1, 3):
                raise NotImplementedError(
                    "only 1- or 3-component baseline JPEG supported; "
                    "plug libjpeg/PIL here for CMYK/YCCK"
                )
            comps = []
            for i in range(ncomp):
                cid = payload[6 + 3 * i]
                hv = payload[7 + 3 * i]
                hf, vf = hv >> 4, hv & 0xF
                if hf not in (1, 2) or vf not in (1, 2):
                    raise NotImplementedError(
                        "sampling factors beyond 2 not supported")
                comps.append((cid, hf, vf, payload[8 + 3 * i]))
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "progressive/extended JPEG decode requires an external "
                "media library not present in this environment; plug "
                "libjpeg/PIL here"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(payload[0:2], "big")
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = payload[0]
            if ns != len(comps):
                raise NotImplementedError(
                    "non-interleaved multi-component scan not supported")
            scan_tables = []
            for i in range(ns):
                sc_id = payload[1 + 2 * i]
                td, ta = payload[2 + 2 * i] >> 4, payload[2 + 2 * i] & 0xF
                match = [c for c in comps if c[0] == sc_id]
                if not match:
                    raise ValueError("SOS names unknown component id")
                scan_tables.append(
                    (match[0], huff[(0, td)], huff[(1, ta)]))
            pos += ln
            # entropy segment: up to the next non-RST marker, de-stuffed
            scan = bytearray()
            rst_positions = []
            p = pos
            while p < len(data) - 1:
                if data[p] == 0xFF:
                    nxt = data[p + 1]
                    if nxt == 0x00:
                        scan.append(0xFF)
                        p += 2
                        continue
                    if 0xD0 <= nxt <= 0xD7:  # RST marker: boundary marker
                        rst_positions.append(len(scan))
                        p += 2
                        continue
                    break
                scan.append(data[p])
                p += 1
            if len(comps) == 1:
                (_, _, _, tq), dc_dec, ac_dec = scan_tables[0]
                return _decode_scan(
                    bytes(scan), rst_positions, h, w, qtables[tq],
                    dc_dec, ac_dec, restart_interval,
                )
            return _decode_scan_interleaved(
                bytes(scan), rst_positions, h, w, qtables,
                scan_tables, restart_interval,
            )
        pos += ln
    raise ValueError("no SOS scan in JPEG")


def jpeg_decode_gray(data: bytes) -> np.ndarray:
    """Decode baseline JPEG bytes to a (h, w) uint8 GRAYSCALE plane:
    grayscale images pass through; color images return their BT.601
    luma (the Y plane the gray feature/resample stages operate on)."""
    img = jpeg_decode(data)
    if img.ndim == 2:
        return img
    return np.clip(
        np.rint(img.astype(np.float64) @ _RGB2Y), 0, 255
    ).astype(np.uint8)


def _decode_data_unit(br: _BitReader, dc_dec, ac_dec, prev_dc: int):
    """Huffman-decode one 8×8 data unit; returns (zigzag coeffs, dc)."""
    s = dc_dec(br)
    dc = prev_dc + _extend(br.read(s), s)
    zq = np.zeros(64, np.int64)
    zq[0] = dc
    kcoef = 1
    while kcoef < 64:
        rs = ac_dec(br)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:  # ZRL
                kcoef += 16
                continue
            break  # EOB
        kcoef += r
        if kcoef > 63:
            raise ValueError("AC coefficient index out of range")
        zq[kcoef] = _extend(br.read(s), s)
        kcoef += 1
    return zq, dc


def _idct_block(zq: np.ndarray, q: np.ndarray) -> np.ndarray:
    coefs = (zq[UNZIGZAG].reshape(8, 8) * q).astype(np.float64)
    return _T.T @ coefs @ _T


def _restart(br: _BitReader, rst_positions: list[int]) -> None:
    """Byte-align at an RST boundary (T.81 F.2.1.3.1)."""
    br.nbits = 0
    br.acc = 0
    if rst_positions:
        br.pos = rst_positions.pop(0)


def _decode_scan(scan, rst_positions, h, w, q, dc_dec, ac_dec, dri):
    bw_blocks = (w + 7) // 8
    bh_blocks = (h + 7) // 8
    out = np.zeros((bh_blocks * 8, bw_blocks * 8), np.float64)
    br = _BitReader(scan)
    prev_dc = 0
    nblock = 0
    for by in range(bh_blocks):
        for bx in range(bw_blocks):
            if dri and nblock and nblock % dri == 0:
                _restart(br, rst_positions)
                prev_dc = 0
            zq, prev_dc = _decode_data_unit(br, dc_dec, ac_dec, prev_dc)
            out[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = _idct_block(zq, q)
            nblock += 1
    return np.clip(np.rint(out[:h, :w] + 128.0), 0, 255).astype(np.uint8)


def _decode_scan_interleaved(
    scan, rst_positions, h, w, qtables, scan_tables, dri
):
    """Interleaved multi-component scan (T.81 A.2.3): MCUs in raster
    order; within each MCU every scan component contributes its v×h
    data units left-to-right, top-to-bottom; each component keeps its
    own DC predictor; a restart interval counts MCUs and resets all
    predictors. Chroma planes are upsampled by sample replication and
    the BT.601 full-range inverse matrix maps YCbCr → RGB."""
    hmax = max(c[0][1] for c in scan_tables)
    vmax = max(c[0][2] for c in scan_tables)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    planes = []
    for (cid, hf, vf, tq), _, _ in scan_tables:
        planes.append(np.zeros((mcus_y * vf * 8, mcus_x * hf * 8), np.float64))
    br = _BitReader(scan)
    prev = [0] * len(scan_tables)
    nmcu = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if dri and nmcu and nmcu % dri == 0:
                _restart(br, rst_positions)
                prev = [0] * len(scan_tables)
            for ci, ((cid, hf, vf, tq), dc_dec, ac_dec) in enumerate(
                scan_tables
            ):
                q = qtables[tq]
                for r in range(vf):
                    for c in range(hf):
                        zq, prev[ci] = _decode_data_unit(
                            br, dc_dec, ac_dec, prev[ci])
                        by, bx = my * vf + r, mx * hf + c
                        planes[ci][
                            by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8
                        ] = _idct_block(zq, q)
            nmcu += 1
    full = []
    for pi, ((cid, hf, vf, tq), _, _) in enumerate(scan_tables):
        p = planes[pi]
        # replicate up to full resolution, then crop to (h, w)
        if vf < vmax:
            p = np.repeat(p, vmax // vf, axis=0)
        if hf < hmax:
            p = np.repeat(p, hmax // hf, axis=1)
        full.append(p[:h, :w])
    ycc = np.stack(full, axis=-1)  # SOF order assumed Y, Cb, Cr
    y = ycc[..., 0] + 128.0
    cb = ycc[..., 1]
    cr = ycc[..., 2]
    rgb = np.stack(
        [
            y + 1.402 * cr,
            y - 0.344136286 * cb - 0.714136286 * cr,
            y + 1.772 * cb,
        ],
        axis=-1,
    )
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)
