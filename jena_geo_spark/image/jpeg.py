"""Pure-numpy baseline JPEG (JFIF) encoder + decoder.

Closes the last documented codec stub (r2 VERDICT "What's missing" #1
kept JPG open because the container has no libjpeg/PIL).  Baseline
sequential DCT JPEG needs no codec library — it is DCT + quantization +
canonical Huffman over 8×8 blocks, all public-spec arithmetic (ITU-T
T.81 / ISO 10918-1; tables from Annex K).  Reference parity target:
``raster/exporter/AsJPG.java`` (ImageIO-backed in the reference).

Scope (exactly what the synthetic image table needs, strict otherwise):

* encode: 8-bit RGB, 4:4:4 (no chroma subsampling), standard Annex K
  quantization tables scaled by IJG quality, standard Annex K Huffman
  tables, single interleaved scan, no restart markers;
* decode: baseline SOF0, 8-bit, 1 or 3 components with all sampling
  factors 1×1, tables read from the stream (any valid canonical set,
  not just ours), single scan, no restart intervals.  Anything outside
  that raises ``ValueError`` rather than mis-decoding.

The DCT is the same orthonormal matmul kernel the phash uses (the
orthonormal 2-D DCT-II is bit-for-bit JPEG's FDCT definition), so
encode is one batched ``D8 @ blocks @ D8.T`` over all blocks; only the
entropy coding walks blocks in Python.  At engine level this sits
behind the arrow_udf payload-dedup path (image/spark.py), so each
distinct payload is entropy-decoded once per batch regardless of row
count — the per-row cost at 10^12 scale is a dictionary lookup.
"""

from __future__ import annotations

import struct

import numpy as np

from .codec import _dct_matrix

_D8 = _dct_matrix(8)

# ---------------------------------------------------------------- tables ----

# ITU-T T.81 Annex K.1 — luminance / chrominance quantization tables.
_QT_LUMA = np.array(
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
    dtype=np.float64,
)
_QT_CHROMA = np.array(
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
    dtype=np.float64,
)

# Annex K.3 — standard Huffman table specs: (bits[1..16], huffval).
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))
_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _zigzag_order() -> np.ndarray:
    """Row-major indices of the 8×8 zigzag walk, derived (not transcribed)."""
    out = []
    for s in range(15):
        ys = list(range(max(0, s - 7), min(7, s) + 1))
        for y in (reversed(ys) if s % 2 == 0 else ys):
            out.append(y * 8 + (s - y))
    return np.array(out, dtype=np.int64)


_ZZ = _zigzag_order()
_UNZZ = np.argsort(_ZZ)


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the canonical JPEG assignment (C.2)."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    assert k == len(vals) and k == sum(bits)
    return codes


_ENC_DC = (_canonical_codes(_DC_LUMA_BITS, _DC_LUMA_VALS),
           _canonical_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS))
_ENC_AC = (_canonical_codes(_AC_LUMA_BITS, _AC_LUMA_VALS),
           _canonical_codes(_AC_CHROMA_BITS, _AC_CHROMA_VALS))


def _quality_scale(tbl: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling: 1..100 → scaled, clipped table."""
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((tbl * scale + 50.0) // 100.0, 1, 255)


# -------------------------------------------------------------- colorspace --

def _rgb_to_ycbcr(arr: np.ndarray) -> np.ndarray:
    """(h,w,3) uint8 → float64 YCbCr (JFIF full-range, BT.601)."""
    a = arr.astype(np.float64)
    r, g, b = a[..., 0], a[..., 1], a[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


def _to_blocks(plane: np.ndarray) -> np.ndarray:
    """(H,W) float with H,W % 8 == 0 → (nb, 8, 8) raster-ordered blocks."""
    hh, ww = plane.shape
    return (
        plane.reshape(hh // 8, 8, ww // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
    )


def _from_blocks(blocks: np.ndarray, hh: int, ww: int) -> np.ndarray:
    return (
        blocks.reshape(hh // 8, ww // 8, 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(hh, ww)
    )


# ----------------------------------------------------------------- encoder --

class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing (B.1.1.5)
                self.out.append(0x00)
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


def _mag_bits(v: int) -> tuple[int, int]:
    """JPEG magnitude category + appended bits for a nonzero/zero DC-diff
    or AC coefficient (F.1.2.1: negatives stored as value-1 in `size` bits)."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    return size, (v if v > 0 else v + (1 << size) - 1)


def _segment(marker: int, payload: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload


def encode_jpeg(arr: np.ndarray, quality: int = 90) -> bytes:
    """(h, w, 3) uint8 RGB → baseline JFIF JPEG bytes (4:4:4, one scan)."""
    h, w, c = arr.shape
    assert c == 3 and arr.dtype == np.uint8
    assert 0 < w < 65536 and 0 < h < 65536
    qy = _quality_scale(_QT_LUMA, quality)
    qc = _quality_scale(_QT_CHROMA, quality)

    ycc = _rgb_to_ycbcr(arr)
    hh, ww = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(ycc, ((0, hh - h), (0, ww - w), (0, 0)), mode="edge")

    # batched FDCT + quantization for all blocks of all three components
    quant: list[np.ndarray] = []
    for ci in range(3):
        blocks = _to_blocks(padded[..., ci]) - 128.0
        coef = _D8 @ blocks @ _D8.T
        q = qy if ci == 0 else qc
        quant.append(
            np.round(coef / q).astype(np.int32).reshape(-1, 64)[:, _ZZ]
        )

    # entropy coding: interleaved MCUs (4:4:4 → one block per component)
    bw = _BitWriter()
    pred = [0, 0, 0]
    nmcu = (hh // 8) * (ww // 8)
    for m in range(nmcu):
        for ci in range(3):
            tsel = 0 if ci == 0 else 1
            dc_codes, ac_codes = _ENC_DC[tsel], _ENC_AC[tsel]
            blk = quant[ci][m]
            diff = int(blk[0]) - pred[ci]
            pred[ci] = int(blk[0])
            size, bits = _mag_bits(diff)
            code, length = dc_codes[size]
            bw.write(code, length)
            if size:
                bw.write(bits, size)
            run = 0
            nz = np.nonzero(blk[1:])[0]
            last = nz[-1] + 1 if len(nz) else 0
            for k in range(1, last + 1):
                v = int(blk[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, length = ac_codes[0xF0]  # ZRL
                    bw.write(code, length)
                    run -= 16
                size, bits = _mag_bits(v)
                code, length = ac_codes[(run << 4) | size]
                bw.write(code, length)
                bw.write(bits, size)
                run = 0
            if last < 63:
                code, length = ac_codes[0x00]  # EOB
                bw.write(code, length)
    bw.flush()

    def dqt(tid: int, tbl: np.ndarray) -> bytes:
        return _segment(
            0xDB, bytes([tid]) + bytes(tbl.astype(np.uint8).reshape(64)[_ZZ])
        )

    def dht(cls: int, tid: int, bits: list[int], vals: list[int]) -> bytes:
        return _segment(0xC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))

    sof = struct.pack(">BHHB", 8, h, w, 3)
    for cid in (1, 2, 3):
        sof += bytes([cid, 0x11, 0 if cid == 1 else 1])  # 1×1 sampling
    sos = bytes([3])
    for cid in (1, 2, 3):
        sos += bytes([cid, 0x00 if cid == 1 else 0x11])
    sos += bytes([0, 63, 0])  # full spectral selection, no approximation

    return (
        b"\xff\xd8"  # SOI
        + _segment(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
        + dqt(0, qy)
        + dqt(1, qc)
        + _segment(0xC0, sof)
        + dht(0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS)
        + dht(1, 0, _AC_LUMA_BITS, _AC_LUMA_VALS)
        + dht(0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS)
        + dht(1, 1, _AC_CHROMA_BITS, _AC_CHROMA_VALS)
        + _segment(0xDA, sos)
        + bytes(bw.out)
        + b"\xff\xd9"  # EOI
    )


# ----------------------------------------------------------------- decoder --

class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        self.pos = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.bits):
            raise ValueError("truncated JPEG entropy stream")
        b = int(self.bits[self.pos])
        self.pos += 1
        return b

    def read(self, n: int) -> int:
        if self.pos + n > len(self.bits):
            raise ValueError("truncated JPEG entropy stream")
        v = 0
        for b in self.bits[self.pos : self.pos + n]:
            v = (v << 1) | int(b)
        self.pos += n
        return v


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    inv = {}
    for sym, (code, length) in _canonical_codes(bits, vals).items():
        inv[(length, code)] = sym
    return inv


def _read_symbol(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in JPEG stream")


def _extend(v: int, size: int) -> int:
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JFIF JPEG bytes → (h, w, 3) uint8 RGB (or grayscale
    replicated to 3 channels for 1-component streams)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    comps: list[tuple[int, int]] = []  # (component id, qtable id) in SOF order
    h = w = 0
    off = 2
    scan: bytes | None = None
    scan_sel: list[tuple[int, int, int]] = []  # (comp index, dc id, ac id)
    while off < len(data):
        if data[off] != 0xFF:
            raise ValueError(f"marker expected at {off}")
        marker = data[off + 1]
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack_from(">H", data, off + 2)
        payload = data[off + 4 : off + 2 + seglen]
        off += 2 + seglen
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            p = 0
            while p < len(payload):
                pq_tid = payload[p]
                if pq_tid >> 4 != 0:
                    raise ValueError("16-bit quant tables unsupported")
                tbl = np.zeros(64, dtype=np.float64)
                tbl[_ZZ] = np.frombuffer(payload[p + 1 : p + 65], dtype=np.uint8)
                qtables[pq_tid & 0x0F] = tbl.reshape(8, 8)
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(payload):
                cls_tid = payload[p]
                bits = list(payload[p + 1 : p + 17])
                n = sum(bits)
                vals = list(payload[p + 17 : p + 17 + n])
                htables[(cls_tid >> 4, cls_tid & 0x0F)] = _decode_table(bits, vals)
                p += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack_from(">BHHB", payload)
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            if nc not in (1, 3):
                raise ValueError("only 1 or 3 components supported")
            for ci in range(nc):
                cid, samp, tq = payload[6 + 3 * ci : 9 + 3 * ci]
                if samp != 0x11:
                    raise ValueError("chroma subsampling unsupported (need 1x1)")
                comps.append((cid, tq))
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(f"non-baseline SOF marker 0xFF{marker:02X}")
        elif marker == 0xDD:
            raise ValueError("restart intervals unsupported")
        elif marker == 0xDA:  # SOS — entropy data follows the header
            ns = payload[0]
            for si in range(ns):
                cs, tt = payload[1 + 2 * si : 3 + 2 * si]
                idx = next(i for i, (cid, _) in enumerate(comps) if cid == cs)
                scan_sel.append((idx, tt >> 4, tt & 0x0F))
            # un-stuff entropy bytes until the next real marker
            raw = bytearray()
            p = off
            while p < len(data):
                b = data[p]
                if b == 0xFF:
                    nxt = data[p + 1]
                    if nxt == 0x00:
                        raw.append(0xFF)
                        p += 2
                        continue
                    if 0xD0 <= nxt <= 0xD7:
                        raise ValueError("restart markers unsupported")
                    break
                raw.append(b)
                p += 1
            scan = bytes(raw)
            off = p
        # APPn/COM and anything else: skipped
    if scan is None or not comps:
        raise ValueError("no scan data found")

    nc = len(comps)
    hh, ww = -(-h // 8) * 8, -(-w // 8) * 8
    nmcu = (hh // 8) * (ww // 8)
    coeffs = [np.zeros((nmcu, 64), dtype=np.float64) for _ in range(nc)]
    br = _BitReader(scan)
    pred = [0] * nc
    for m in range(nmcu):
        for idx, dc_id, ac_id in scan_sel:
            dct = htables.get((0, dc_id))
            act = htables.get((1, ac_id))
            if dct is None or act is None:
                raise ValueError("missing Huffman table for scan")
            blk = coeffs[idx][m]
            size = _read_symbol(br, dct)
            diff = _extend(br.read(size), size)
            pred[idx] += diff
            blk[0] = pred[idx]
            k = 1
            while k < 64:
                rs = _read_symbol(br, act)
                if rs == 0x00:  # EOB
                    break
                run, size = rs >> 4, rs & 0x0F
                if size == 0:
                    if run != 15:
                        raise ValueError("invalid AC symbol")
                    k += 16  # ZRL
                    continue
                k += run
                if k > 63:
                    raise ValueError("AC coefficient index overflow")
                blk[k] = _extend(br.read(size), size)
                k += 1

    planes = []
    for idx, (cid, tq) in enumerate(comps):
        q = qtables.get(tq)
        if q is None:
            raise ValueError(f"missing quant table {tq}")
        deq = np.zeros((nmcu, 64), dtype=np.float64)
        deq[:, _ZZ] = coeffs[idx]  # de-zigzag
        blocks = deq.reshape(-1, 8, 8) * q
        spatial = _D8.T @ blocks @ _D8 + 128.0  # batched IDCT
        planes.append(_from_blocks(spatial, hh, ww)[:h, :w])
    if nc == 1:
        y = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return np.repeat(y[:, :, None], 3, axis=2)
    return _ycbcr_to_rgb(np.stack(planes, axis=-1))
