"""Image payload codecs — pure python/numpy (no PIL in this environment).

The input table carries opaque image ``bytes`` with (w, h, fmt) metadata
(BASELINE input_hint).  Formats:

* ``raw`` — band-interleaved uint8 RGB, C-order, exactly w*h*3 bytes;
* ``png`` — real PNG (8-bit RGB, filter 0, zlib), encoder+decoder below;
* ``jpg`` — real baseline JFIF JPEG, pure-numpy encoder+decoder in
  ``image/jpeg.py`` (DCT + Annex-K quantization/Huffman — no codec
  library needed); the generator emits jpg rows with the stored phash
  computed from the DECODED (lossy) pixels so the verify gate is exact,
  and generation asserts the PSNR ≥ 40 dB lossy invariant per payload.

``phash64`` is a DCT-based 64-bit perceptual hash (numpy matmul DCT-II),
deterministic from the pixel array.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → PNG bytes (color type 2, bit depth 8, filter 0)."""
    h, w, c = arr.shape
    assert c == 3 and arr.dtype == np.uint8
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", zlib.compress(raw, 6)) + _chunk(b"IEND", b"")


def decode_png(data: bytes) -> np.ndarray:
    assert data[:8] == _PNG_SIG, "not a PNG"
    off, w = 8, 0
    h = 0
    idat = b""
    while off < len(data):
        (ln,) = struct.unpack_from(">I", data, off)
        tag = data[off + 4 : off + 8]
        payload = data[off + 8 : off + 8 + ln]
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack_from(">IIBB", payload)[:4]
            assert depth == 8 and ctype == 2, "only 8-bit RGB supported"
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        off += 12 + ln
    raw = zlib.decompress(idat)
    stride = w * 3 + 1
    out = np.empty((h, w, 3), dtype=np.uint8)
    prev = np.zeros(w * 3, dtype=np.uint8)
    for y in range(h):
        row = raw[y * stride : (y + 1) * stride]
        ftype, body = row[0], np.frombuffer(row[1:], dtype=np.uint8).copy()
        if ftype == 0:
            line = body
        elif ftype == 1:  # Sub
            line = body
            for i in range(3, len(line)):
                line[i] = (int(line[i]) + int(line[i - 3])) & 0xFF
        elif ftype == 2:  # Up
            line = (body.astype(np.int16) + prev).astype(np.uint8)
        elif ftype == 3:  # Average
            line = body
            for i in range(len(line)):
                left = int(line[i - 3]) if i >= 3 else 0
                line[i] = (int(line[i]) + (left + int(prev[i])) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            line = body
            for i in range(len(line)):
                a = int(line[i - 3]) if i >= 3 else 0
                b = int(prev[i])
                cc = int(prev[i - 3]) if i >= 3 else 0
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                line[i] = (int(line[i]) + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {ftype}")
        out[y] = line.reshape(w, 3)
        prev = line
    return out


def encode_raw(arr: np.ndarray) -> bytes:
    return np.ascontiguousarray(arr, dtype=np.uint8).tobytes()


def decode_raw(data: bytes, w: int, h: int) -> np.ndarray:
    return np.frombuffer(data, dtype=np.uint8).reshape(h, w, 3).copy()


def decode(data: bytes, w: int, h: int, fmt: str) -> np.ndarray:
    if fmt == "raw":
        return decode_raw(data, w, h)
    if fmt == "png":
        return decode_png(data)
    if fmt == "jpg":
        from . import jpeg  # deferred: jpeg.py imports this module's DCT

        return jpeg.decode_jpeg(data)
    raise ValueError(f"unknown fmt {fmt}")


# ---------------------------------------------------------------- phash ----

def _dct_matrix(n: int) -> np.ndarray:
    k = np.arange(n).reshape(-1, 1)
    i = np.arange(n).reshape(1, -1)
    m = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * i + 1) * k / (2.0 * n))
    m[0] /= np.sqrt(2.0)
    return m


_D32 = _dct_matrix(32)


def gray32(arr: np.ndarray) -> np.ndarray:
    """Luma + 32×32 subsample of an RGB uint8 array (phash preprocessing)."""
    gray = arr.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    h, w = gray.shape
    ys = (np.arange(32) * h // 32).clip(0, h - 1)
    xs = (np.arange(32) * w // 32).clip(0, w - 1)
    return gray[np.ix_(ys, xs)]


def phash64_batch(g32: np.ndarray) -> np.ndarray:
    """64-bit DCT perceptual hashes for a STACK of 32×32 luma planes
    (n,32,32) → (n,) int64 — one broadcast matmul pair for the whole batch
    instead of per-row DCTs (the r1 flagship-verify hot spot, VERDICT #5)."""
    g32 = np.asarray(g32, dtype=np.float64).reshape(-1, 32, 32)
    d = _D32 @ g32 @ _D32.T  # (n,32,32): batched DCT-II both axes
    low = d[:, :8, :8].reshape(len(g32), 64)
    med = np.median(low[:, 1:], axis=1)  # skip DC term for the threshold
    bits = (low > med[:, None]).astype(np.uint64)
    weights = np.uint64(1) << np.arange(63, -1, -1, dtype=np.uint64)
    return (bits * weights).sum(axis=1, dtype=np.uint64).astype(np.int64)


def phash64(arr: np.ndarray) -> int:
    """64-bit DCT perceptual hash of an RGB uint8 array (deterministic) —
    single-image view of ``phash64_batch`` (same code path bit-for-bit)."""
    return int(phash64_batch(gray32(arr)[None, :, :])[0])


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(255.0**2 / mse))
