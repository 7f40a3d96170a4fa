"""From-scratch image codecs (stdlib zlib + numpy only — no PIL/cv2).

The reference stores chips as raw ``.npy`` files and PNG composites via
PIL (tree_health_detection/store_data_structures.py:30,36,97-144). This
engine inlines chips as a ``bytes`` binary column (SURVEY.md §1.3), so
it needs its own codecs:

- ``png``: lossless, real PNG files (8-bit, RGB/RGBA/gray), filter 0..4
  supported on decode, filter 0 on encode. Decoded pixels are
  bit-exact (``np.allclose`` gate in BASELINE.md).
- ``qdct``: simple lossy 8×8 block-DCT quantization codec (numpy
  matmul DCT — scipy absent in-sandbox). Quality default keeps
  PSNR ≥ 40 dB per BASELINE.json's per-row invariant.
- ``npy``: raw numpy buffer passthrough for float cubes (HSI), the
  moral equivalent of the reference's np.save per-crown cubes.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = ["encode", "decode", "encode_png", "decode_png", "encode_qdct",
           "decode_qdct", "encode_npy", "decode_npy", "encode_wav",
           "decode_wav", "psnr", "average_hash"]

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray) -> bytes:
    """Encode HxW (gray), HxWx3 (RGB) or HxWx4 (RGBA) uint8 → PNG.

    zlib level 2: PNG is lossless at any level (decoded pixels are
    bit-identical), and level 6 cost ~2.5× the compress time of the
    chip-extraction hot loop for ~10% smaller chips."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    color_type = {1: 0, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    # filter byte 0 per scanline
    raw = np.empty((h, 1 + w * c), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = img.reshape(h, w * c)
    idat = zlib.compress(raw.tobytes(), 2)
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    w = h = bit_depth = color_type = None
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, bit_depth, color_type, _, _, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if bit_depth != 8 or interlace != 0:
                raise ValueError("unsupported PNG variant")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    c = {0: 1, 2: 3, 4: 2, 6: 4}[color_type]
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8)
    stride = 1 + w * c
    raw = raw.reshape(h, stride)
    filters = raw[:, 0]
    if not filters.any():  # all filter 0 (our own encoder's output):
        img = raw[:, 1:].reshape(h, w, c).copy()  # skip the row loop
        return img[:, :, 0] if c == 1 else img
    out = np.zeros((h, w * c), dtype=np.uint8)
    bpp = c
    for y in range(h):
        line = raw[y, 1:].astype(np.int32)
        f = filters[y]
        prev = out[y - 1].astype(np.int32) if y > 0 else np.zeros(w * c, np.int32)
        if f == 0:
            rec = line
        elif f == 2:  # Up
            rec = (line + prev) & 0xFF
        elif f in (1, 3, 4):  # Sub / Average / Paeth need sequential scan
            rec = np.empty(w * c, dtype=np.int32)
            for i in range(w * c):
                a = rec[i - bpp] if i >= bpp else 0
                b = prev[i]
                if f == 1:
                    rec[i] = (line[i] + a) & 0xFF
                elif f == 3:
                    rec[i] = (line[i] + ((a + b) >> 1)) & 0xFF
                else:
                    cc = prev[i - bpp] if i >= bpp else 0
                    p = a + b - cc
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                    rec[i] = (line[i] + pred) & 0xFF
        else:
            raise ValueError(f"bad filter {f}")
        out[y] = rec.astype(np.uint8)
    img = out.reshape(h, w, c)
    return img[:, :, 0] if c == 1 else img


# ---------------------------------------------------------------- qdct

_Q50 = np.array(
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


def _dct_matrix(n: int = 8) -> np.ndarray:
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    m = np.sqrt(2.0 / n) * np.cos((2 * i + 1) * k * np.pi / (2 * n))
    m[0] = np.sqrt(1.0 / n)
    return m


_DCT = _dct_matrix()
_IDCT = _DCT.T


def _qtable(quality: int) -> np.ndarray:
    # JPEG-style scaling; quality 97 default → PSNR comfortably ≥ 40 dB
    s = 5000 / quality if quality < 50 else 200 - 2 * quality
    q = np.floor((_Q50 * s + 50) / 100)
    return np.clip(q, 1, 255)


_DCT32 = None
_Q32: dict[int, np.ndarray] = {}


def _consts(quality: int):
    """float32 DCT matrix + quantization table, built once."""
    global _DCT32
    if _DCT32 is None:
        _DCT32 = _DCT.astype(np.float32)
    qf = _Q32.get(quality)
    if qf is None:
        qf = _qtable(quality).astype(np.float32)
        _Q32[quality] = qf
    return _DCT32, qf


def encode_qdct(img: np.ndarray, quality: int = 97) -> bytes:
    """Lossy codec: per-channel 8×8 DCT → quantize → zlib int16 stream.

    Works block-natively: ONE transpose copy into (nby, nbx, c, 8, 8)
    layout, then batched 8×8 GEMMs and a broadcast quantize — the
    payload block order falls out for free (the former slab-GEMM path
    paid two extra full-image reorder copies plus a tiled qtable
    allocation per call; outputs are bit-identical)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    m, qf = _consts(quality)
    ph, pw = (h + 7) & ~7, (w + 7) & ~7
    pad = np.zeros((ph, pw, c), dtype=np.float32)
    pad[:h, :w] = img
    if h < ph:
        pad[h:, :w] = pad[h - 1 : h, :w]
    if w < pw:
        pad[:, w:] = pad[:, w - 1 : w]
    pad -= 128.0
    b = np.ascontiguousarray(
        pad.reshape(ph // 8, 8, pw // 8, 8, c).transpose(0, 2, 4, 1, 3)
    )
    coef = (m @ b) @ m.T
    coef /= qf
    quant = np.rint(coef, out=coef).astype(np.int16)
    # int8 when coefficients fit (halves the zlib input)
    if np.abs(quant).max(initial=0) < 127:
        blocks = quant.astype(np.int8)
        dtype_flag = 1
    else:
        blocks = quant
        dtype_flag = 2
    payload = zlib.compress(blocks.tobytes(), 2)
    head = struct.pack(">4sHHBBB", b"QDCT", h, w, c, quality, dtype_flag)
    return head + payload


def decode_qdct_blocks(data: bytes) -> tuple[np.ndarray, int, int, int]:
    """Decompress + dequantize WITHOUT the inverse DCT: returns
    (coef f32 (nby, nbx, c, 8, 8), h, w, c). The expensive pixel
    reconstruction can then run per-window via `idct_window` — a
    windowed raster read (reference get_polygons.py:588-623's
    rasterio window semantics) that skips the ~96% of blocks a small
    crop never touches."""
    magic, h, w, c, quality, dtype_flag = struct.unpack(">4sHHBBB", data[:11])
    if magic != b"QDCT":
        raise ValueError("not qdct")
    _, qf = _consts(quality)
    ph, pw = (h + 7) & ~7, (w + 7) & ~7
    dt = np.int8 if dtype_flag == 1 else np.int16
    blocks = np.frombuffer(zlib.decompress(data[11:]), dtype=dt).reshape(
        ph // 8, pw // 8, c, 8, 8
    )
    coef = blocks.astype(np.float32)
    coef *= qf
    return coef, h, w, c


def idct_window(coef: np.ndarray, h: int, w: int,
                row0: int, row1: int, col0: int, col1: int) -> np.ndarray:
    """Reconstruct ONLY the pixel window [row0:row1, col0:col1) from
    dequantized qdct blocks. Bit-identical to
    ``decode_qdct(data)[row0:row1, col0:col1]`` — the 8×8 IDCT is
    block-local, so slicing blocks first commutes with the transform
    (same float32 GEMMs in the same order per block)."""
    m = _consts(97)[0]  # DCT matrix is quality-independent
    row1 = min(row1, h)
    col1 = min(col1, w)
    br0, br1 = row0 >> 3, (row1 + 7) >> 3
    bc0, bc1 = col0 >> 3, (col1 + 7) >> 3
    sub = coef[br0:br1, bc0:bc1]
    padb = (m.T @ sub) @ m
    hh, ww = (br1 - br0) * 8, (bc1 - bc0) * 8
    pad = np.ascontiguousarray(padb.transpose(0, 3, 1, 4, 2)).reshape(
        hh, ww, coef.shape[2]
    )
    pad += 128.0
    win = pad[row0 - br0 * 8 : row1 - br0 * 8,
              col0 - bc0 * 8 : col1 - bc0 * 8]
    out = np.clip(np.rint(win, out=win), 0, 255).astype(np.uint8)
    return out[:, :, 0] if coef.shape[2] == 1 else out


def decode_qdct(data: bytes) -> np.ndarray:
    magic, h, w, c, quality, dtype_flag = struct.unpack(">4sHHBBB", data[:11])
    if magic != b"QDCT":
        raise ValueError("not qdct")
    m, qf = _consts(quality)
    ph, pw = (h + 7) & ~7, (w + 7) & ~7
    dt = np.int8 if dtype_flag == 1 else np.int16
    blocks = np.frombuffer(zlib.decompress(data[11:]), dtype=dt).reshape(
        ph // 8, pw // 8, c, 8, 8
    )
    # dequantize + inverse DCT in the stored block layout, then ONE
    # transpose copy back to (ph, pw, c)
    coef = blocks.astype(np.float32)
    coef *= qf
    padb = (m.T @ coef) @ m
    pad = np.ascontiguousarray(padb.transpose(0, 3, 1, 4, 2)).reshape(ph, pw, c)
    pad += 128.0
    out = np.clip(np.rint(pad[:h, :w], out=pad[:h, :w]), 0, 255).astype(np.uint8)
    return out[:, :, 0] if c == 1 else out


# ---------------------------------------------------------------- npy

def encode_npy(arr: np.ndarray) -> bytes:
    """Raw ndarray payload: dtype-str, shape, C-order buffer."""
    dt = np.dtype(arr.dtype).str.encode()
    shape = np.asarray(arr.shape, dtype=np.int32)
    return (
        struct.pack(">4sB", b"NPYB", len(dt))
        + dt
        + struct.pack(">B", len(shape))
        + shape.tobytes()
        + np.ascontiguousarray(arr).tobytes()
    )


def decode_npy(data: bytes) -> np.ndarray:
    magic, dtlen = struct.unpack(">4sB", data[:5])
    if magic != b"NPYB":
        raise ValueError("not npy blob")
    dt = np.dtype(data[5 : 5 + dtlen].decode())
    (ndim,) = struct.unpack(">B", data[5 + dtlen : 6 + dtlen])
    off = 6 + dtlen
    shape = np.frombuffer(data[off : off + 4 * ndim], dtype=np.int32)
    off += 4 * ndim
    return np.frombuffer(data[off:], dtype=dt).reshape(shape).copy()


# ------------------------------------------------------------- wav
# PCM WAV is a fixed RIFF layout (public spec) — decodable with
# struct + numpy alone, so the audio path needs no codec library for
# uncompressed recordings. Compressed codecs stay a loud gate.

def encode_wav(signal: np.ndarray, sample_rate: int = 16000) -> bytes:
    """float (-1..1) or int16 mono/multichannel → PCM16 WAV bytes."""
    sig = np.asarray(signal)
    if sig.dtype.kind == "f":
        pcm = np.clip(np.floor(sig * 32767.0 + 0.5),
                      -32768, 32767).astype("<i2")
    else:
        pcm = sig.astype("<i2")
    if pcm.ndim == 1:
        pcm = pcm[:, None]
    n_ch = pcm.shape[1]
    data = pcm.tobytes()
    return (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
            + b"fmt " + struct.pack("<IHHIIHH", 16, 1, n_ch, sample_rate,
                                    sample_rate * n_ch * 2, n_ch * 2, 16)
            + b"data" + struct.pack("<I", len(data)) + data)


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """PCM (8/16/24/32-bit) or IEEE-float WAV → (mono float32 signal
    in [-1, 1], sample_rate). Multichannel mixes down by mean.
    Compressed codecs (mp3-in-wav, ADPCM, ...) raise loudly."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, raw = 12, None, None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        sz = struct.unpack_from("<I", data, pos + 4)[0]
        body = data[pos + 8:pos + 8 + sz]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            raw = body
        pos += 8 + sz + (sz & 1)
    if fmt is None or raw is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt, n_ch, rate, _br, _ba, bits = fmt
    if audio_fmt == 1:
        if bits == 8:
            sig = (np.frombuffer(raw, np.uint8).astype(np.float32)
                   - 128.0) / 128.0
        elif bits == 16:
            sig = np.frombuffer(raw, "<i2").astype(np.float32) / 32768.0
        elif bits == 24:
            b3 = np.frombuffer(raw, np.uint8)
            b3 = b3[: len(b3) - len(b3) % 3].reshape(-1, 3).astype(np.int32)
            v = b3[:, 0] | (b3[:, 1] << 8) | (b3[:, 2] << 16)
            v = (v ^ 0x800000) - 0x800000
            sig = v.astype(np.float32) / 8388608.0
        elif bits == 32:
            sig = np.frombuffer(raw, "<i4").astype(np.float32) / 2147483648.0
        else:
            raise NotImplementedError(f"PCM {bits}-bit WAV not supported")
    elif audio_fmt == 3:
        sig = np.frombuffer(raw, "<f4" if bits == 32 else "<f8").astype(
            np.float32)
    else:
        raise NotImplementedError(
            f"WAV audio format {audio_fmt} is compressed; decoding needs "
            "an audio codec library (not installed) — transcode to PCM"
        )
    if n_ch > 1:
        sig = sig[: len(sig) - len(sig) % n_ch].reshape(-1, n_ch).mean(
            axis=1, dtype=np.float32)
    return sig, int(rate)


# --------------------------------------------------------------- api

def encode(img: np.ndarray, fmt: str, **kw) -> bytes:
    if fmt == "png":
        return encode_png(img)
    if fmt == "qdct":
        return encode_qdct(img, **kw)
    if fmt == "npy":
        return encode_npy(img)
    raise ValueError(f"unknown fmt {fmt!r}")


def decode(data: bytes, fmt: str | None = None) -> np.ndarray:
    if fmt is None:
        if data[:8] == _PNG_SIG:
            fmt = "png"
        elif data[:4] == b"QDCT":
            fmt = "qdct"
        elif data[:4] == b"NPYB":
            fmt = "npy"
        else:
            raise ValueError("unrecognized payload")
    if fmt == "png":
        return decode_png(data)
    if fmt == "qdct":
        return decode_qdct(data)
    if fmt == "npy":
        return decode_npy(data)
    raise ValueError(f"unknown fmt {fmt!r}")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    mse = float(np.mean((a - b) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)


def average_hash(img: np.ndarray) -> int:
    """64-bit perceptual hash: mean over 8×8 downsample (FIXTURES.md §1
    ``phash`` column). Deterministic, signed-int64 output so it stores
    in an Arrow int64 column."""
    if img.ndim == 3:
        img = img.mean(axis=2)
    h, w = img.shape
    ys = (np.arange(8) * h) // 8
    xs = (np.arange(8) * w) // 8
    ye = np.append(ys[1:], h)
    xe = np.append(xs[1:], w)
    small = np.empty((8, 8))
    for i in range(8):
        for j in range(8):
            small[i, j] = img[ys[i] : ye[i], xs[j] : xe[j]].mean()
    bits = (small > small.mean()).ravel()
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    return v - (1 << 64) if v >= (1 << 63) else v
