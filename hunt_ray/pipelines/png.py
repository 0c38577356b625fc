"""A real, dependency-free PNG codec (stdlib zlib + numpy) for the
multimodal pipelines.

The container has no PIL/ffmpeg, so "real image decode" is provided by
this minimal-but-genuine PNG implementation: 8-bit greyscale / RGB /
RGBA, all five scanline filters on decode, filter-0 encode. It backs
``multimodal.RealDecoder`` / ``multimodal.RealResizer`` — the decode
boundary the earlier rounds stubbed — and the deterministic fixture
generator that emits real PNG bytes for tests and probes.

Format per the public PNG spec (RFC 2083 / ISO 15948): signature,
IHDR / IDAT / IEND chunks, CRC-32 per chunk, zlib-compressed filtered
scanlines. Interlacing, palettes and 16-bit depths are out of scope and
rejected with a clear error (the real-user contract: decode what we
claim, fail loudly on what we don't).

Scale note: per-scanline unfiltering is a Python loop over ROWS with
numpy kernels per row; Sub/Paeth are inherently sequential in x, done
via an accumulating row loop. Bounded by image height — fine for the
thumbnail/feature sizes this stage handles; a GPU/SIMD codec slots in
behind the same ``decode_png``/``encode_png`` signatures.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"

# color type → samples per pixel (8-bit depth only)
_CHANNELS = {0: 1, 2: 3, 6: 4}
_FMT = {0: "gray", 2: "rgb", 6: "rgba"}
_COLOR_TYPE = {1: 0, 3: 2, 4: 6}


class PngError(ValueError):
    pass


def _chunk(tag: bytes, payload: bytes) -> bytes:
    crc = zlib.crc32(tag + payload) & 0xFFFFFFFF
    return struct.pack(">I", len(payload)) + tag + payload + \
        struct.pack(">I", crc)


def encode_png(arr: np.ndarray, *, compress_level: int = 6) -> bytes:
    """uint8 array (H,W) | (H,W,1) | (H,W,3) | (H,W,4) → PNG bytes
    (filter 0 scanlines — valid PNG any decoder reads)."""
    a = np.asarray(arr)
    if a.dtype != np.uint8:
        raise PngError(f"encode_png needs uint8, got {a.dtype}")
    if a.ndim == 2:
        a = a[:, :, None]
    if a.ndim != 3 or a.shape[2] not in _COLOR_TYPE:
        raise PngError(f"unsupported shape {arr.shape}")
    h, w, ch = a.shape
    if h == 0 or w == 0:
        raise PngError("empty image")
    color_type = _COLOR_TYPE[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    # filter byte 0 in front of every scanline
    raw = np.empty((h, 1 + w * ch), np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = a.reshape(h, w * ch)
    idat = zlib.compress(raw.tobytes(), compress_level)
    return _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + \
        _chunk(b"IEND", b"")


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor, vectorized over one scanline position set."""
    ai, bi, ci = (x.astype(np.int16) for x in (a, b, c))
    p = ai + bi - ci
    pa_, pb, pc = np.abs(p - ai), np.abs(p - bi), np.abs(p - ci)
    out = np.where((pa_ <= pb) & (pa_ <= pc), a,
                   np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def _unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse PNG scanline filtering: (h, 1+stride) filtered bytes →
    (h, stride) recon bytes. Filters 0-4 per the spec."""
    recon = np.zeros((h, stride), np.uint8)
    prev = np.zeros(stride, np.uint8)
    for y in range(h):
        ft = int(raw[y, 0])
        line = raw[y, 1:].copy()
        if ft == 0:
            pass
        elif ft == 1:  # Sub: sequential in x, one vector add per bpp lane
            for x in range(bpp, stride):
                line[x] = (int(line[x]) + int(line[x - bpp])) & 0xFF
        elif ft == 2:  # Up
            line += prev
        elif ft == 3:  # Average
            for x in range(stride):
                left = int(line[x - bpp]) if x >= bpp else 0
                line[x] = (int(line[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for x in range(stride):
                left = line[x - bpp] if x >= bpp else np.uint8(0)
                ul = prev[x - bpp] if x >= bpp else np.uint8(0)
                pred = _paeth(np.asarray(left), prev[x], np.asarray(ul))
                line[x] = (int(line[x]) + int(pred)) & 0xFF
        else:
            raise PngError(f"unknown filter type {ft} on scanline {y}")
        recon[y] = line
        prev = line
    return recon


def decode_png(data: bytes) -> tuple[np.ndarray, dict]:
    """PNG bytes → (uint8 array (H,W) gray or (H,W,C), meta dict with
    width/height/format). 8-bit gray/RGB/RGBA, non-interlaced."""
    if data[:8] != _SIG:
        raise PngError("not a PNG (bad signature)")
    pos, ihdr, idat = 8, None, []
    n = len(data)
    while pos + 8 <= n:
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        payload = data[pos + 8:pos + 8 + length]
        if len(payload) != length:
            raise PngError(f"truncated {tag!r} chunk")
        if tag == b"IHDR":
            ihdr = payload
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"IEND":
            break
        pos += 12 + length  # len + tag + payload + crc
    if ihdr is None or not idat:
        raise PngError("missing IHDR/IDAT")
    w, h, depth, color_type, comp, filt, interlace = \
        struct.unpack(">IIBBBBB", ihdr)
    if depth != 8:
        raise PngError(f"only 8-bit depth supported, got {depth}")
    if color_type not in _CHANNELS:
        raise PngError(f"unsupported color type {color_type} "
                       "(gray/rgb/rgba only; no palette)")
    if interlace:
        raise PngError("interlaced PNG not supported")
    if comp or filt:
        raise PngError("nonstandard compression/filter method")
    ch = _CHANNELS[color_type]
    stride = w * ch
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), np.uint8)
    if len(raw) != h * (1 + stride):
        raise PngError("IDAT length mismatch")
    recon = _unfilter(raw.reshape(h, 1 + stride), h, stride, ch)
    arr = recon.reshape(h, w, ch)
    if ch == 1:
        arr = arr[:, :, 0]
    return arr, {"width": int(w), "height": int(h),
                 "format": _FMT[color_type]}


def resize_nearest(arr: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resample (the deterministic kernel the resize
    stage uses — exact integer source-index grid, no float blending)."""
    h, w = arr.shape[:2]
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return arr[np.ix_(ys, xs)]


def synth_png(key: int, *, max_dim: int = 48) -> tuple[bytes, dict]:
    """Deterministic real-PNG fixture: seeded pixels, size/colortype
    derived from ``key``. Returns (png_bytes, expected meta incl. the
    pixel checksum) so tests and probes can verify decode exactly."""
    rng = np.random.default_rng(key)
    w = 8 + (key * 7) % max_dim
    h = 8 + (key * 11) % max_dim
    ct = (0, 2, 6)[key % 3]
    shape = (h, w) if ct == 0 else (h, w, _CHANNELS[ct])
    arr = rng.integers(0, 256, size=shape, dtype=np.uint8)
    return encode_png(arr), {
        "width": w, "height": h, "format": _FMT[ct],
        "pixel_sum": int(arr.astype(np.int64).sum()),
    }
