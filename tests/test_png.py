"""The real PNG codec + the real multimodal decode path.

Covers: encode/decode round trips over all supported color types, decode
of scanlines using every PNG filter (0-4) built by an INDEPENDENT filter
implementation in this test, malformed-input errors, nearest-neighbor
resize, and the end-to-end actor-pool pipeline (ensure_images →
RealDecoder → RealResizer) with pixel-exact verification.
"""

import struct
import zlib

import numpy as np
import pyarrow as pa
import pytest

from hunt_ray.pipelines.png import (PngError, decode_png, encode_png,
                                    resize_nearest, synth_png)


def test_roundtrip_all_color_types():
    rng = np.random.default_rng(3)
    for shape, fmt in [((7, 5), "gray"), ((4, 9, 3), "rgb"),
                       ((6, 6, 4), "rgba"), ((1, 1), "gray")]:
        arr = rng.integers(0, 256, size=shape, dtype=np.uint8)
        out, meta = decode_png(encode_png(arr))
        assert (out == arr).all()
        assert meta["format"] == fmt
        assert (meta["height"], meta["width"]) == shape[:2]


def _chunk(tag: bytes, payload: bytes) -> bytes:
    crc = zlib.crc32(tag + payload) & 0xFFFFFFFF
    return struct.pack(">I", len(payload)) + tag + payload + \
        struct.pack(">I", crc)


def _filter_line(line, prev, ft, ch):
    """Independent (test-side) PNG scanline filter implementation."""
    line = line.astype(np.int16)
    left = np.concatenate([np.zeros(ch, np.int16), line[:-ch]])
    ul = np.concatenate([np.zeros(ch, np.int16), prev[:-ch]])
    if ft == 0:
        return line % 256
    if ft == 1:
        return (line - left) % 256
    if ft == 2:
        return (line - prev) % 256
    if ft == 3:
        return (line - ((left + prev) >> 1)) % 256
    p = left + prev - ul
    pa_, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
    pred = np.where((pa_ <= pb) & (pa_ <= pc), left,
                    np.where(pb <= pc, prev, ul))
    return (line - pred) % 256


@pytest.mark.parametrize("ct,ch", [(0, 1), (2, 3), (6, 4)])
def test_decode_every_filter_type(ct, ch):
    rng = np.random.default_rng(11 + ct)
    h, w = 5, 6
    arr = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
    recon = arr.reshape(h, w * ch)
    raws, prev = [], np.zeros(w * ch, np.int16)
    for y, ft in enumerate([0, 1, 2, 3, 4]):
        f = _filter_line(recon[y], prev, ft, ch)
        raws.append(bytes([ft]) + f.astype(np.uint8).tobytes())
        prev = recon[y].astype(np.int16)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ct, 0, 0, 0)
    png = b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr) + \
        _chunk(b"IDAT", zlib.compress(b"".join(raws))) + \
        _chunk(b"IEND", b"")
    out, meta = decode_png(png)
    want = arr[:, :, 0] if ch == 1 else arr
    assert (out == want).all()


def test_malformed_inputs_raise():
    with pytest.raises(PngError):
        decode_png(b"not a png at all")
    data, _ = synth_png(1)
    with pytest.raises(PngError):
        decode_png(data[:30])  # truncated chunk
    with pytest.raises(PngError):
        encode_png(np.zeros((2, 2), np.float32))  # wrong dtype
    with pytest.raises(PngError):
        encode_png(np.zeros((0, 3), np.uint8))  # empty
    # 16-bit depth rejected with a clear error
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
    png16 = b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr) + \
        _chunk(b"IDAT", zlib.compress(b"\x00" * 10)) + _chunk(b"IEND", b"")
    with pytest.raises(PngError, match="8-bit"):
        decode_png(png16)


def test_resize_nearest_exact():
    arr = np.arange(24, dtype=np.uint8).reshape(4, 6)
    out = resize_nearest(arr, 3, 2)
    ys, xs = (np.arange(2) * 4) // 2, (np.arange(3) * 6) // 3
    assert (out == arr[np.ix_(ys, xs)]).all()
    rgb = np.arange(72, dtype=np.uint8).reshape(4, 6, 3)
    assert resize_nearest(rgb, 12, 8).shape == (8, 12, 3)


def test_real_decode_pipeline_end_to_end(ray_session, tmp_path):
    """ensure_images → RealDecoder actor pool → pixel-exact checksums,
    and RealResizer emits genuine PNGs whose pixels equal the local
    nearest-neighbor oracle."""
    from hunt_ray.pipelines.multimodal import (ensure_images,
                                               image_decode_probe,
                                               thumbnail_images)

    d = ensure_images(str(tmp_path / "imgs"), n=40)
    meta = image_decode_probe(d)  # raises on any mismatch
    assert len(meta) == 40
    assert set(meta["format"]) == {"gray", "rgb", "rgba"}

    th = thumbnail_images(d, thumb=(9, 7)).to_pandas()
    assert len(th) == 40
    for _, row in th.sample(6, random_state=0).iterrows():
        arr, m = decode_png(row["thumb"])
        assert (m["width"], m["height"]) == (9, 7)
        k = int(row["key"].split("://")[1])
        src, _ = decode_png(synth_png(k)[0])
        assert (arr == resize_nearest(src, 9, 7)).all()


def test_real_decoder_error_modes(ray_session):
    from hunt_ray.pipelines.multimodal import RealDecoder

    batch = pa.table({"key": pa.array(["a"], pa.string()),
                      "payload": pa.array([b"\xff\xd8\xff jpeg-ish"],
                                          pa.binary())})
    with pytest.raises(NotImplementedError):
        RealDecoder()(batch)
    flagged = RealDecoder(on_error="flag")(batch)
    assert flagged.column("format").to_pylist() == ["error"]
    assert flagged.column("width").to_pylist() == [0]


def test_band_features_recomputable(ray_session, tmp_path):
    """RealDecoder's feature vector is a real pooled statistic — exactly
    recomputable from the decoded pixels."""
    from hunt_ray.pipelines.multimodal import FEATURE_DIM, RealDecoder

    data, _ = synth_png(7)
    batch = pa.table({"key": pa.array(["img://7"], pa.string()),
                      "payload": pa.array([data], pa.binary())})
    out = RealDecoder()(batch)
    feat = np.array(out.column("feature").to_pylist()[0], np.float32)
    arr, _ = decode_png(data)
    flat = arr.reshape(arr.shape[0], -1).astype(np.float64)
    want = np.array([b.mean() / 255.0 for b in
                     np.array_split(flat, FEATURE_DIM, axis=0)], np.float32)
    assert (feat == want).all()


def test_real_decoder_flag_mode_survives_torn_png(ray_session):
    """flag mode must absorb the FULL corrupt-payload surface: a valid
    PNG signature with non-zlib IDAT bytes raises zlib.error (not
    ValueError) from decode_png — the decode job must not die on it."""
    from hunt_ray.pipelines.multimodal import RealDecoder
    from hunt_ray.pipelines.png import encode_png
    import numpy as np

    from hunt_ray.pipelines.png import _SIG, _chunk
    import struct
    import zlib

    good = encode_png(np.zeros((4, 4), np.uint8))
    # structurally valid chunk stream whose IDAT payload is not a zlib
    # stream: decode_png reaches zlib.decompress and raises zlib.error
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0)
    torn = _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", b"notzlib!") \
        + _chunk(b"IEND", b"")
    with pytest.raises(zlib.error):
        decode_png(torn)
    batch = pa.table({"key": pa.array(["good", "torn"], pa.string()),
                      "payload": pa.array([good, torn], pa.binary())})
    out = RealDecoder(on_error="flag")(batch)
    assert out.column("format").to_pylist()[0] == "gray"
    assert out.column("format").to_pylist()[1] == "error"
    with pytest.raises(Exception):
        RealDecoder()(batch)  # raise mode still propagates
