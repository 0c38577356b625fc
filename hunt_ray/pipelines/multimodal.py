"""Multimodal column plumbing: opaque binary payloads through actor pools.

Images/audio/video are opaque ``binary`` columns with typed metadata.
Two codec tiers:

* REAL: ``RealDecoder`` / ``RealResizer`` decode actual PNG bytes —
  via PIL when importable, else the dependency-free pure-numpy codec in
  :mod:`hunt_ray.pipelines.png` (8-bit gray/RGB/RGBA, all five scanline
  filters) — extract band-mean features, and emit genuine PNG
  thumbnails. ``png.synth_png`` generates deterministic real-PNG
  fixtures so the whole loop is testable in this container. Non-PNG
  formats (JPEG/audio/video) still raise ``NotImplementedError`` at the
  clearly-marked boundary — decode what we claim, fail loudly on what
  we don't.
* STUB: ``FakeDecoder`` (deterministic pseudo-header + hashed windows)
  remains the documented fallback for payloads that are not images at
  all — it exercises the identical plumbing (schema, small-batch
  actor-pool ``map_batches`` over wide binary rows, list<float32>
  feature layout) over the ``pages.html`` binary column.
"""

from __future__ import annotations

import hashlib
import struct
import zlib

import numpy as np
import pyarrow as pa

FEATURE_DIM = 16


class FakeDecoder:
    """Actor-pool stage: binary payload → metadata + feature vector.

    State (the would-be model / codec tables) is built once per actor.
    Batches must stay SMALL for wide binary rows — size batch_size so
    batch_bytes × concurrency fits the worker heap.
    """

    def __init__(self, feature_dim: int = FEATURE_DIM, real_decoder: bool = False):
        self.feature_dim = feature_dim
        if real_decoder:
            raise NotImplementedError(
                "real image/audio decode needs PIL/ffmpeg — not available in "
                "this container; FakeDecoder provides the deterministic stand-in")
        self.seeds = np.arange(feature_dim, dtype=np.uint64)

    def _decode(self, payload: bytes) -> tuple[int, int, str]:
        """STUB decode: deterministic pseudo width/height/format from bytes."""
        h = hashlib.blake2b(payload[:64], digest_size=8).digest()
        w = 16 + int.from_bytes(h[:2], "little") % 2048
        ht = 16 + int.from_bytes(h[2:4], "little") % 2048
        fmt = ["rgb", "rgba", "gray"][h[4] % 3]
        return w, ht, fmt

    def _features(self, payload: bytes) -> np.ndarray:
        out = np.empty(self.feature_dim, dtype=np.float32)
        n = max(1, len(payload) // self.feature_dim)
        for i in range(self.feature_dim):
            window = payload[i * n:(i + 1) * n] or b"\x00"
            d = hashlib.blake2b(window, digest_size=8,
                                salt=int(self.seeds[i]).to_bytes(8, "little")).digest()
            out[i] = (int.from_bytes(d, "little") % 10_000) / 10_000.0
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        keys = batch.column("key").to_pylist()
        widths, heights, fmts, feats, sizes = [], [], [], [], []
        for p in payloads:
            p = p or b""
            w, h, f = self._decode(p)
            widths.append(w)
            heights.append(h)
            fmts.append(f)
            sizes.append(len(p))
            feats.append(self._features(p))
        return pa.table({
            "key": pa.array(keys, pa.string()),
            "n_bytes": pa.array(sizes, pa.int64()),
            "width": pa.array(widths, pa.int32()),
            "height": pa.array(heights, pa.int32()),
            "format": pa.array(fmts, pa.string()),
            "feature": pa.array([f.tolist() for f in feats],
                                pa.list_(pa.float32(), FEATURE_DIM)),
        })


class RealDecoder:
    """Actor-pool stage: REAL image decode → metadata + band-mean
    features. Uses PIL when importable (the production path on a real
    cluster); otherwise the built-in pure-numpy PNG codec
    (:mod:`hunt_ray.pipelines.png`) — genuine pixel decode either way.
    Payloads that are not a supported image format raise
    ``NotImplementedError`` (``on_error="raise"``, the default) or are
    emitted with format='error' and zeroed fields
    (``on_error="flag"``).

    Codec/import state is resolved ONCE per actor in ``__init__``;
    batches stay small because binary rows are wide.
    """

    def __init__(self, feature_dim: int = FEATURE_DIM,
                 on_error: str = "raise"):
        if on_error not in ("raise", "flag"):
            raise ValueError(f"on_error must be 'raise'|'flag', "
                             f"got {on_error!r}")
        self.feature_dim = feature_dim
        self.on_error = on_error
        try:  # pragma: no cover — PIL absent in this container
            from PIL import Image
            self._pil = Image
        except ImportError:
            self._pil = None

    def _decode(self, payload: bytes):
        from . import png as _png

        if payload[:8] == b"\x89PNG\r\n\x1a\n":
            if self._pil is not None:  # pragma: no cover
                import io
                im = self._pil.open(io.BytesIO(payload))
                arr = np.asarray(im)
                fmt = {"L": "gray", "RGB": "rgb",
                       "RGBA": "rgba"}.get(im.mode, im.mode.lower())
                return arr, {"width": im.width, "height": im.height,
                             "format": fmt}
            return _png.decode_png(payload)
        raise NotImplementedError(
            "unsupported image format (PNG only without PIL; install "
            "PIL/ffmpeg on a real cluster for JPEG/audio/video)")

    def _features(self, arr: np.ndarray) -> np.ndarray:
        """feature_dim horizontal band means in [0,1] — a real, exactly
        recomputable pooled-luminance descriptor."""
        flat = arr.reshape(arr.shape[0], -1).astype(np.float64)
        bands = np.array_split(flat, self.feature_dim, axis=0)
        return np.array([b.mean() / 255.0 if b.size else 0.0
                         for b in bands], np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = batch.column("key").to_pylist()
        widths, heights, fmts, feats, sizes, psums = [], [], [], [], [], []
        for p in batch.column("payload").to_pylist():
            p = p or b""
            try:
                arr, meta = self._decode(p)
            except (NotImplementedError, ValueError, zlib.error,
                    struct.error, OSError):
                # the full corrupt-payload surface: ValueError from our
                # codec's explicit checks, zlib/struct errors from torn
                # IDAT/IHDR bytes, OSError from PIL (UnidentifiedImageError)
                if self.on_error == "raise":
                    raise
                widths.append(0); heights.append(0); fmts.append("error")
                sizes.append(len(p)); psums.append(0)
                feats.append(np.zeros(self.feature_dim, np.float32))
                continue
            widths.append(meta["width"]); heights.append(meta["height"])
            fmts.append(meta["format"]); sizes.append(len(p))
            psums.append(int(arr.astype(np.int64).sum()))
            feats.append(self._features(arr))
        return pa.table({
            "key": pa.array(keys, pa.string()),
            "n_bytes": pa.array(sizes, pa.int64()),
            "width": pa.array(widths, pa.int32()),
            "height": pa.array(heights, pa.int32()),
            "format": pa.array(fmts, pa.string()),
            "pixel_sum": pa.array(psums, pa.int64()),
            "feature": pa.array([f.tolist() for f in feats],
                                pa.list_(pa.float32(), self.feature_dim)),
        })


class RealResizer:
    """Actor-pool stage: real thumbnailing — decode PNG, nearest-neighbor
    resample to (thumb_w, thumb_h), re-encode as a genuine PNG. Output
    rows are bounded (thumb bytes) regardless of input size."""

    def __init__(self, thumb_w: int = 16, thumb_h: int = 16):
        self.thumb_w, self.thumb_h = thumb_w, thumb_h

    def __call__(self, batch: pa.Table) -> pa.Table:
        from . import png as _png

        keys = batch.column("key")
        outs = []
        for p in batch.column("payload").to_pylist():
            arr, _ = _png.decode_png(p or b"")
            thumb = _png.resize_nearest(arr, self.thumb_w, self.thumb_h)
            outs.append(_png.encode_png(thumb))
        return pa.table({
            "key": keys,
            "thumb_w": pa.array([self.thumb_w] * batch.num_rows, pa.int32()),
            "thumb_h": pa.array([self.thumb_h] * batch.num_rows, pa.int32()),
            "thumb": pa.array(outs, pa.binary()),
        })


def ensure_images(images_dir: str, *, n: int = 200,
                  shards: int = 4) -> str:
    """Deterministic real-PNG fixture table: (key, payload, width,
    height, format, pixel_sum) rows where payload is genuine PNG bytes
    (``png.synth_png``) and the remaining columns are the expected
    decode results — written once as partitioned parquet, reused on
    re-entry (the ensure_linked_pages pattern)."""
    import os

    import pyarrow.parquet as pq

    from .png import synth_png

    done = os.path.join(images_dir, "_done")
    if os.path.exists(done):
        return images_dir
    os.makedirs(images_dir, exist_ok=True)
    per = (n + shards - 1) // shards
    for s in range(shards):
        keys = list(range(s * per, min((s + 1) * per, n)))
        rows = [synth_png(k) for k in keys]
        pq.write_table(pa.table({
            "key": pa.array([f"img://{k}" for k in keys], pa.string()),
            "payload": pa.array([r[0] for r in rows], pa.binary()),
            "width": pa.array([r[1]["width"] for r in rows], pa.int32()),
            "height": pa.array([r[1]["height"] for r in rows], pa.int32()),
            "format": pa.array([r[1]["format"] for r in rows], pa.string()),
            "pixel_sum": pa.array([r[1]["pixel_sum"] for r in rows],
                                  pa.int64()),
        }), os.path.join(images_dir, f"part-{s}.parquet"))
    with open(done, "w") as f:
        f.write(str(n))
    return images_dir


def decode_images(images_dir: str, *, batch_size: int = 32,
                  concurrency: tuple[int, int] | int = (1, 4)):
    """Real-codec actor-pool decode over an images table
    ((key, payload) parquet; see :func:`ensure_images` for the
    deterministic fixture): one metadata + band-feature row per image."""
    import ray.data as rd

    ds = rd.read_parquet(images_dir, columns=["key", "payload"])
    return ds.map_batches(RealDecoder, batch_format="pyarrow",
                          batch_size=batch_size, concurrency=concurrency)


def thumbnail_images(images_dir: str, *, thumb: tuple[int, int] = (16, 16),
                     batch_size: int = 32,
                     concurrency: tuple[int, int] | int = (1, 4)):
    """Real-codec actor-pool thumbnailing: PNG in → smaller PNG out."""
    import ray.data as rd

    ds = rd.read_parquet(images_dir, columns=["key", "payload"])
    return ds.map_batches(RealResizer, fn_constructor_args=thumb,
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=concurrency)


def image_decode_probe(images_dir: str):
    """Self-checking end-to-end probe for the REAL codec path: decode
    every fixture PNG through the actor pool and verify width, height,
    format AND the full pixel checksum against the values recorded at
    synthesis time — a wrong byte anywhere in unfiltering flips
    pixel_sum. Raises on any mismatch; returns the per-image decoded
    metadata (key, n_bytes, width, height, format, pixel_sum)."""
    import ray.data as rd

    decoded = decode_images(images_dir).to_pandas()
    expect = (rd.read_parquet(
        images_dir, columns=["key", "width", "height", "format",
                             "pixel_sum"]).to_pandas())
    j = decoded.merge(expect, on="key", suffixes=("", "_want"))
    if len(j) != len(expect) or len(decoded) != len(expect):
        raise AssertionError(
            f"decode row mismatch: {len(decoded)} vs {len(expect)}")
    for c in ("width", "height", "format", "pixel_sum"):
        bad = j[j[c] != j[f"{c}_want"]]
        if len(bad):
            raise AssertionError(
                f"real decode mismatch on {c}: {bad.head(3)}")
    return decoded.sort_values("key").reset_index(drop=True)


def decode_features(pages_dir: str, *, batch_size: int = 64,
                    concurrency: tuple[int, int] | int = (1, 4)):
    """Actor-pool decode over the pages.html binary column.

    Small batch_size on purpose: binary payloads are wide rows; at real
    image sizes (MBs) this would drop to 8-16 rows per batch.
    """
    import ray.data as rd

    ds = rd.read_parquet(pages_dir, columns=["url", "html"])

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({"key": batch.column("url").cast(pa.string()),
                         "payload": batch.column("html")})

    return (ds.map_batches(rename, batch_format="pyarrow")
            .map_batches(FakeDecoder, batch_format="pyarrow",
                         batch_size=batch_size, concurrency=concurrency))


class FakeResizer:
    """Actor-pool resize stage: payload → fixed-size thumbnail bytes.

    STUB semantics (strided byte sample standing in for pixel resampling;
    swap for PIL's ``Image.resize`` on a real cluster) — the plumbing is
    real: bounded output width (thumb_bytes per row regardless of input
    size), small batches for wide rows, stateless-but-configured actor.
    """

    def __init__(self, thumb_w: int = 64, thumb_h: int = 64):
        self.n_out = thumb_w * thumb_h
        self.thumb_w, self.thumb_h = thumb_w, thumb_h

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = batch.column("key")
        outs = []
        for p in batch.column("payload").to_pylist():
            p = p or b"\x00"
            buf = np.frombuffer(p, dtype=np.uint8)
            idx = np.linspace(0, len(buf) - 1, self.n_out).astype(np.int64)
            outs.append(buf[idx].tobytes())
        return pa.table({
            "key": keys,
            "thumb_w": pa.array([self.thumb_w] * batch.num_rows, pa.int32()),
            "thumb_h": pa.array([self.thumb_h] * batch.num_rows, pa.int32()),
            "thumb": pa.array(outs, pa.binary()),
        })


class FrameSampler:
    """Actor-pool frame sampler: payload → one row per sampled frame.

    Treats the payload as a pseudo-video of fixed-size frames (frame size
    from the stub header) and emits every ``every``-th frame — the
    row-expanding (flat-map) plumbing a real ffmpeg keyframe sampler needs:
    output rows ≫ input rows, each bounded, ordered (key, frame_idx).
    """

    def __init__(self, every: int = 4, frame_bytes: int = 4096,
                 max_frames: int = 64):
        self.every = max(1, every)
        self.frame_bytes = frame_bytes
        self.max_frames = max_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys_out, idx_out, frames_out = [], [], []
        keys = batch.column("key").to_pylist()
        for key, p in zip(keys, batch.column("payload").to_pylist()):
            p = p or b""
            n_frames = min((len(p) + self.frame_bytes - 1) // self.frame_bytes,
                           self.max_frames * self.every)
            for fi in range(0, n_frames, self.every):
                lo = fi * self.frame_bytes
                keys_out.append(key)
                idx_out.append(fi)
                frames_out.append(p[lo: lo + self.frame_bytes])
        return pa.table({
            "key": pa.array(keys_out, pa.string()),
            "frame_idx": pa.array(idx_out, pa.int32()),
            "frame": pa.array(frames_out, pa.binary()),
        })


def resize_thumbnails(pages_dir: str, *, thumb: tuple[int, int] = (64, 64),
                      batch_size: int = 64,
                      concurrency: tuple[int, int] | int = (1, 4)):
    """Actor-pool resize over the binary column (stubbed resampling)."""
    import ray.data as rd

    ds = rd.read_parquet(pages_dir, columns=["url", "html"])

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({"key": batch.column("url").cast(pa.string()),
                         "payload": batch.column("html")})

    return (ds.map_batches(rename, batch_format="pyarrow")
            .map_batches(FakeResizer, fn_constructor_args=thumb,
                         batch_format="pyarrow", batch_size=batch_size,
                         concurrency=concurrency))


def sample_frames(pages_dir: str, *, every: int = 4, frame_bytes: int = 4096,
                  batch_size: int = 32,
                  concurrency: tuple[int, int] | int = (1, 4)):
    """Actor-pool frame sampling over the binary column (stubbed frames)."""
    import ray.data as rd

    ds = rd.read_parquet(pages_dir, columns=["url", "html"])

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({"key": batch.column("url").cast(pa.string()),
                         "payload": batch.column("html")})

    return (ds.map_batches(rename, batch_format="pyarrow")
            .map_batches(FrameSampler, fn_constructor_args=(every, frame_bytes),
                         batch_format="pyarrow", batch_size=batch_size,
                         concurrency=concurrency))


class Md5MetaDecoder:
    """Oracle-compatible sibling of ``FakeDecoder``: every derived value
    uses only md5 + character slicing so a DuckDB oracle can recompute it
    exactly (``__ray_entry__.oracle_sql: q_multimodal_meta /
    q_multimodal_feature_windows``). Same actor-pool plumbing as the
    blake2b stub; the "decode" here stands in for reading an image header
    (width/height/format) and pooling fixed windows into features.

    Exact mirror of the SQL:
      t        = coalesce(text, '')                 (unicode code points)
      h        = md5(t[:64])                        (utf-8 bytes)
      n_bytes  = strlen(t)                          (utf-8 byte length)
      width    = 16 + int(h[0:4], 16)  % 2048
      height   = 16 + int(h[4:8], 16)  % 2048
      format   = ('rgb','rgba','gray')[int(h[8:10], 16) % 3]
      win      = max(1, len(t) // FEATURE_DIM)      (code points)
      f[i]     = int(md5(f"{i}|" + t[i*win:(i+1)*win])[:15], 16) % 10000
    """

    FORMATS = ("rgb", "rgba", "gray")

    def __init__(self, feature_dim: int = FEATURE_DIM):
        self.feature_dim = feature_dim

    def meta_rows(self, doc_ids, texts):
        n_bytes, widths, heights, fmts = [], [], [], []
        for t in texts:
            t = t or ""
            h = hashlib.md5(t[:64].encode("utf-8")).hexdigest()
            n_bytes.append(len(t.encode("utf-8")))
            widths.append(16 + int(h[0:4], 16) % 2048)
            heights.append(16 + int(h[4:8], 16) % 2048)
            fmts.append(self.FORMATS[int(h[8:10], 16) % 3])
        return pa.table({
            "doc_id": pa.array(doc_ids, pa.int64()),
            "n_bytes": pa.array(n_bytes, pa.int64()),
            "width": pa.array(widths, pa.int64()),
            "height": pa.array(heights, pa.int64()),
            "format": pa.array(fmts, pa.string()),
        })

    def window_rows(self, doc_ids, texts):
        ids_out, wins, fvals = [], [], []
        for did, t in zip(doc_ids, texts):
            t = t or ""
            win = max(1, len(t) // self.feature_dim)
            for i in range(self.feature_dim):
                w = t[i * win:(i + 1) * win]
                d = hashlib.md5(f"{i}|{w}".encode("utf-8")).hexdigest()
                ids_out.append(did)
                wins.append(i)
                fvals.append(int(d[:15], 16) % 10000)
        return pa.table({
            "doc_id": pa.array(ids_out, pa.int64()),
            "win": pa.array(wins, pa.int64()),
            "fval": pa.array(fvals, pa.int64()),
        })


class _Md5MetaStage(Md5MetaDecoder):
    def __call__(self, batch: pa.Table) -> pa.Table:
        return self.meta_rows(batch.column("doc_id").to_pylist(),
                              batch.column("text").to_pylist())


class _Md5WindowStage(Md5MetaDecoder):
    def __call__(self, batch: pa.Table) -> pa.Table:
        return self.window_rows(batch.column("doc_id").to_pylist(),
                                batch.column("text").to_pylist())


def _documents_ds(sf_dir: str):
    import os

    import ray.data as rd
    return rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])


def decode_meta_md5(sf_dir: str, *, batch_size: int = 128,
                    concurrency: tuple[int, int] | int = (1, 4)):
    """Oracled decode-metadata pipeline over the documents table (lazy)."""
    return _documents_ds(sf_dir).map_batches(
        _Md5MetaStage, batch_format="pyarrow",
        batch_size=batch_size, concurrency=concurrency)


def feature_windows_md5(sf_dir: str, *, batch_size: int = 128,
                        concurrency: tuple[int, int] | int = (1, 4)):
    """Oracled window-feature pipeline: one row per (doc, window), lazy."""
    return _documents_ds(sf_dir).map_batches(
        _Md5WindowStage, batch_format="pyarrow",
        batch_size=batch_size, concurrency=concurrency)


def pipeline_summary(pages_dir: str):
    """All three stub stages (decode / resize / frame-sample) in one driver
    entry: each stage's output folds to ONE deterministic rollup row
    (stage, n_rows, bytes_sum, int_sum) via per-batch partials + a tiny
    groupby — so the actor-pool plumbing of every stage runs end-to-end
    while the driver result stays a 3-row table (rows-only by declared
    stub nature; the per-value oracles live in decode_meta_md5 /
    feature_windows_md5)."""
    import pyarrow.compute as pc

    def partial(stage: str, bin_col: str, int_cols: tuple[str, ...]):
        def f(batch: pa.Table) -> pa.Table:
            by = int(pc.sum(pc.binary_length(batch.column(bin_col))).as_py() or 0) \
                if bin_col else 0
            iv = sum(int(pc.sum(batch.column(c)).as_py() or 0) for c in int_cols)
            return pa.table({
                "stage": pa.array([stage], pa.string()),
                "n_rows": pa.array([batch.num_rows], pa.int64()),
                "bytes_sum": pa.array([by], pa.int64()),
                "int_sum": pa.array([iv], pa.int64()),
            })
        return f

    dec = decode_features(pages_dir).map_batches(
        partial("decode", None, ("n_bytes", "width", "height")),
        batch_format="pyarrow")
    rsz = resize_thumbnails(pages_dir).map_batches(
        partial("resize", "thumb", ("thumb_w", "thumb_h")),
        batch_format="pyarrow")
    frm = sample_frames(pages_dir).map_batches(
        partial("frames", "frame", ("frame_idx",)),
        batch_format="pyarrow")

    def fold(batch: pa.Table) -> pa.Table:
        return pa.table({
            "stage": batch.column("stage"),
            "n_rows": batch.column("sum(n_rows)").cast(pa.int64()),
            "bytes_sum": batch.column("sum(bytes_sum)").cast(pa.int64()),
            "int_sum": batch.column("sum(int_sum)").cast(pa.int64()),
        })

    return (dec.union(rsz).union(frm)
            .groupby("stage")
            .sum(["n_rows", "bytes_sum", "int_sum"])
            .map_batches(fold, batch_format="pyarrow"))
