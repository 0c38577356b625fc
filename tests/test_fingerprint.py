"""Fingerprint regression: the segmented-Horner vectorization must be
byte-identical to the definitional per-token rolling-hash loop."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from hunt_ray.common.hashing import md5_hash64
from hunt_ray.pipelines.textstats import (
    FP_BASE,
    FP_OFFSET,
    _flat_tokens,
    fingerprint_batch,
)


def _reference_loop(batch: pa.Table) -> dict[int, int]:
    """The definitional recurrence: fp = fp·B + h, token by token."""
    df = _flat_tokens(batch)
    fps: dict[int, np.uint64] = {}
    if df.height:
        th = md5_hash64(df["term"].to_numpy())
        with np.errstate(over="ignore"):
            for did, h in zip(df["doc_id"].to_numpy(), th):
                fps[int(did)] = fps.get(int(did), FP_OFFSET) * FP_BASE + np.uint64(h)
    out = {}
    for did in batch.column("doc_id").to_pylist():
        out[int(did)] = int(fps.get(int(did), FP_OFFSET))
    return out


def _check(texts: list[str | None]) -> None:
    batch = pa.table({
        "doc_id": pa.array(list(range(len(texts))), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    got = fingerprint_batch(batch)
    want = _reference_loop(batch)
    for did, fp in zip(got.column("doc_id").to_pylist(),
                       got.column("fingerprint").to_pylist()):
        assert int(fp) == want[int(did)], did


def test_fingerprint_identity_basic():
    _check(["the quick brown fox", "the quick brown fox", "fox brown quick the",
            "", None, "a", "a a a a a a a a", "x " * 500])


def test_fingerprint_identity_random():
    rng = np.random.default_rng(99)
    vocab = ["alpha", "beta", "gamma", "delta", "x1", "Y2", "0z"]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(0, 40)))
             for _ in range(64)]
    _check(texts)


def test_fingerprint_order_sensitive():
    a = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": pa.array(["alpha beta", "beta alpha"], pa.string())})
    t = fingerprint_batch(a)
    f = t.column("fingerprint").to_pylist()
    assert f[0] != f[1]


def test_fingerprint_no_per_token_python_loop():
    """The hot path must not iterate tokens in Python: a 100k-token doc
    fingerprints in well under a second of pure-numpy time."""
    import time

    text = " ".join(f"tok{i % 997}" for i in range(100_000))
    batch = pa.table({"doc_id": pa.array([1], pa.int64()),
                      "text": pa.array([text], pa.string())})
    t0 = time.perf_counter()
    fingerprint_batch(batch)
    assert time.perf_counter() - t0 < 1.0
