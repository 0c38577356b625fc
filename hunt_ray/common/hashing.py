"""Deterministic 64-bit hashing of document keys and terms.

The reference derives ``DocId`` as a 64-bit MurmurHash2 of the URI
(``hunt-searchengine/src/Hunt/Common/DocId.hs:76-77``; 64 bits chosen to make
collisions negligible, ``README.md:93-94``). Rank identity in our engine is
defined on (score, url), not on internal ids, so any deterministic 64-bit
hash works; we use polars' vectorized 64-bit hash (Rust, SIMD) with a fixed
seed, falling back to blake2b when polars is unavailable.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

HASH_SEED = 0x68756E74  # "hunt"

try:
    import polars as pl

    _HAVE_POLARS = True
except Exception:  # pragma: no cover
    _HAVE_POLARS = False


def hash64(strings: pa.Array | pa.ChunkedArray | list[str]) -> np.ndarray:
    """Vectorized 64-bit hash of a string array → np.uint64 array."""
    if isinstance(strings, list):
        strings = pa.array(strings, type=pa.large_string())
    if _HAVE_POLARS:
        s = pl.from_arrow(strings)
        if isinstance(s, pl.DataFrame):  # chunked arrays can arrive as frames
            s = s.to_series()
        return s.hash(seed=HASH_SEED).to_numpy().astype(np.uint64)
    # fallback: per-row blake2b (slow path, only without polars)
    import hashlib

    if isinstance(strings, pa.ChunkedArray):
        strings = strings.combine_chunks()
    out = np.empty(len(strings), dtype=np.uint64)
    for i, v in enumerate(strings):
        h = hashlib.blake2b(str(v).encode("utf-8"), digest_size=8).digest()
        out[i] = int.from_bytes(h, "little")
    return out


def doc_ids_for_urls(urls: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """DocId column = hash64(url), mirroring Hunt's mkDocId (DocId.hs:76-77)."""
    return hash64(urls)


def bucket_of(hashes: np.ndarray, n_buckets: int) -> np.ndarray:
    return (hashes % np.uint64(n_buckets)).astype(np.int32)


_MD5_CACHE: dict[str, int] = {}


def md5_hash64(terms) -> np.ndarray:
    """Top 8 bytes of md5(term) as uint64 — DuckDB-reproducible
    (``('0x' || substring(md5(term), 1, 16))::UBIGINT``), used by the
    pipelines whose outputs carry exact SQL oracles (SimHash,
    fingerprints). Hashed once per distinct term (bounded cache)."""
    uniq, inv = np.unique(np.asarray(terms, dtype=object), return_inverse=True)
    out = np.empty(len(uniq), dtype=np.uint64)
    import hashlib

    for i, t in enumerate(uniq):
        h = _MD5_CACHE.get(t)
        if h is None:
            h = int.from_bytes(hashlib.md5(t.encode("utf-8")).digest()[:8], "big")
            if len(_MD5_CACHE) < 1_000_000:
                _MD5_CACHE[t] = h
        out[i] = h
    return out[inv]


def doc_id_to_hex(doc_id: int) -> str:
    """toHex (DocId.hs:79-85): "0x" + lowercase hex, no padding — the
    JSON/debug rendering of a doc id."""
    return f"0x{int(doc_id):x}"


def doc_id_from_hex(text: str) -> int | None:
    """fromHex (DocId.hs:87-89): parse hex with or without the 0x prefix;
    None when not a valid hex string."""
    t = text[2:] if text.startswith(("0x", "0X")) else text
    if not t:
        return None
    try:
        return int(t, 16)
    except ValueError:
        return None
