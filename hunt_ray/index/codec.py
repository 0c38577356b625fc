"""Posting-list chunk encoding: sorted doc ids, delta+varbyte compressed.

Mirrors the reference's segment postings layout (``.occ``/``.pos`` varint
streams, ``Hunt/SegmentIndex/Directory/TermInfos.hs:196-221``) re-expressed
as Parquet rows: one row per (context, term, chunk-of-docs), with binary
blobs holding the varbyte streams. Chunking (CHUNK_DOCS docs per row) keeps
hot head-term rows bounded and gives block-max metadata for WAND pruning
(per-chunk ``max_tf`` and ``last_doc_id`` enable skipping).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..common.varbyte import (
    delta_decode,
    delta_encode,
    segmented_delta_decode,
    segmented_delta_encode,
    vb_decode,
    vb_encode,
)

CHUNK_DOCS = 4096

POSTINGS_SCHEMA = pa.schema(
    [
        ("context", pa.string()),
        ("term", pa.string()),
        ("chunk", pa.int32()),
        ("n_docs", pa.int32()),
        ("max_tf", pa.int32()),
        ("last_doc_id", pa.uint64()),
        ("doc_ids", pa.large_binary()),
        ("tfs", pa.large_binary()),
        ("positions", pa.large_binary()),
    ]
)

DICT_SCHEMA = pa.schema(
    [
        ("context", pa.string()),
        ("term", pa.string()),
        ("term_lc", pa.string()),
        ("df", pa.int64()),
        ("cf", pa.int64()),
        ("max_tf", pa.int32()),
        ("n_chunks", pa.int32()),
    ]
)


def encode_term_chunks(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    pos_flat: np.ndarray | None,
    pos_offsets: np.ndarray | None,
    chunk_docs: int = CHUNK_DOCS,
) -> list[dict]:
    """Encode one term's postings (doc_ids ascending) into chunk dicts."""
    n = len(doc_ids)
    out = []
    for ci, lo in enumerate(range(0, n, chunk_docs)):
        hi = min(lo + chunk_docs, n)
        dvals = doc_ids[lo:hi]
        tvals = tfs[lo:hi]
        if pos_flat is not None and pos_offsets is not None:
            plo, phi = int(pos_offsets[lo]), int(pos_offsets[hi])
            seg_off = pos_offsets[lo:hi + 1] - pos_offsets[lo]
            pvals = segmented_delta_encode(pos_flat[plo:phi].astype(np.uint64), seg_off)
            pos_blob = vb_encode(pvals)
        else:
            pos_blob = b""
        out.append(
            {
                "chunk": ci,
                "n_docs": hi - lo,
                "max_tf": int(tvals.max()) if len(tvals) else 0,
                "last_doc_id": int(dvals[-1]),
                "doc_ids": vb_encode(delta_encode(dvals.astype(np.uint64))),
                "tfs": vb_encode(tvals.astype(np.uint64)),
                "positions": pos_blob,
            }
        )
    return out


def decode_doc_ids(blob: bytes) -> np.ndarray:
    return delta_decode(vb_decode(blob))


def decode_tfs(blob: bytes) -> np.ndarray:
    return vb_decode(blob)


def decode_positions(blob: bytes, tfs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Return (flat positions, offsets) for a chunk; offsets from tfs."""
    offsets = np.zeros(len(tfs) + 1, dtype=np.int64)
    np.cumsum(tfs, out=offsets[1:])
    flat = segmented_delta_decode(vb_decode(blob), offsets)
    return flat, offsets
