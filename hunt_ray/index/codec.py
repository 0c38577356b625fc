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

# docs-table shard modulus: the build writes docs with a
# shard = doc_id % DOC_SHARDS column, one row group per shard value, so a
# serve-mode DocShardActor pool of any size dividing DOC_SHARDS reads only
# its own row groups (Parquet row-group stats pruning) — never the full
# table. Divisors 1/2/4/8/16 cover the practical pool sizes.
DOC_SHARDS = 16

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
        # case-folded shadow dictionary: row index permutation such that
        # term_lc[lc_perm] is sorted within each context span — nocase and
        # prefix-nocase lookups binary-search the shadow order instead of
        # scanning the vocabulary (the distributed analog of the reference's
        # PrefixTreeIndex nocase path, PrefixTreeIndex.hs:86-98)
        ("lc_perm", pa.int32()),
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


def encode_partition_arrays(
    ctx_ord: np.ndarray, trm_ord: np.ndarray,
    dids: np.ndarray, tfs: np.ndarray,
    pos_flat: np.ndarray, pos_offsets: np.ndarray, pos_counts: np.ndarray,
    chunk_docs: int = CHUNK_DOCS,
) -> tuple[dict, dict, np.ndarray, np.ndarray]:
    """Encode a whole partition in vectorized passes (no per-term loop).

    Inputs are UNSORTED posting rows with lexicographic-ordinal context and
    term codes. One lexsort orders everything; chunk boundaries, deltas,
    varbyte streams and per-chunk/per-term stats all come from segmented
    numpy ops; per-chunk blobs are memoryview slices of three shared byte
    streams. Returns (postings column dict, dict-table column dict,
    group_starts, perm) — group metadata for callers needing term strings.
    """
    from ..common.nputil import gather_ranges
    from ..common.varbyte import vb_encode_with_lengths

    n = len(dids)
    perm = np.lexsort((dids, trm_ord, ctx_ord))
    p_ctx, p_trm = ctx_ord[perm], trm_ord[perm]
    p_dids = np.ascontiguousarray(dids[perm], dtype=np.uint64)
    p_tfs = np.ascontiguousarray(tfs[perm], dtype=np.uint32)
    p_counts = pos_counts[perm]
    # positions stay u32 end-to-end — delta values are identical to the u64
    # computation (segments are ascending), at a quarter the footprint
    p_flat = np.ascontiguousarray(pos_flat[gather_ranges(pos_offsets[perm], p_counts)])
    p_offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(p_counts, out=p_offs[1:])

    new_grp = np.empty(n, dtype=bool)
    new_grp[0] = True
    new_grp[1:] = (p_ctx[1:] != p_ctx[:-1]) | (p_trm[1:] != p_trm[:-1])
    grp_id = np.cumsum(new_grp) - 1
    grp_starts = np.flatnonzero(new_grp)
    row_in_grp = np.arange(n, dtype=np.int64) - grp_starts[grp_id]
    is_chunk_start = new_grp | (row_in_grp % chunk_docs == 0)
    chunk_starts = np.flatnonzero(is_chunk_start)
    chunk_ends = np.r_[chunk_starts[1:], n]
    chunk_grp = grp_id[chunk_starts]
    chunk_seq = (row_in_grp[chunk_starts] // chunk_docs).astype(np.int32)

    # doc ids: delta within chunk, one varbyte stream, sliced per chunk
    chunk_bounds = np.r_[chunk_starts, n]
    d_deltas = segmented_delta_encode(p_dids, chunk_bounds)
    doc_buf, doc_lens = vb_encode_with_lengths(d_deltas)
    doc_cum = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(doc_lens, out=doc_cum[1:])
    # tfs: plain varbyte stream
    tf_buf, tf_lens = vb_encode_with_lengths(p_tfs)
    tf_cum = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(tf_lens, out=tf_cum[1:])
    # positions: delta within doc, varbyte stream, sliced at chunk bounds
    pos_deltas = segmented_delta_encode(p_flat, p_offs)
    pos_buf, pos_lens = vb_encode_with_lengths(pos_deltas)
    pos_cum = np.zeros(len(p_flat) + 1, dtype=np.int64)
    np.cumsum(pos_lens, out=pos_cum[1:])

    mv_doc, mv_tf, mv_pos = memoryview(doc_buf), memoryview(tf_buf), memoryview(pos_buf)
    max_tf_chunk = np.maximum.reduceat(p_tfs, chunk_starts).astype(np.int32) \
        if n else np.empty(0, np.int32)
    postings = {
        "chunk": chunk_seq,
        "n_docs": (chunk_ends - chunk_starts).astype(np.int32),
        "max_tf": max_tf_chunk,
        "last_doc_id": p_dids[chunk_ends - 1],
        "doc_ids": [bytes(mv_doc[doc_cum[s]:doc_cum[e]])
                    for s, e in zip(chunk_starts, chunk_ends)],
        "tfs": [bytes(mv_tf[tf_cum[s]:tf_cum[e]])
                for s, e in zip(chunk_starts, chunk_ends)],
        "positions": [bytes(mv_pos[pos_cum[p_offs[s]]:pos_cum[p_offs[e]]])
                      for s, e in zip(chunk_starts, chunk_ends)],
        "grp": chunk_grp,
    }
    grp_ends = np.r_[grp_starts[1:], n]
    dict_cols = {
        "df": (grp_ends - grp_starts).astype(np.int64),
        "cf": np.add.reduceat(p_tfs, grp_starts).astype(np.int64) if n else np.empty(0, np.int64),
        "max_tf": np.maximum.reduceat(p_tfs, grp_starts).astype(np.int32) if n else np.empty(0, np.int32),
        "n_chunks": np.bincount(chunk_grp, minlength=len(grp_starts)).astype(np.int32),
        "ctx_ord": p_ctx[grp_starts],
        "trm_ord": p_trm[grp_starts],
    }
    return postings, dict_cols, grp_starts, perm


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
