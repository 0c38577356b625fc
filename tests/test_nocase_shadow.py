"""Case-folded shadow dictionary: nocase/prefix-nocase lookups must be
binary searches over the build-time lc_perm order (no vocabulary scan),
routed only to partitions whose [lc_min, lc_max] can hold the key —
the rebuild of the reference's PrefixTreeIndex nocase path
(PrefixTreeIndex.hs:86-98) over the partitioned dictionary."""

from __future__ import annotations

import numpy as np
import pytest

from hunt_ray.index.build import BuildConfig, build_index
from hunt_ray.index.reader import IndexReader


@pytest.fixture(scope="module")
def shadow_index(ray_session, pages_small, tmp_path_factory):
    idx_dir = str(tmp_path_factory.mktemp("shadow_idx"))
    cfg = BuildConfig(num_partitions=4, salt_buckets=2, batch_size=64,
                      analyzer_concurrency=2)
    build_index(pages_small, idx_dir, cfg)
    return IndexReader(idx_dir)


def _brute_nocase(rd: IndexReader, op: str, context: str, key: str) -> set[str]:
    """Reference result: linear scan of every partition's full vocabulary."""
    kl = key.lower()
    found = set()
    for k in range(rd.num_partitions):
        pr = rd.part(k)
        lo, hi = pr._span(context)
        for i in range(lo, hi):
            t = pr.term_lc[i]
            if (t == kl) if op == "nocase" else t.startswith(kl):
                found.add(pr.terms[i])
    return found


@pytest.mark.parametrize("op,key", [
    ("nocase", "brain"), ("nocase", "BRAIN"), ("nocase", "Mission"),
    ("nocase", "the"), ("nocase", "zzz-missing"),
    ("prefix_nocase", "bra"), ("prefix_nocase", "BR"), ("prefix_nocase", "t"),
    ("prefix_nocase", "Wor"),
])
def test_nocase_matches_bruteforce_without_scans(shadow_index, op, key):
    rd = shadow_index
    res = rd.search_sc(op, "body", key, with_positions=False)
    assert {w for w, _, _ in res} == _brute_nocase(rd, op, "body", key)
    # the O(vocab) fallback must never have run (format>=4 index)
    for pr in rd._parts.values():
        assert pr.nocase_fallback_scans == 0
        assert pr.lc_perm is not None


def test_shadow_is_sorted_per_context_span(shadow_index):
    rd = shadow_index
    for k in range(rd.num_partitions):
        pr = rd.part(k)
        for cx, (lo, hi) in pr.cx_span.items():
            span = pr.term_lc_sorted[lo:hi]
            assert all(span[i] <= span[i + 1] for i in range(len(span) - 1)), (k, cx)
            # permutation stays inside its context span
            assert all(lo <= int(p) < hi for p in pr.lc_perm[lo:hi])


def test_nocase_routing_prunes_partitions(shadow_index):
    rd = shadow_index
    assert rd.lc_ranges is not None and len(rd.lc_ranges) == rd.num_partitions
    # a key outside every partition's folded range routes nowhere
    assert rd.parts_for("nocase", "\U0010fffe") == []
    # routing is sound: every partition that holds a case variant is probed
    for key in ("brain", "the", "mission"):
        probed = set(rd.parts_for("nocase", key))
        for k in range(rd.num_partitions):
            pr = rd.part(k)
            if any(t == key for t in pr.term_lc):
                assert k in probed, (key, k)
    # and strictly narrower than full fan-out for some key (term-range
    # partitioning gives disjoint-ish folded ranges on this corpus)
    widths = {key: len(rd.parts_for("nocase", key))
              for key in ("aardvark", "brain", "zebra")}
    assert any(w < rd.num_partitions for w in widths.values()), widths


def test_bm25_nocase_lookup_uses_shadow(shadow_index):
    from hunt_ray.query.bm25 import BM25Engine

    rd = shadow_index
    eng = BM25Engine(rd, context="body")
    hits = eng.search("brain mission", k=5, hydrate=False)
    assert hits
    for pr in rd._parts.values():
        assert pr.nocase_fallback_scans == 0


def test_reader_memory_arrow_resident_dictionaries():
    """ArrowStrSeq keeps the term dictionary in Arrow buffers: the resident
    footprint is the string bytes + offsets, several times smaller than the
    equivalent list of Python str objects (VERDICT r2 finding #5)."""
    import sys

    import numpy as np
    import pyarrow as pa

    from hunt_ray.index.reader import ArrowStrSeq

    words = [f"term{i:06d}suffix" for i in range(20000)]
    arr = pa.array(words, pa.large_string())
    seq = ArrowStrSeq(arr)
    arrow_bytes = sum(b.size for b in arr.buffers() if b is not None)
    pylist_bytes = sys.getsizeof(words) + sum(sys.getsizeof(w) for w in words)
    assert arrow_bytes * 3 < pylist_bytes  # >3x smaller in practice
    # bisect-compatible: same lookups as the list
    import bisect

    for probe in ["term000000suffix", "term019999suffix", "term010000suffix",
                  "zzz", ""]:
        assert bisect.bisect_left(seq, probe) == bisect.bisect_left(words, probe)
    assert seq[5] == words[5]
    assert list(seq[10:13]) == words[10:13]
    assert list(seq.take(np.array([3, 7]))) == [words[3], words[7]]
