from __future__ import annotations

import numpy as np
import pytest

from hunt_ray.index.build import BuildConfig, build_index
from hunt_ray.index.reader import IndexReader
from hunt_ray.query.bm25 import BM25Engine


@pytest.fixture(scope="module")
def bm25(ray_session, pages_small, tmp_path_factory):
    idx_dir = str(tmp_path_factory.mktemp("bm25index"))
    build_index(pages_small, idx_dir,
                BuildConfig(num_partitions=4, salt_buckets=2, batch_size=64,
                            analyzer_concurrency=2))
    return BM25Engine(IndexReader(idx_dir))


QUERIES = [
    "brain",
    "take over the world",
    "mission tonight data",
    "the and of",              # pure stopwords — head terms
    "brain pinky mission",
    "nonexistentterm",
    "world nonexistentterm take",
]


@pytest.mark.parametrize("q", QUERIES)
def test_wand_equals_exhaustive(bm25, q):
    """search_wand is the vectorized block-max path — must be exact."""
    for k in (1, 5, 10, 50):
        ex = bm25.search_exhaustive(q, k)
        wd = bm25.search_wand(q, k)
        assert [d for d, _ in ex] == [d for d, _ in wd], f"{q!r} k={k}"
        assert np.allclose([s for _, s in ex], [s for _, s in wd], rtol=0, atol=0)


@pytest.mark.parametrize("q", QUERIES)
def test_wand_daat_reference_equals_exhaustive(bm25, q):
    """The per-doc DAAT reference implementation, both with and without
    its block-max skip, stays bit-identical to exhaustive."""
    for k in (1, 10):
        ex = bm25.search_exhaustive(q, k)
        assert ex == bm25.search_wand_daat(q, k, block_max=True), f"{q!r} k={k}"
        assert ex == bm25.search_wand_daat(q, k, block_max=False), f"{q!r} k={k}"


@pytest.mark.parametrize("q", QUERIES[:3])
def test_wand_no_blockmax_same(bm25, q):
    ex = bm25.search_exhaustive(q, 10)
    wd = bm25.search_wand(q, 10, block_max=False)
    assert ex == wd


def test_scores_positive_and_ordered(bm25):
    hits = bm25.search("take over the world", k=10)
    scores = [h["score"] for h in hits]
    assert all(s > 0 for s in scores)
    assert scores == sorted(scores, reverse=True)
    assert all(h["url"].startswith("test://") for h in hits)


def test_idf_downweights_stopwords(bm25):
    rare = bm25.search_exhaustive("pinky", 1)
    stop = bm25.search_exhaustive("the", 1)
    assert rare and stop
    assert rare[0][1] > stop[0][1]


def test_empty_query(bm25):
    assert bm25.search_exhaustive("", 10) == []
    assert bm25.search_wand("", 10) == []


@pytest.mark.parametrize("q", QUERIES)
def test_maxscore_equals_exhaustive(bm25, q):
    for k in (1, 5, 10, 50):
        ex = bm25.search_exhaustive(q, k)
        ms = bm25.search_maxscore(q, k)
        assert ex == ms, f"{q!r} k={k}"


def test_k_zero_returns_empty(bm25):
    """k=0 must return [] on every scorer path (the O(n) partition
    select in _top_k and the theta seeds need kk >= 1 internally)."""
    q = QUERIES[0]
    assert bm25.search_exhaustive(q, 0) == []
    assert bm25.search_maxscore(q, 0) == []
    assert bm25.search_block_max(q, 0) == []
    assert bm25.search_wand_daat(q, 0) == []
