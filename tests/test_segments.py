from __future__ import annotations

import numpy as np
import pytest

from hunt_ray.fixtures.pages import write_pages
from hunt_ray.index.build import BuildConfig
from hunt_ray.index.segments import SegmentedIndex
from hunt_ray.query.engine import SearchEngine

CFG = dict(num_partitions=2, salt_buckets=2, batch_size=64, analyzer_concurrency=2)


@pytest.fixture(scope="module")
def seg_index(ray_session, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("segroot"))
    base_pages = str(tmp_path_factory.mktemp("segpages0"))
    write_pages(base_pages, seed=42, n_rows=120, rows_per_file=60)
    from hunt_ray.index.build import build_index

    build_index(base_pages, root, BuildConfig(**CFG))
    return root


def _engine(root):
    return SearchEngine.from_reader(SegmentedIndex(root).reader())


def test_delete_by_query(seg_index):
    si = SegmentedIndex(seg_index)
    eng = _engine(seg_index)
    before = eng.search("brain", limit=0)
    assert before.count >= 1
    n = si.delete_by_query("brain")
    assert n >= before.count  # prefix search may cover more docs
    after = _engine(seg_index).search("brain", limit=0)
    assert after.count == 0
    # unrelated docs still live
    assert _engine(seg_index).search("the", limit=0).count > 0


def test_insert_new_segment(seg_index, tmp_path_factory):
    si = SegmentedIndex(seg_index)
    more = str(tmp_path_factory.mktemp("segpages1"))
    # different seed → different urls (test://i would collide; use a shifted set)
    import pyarrow.parquet as pq

    from hunt_ray.fixtures.pages import generate_pages

    t = generate_pages(seed=99, n_rows=40)
    # rewrite urls so they don't collide with segment 0
    import pyarrow as pa

    urls = pa.array([f"seg1://{i}" for i in range(t.num_rows)], pa.string())
    t = t.set_column(t.schema.get_field_index("url"), "url", urls)
    pq.write_table(t, f"{more}/pages-00000.parquet")
    si.insert_pages(more, BuildConfig(**CFG))

    eng = _engine(seg_index)
    res = eng.search("the", limit=0)
    urls_found = {h.url for h in res.result}
    assert any(u.startswith("seg1://") for u in urls_found)
    assert any(u.startswith("test://") for u in urls_found)
    # doc table merged: LIVE docs only (the earlier delete_by_query's
    # tombstones are excluded; all of them exist in segment 0)
    tombs = si._tombstones()
    assert eng.reader.docs.n_docs == 160 - tombs.size
    assert eng.reader.stats["n_docs"] == 160 - tombs.size


def test_duplicate_insert_rejected(seg_index, tmp_path_factory):
    si = SegmentedIndex(seg_index)
    dup = str(tmp_path_factory.mktemp("segdup"))
    write_pages(dup, seed=42, n_rows=10, rows_per_file=10)  # same urls as base
    with pytest.raises(ValueError, match="duplicate URIs"):
        si.insert_pages(dup, BuildConfig(**CFG))


def test_phrase_across_segments(seg_index):
    # positional data must survive the multi-segment merge
    eng = _engine(seg_index)
    res = eng.search('"take over the world"', limit=0)
    assert all(not h.url.startswith("deleted") for h in res.result)
    # the canon doc test://0 was deleted via "brain" delete_by_query above?
    # (module-scoped: delete ran first; test://0 contains "brain")
    assert all(h.url != "test://0" for h in res.result)


def test_compaction_rank_identity_and_exact_stats(ray_session, tmp_path):
    """compact(): multi-segment + tombstones → one segment, identical
    query results, tombstone-free doc table and exact avgdl."""
    import numpy as np

    from hunt_ray.common.hashing import hash64
    from hunt_ray.fixtures.pages import generate_pages, write_pages
    from hunt_ray.index.build import BuildConfig
    from hunt_ray.index.reader import IndexReader
    from hunt_ray.index.segments import SegmentedIndex
    from hunt_ray.query.engine import SearchEngine

    root = str(tmp_path / "segroot")
    cfg = BuildConfig(num_partitions=3, salt_buckets=2, batch_size=64,
                      analyzer_concurrency=2)
    p0 = str(tmp_path / "p0")
    write_pages(p0, seed=42, n_rows=120, rows_per_file=60)
    from hunt_ray.index.build import build_index

    build_index(p0, root, cfg)
    seg = SegmentedIndex(root)

    # second segment (disjoint urls via offset), then delete a few docs
    import pyarrow.parquet as pq

    p1 = str(tmp_path / "p1")
    import os

    os.makedirs(p1, exist_ok=True)
    pq.write_table(generate_pages(seed=43, n_rows=80, url_offset=1000),
                   os.path.join(p1, "pages-0.parquet"))
    seg.insert_pages(p1, cfg)
    victims = [f"test://{i}" for i in (2, 50, 1003)]
    n_del = seg.delete_doc_ids(np.asarray(hash64(victims), dtype=np.uint64))
    assert n_del == 3

    queries = ["brain", "bra", '"take over the world"', "take AND world",
               "the AND NOT mission", "datecontext:[2013-01-01 TO 2013-06-30]"]
    before_eng = SearchEngine.from_reader(seg.reader())
    before = {q: [(h.url, h.score) for h in before_eng.search(q, limit=0).result]
              for q in queries}
    n_live = seg.reader().stats["n_docs"]

    info = seg.compact()
    assert info["complete"] is True
    after_reader = seg.reader()
    # single plain segment again, no tombstones
    assert isinstance(after_reader, IndexReader)
    after_eng = SearchEngine.from_reader(after_reader)
    for q in queries:
        got = [(h.url, h.score) for h in after_eng.search(q, limit=0).result]
        assert got == before[q], q
    # victims are physically gone from the doc table
    assert after_reader.docs.n_docs == n_live == 120 + 80 - 3
    vict_ids = np.asarray(hash64(victims), dtype=np.uint64)
    assert not np.isin(vict_ids, after_reader.docs.doc_id).any()
    # avgdl recomputed exactly over the live docs (MultiReader only
    # approximates it while tombstones exist)
    lens = after_reader.docs.lens["body"]
    assert abs(after_reader.stats["avgdl_body"] - lens.mean()) < 1e-9
    # further inserts still work on the compacted base
    p2 = str(tmp_path / "p2")
    os.makedirs(p2, exist_ok=True)
    pq.write_table(generate_pages(seed=44, n_rows=30, url_offset=5000),
                   os.path.join(p2, "pages-0.parquet"))
    seg.insert_pages(p2, cfg)
    assert seg.reader().stats["n_docs"] == 120 + 80 - 3 + 30


def test_bm25_over_segments_and_compaction(ray_session, tmp_path):
    """BM25 must work over a multi-segment view with tombstones (never
    surfacing deleted docs), and after compaction must equal a fresh
    single-segment build of the live corpus bit-for-bit (exact avgdl)."""
    import os

    import numpy as np
    import pyarrow.parquet as pq

    from hunt_ray.common.hashing import hash64
    from hunt_ray.fixtures.pages import generate_pages, write_pages
    from hunt_ray.index.build import BuildConfig, build_index
    from hunt_ray.index.reader import IndexReader
    from hunt_ray.index.segments import SegmentedIndex
    from hunt_ray.query.bm25 import BM25Engine

    cfg = BuildConfig(num_partitions=3, salt_buckets=2, batch_size=64,
                      analyzer_concurrency=2)
    root = str(tmp_path / "segroot2")
    p0 = str(tmp_path / "p0b")
    write_pages(p0, seed=42, n_rows=100, rows_per_file=50)
    build_index(p0, root, cfg)
    seg = SegmentedIndex(root)
    p1 = str(tmp_path / "p1b")
    os.makedirs(p1, exist_ok=True)
    t1 = generate_pages(seed=47, n_rows=60, url_offset=2000)
    pq.write_table(t1, os.path.join(p1, "pages-0.parquet"))
    seg.insert_pages(p1, cfg)
    victims = ["test://5", "test://2012"]
    seg.delete_doc_ids(np.asarray(hash64(victims), dtype=np.uint64))
    vict_ids = set(int(x) for x in hash64(victims))

    # multi-segment BM25: runs, and tombstoned docs never appear
    eng_multi = BM25Engine(seg.reader())
    for q in ("brain", "take over the world", "the and of"):
        hits = eng_multi.search(q, k=50, hydrate=False)
        assert hits
        assert not ({h["doc_id"] for h in hits} & vict_ids), q

    # after compaction: bit-identical to a fresh build of the live corpus
    seg.compact()
    live_pages = str(tmp_path / "live")
    os.makedirs(live_pages, exist_ok=True)
    t0 = generate_pages(seed=42, n_rows=100)
    keep0 = [i for i in range(100) if f"test://{i}" not in victims]
    keep1 = [i for i in range(60) if f"test://{2000 + i}" not in victims]
    pq.write_table(t0.take(keep0), os.path.join(live_pages, "a.parquet"))
    pq.write_table(t1.take(keep1), os.path.join(live_pages, "b.parquet"))
    fresh_idx = str(tmp_path / "fresh")
    build_index(live_pages, fresh_idx, cfg)

    eng_a = BM25Engine(seg.reader())
    eng_b = BM25Engine(IndexReader(fresh_idx))
    assert eng_a.N == eng_b.N
    assert abs(eng_a.avgdl - eng_b.avgdl) < 1e-12
    for q in ("brain", "take over the world", "the and of", "pinky data"):
        a = eng_a.search(q, k=20, hydrate=True)
        b = eng_b.search(q, k=20, hydrate=True)
        assert a == b, q


def test_recrawl_duplicate_content_identity(ray_session, tmp_path):
    """The recrawl reality: a later generation re-inserts byte-identical
    page CONTENT under new urls (same html/text, distinct doc ids). At
    every lifecycle step — dups live, dups tombstoned, post-compact —
    the engine stays rank-identical (urls AND float32 scores) to the
    independent oracle over the equivalent corpus, across a grammar-fuzz
    query sample. Pins score-tie ordering between byte-equal docs and
    tombstone scoping across segments. (One-off sweeps at 200 fuzz
    queries / 200+100 docs ran green; this is the bounded version.)"""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from hunt_ray.analyze.schema import fixture_schema
    from hunt_ray.common.hashing import doc_ids_for_urls
    from hunt_ray.fixtures.pages import generate_pages
    from hunt_ray.index.build import build_index
    from hunt_ray.query.oracle import OracleIndex, OracleProcessor
    from hunt_ray.query.parser import parse_query
    from test_query_engine import _fuzz_queries

    cfg = BuildConfig(schema=fixture_schema(), **CFG)
    base = generate_pages(seed=42, n_rows=100)
    pick = np.sort(np.random.default_rng(7).choice(100, size=50, replace=False))
    dup = base.take(pa.array(pick, pa.int64()))
    dup_urls = [f"test://dup{i}" for i in range(50)]
    dup = dup.set_column(dup.schema.get_field_index("url"), "url",
                         pa.array(dup_urls, pa.string()))

    root = str(tmp_path / "root")
    d0, d1 = str(tmp_path / "p0"), str(tmp_path / "p1")
    for d, t in ((d0, base), (d1, dup)):
        os.makedirs(d, exist_ok=True)
        pq.write_table(t, os.path.join(d, "pages-00000.parquet"))
    build_index(d0, root, cfg)
    six = SegmentedIndex(root)
    six.insert_pages(d1, cfg)

    fuzz = _fuzz_queries(40, seed=31337)

    def identity(oracle, tag):
        eng = _engine(root)
        for qs in fuzz:
            got = [(h.url, h.score) for h in eng.search(qs, offset=0, limit=0).result]
            want = oracle.search(parse_query(qs))
            assert [u for u, _ in got] == [u for u, _ in want], (tag, qs)
            assert np.array_equal(
                np.asarray([s for _, s in got], np.float32),
                np.asarray([s for _, s in want], np.float32)), (tag, qs)

    both = OracleProcessor(OracleIndex(pa.concat_tables([base, dup]),
                                       fixture_schema()))
    identity(both, "dups live")

    assert six.delete_doc_ids(
        doc_ids_for_urls(pa.array(dup_urls, pa.string()))) == 50
    base_only = OracleProcessor(OracleIndex(base, fixture_schema()))
    identity(base_only, "dups tombstoned")

    six.compact()
    identity(base_only, "post compact")
