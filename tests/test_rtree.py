"""STR-packed R-tree (the SimpleRTreeIndex analog, RTreeIndex.hs:120-180):
structure unit tests against brute force, and engine/serve parity between
the ``position-rtree`` (R-tree-backed) and ``position`` (Z-order-scan)
context types over the same corpus."""

from __future__ import annotations

import numpy as np
import pytest

from hunt_ray.analyze.normalize import normalize_position
from hunt_ray.index.rtree import STRTree, decode_dims, decode_key


def _brute(lat, lon, r):
    la0, la1, lo0, lo1 = r
    return np.flatnonzero((lat >= la0) & (lat <= la1)
                          & (lon >= lo0) & (lon <= lo1))


def test_strtree_vs_bruteforce():
    rng = np.random.default_rng(41)
    for n in (0, 1, 3, 63, 64, 65, 1000, 5000):
        lat = rng.integers(0, 2**32, size=n, dtype=np.uint64).astype(np.uint32)
        lon = rng.integers(0, 2**32, size=n, dtype=np.uint64).astype(np.uint32)
        t = STRTree(lat, lon)
        for _ in range(30):
            c = rng.integers(0, 2**32, size=4, dtype=np.uint64)
            r = (int(min(c[0], c[1])), int(max(c[0], c[1])),
                 int(min(c[2], c[3])), int(max(c[2], c[3])))
            got = t.query(*r)
            want = _brute(lat, lon, r)
            assert np.array_equal(got, want), (n, r)
        # full-space rect returns everything; empty rect nothing
        assert len(t.query(0, 2**32 - 1, 0, 2**32 - 1)) == n
        assert len(t.query(5, 4, 0, 2**32 - 1)) == 0


def test_strtree_duplicate_points():
    lat = np.full(500, 7, np.uint32)
    lon = np.full(500, 9, np.uint32)
    t = STRTree(lat, lon)
    assert len(t.query(7, 7, 9, 9)) == 500
    assert len(t.query(8, 10, 9, 9)) == 0


def test_decode_dims_matches_decode_key():
    rng = np.random.default_rng(43)
    keys = []
    for _ in range(50):
        la = float(rng.uniform(-89, 89))
        lo = float(rng.uniform(-179, 179))
        keys.append(normalize_position(f"{la:.7f}-{lo:.7f}"))
    lat, lon = decode_dims(keys)
    for i, k in enumerate(keys):
        la_i, lo_i = decode_key(k)
        assert (int(lat[i]), int(lon[i])) == (la_i, lo_i)


def _in_rect(nw, se, p) -> bool:
    return nw[0] <= p[0] <= se[0] and nw[1] <= p[1] <= se[1]


@pytest.fixture(scope="module")
def rtree_engine(ray_session, tmp_path_factory):
    """Same corpus indexed under BOTH geo context types."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hunt_ray.analyze.schema import ContextSchema
    from hunt_ray.index.build import BuildConfig, build_index
    from hunt_ray.query.engine import SearchEngine

    rng = np.random.default_rng(47)
    n = 150
    coords = [(round(float(rng.uniform(0, 80)), 4), round(float(rng.uniform(0, 80)), 4))
              for _ in range(n)]
    d = tmp_path_factory.mktemp("rtpages")
    tbl = pa.table({
        "url": pa.array([f"geo://{i}" for i in range(n)], pa.string()),
        "warc_ts": pa.array(np.arange(n, dtype=np.int64), pa.timestamp("us")),
        "html": pa.array([b"<html></html>"] * n, pa.binary()),
        "text": pa.array([f"point at {la}-{lo} end" for la, lo in coords], pa.string()),
        "lang": pa.array(["en"] * n, pa.string()),
    })
    pq.write_table(tbl, str(d / "pages-00000.parquet"))
    schema = {
        "body": ContextSchema(type="text", default=True, source="text"),
        "geoz": ContextSchema(type="position", default=False, source="text"),
        "geort": ContextSchema(type="position-rtree", default=False, source="text"),
    }
    idx = str(tmp_path_factory.mktemp("rtidx"))
    build_index(str(d), idx, BuildConfig(schema=schema, num_partitions=3,
                                         batch_size=64, analyzer_concurrency=2))
    return SearchEngine(idx), coords, idx


def test_rtree_engine_parity(rtree_engine):
    """Rectangle queries through the R-tree context return exactly the
    Z-order context's results AND the brute-force rectangle membership."""
    engine, coords, _ = rtree_engine
    rng = np.random.default_rng(53)
    for _ in range(25):
        xs = sorted(rng.uniform(0, 80, size=2))
        ys = sorted(rng.uniform(0, 80, size=2))
        nw, se = (xs[0], ys[0]), (xs[1], ys[1])
        rect = f"[{nw[0]:.4f}-{nw[1]:.4f} TO {se[0]:.4f}-{se[1]:.4f}]"
        got_rt = {h.url for h in engine.search(f"geort:{rect}", limit=0).result}
        got_z = {h.url for h in engine.search(f"geoz:{rect}", limit=0).result}
        want = {f"geo://{i}" for i, p in enumerate(coords) if _in_rect(nw, se, p)}
        assert got_rt == want, rect
        assert got_z == want, rect
    # the R-tree structure was actually consulted (lazy caches populated)
    built = [pr for pr in engine.reader._parts.values()
             if getattr(pr, "_rtrees", None) and "geort" in pr._rtrees]
    assert built, "no partition built an R-tree for the geort context"
    assert all("geoz" not in pr._rtrees for pr in engine.reader._parts.values())


def test_rtree_serve_parity(rtree_engine):
    """Serve-mode fan-out (incl. the batched prefetch path) returns the
    local reader's results for the R-tree context."""
    from hunt_ray.query.serve import RemoteIndexReader

    engine, coords, idx = rtree_engine
    rr = RemoteIndexReader(idx, n_actors=2)
    try:
        rng = np.random.default_rng(59)
        for _ in range(5):
            xs = sorted(rng.uniform(0, 80, size=2))
            ys = sorted(rng.uniform(0, 80, size=2))
            lb = normalize_position(f"{xs[0]:.7f}-{ys[0]:.7f}")
            ub = normalize_position(f"{xs[1]:.7f}-{ys[1]:.7f}")
            rr.prefetch([], ranges=[("geort", lb, ub)])
            remote = rr.lookup_range_sc("geort", lb, ub)
            local = engine.reader.lookup_range_sc("geort", lb, ub)
            assert [w for w, _, _ in remote] == [w for w, _, _ in local]
            for (_, _, pr_), (_, _, pl) in zip(remote, local):
                assert np.array_equal(pr_.doc_ids, pl.doc_ids)
    finally:
        rr.shutdown()


def test_geo_range_matches_duckdb_oracle(ray_session):
    """Driver-visible q_geo_range == its DuckDB oracle at sf0.001 (the
    same comparison the correctness gate runs at sf0.01)."""
    import importlib.util

    import duckdb
    import pandas as pd

    spec = importlib.util.spec_from_file_location(
        "ray_entry_geo", "/root/repo/__ray_entry__.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    sf = "/root/testdata/sf0.001"
    got = m.queries()["q_geo_range"](sf).to_pandas()
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    want = con.execute(m.oracle_sql()["q_geo_range"]).df()
    assert len(got) == len(want) > 0
    got = got.sort_values(["rect", "doc_id"]).reset_index(drop=True)
    want = want.sort_values(["rect", "doc_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))


def test_rtree_across_segments_with_tombstones(ray_session, tmp_path):
    """Rectangle queries through MultiReader: each segment descends its own
    R-tree, tombstoned docs drop out, re-inserted docs resurface."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hunt_ray.analyze.schema import ContextSchema
    from hunt_ray.index.build import BuildConfig, build_index
    from hunt_ray.index.segments import SegmentedIndex
    from hunt_ray.query.engine import SearchEngine

    def write(points: dict[str, tuple[float, float]], d: str) -> str:
        import os

        os.makedirs(d, exist_ok=True)
        urls = sorted(points)
        tbl = pa.table({
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(list(range(len(urls))), pa.timestamp("us")),
            "html": pa.array([b"<html></html>"] * len(urls), pa.binary()),
            "text": pa.array([f"at {points[u][0]:.3f}-{points[u][1]:.3f}"
                              for u in urls], pa.string()),
            "lang": pa.array(["en"] * len(urls), pa.string()),
        })
        pq.write_table(tbl, f"{d}/pages.parquet")
        return d

    schema = {
        "body": ContextSchema(type="text", default=True, source="text"),
        "geo": ContextSchema(type="position-rtree", default=False, source="text"),
    }
    cfg = BuildConfig(schema=schema, num_partitions=2, batch_size=64,
                      analyzer_concurrency=2)
    root = str(tmp_path / "root")
    build_index(write({"p://a": (10.0, 10.0), "p://b": (20.0, 20.0)},
                      str(tmp_path / "pg0")), root, cfg)
    si = SegmentedIndex(root)
    si.insert_pages(write({"p://c": (12.0, 12.0)}, str(tmp_path / "pg1")), cfg)

    rect = "geo:[5.0005-5.0005 TO 25.0005-25.0005]"

    def hits():
        eng = SearchEngine.from_reader(SegmentedIndex(root).reader())
        return {h.url for h in eng.search(rect, limit=0).result}

    import numpy as np

    from hunt_ray.common.hashing import hash64

    def delete(uri: str):
        si.delete_doc_ids(np.asarray(hash64([uri]), dtype=np.uint64))

    assert hits() == {"p://a", "p://b", "p://c"}
    delete("p://b")
    assert hits() == {"p://a", "p://c"}
    # update = delete + re-insert at a new position inside the rect
    delete("p://a")
    si.insert_pages(write({"p://a": (11.0, 11.0)}, str(tmp_path / "pg2")), cfg)
    assert hits() == {"p://a", "p://c"}


def test_decode_dims_arrow_zero_copy_path():
    """Arrow input (string + large_string, sliced and chunked) decodes
    identically to the list-of-str path."""
    import pyarrow as pa

    rng = np.random.default_rng(61)
    keys = sorted(normalize_position(
        f"{rng.uniform(-89, 89):.7f}-{rng.uniform(-179, 179):.7f}")
        for _ in range(300))
    want = decode_dims(keys)
    for typ in (pa.string(), pa.large_string()):
        arr = pa.array(keys, typ)
        for sl, ref in ((arr, want),
                        (arr.slice(50, 100),
                         (want[0][50:150], want[1][50:150])),
                        (pa.chunked_array([arr.slice(0, 150), arr.slice(150)]),
                         want)):
            got = decode_dims(sl)
            assert np.array_equal(got[0], ref[0])
            assert np.array_equal(got[1], ref[1])
