"""Geo position context: Morton normalizer goldens (AnalyzerTests.hs:154-172),
round-trip property, and prop_position_range-style 2-dim containment
(InterpreterTests.hs:543-560) against the engine."""

from __future__ import annotations

import numpy as np
import pytest

from hunt_ray.analyze.normalize import (
    denormalize_position,
    is_position,
    normalize_position,
    position_in_range,
)

GOLDEN_1_1 = "1100000000000000110000111100000011000011001111001100000000000000"


def test_norm_pos_goldens():
    # test_norm_pos / test_norm_pos2 / test_norm_pos4 (AnalyzerTests.hs:154-162)
    assert normalize_position("1-1") == GOLDEN_1_1
    assert normalize_position("-1.00--1.000") == "00" + GOLDEN_1_1[2:]
    assert normalize_position("1.000000-1.000000") == GOLDEN_1_1


def test_norm_pos_roundtrip_golden():
    # test_norm_pos5 (AnalyzerTests.hs:164-165)
    pos = "-25.0000001-1.0000002"
    assert denormalize_position(normalize_position(pos)) == pos


def test_norm_pos_roundtrip_property():
    # prop_norm_pos3 shape (AnalyzerTests.hs:167-172): lat.0000001-lon.0000002
    rng = np.random.default_rng(7)
    for _ in range(100):
        lat = int(rng.integers(-89, 90))
        lon = int(rng.integers(-179, 180))
        pos = f"{lat}.0000001-{lon}.0000002"
        assert denormalize_position(normalize_position(pos)) == pos, pos


def test_is_position():
    assert is_position("1-1")
    assert is_position("-89.99--179.99")
    assert is_position("53.6-10.0")
    assert not is_position("90-0")        # bounds exclusive (Position.hs:40-52)
    assert not is_position("0-180")
    assert not is_position("text-text")
    assert not is_position("53.6")


def _in_rect(nw, se, p) -> bool:
    return nw[0] <= p[0] <= se[0] and nw[1] <= p[1] <= se[1]


def test_position_in_range_matches_rect():
    """position_in_range over normalized keys ≡ rectangle containment
    (non-negative coords, like the reference's own property test)."""
    rng = np.random.default_rng(13)
    for _ in range(200):
        xs = rng.uniform(0, 89, size=2)
        ys = rng.uniform(0, 89, size=2)
        nw = (min(xs), min(ys))
        se = (max(xs), max(ys))
        p = (float(rng.uniform(0, 89)), float(rng.uniform(0, 89)))
        k = normalize_position(f"{p[0]:.7f}-{p[1]:.7f}")
        lb = normalize_position(f"{nw[0]:.7f}-{nw[1]:.7f}")
        ub = normalize_position(f"{se[0]:.7f}-{se[1]:.7f}")
        assert position_in_range(k, lb, ub) == _in_rect(nw, se, p), (nw, se, p)


@pytest.fixture(scope="module")
def geo_engine(ray_session, tmp_path_factory):
    """Corpus of docs each carrying one geo token in a position context."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hunt_ray.analyze.schema import ContextSchema
    from hunt_ray.index.build import BuildConfig, build_index
    from hunt_ray.query.engine import SearchEngine

    rng = np.random.default_rng(29)
    n = 120
    coords = [(round(float(rng.uniform(0, 80)), 4), round(float(rng.uniform(0, 80)), 4))
              for _ in range(n)]
    d = tmp_path_factory.mktemp("geopages")
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
        "geocontext": ContextSchema(type="position", default=False, source="text"),
    }
    idx = str(tmp_path_factory.mktemp("geoidx"))
    build_index(str(d), idx, BuildConfig(schema=schema, num_partitions=3,
                                         batch_size=64, analyzer_concurrency=2))
    return SearchEngine(idx), coords


def test_prop_position_range_engine(geo_engine):
    """Engine range query returns exactly the docs inside the rectangle
    (prop_position_range, InterpreterTests.hs:543-560)."""
    engine, coords = geo_engine
    rng = np.random.default_rng(31)
    for _ in range(20):
        xs = sorted(rng.uniform(0, 80, size=2))
        ys = sorted(rng.uniform(0, 80, size=2))
        nw, se = (xs[0], ys[0]), (xs[1], ys[1])
        q = f"geocontext:[{nw[0]:.4f}-{nw[1]:.4f} TO {se[0]:.4f}-{se[1]:.4f}]"
        got = {h.url for h in engine.search(q, limit=0).result}
        want = {f"geo://{i}" for i, p in enumerate(coords) if _in_rect(nw, se, p)}
        assert got == want, q


def test_norm_position_vectorized_matches_scalar():
    """The Arrow/numpy kernel (extract_regex + unpackbits interleave) is
    token-for-token identical to the scalar reference implementation,
    including invalid/out-of-bounds passthrough and prefix-match quirks."""
    import numpy as np

    from hunt_ray.analyze.normalize import (is_position, norm_position,
                                            normalize_position,
                                            validate_position)

    rng = np.random.default_rng(11)
    toks = [f"{rng.uniform(-95, 95):.{int(rng.integers(0, 9))}f}"
            f"-{rng.uniform(-185, 185):.{int(rng.integers(0, 9))}f}"
            for _ in range(400)]
    toks += ["1-1", "0-0", "-0.5-0.5", "89.9999999--179.9999999", "90-0",
             "-90-0", "0-180", "abc", "", "1-2-3", "1.2.3-4", "+5.5-+6.25",
             "12-", "-12", "1-2xyz", "  1-2", "0.0000001--0.0000001",
             "89.99999994-179.99999994"]
    assert norm_position(toks).to_pylist() == \
        [normalize_position(t) for t in toks]
    assert [bool(v) for v in validate_position(toks)] == \
        [is_position(t) for t in toks]
