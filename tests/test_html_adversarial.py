"""Hand-computed expectations for adversarial html anchors — the cases
ADVICE r4 flagged as untestable through the DuckDB oracle because the
oracle shares the extraction regexes: an href containing '>', a
non-numeric test:// href, nested markup inside the anchor element, and
script-quoted hrefs. These pin `extract_anchors`' '>'-exclusion rule
and `_anchor_pairs`' tolerant suffix parse against literal expected
values, independent of any oracle."""

from __future__ import annotations

import pyarrow as pa
import pytest


@pytest.fixture(autouse=True)
def _ray(ray_session):
    return ray_session


HTML = (
    '<html><body>'
    '<a href="test://1">plain one</a> '
    # href contains '>': with the old [^"]* href pattern the element
    # regex closed at that '>' and the anchor swallowed 'x">real text'
    '<a href="test://5>x">real text</a> '
    '<a href="test://about">about page</a> '          # non-numeric suffix
    '<a href="test://2" rel="nofollow">with attrs</a> '
    '<a href="test://3"><b>nested markup</b></a> '    # skipped: [^<]* rule
    '<script>var s = \'<a href="test://9">ghost</a>\';</script>'
    '<a href="http://other/4">offsite</a>'
    '</body></html>'
)


def test_extract_anchors_href_gt_and_nesting():
    from hunt_ray.analyze.html import extract_anchors

    hrefs, anchors = extract_anchors(pa.array([HTML]))
    pairs = list(zip(hrefs.to_pylist()[0], anchors.to_pylist()[0]))
    # test://5>x is NOT a capturable simple anchor under the '>'-safe
    # rule (its href value would need '>'); nested markup and script
    # ghosts are skipped; attribute tails never leak into anchor text
    assert pairs == [
        ("test://1", "plain one"),
        ("test://about", "about page"),
        ("test://2", "with attrs"),
        ("http://other/4", "offsite"),
    ]
    assert not any(">" in a or '"' in a for _, a in pairs)


def test_extract_links_keeps_all_hrefs_in_order():
    from hunt_ray.analyze.html import extract_links

    links = extract_links(pa.array([HTML])).to_pylist()[0]
    # link extraction (for the edge graph) is laxer than anchor capture:
    # every href value in document order, script ghosts excluded
    assert links == ["test://1", "test://5>x", "test://about",
                     "test://2", "test://3", "http://other/4"]


def test_anchor_pairs_drops_malformed_hrefs_not_the_batch():
    from hunt_ray.pipelines.graph import _anchor_pairs

    batch = pa.table({"html": pa.array([HTML.encode()], pa.binary())})
    out = _anchor_pairs(batch)
    got = sorted(zip(out.column("dst").to_pylist(),
                     out.column("anchor").to_pylist()))
    # test://about parses to null dst and is dropped row-wise (the old
    # strict cast raised and killed the whole job); offsite href is
    # filtered by scheme; only the numeric test:// anchors survive
    assert got == [(1, "plain one"), (2, "with attrs")]
