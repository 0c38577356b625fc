from __future__ import annotations

import numpy as np
import pytest

from hunt_ray.index.build import BuildConfig, build_index
from hunt_ray.query.engine import SearchEngine
from hunt_ray.query.serve import RemoteIndexReader


@pytest.fixture(scope="module")
def serve_index(ray_session, pages_small, tmp_path_factory):
    idx_dir = str(tmp_path_factory.mktemp("serveindex"))
    build_index(pages_small, idx_dir,
                BuildConfig(num_partitions=4, salt_buckets=2, batch_size=64,
                            analyzer_concurrency=2))
    return idx_dir


QUERIES = ["brain", "bra", '"take over the world"', "take AND world",
           "brain OR mission", "title:brain", "take NEAR 2 world",
           "datecontext:[2013-01-01 TO 2013-06-30]"]


def test_actor_pool_matches_local(serve_index):
    local = SearchEngine(serve_index)
    remote_reader = RemoteIndexReader(serve_index, n_actors=2)
    remote = SearchEngine.from_reader(remote_reader)
    try:
        for q in QUERIES:
            a = local.search(q, limit=0)
            b = remote.search(q, limit=0)
            assert [(h.url, h.score) for h in a.result] == \
                   [(h.url, h.score) for h in b.result], q
    finally:
        remote_reader.shutdown()


def test_routing_targets_single_partition(serve_index):
    r = RemoteIndexReader(serve_index, n_actors=2)
    try:
        # case-sensitive exact lookup routes to exactly one partition
        assert len(r.parts_for("case", "brain")) == 1
        # nocase routes only to partitions whose folded range can hold the
        # key (format-4 lc_ranges) — never more than full fan-out, and sound
        probed = r.parts_for("nocase", "brain")
        assert 1 <= len(probed) <= r.num_partitions
        for k in range(r.num_partitions):
            if any(t == "brain" for t in r.part(k).term_lc):
                assert k in probed
    finally:
        r.shutdown()
