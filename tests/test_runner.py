"""Shard-resumable pipeline runner (hunt_ray/pipelines/runner.py):
crash-resume skips completed shards, param changes invalidate them, and
the resumed output is identical to a one-shot run."""

from __future__ import annotations

import json
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from hunt_ray.pipelines.runner import run_resumable, shard_files


@pytest.fixture(autouse=True)
def _ray(ray_session):
    return ray_session


def _write_inputs(d, n_files=6, rows_per=40):
    files = []
    for f in range(n_files):
        ids = list(range(f * rows_per, (f + 1) * rows_per))
        p = str(d / f"in-{f}.parquet")
        pq.write_table(pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array([f"doc {i} body words" for i in ids]),
        }), p)
        files.append(p)
    return files


def _transform(min_id: int = 0):
    def fn(ds):
        import pyarrow.compute as pc

        def keep(batch: pa.Table) -> pa.Table:
            return batch.filter(
                pc.greater_equal(batch.column("doc_id"), min_id))
        return ds.map_batches(keep, batch_format="pyarrow")
    return fn


def _read_out(out_dir) -> pd.DataFrame:
    parts = []
    for root, _dirs, names in os.walk(out_dir):
        if "_done" in root:
            continue
        for nm in names:
            if nm.endswith(".parquet"):
                parts.append(pq.read_table(os.path.join(root, nm)).to_pandas())
    return (pd.concat(parts).sort_values("doc_id").reset_index(drop=True)
            if parts else pd.DataFrame())


def test_shard_files_contiguous_and_bounded():
    fs = [f"f{i:02d}" for i in range(10)]
    groups = shard_files(fs, 4)
    assert [f for g in groups for f in g] == sorted(fs)
    assert len(groups) <= 4 + 1 and all(groups)
    assert shard_files(fs, 100) == [[f] for f in sorted(fs)]


def test_resume_skips_completed_shards(tmp_path):
    files = _write_inputs(tmp_path)
    out = str(tmp_path / "out")

    class Boom(RuntimeError):
        pass

    calls = {"n": 0}

    def failing(ds):
        calls["n"] += 1
        if calls["n"] == 3:     # die while processing the third shard
            raise Boom()
        return _transform(10)(ds)

    with pytest.raises(Boom):
        run_resumable(files, failing, out, n_shards=3, params={"min_id": 10})

    done = sorted(os.listdir(os.path.join(out, "_done")))
    assert done == ["shard-0.json", "shard-1.json"]  # two shards survived

    calls2 = {"n": 0}

    def counting(ds):
        calls2["n"] += 1
        return _transform(10)(ds)

    s = run_resumable(files, counting, out, n_shards=3,
                      params={"min_id": 10})
    assert s["skipped"] == 2 and s["ran"] == 1
    assert calls2["n"] == 1                      # finished shards not rerun

    # identical to a one-shot run
    ref = str(tmp_path / "ref")
    run_resumable(files, _transform(10), ref, n_shards=3,
                  params={"min_id": 10})
    pd.testing.assert_frame_equal(_read_out(out), _read_out(ref))
    with open(os.path.join(out, "_done", "run.json")) as f:
        assert json.load(f)["n_shards"] == 3


def test_param_change_invalidates_shards(tmp_path):
    files = _write_inputs(tmp_path, n_files=4)
    out = str(tmp_path / "out")
    run_resumable(files, _transform(0), out, n_shards=2, params={"min_id": 0})
    s = run_resumable(files, _transform(100), out, n_shards=2,
                      params={"min_id": 100})
    assert s["ran"] == 2 and s["skipped"] == 0   # stale records rejected
    got = _read_out(out)
    assert (got.doc_id >= 100).all()
    # lineage recorded per shard
    with open(os.path.join(out, "_done", "shard-0.json")) as f:
        rec = json.load(f)
    assert rec["inputs"] == sorted(files)[:2]
    assert rec["rows"] == len(_read_out(os.path.join(out, "shard=0")))
