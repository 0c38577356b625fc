"""Shard-resumable pipeline runner: partitioned Parquet output with
per-shard completion + lineage records, so a failed corpus run skips
finished shards on restart.

The index build already has this property through its manifest
(``hunt_ray/index/manifest.py``, Hunt's ``gen_N`` analog); this runner
gives the same guarantee to any corpus pipeline (clean / dedup / stats),
mirroring the crawler's checkpoint-resume loop
(``Holumbus/Crawler/Core.hs:123-151``: process a bounded slice, persist
state, resume skips completed work).

Layout under ``out_dir/``:

- ``shard=<K>/*.parquet``       — one directory per input shard, written
  by Ray Data (many files, streamed — never one giant file)
- ``_done/shard-<K>.json``      — atomic (tmp+rename) completion record:
  input files, params hash, rows written, seconds
- ``_done/run.json``            — final run summary once every shard is in

Resume rule: a shard is skipped iff its completion record exists AND
carries the same params hash (changed transform params invalidate old
shards rather than silently mixing outputs). Each shard's pipeline is
internally parallel (Ray Data streaming); shards run one at a time so a
crash loses at most one shard of work and per-run driver state stays
O(1). Shard granularity = the input file list split into ``n_shards``
contiguous groups — align it with the storage layout (one group per
input prefix/day/crawl segment) so reruns skip at the unit the storage
fails at.
"""

from __future__ import annotations

import json
import os
import tempfile
import time
from typing import Callable

from ..index.manifest import params_hash


def _atomic_write_json(path: str, obj: dict) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(obj, f, indent=1, sort_keys=True)
    os.replace(tmp, path)


def shard_files(files: list[str], n_shards: int) -> list[list[str]]:
    """Contiguous file groups (sorted input → stable shard identity)."""
    files = sorted(files)
    n_shards = max(1, min(n_shards, len(files)))
    per = -(-len(files) // n_shards)
    return [files[i:i + per] for i in range(0, len(files), per)]


def run_resumable(files: list[str],
                  transform: Callable,
                  out_dir: str,
                  *,
                  n_shards: int = 8,
                  params: dict | None = None) -> dict:
    """Run ``transform(ray.data.Dataset) -> ray.data.Dataset`` over the
    input files shard by shard, writing ``out_dir/shard=K/`` Parquet with
    a completion record per shard. Reruns skip shards whose record
    matches the current params hash. Returns the run summary (also
    persisted as ``_done/run.json``).
    """
    import ray.data as rd

    phash = params_hash(params or {})
    shards = shard_files(files, n_shards)
    done_dir = os.path.join(out_dir, "_done")
    summary: dict = {"params_hash": phash, "n_shards": len(shards),
                     "shards": [], "skipped": 0, "ran": 0}

    for k, group in enumerate(shards):
        marker = os.path.join(done_dir, f"shard-{k}.json")
        shard_out = os.path.join(out_dir, f"shard={k}")
        if os.path.exists(marker):
            with open(marker) as f:
                rec = json.load(f)
            if rec.get("params_hash") == phash and rec.get("inputs") == group:
                summary["skipped"] += 1
                summary["shards"].append({"shard": k, "skipped": True,
                                          "rows": rec.get("rows")})
                continue
        # stale or param-mismatched output: rewrite the whole shard
        if os.path.isdir(shard_out):
            import shutil

            shutil.rmtree(shard_out)
        t0 = time.time()
        out_ds = transform(rd.read_parquet(group))
        out_ds.write_parquet(shard_out)
        rows = _count_rows(shard_out)  # counted from the durable files
        rec = {"shard": k, "inputs": group, "params_hash": phash,
               "rows": rows, "seconds": round(time.time() - t0, 3)}
        _atomic_write_json(marker, rec)
        summary["ran"] += 1
        summary["shards"].append({"shard": k, "skipped": False, "rows": rows})

    _atomic_write_json(os.path.join(done_dir, "run.json"), summary)
    return summary


def _count_rows(parquet_dir: str) -> int:
    import pyarrow.parquet as pq

    total = 0
    for root, _dirs, names in os.walk(parquet_dir):
        for nm in names:
            if nm.endswith(".parquet"):
                total += pq.read_metadata(os.path.join(root, nm)).num_rows
    return total
