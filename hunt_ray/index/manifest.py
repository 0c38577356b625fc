"""Index manifest: generations, per-partition completion + lineage.

Mirrors Hunt's segment-index generation files (``gen_N`` written by
``storeSegmentInfos``, ``Hunt/SegmentIndex.hs:94-113``; layout
``SegmentIndex/Directory/Layout.hs:8-27``) and the crawler's
checkpoint/resume loop (``Holumbus/Crawler/Core.hs:123-151``).

Layout under ``<index_dir>/``:

- ``manifest/gen_<N>.json``   — committed generation: config hash, schema,
  partition boundaries, global stats, list of completed parts
- ``manifest/parts/gen_<N>/part-<K>.json`` — per-part completion record,
  written atomically (tmp+rename) by the merge task that built the part:
  rows, bytes, run files consumed, input lineage (file list + params hash)
- ``postings/part=<K>.parquet`` + ``dict/part=<K>.parquet`` — the index
- ``docs/``                   — doc table parquet

Resume: a rerun with the same params hash skips parts whose completion
record exists, then re-commits the generation.
"""

from __future__ import annotations

import hashlib
import json
import os
import tempfile


def params_hash(payload: dict) -> str:
    return hashlib.sha256(json.dumps(payload, sort_keys=True).encode()).hexdigest()[:16]


def _atomic_write_json(path: str, obj: dict) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".tmp")
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(obj, f, sort_keys=True)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


class Manifest:
    def __init__(self, index_dir: str):
        self.index_dir = index_dir
        self.dir = os.path.join(index_dir, "manifest")

    # -- generations ------------------------------------------------

    def generations(self) -> list[int]:
        if not os.path.isdir(self.dir):
            return []
        gens = []
        for name in os.listdir(self.dir):
            if name.startswith("gen_") and name.endswith(".json"):
                gens.append(int(name[4:-5]))
        return sorted(gens)

    def latest(self) -> dict | None:
        gens = self.generations()
        if not gens:
            return None
        return self.read_generation(gens[-1])

    def read_generation(self, gen: int) -> dict:
        with open(os.path.join(self.dir, f"gen_{gen}.json")) as f:
            return json.load(f)

    def commit_generation(self, gen: int, payload: dict) -> None:
        payload = dict(payload, generation=gen)
        _atomic_write_json(os.path.join(self.dir, f"gen_{gen}.json"), payload)

    def next_generation(self) -> int:
        gens = self.generations()
        return (gens[-1] + 1) if gens else 0

    # -- per-part completion ----------------------------------------

    def part_record_path(self, gen: int, part: int) -> str:
        return os.path.join(self.dir, "parts", f"gen_{gen}", f"part-{part:05d}.json")

    def part_done(self, gen: int, part: int, phash: str) -> bool:
        p = self.part_record_path(gen, part)
        if not os.path.exists(p):
            return False
        try:
            with open(p) as f:
                rec = json.load(f)
            return rec.get("params_hash") == phash
        except Exception:
            return False

    def mark_part_done(self, gen: int, part: int, record: dict) -> None:
        _atomic_write_json(self.part_record_path(gen, part), record)

    def part_record(self, gen: int, part: int) -> dict | None:
        p = self.part_record_path(gen, part)
        if not os.path.exists(p):
            return None
        try:
            with open(p) as f:
                return json.load(f)
        except Exception:
            return None

    def completed_parts(self, gen: int, phash: str, n_parts: int) -> set[int]:
        return {k for k in range(n_parts) if self.part_done(gen, k, phash)}
