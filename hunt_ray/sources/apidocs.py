"""ApiDocument JSON ingest — Hunt's primary insert format.

Reference: ``Hunt/Common/ApiDocument.hs:33-42,135-148`` — an ApiDocument is
``{"uri": ..., "index": {context: content}, "description": {...},
"weight": w}``; the interpreter analyzes the per-context content with the
schema and stores the description verbatim (``Interpreter.hs:421-480``).

We adapt JSONL of ApiDocuments into a columnar table (one ``cx_<context>``
string column per context + ``url``/``weight``/``desc`` JSON) and index it
with the normal build pipeline using ``source="column:cx_<cx>"`` context
schemas — same analyzer, same shuffle, same index format.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

from ..analyze.schema import ContextSchema, Schema


def apidocs_to_table(jsonl_path: str | list[str]) -> pa.Table:
    """Parse ApiDocument JSONL → columnar table (driver-side; ingest files
    are command batches, not the 100 TB corpus)."""
    paths = [jsonl_path] if isinstance(jsonl_path, str) else list(jsonl_path)
    docs = []
    for p in paths:
        with open(p) as f:
            for line in f:
                line = line.strip()
                if line:
                    docs.append(json.loads(line))
    return apidocs_list_to_table(docs)


def apidocs_list_to_table(docs: list[dict],
                          contexts: "set[str] | None" = None) -> pa.Table:
    if contexts is None:
        contexts = set()
        for d in docs:
            contexts.update(d.get("index", {}))
    contexts = set(contexts)
    cols: dict[str, list] = {"url": [], "weight": [], "desc": []}
    for cx in sorted(contexts):
        cols[f"cx_{cx}"] = []
    seen = set()
    for d in docs:
        uri = d["uri"]
        if uri in seen:
            # duplicate URIs in one batch are an error (Interpreter.hs:466-480)
            raise ValueError(f"duplicate URI in ApiDocument batch: {uri!r}")
        seen.add(uri)
        cols["url"].append(uri)
        # adWght 0.0 = unset → defScore 1.0 (toDefScore, Score.hs:50-52)
        cols["weight"].append(float(d.get("weight", 0.0)) or 1.0)
        desc = {k: v for k, v in (d.get("description") or {}).items()
                if v is not None}  # DocDesc.deleteNull (DocDesc.hs:173-178)
        cols["desc"].append(json.dumps(desc, sort_keys=True))
        idx = d.get("index", {})
        for cx in sorted(contexts):
            cols[f"cx_{cx}"].append(idx.get(cx, ""))
    schema_fields = [("url", pa.string()), ("weight", pa.float32()),
                     ("desc", pa.string())]
    schema_fields += [(f"cx_{cx}", pa.string()) for cx in sorted(contexts)]
    return pa.table({k: pa.array(v, dict(schema_fields)[k]) for k, v in cols.items()})


def schema_for_apidocs(base: Schema) -> Schema:
    """Rewrite a context schema so each context reads its own column."""
    return {
        cx: ContextSchema(type=cs.type, regexp=cs.regexp,
                          normalizers=cs.normalizers, weight=cs.weight,
                          default=cs.default, source=f"column:cx_{cx}")
        for cx, cs in base.items()
    }


def ingest_apidocs_jsonl(jsonl_path: str | list[str], staging_dir: str,
                         contexts: set[str], *,
                         concurrency: int = 8) -> str:
    """Ray-native distributed ApiDocument JSONL ingest.

    ``ray.data.read_json`` streams the JSONL corpus; each batch converts to
    the columnar ``cx_<context>`` layout in ``map_batches`` (per-batch
    duplicate-URI check, like the reference's per-insert-batch check) and
    lands as partitioned staging parquet for ``build_index``. The scale
    path for JSONL corpora — ``apidocs_to_table`` stays for driver-side
    command batches.
    """
    import ray.data as rd

    cxs = sorted(contexts)

    def to_cols(batch: pa.Table) -> pa.Table:
        rows = batch.to_pylist()
        uris = [r.get("uri") for r in rows]
        if len(set(uris)) != len(uris):
            raise ValueError("duplicate URI in ApiDocument batch")
        cols: dict[str, list] = {"url": uris, "weight": [], "desc": []}
        for cx in cxs:
            cols[f"cx_{cx}"] = []
        for r in rows:
            cols["weight"].append(float(r.get("weight") or 0.0) or 1.0)
            desc = {k: v for k, v in (r.get("description") or {}).items()
                    if v is not None}
            cols["desc"].append(json.dumps(desc, sort_keys=True))
            idx = r.get("index") or {}
            for cx in cxs:
                cols[f"cx_{cx}"].append(idx.get(cx) or "")
        fields = dict([("url", pa.string()), ("weight", pa.float32()),
                       ("desc", pa.string())]
                      + [(f"cx_{cx}", pa.string()) for cx in cxs])
        return pa.table({k: pa.array(v, fields[k]) for k, v in cols.items()})

    paths = [jsonl_path] if isinstance(jsonl_path, str) else list(jsonl_path)
    ds = rd.read_json(paths)
    ds.map_batches(to_cols, batch_format="pyarrow",
                   concurrency=concurrency).write_parquet(staging_dir)
    return staging_dir


def write_apidocs_parquet(docs: list[dict] | str, out_dir: str,
                          rows_per_file: int = 4096,
                          contexts: "set[str] | None" = None) -> str:
    table = apidocs_to_table(docs) if isinstance(docs, str) \
        else apidocs_list_to_table(docs, contexts)
    os.makedirs(out_dir, exist_ok=True)
    k = 0
    for lo in range(0, table.num_rows, rows_per_file):
        chunk = table.slice(lo, min(rows_per_file, table.num_rows - lo))
        pq.write_table(chunk, os.path.join(out_dir, f"apidocs-{k:05d}.parquet"))
        k += 1
    return out_dir
