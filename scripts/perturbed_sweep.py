"""Perturbed-corpus differential sweep: rebuild the input tables with a
seeded perturbation, then run EVERY `queries()` entry against its DuckDB
oracle on the perturbed copy (rows-only entries must still run and keep
their self-check column green). Because engine and oracle both read the
same perturbed parquet, any disagreement is an engine bug, not a fixture
artifact — this is the sweep that caught the gappy-vec_id k-means crash
and the cluster-relabel divergence fixed in commit 266bfaa.

Modes (all seeded, byte-reproducible):
  drop    — drop each row independently with probability --rate
            (default 0.07); exercises gappy doc_id/vec_id spaces.
  shuffle — permute row order within each table (ids stay contiguous);
            every pipeline must be row-order invariant.
  empty   — blank out the `text` of a --rate fraction of documents;
            exercises zero-token docs through every tokenizing kernel.
  unicode — append a gauntlet of non-ASCII material (accents, combining
            marks, Turkish İ/ı, ẞ/ß, Kelvin K and Å signs — which
            LOWERCASE INTO ASCII — fullwidth digits, CJK, emoji, NBSP,
            zero-width joiner, mixed-script confusables) to the text of
            a --rate fraction of documents; the engine (Rust regex /
            Arrow utf8proc lower) and DuckDB (its own lower + RE2) must
            tokenize `lower(text)` → `[a-z0-9_]+` identically on it.
  dup     — append a --rate fraction of documents as fresh-doc_id copies
            (ids continue n..n+m-1, so contiguity contracts hold): even
            copies byte-exact, odd copies near-duplicates (one appended
            marker token). Exercises dedup keep-rules, minhash/simhash
            duplicate mass, bucket caps, and — because duplicate texts
            produce byte-equal BM25 scores — every ranking tie-break.
  ties    — events only: for a --rate fraction of events, copy ts (and
            value) from the same user's previous event in (ts, event_id)
            order, forcing equal-timestamp collisions through sessionize
            boundaries, as-of join "max (ts, event_id) ≤" tie-breaks,
            and window sums.
  long    — inflate the text of min(8, rate·n) documents ~30× (the doc
            repeated with paragraph breaks). Exercises long-document
            paths: substring/paragraph dedup interval logic, positions
            varint with large offsets, repetition scores, quantiles.
  zerovec — zero out the embedding of a --rate fraction of vectors:
            degenerate zero-norm rows through every cosine kernel. The
            engine's epsilon-guarded normalize defines cos(0⃗, ·) = 0.0;
            the oracles mirror it with a CASE (DuckDB's own
            list_cosine_similarity would say -1.0).
  vecdup  — append a --rate fraction of embeddings as byte-identical
            copies under fresh contiguous vec_ids: exact cosine ties
            through KNN/kmeans top-k tie-breaks ((cos desc, id asc)
            must hold end to end, including per-batch partial top-k).

Known, documented contract skips (counted separately, not failures):
the derived-link-graph family (`graph.n_docs`) refuses non-contiguous
doc_ids by design — its synthetic edge formula `(src*m+c+1) % n` and the
SQL oracle's identical formula are only meaningful on 0..n-1 (see
`hunt_ray/pipelines/graph.py:57-91`); real edge tables go through
`pagerank_edges()` which has no such requirement. `drop` mode therefore
expects those queries to raise that exact ValueError.

Bugs this sweep has caught so far: the gappy-vec_id k-means crash and
cluster-relabel divergence (266bfaa), float-summation-order sensitivity
in q_lineitem_q1/q_events_range (137a5c4), and four unicode definition
mismatches — Python context-sensitive lower() vs utf8proc in char-gram
jaccard, code-point vs byte grams in substring_stats, Rust-\\s vs
RE2-\\s in token_count_bpe, and lower-then-tokenize vs the analyzer's
tokenize-then-lower in the q_index_bm25 oracle.

Usage:
  PYTHONPATH=. python scripts/perturbed_sweep.py \
      [--sf /root/testdata/sf0.001] \
      [--mode drop|shuffle|empty|unicode|dup|ties|long|zerovec|vecdup|all \
       or a '+'-chain like dup+unicode] [--rate 0.07] [--seed 1]
"""
from __future__ import annotations

import argparse
import os
import shutil
import sys
import time
import zlib

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from check_oracles import TABLES, canon, to_df  # noqa: E402

# tables any oracle or pipeline actually reads; the rest are copied as-is
PERTURBED = ("documents", "embeddings", "events", "lineitem")
CONTRACT_MSG = "requires contiguous doc_ids"

# Case-conversion landmines (chars whose lower() lands IN or NEXT TO
# [a-z0-9_]) + separators and confusables; each entry is appended whole
UNICODE_GAUNTLET = [
    "CAFÉ naïve Ångström",          # accents; Å (U+00C5)
    "İstanbul ıı İİ",               # Turkish dotted/dotless I
    "STRAẞE größe ßß",              # capital sharp S → 'ss'? (lower ẞ=ß)
    "KELVIN K sign 2K",             # U+212A lowers to ASCII 'k'
    "ΣΙΣΥΦΟΣ σίσυφος",              # final-sigma casing
    "ｆｕｌｌｗｉｄｔｈ１２３",        # fullwidth letters+digits
    "東京都 and русский текст",      # CJK + Cyrillic
    "emoji 🎉🎊 mix42",
    "non breaking spaces tab	done",
    "zero​width‍join ab́c",  # ZWSP/ZWJ + combining acute
    "ⅣⅦ roman Ⅸ ①②",               # numeric-ish symbols
    "ideo　space nelbr fssep end",  # ideographic space, NEL, 
    "ʼn ǅungla ǋemačka",            # titlecase digraphs (lower ǅ=ǆ)
]


def perturb_table(tbl: pa.Table, name: str, mode: str, rate: float,
                  rng: np.random.Generator) -> pa.Table:
    n = tbl.num_rows
    if mode == "drop":
        keep = rng.random(n) >= rate
        keep[rng.integers(0, n)] = True  # never produce an empty table
        return tbl.filter(pa.array(keep))
    if mode == "shuffle":
        return tbl.take(pa.array(rng.permutation(n), pa.int64()))
    if mode == "empty":
        if name != "documents":
            return tbl
        mask = rng.random(n) < rate
        text = tbl.column("text").to_pylist()
        blank = np.flatnonzero(mask)
        for i in blank:
            text[i] = ""
        idx = tbl.schema.get_field_index("text")
        return tbl.set_column(idx, "text", pa.array(text, pa.string()))
    if mode == "unicode":
        if name != "documents":
            return tbl
        mask = rng.random(n) < rate
        text = tbl.column("text").to_pylist()
        for j, i in enumerate(np.flatnonzero(mask)):
            text[i] = text[i] + " " + UNICODE_GAUNTLET[
                j % len(UNICODE_GAUNTLET)]
        idx = tbl.schema.get_field_index("text")
        return tbl.set_column(idx, "text", pa.array(text, pa.string()))
    if mode == "dup":
        if name != "documents":
            return tbl
        m = max(1, int(round(n * rate)))
        src_idx = np.sort(rng.choice(n, size=m, replace=False))
        base = tbl.take(pa.array(src_idx, pa.int64()))
        start = int(pa.compute.max(tbl.column("doc_id")).as_py()) + 1
        text = base.column("text").to_pylist()
        for j in range(m):
            if j % 2 == 1:  # odd copies: near-duplicates, not byte-equal
                text[j] = text[j] + f" nearmark{j}"
        base = base.set_column(
            base.schema.get_field_index("doc_id"), "doc_id",
            pa.array(np.arange(start, start + m), pa.int64()))
        base = base.set_column(
            base.schema.get_field_index("text"), "text",
            pa.array(text, pa.string()))
        base = base.set_column(
            base.schema.get_field_index("n_chars"), "n_chars",
            pa.array([len(t) for t in text], pa.int64()))
        return pa.concat_tables([tbl, base])
    if mode == "ties":
        if name != "events":
            return tbl
        uid = tbl.column("user_id").to_numpy()
        ts = tbl.column("ts").cast(pa.int64()).to_numpy().copy()
        eid = tbl.column("event_id").to_numpy()
        val = tbl.column("value").to_numpy().copy()
        order = np.lexsort((eid, ts, uid))
        hit = rng.random(n) < rate
        # walk in (uid, ts, eid) order; pull ts/value from the previous
        # SAME-USER event so collisions are in-domain, not cross-user
        applied = 0
        for k in range(1, n):
            i, p = order[k], order[k - 1]
            if hit[i] and uid[i] == uid[p]:
                ts[i] = ts[p]
                val[i] = val[p]
                applied += 1
        if applied == 0:  # never a vacuous green: force one collision
            for k in range(1, n):
                i, p = order[k], order[k - 1]
                if uid[i] == uid[p]:
                    ts[i], val[i] = ts[p], val[p]
                    break
        tbl = tbl.set_column(
            tbl.schema.get_field_index("ts"), "ts",
            pa.array(ts, pa.int64()).cast(pa.timestamp("us")))
        return tbl.set_column(
            tbl.schema.get_field_index("value"), "value",
            pa.array(val, pa.float64()))
    if mode == "long":
        if name != "documents":
            return tbl
        k = max(1, min(8, int(round(n * rate))))
        idx = rng.choice(n, size=k, replace=False)
        text = tbl.column("text").to_pylist()
        for i in idx:
            text[i] = "\n\n".join([text[i]] * 30)
        pos = tbl.schema.get_field_index("text")
        tbl = tbl.set_column(pos, "text", pa.array(text, pa.string()))
        return tbl.set_column(
            tbl.schema.get_field_index("n_chars"), "n_chars",
            pa.array([len(t) for t in text], pa.int64()))
    if mode == "zerovec":
        if name != "embeddings":
            return tbl
        hit = np.flatnonzero(rng.random(n) < rate)
        if hit.size == 0:  # never a vacuous green
            hit = np.array([rng.integers(0, n)])
        emb = tbl.column("embedding").to_pylist()
        for j, i in enumerate(hit):
            # alternate exact-zero rows (cos 0.0 by convention) and
            # tiny-norm rows (engine/oracle must agree on the TRUE
            # cosine — a max(norm, eps) clamp would shrink it)
            emb[i] = ([0.0] * len(emb[i]) if j % 2 == 0
                      else [v * 1e-20 for v in emb[i]])
        idx = tbl.schema.get_field_index("embedding")
        return tbl.set_column(
            idx, "embedding",
            pa.array(emb, tbl.schema.field("embedding").type))
    if mode == "vecdup":
        if name != "embeddings":
            return tbl
        m = max(1, int(round(n * rate)))
        src = np.sort(rng.choice(n, size=m, replace=False))
        dup = tbl.take(pa.array(src, pa.int64()))
        start = int(pa.compute.max(tbl.column("vec_id")).as_py()) + 1
        dup = dup.set_column(
            dup.schema.get_field_index("vec_id"), "vec_id",
            pa.array(np.arange(start, start + m), pa.int64()))
        return pa.concat_tables([tbl, dup])
    raise ValueError(f"unknown mode {mode!r}")


def build_dir(sf: str, mode: str, rate: float, seed: int) -> str:
    """``mode`` may be a '+'-chained composition (e.g. ``dup+unicode``):
    each stage's perturbation is applied to the previous stage's output.
    Single-stage modes keep the ORIGINAL (seed, crc32(table)) rng stream
    so every recorded single-mode artifact stays byte-reproducible from
    its documented command; chained stages salt by stage index."""
    out = f"/tmp/perturbed_{mode.replace('+', '_')}_{seed}"
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    stages = mode.split("+")
    for t in TABLES:
        src = f"{sf}/{t}.parquet"
        if t in PERTURBED:
            tbl = pq.read_table(src)
            for si, stage in enumerate(stages):
                key = ((seed, zlib.crc32(t.encode())) if len(stages) == 1
                       else (seed, si, zlib.crc32(t.encode())))
                tbl = perturb_table(tbl, t, stage, rate,
                                    np.random.default_rng(key))
            pq.write_table(tbl, f"{out}/{t}.parquet")
        else:
            shutil.copy(src, f"{out}/{t}.parquet")
    return out


def run_sweep(m, mode: str, sf_dir: str) -> tuple[list[str], list[str]]:
    """→ (failures, contract_skips); prints one line per query."""
    qs, sqls = m.queries(), m.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    fails, skips = [], []
    for name in sorted(qs):
        t0 = time.time()
        try:
            got = to_df(qs[name](sf_dir))
            if name in sqls:
                got = canon(got)
                want = canon(con.execute(sqls[name]).df())
                assert list(got.columns) == list(want.columns), \
                    f"schema {list(got.columns)} != {list(want.columns)}"
                assert len(got) == len(want), \
                    f"rows {len(got)} != {len(want)}"
                pd.testing.assert_frame_equal(
                    got, want.astype(got.dtypes.to_dict()),
                    check_exact=False, rtol=0, atol=0)
                kind = "exact"
            else:
                assert len(got) >= 0
                if "ok" in got.columns:
                    assert bool(got["ok"].all()), \
                        "self-check column has False rows"
                kind = "rows-only"
            print(f"  ok   {name:<28} {len(got):>7} rows "
                  f"{time.time() - t0:5.1f}s ({kind})")
        except ValueError as e:
            if CONTRACT_MSG in str(e) and "drop" in mode.split("+"):
                skips.append(name)
                print(f"  skip {name:<28} documented contiguous-id "
                      "contract (expected under drop)")
            else:
                fails.append(name)
                print(f"  FAIL {name:<28} {str(e).splitlines()[0][:110]}")
        except Exception as e:  # noqa: BLE001 — report and continue
            fails.append(name)
            print(f"  FAIL {name:<28} {str(e).splitlines()[0][:110]}")
    return fails, skips


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--sf", default="/root/testdata/sf0.001")
    p.add_argument("--mode", default="all",
                   help="one of drop/shuffle/empty/unicode/dup/ties/long/"
                        "zerovec/vecdup, a '+'-chained composition "
                        "(dup+unicode), or all")
    p.add_argument("--rate", type=float, default=0.07)
    p.add_argument("--seed", type=int, default=1)
    a = p.parse_args()

    import importlib.util

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    spec = importlib.util.spec_from_file_location("entry", "__ray_entry__.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)

    known = ("drop", "shuffle", "empty", "unicode", "dup", "ties", "long",
             "zerovec", "vecdup")
    modes = list(known) if a.mode == "all" else [a.mode]
    for m_ in modes:  # fail fast, before any table is copied or built
        for stage in m_.split("+"):
            if stage not in known:
                p.error(f"unknown mode {stage!r} (choose from "
                        f"{'/'.join(known)}, '+'-chainable, or all)")
    bad = 0
    for mode in modes:
        sf_dir = build_dir(a.sf, mode, a.rate, a.seed)
        print(f"== mode={mode} rate={a.rate} seed={a.seed} → {sf_dir}")
        fails, skips = run_sweep(m, mode, sf_dir)
        n = len(m.queries())
        print(f"== {mode}: {n - len(fails) - len(skips)} ok, "
              f"{len(skips)} contract-skip, {len(fails)} failed"
              f"{': ' + ', '.join(fails) if fails else ''}")
        bad += len(fails)
    ray.shutdown()
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
