"""Corpus-curation pipelines (hunt_ray/pipelines/curate.py, events.py):
decontamination, repetition stats, source caps, stratified sampling,
sessionization — each against its DuckDB oracle plus hand-built edge
cases (planted contamination, multi-block caps, gap boundaries)."""

from __future__ import annotations

import importlib.util

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(autouse=True)
def _ray(ray_session):
    return ray_session


@pytest.fixture(scope="module")
def entry():
    spec = importlib.util.spec_from_file_location(
        "ray_entry_curate", "/root/repo/__ray_entry__.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def _oracle(entry, key: str, sf: str = SF) -> pd.DataFrame:
    import duckdb

    con = duckdb.connect()
    for t in ("documents", "events"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf}/{t}.parquet')")
    return con.execute(entry.oracle_sql()[key]).df()


def _assert_matches(entry, key: str, *, min_rows: int = 1):
    got = entry.queries()[key](SF).to_pandas()
    want = _oracle(entry, key)
    cols = sorted(got.columns)
    assert cols == sorted(want.columns)
    got = got[cols].sort_values(cols).reset_index(drop=True)
    want = want[cols].sort_values(cols).reset_index(drop=True)
    assert len(got) == len(want) >= min_rows
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))
    return got


def test_decontaminate_matches_oracle(entry):
    got = _assert_matches(entry, "q_decontaminate", min_rows=5)
    assert (got.n_hit_grams >= 1).all()


def test_decontaminate_planted(tmp_path):
    """A doc that copies a 6-token passage from an eval doc is flagged
    with the right distinct-gram count; unrelated docs are not."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hunt_ray.pipelines.curate import decontaminate

    passage = "alpha beta gamma delta epsilon zeta"
    docs = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),  # doc 0 is eval (0 % m == 0)
        "text": pa.array([
            f"intro {passage} outro",
            f"stolen words {passage} appended here",   # 3 shared 4-grams
            "totally unrelated words with no overlap at all",
        ]),
    })
    pq.write_table(docs, tmp_path / "documents.parquet")
    out = decontaminate(str(tmp_path), n=4, eval_mod=19).to_pandas()
    assert out.doc_id.tolist() == [1]
    assert out.n_hit_grams.tolist() == [3]  # the 3 windows inside the passage


def test_repetition_matches_oracle(entry):
    got = _assert_matches(entry, "q_repetition", min_rows=100)
    assert (got.dup_token_ratio > 0).any()      # fixture vocab is small
    assert (got.top_bigram_n >= 1).all()


def test_repetition_hand_case():
    import pyarrow as pa

    from hunt_ray.pipelines.curate import repetition_batch

    out = repetition_batch(pa.table({
        "doc_id": pa.array([7, 8], pa.int64()),
        "text": pa.array(["a a a b", "unique"]),
    })).to_pandas().set_index("doc_id")
    assert out.loc[7, "n_tokens"] == 4
    assert out.loc[7, "dup_token_ratio"] == pytest.approx(0.5)
    assert out.loc[7, "top_bigram_n"] == 2          # "a a" twice of 3 bigrams
    assert out.loc[7, "top_bigram_frac"] == pytest.approx(round(2 / 3, 6))
    assert out.loc[8, "n_tokens"] == 1
    assert out.loc[8, "top_bigram_n"] == 0
    assert out.loc[8, "top_bigram_frac"] == 0.0


def test_source_cap_matches_oracle(entry):
    got = _assert_matches(entry, "q_source_cap", min_rows=20)
    assert got.groupby("source").size().max() <= 20


def test_source_cap_across_blocks(tmp_path):
    """The partial+final combine caps correctly when one source's docs are
    spread over several input files (the multi-block case the partial
    stage alone cannot resolve) — lowest doc_ids win globally."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hunt_ray.pipelines.curate import source_cap

    d = tmp_path / "documents.parquet"
    d.mkdir()
    # interleave ids across files so per-file lowest-k ≠ global lowest-k
    for f, ids in enumerate(([9, 3, 6], [1, 4, 7], [2, 5, 8])):
        pq.write_table(pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "source": pa.array(["hot"] * len(ids)),
        }), d / f"part-{f}.parquet")
    out = source_cap(str(tmp_path), k=4).to_pandas()
    assert sorted(out.doc_id.tolist()) == [1, 2, 3, 4]
    assert (out.source == "hot").all()


def test_sample_stratified_matches_oracle(entry):
    got = _assert_matches(entry, "q_sample_stratified", min_rows=50)
    # en sampled at 2× de, 4× default — the strata actually differ
    assert set(got.lang) >= {"en", "de"}


def test_sample_stratified_deterministic_and_nested():
    from hunt_ray.pipelines.curate import sample_stratified

    a = sample_stratified(SF).to_pandas().doc_id.sort_values().tolist()
    b = sample_stratified(SF).to_pandas().doc_id.sort_values().tolist()
    assert a == b  # same draw every run
    # raising every rate only ADDS docs (threshold rule on a fixed draw)
    wide = sample_stratified(SF, rates={"en": 255, "de": 255},
                             default_rate=255).to_pandas()
    assert set(a) <= set(wide.doc_id)


def test_sessionize_matches_oracle(entry):
    got = _assert_matches(entry, "q_sessionize", min_rows=100)
    assert (got.n_events >= 1).all()
    assert (got.session_start <= got.session_end).all()
    # multi-event sessions exist (the gap choice is non-vacuous)
    assert (got.n_events > 1).any()


def test_sessionize_gap_boundaries(tmp_path):
    """Gap rule is strict '>': an event exactly gap minutes later stays in
    the session; one microsecond past it opens a new one. session_seq
    restarts per user."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hunt_ray.pipelines.events import sessionize

    t0 = np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64)
    m = 60_000_000
    rows = [
        (1, t0, 0), (1, t0 + 10 * m, 1),        # u1 s1: two events
        (1, t0 + 10 * m + 480 * m, 2),          # exactly gap → same session
        (1, t0 + 10 * m + 960 * m + 1, 3),      # gap + 1 µs → new session
        (2, t0, 4),                             # u2 s1
    ]
    pq.write_table(pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.int64()).cast(pa.timestamp("us")),
        "event_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array(["x"] * len(rows)),
        "value": pa.array([0.0] * len(rows)),
        "props": pa.array(["{}"] * len(rows)),
    }), tmp_path / "events.parquet")
    out = (sessionize(str(tmp_path), gap_minutes=480).to_pandas()
           .sort_values(["user_id", "session_seq"]).reset_index(drop=True))
    assert out[["user_id", "session_seq", "n_events"]].values.tolist() == [
        [1, 1, 3], [1, 2, 1], [2, 1, 1]]


def test_window_agg_matches_oracle(entry):
    got = _assert_matches(entry, "q_window_agg", min_rows=50)
    assert (got.n >= 1).all()
    assert got.event_type.nunique() >= 3


def test_asof_join_matches_oracle(entry):
    got = _assert_matches(entry, "q_asof_join", min_rows=20)
    assert (got.lag_us >= 0).all()              # match is never in the future
    assert got.event_id.is_unique               # one match per left event


def test_asof_join_tie_and_inner_semantics(tmp_path):
    """Equal-ts view matches (ts ≤), max event_id wins among equal-ts
    views, and clicks before any view are dropped."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hunt_ray.pipelines.events import asof_join

    t0 = 1_700_000_000_000_000
    rows = [  # (user, ts, event_id, type)
        (1, t0 - 5, 0, "click"),      # before any view → dropped
        (1, t0, 1, "view"),
        (1, t0, 2, "view"),           # same ts: max event_id (2) wins
        (1, t0, 3, "click"),          # equal ts matches (v.ts <= c.ts)
        (1, t0 + 10, 4, "click"),
        (2, t0 + 1, 5, "view"),
        (2, t0 + 9, 6, "click"),
    ]
    pq.write_table(pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.int64()).cast(pa.timestamp("us")),
        "event_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows]),
        "value": pa.array([0.0] * len(rows)),
        "props": pa.array(["{}"] * len(rows)),
    }), tmp_path / "events.parquet")
    out = (asof_join(str(tmp_path)).to_pandas()
           .sort_values("event_id").reset_index(drop=True))
    assert out[["event_id", "view_event_id", "lag_us"]].values.tolist() == [
        [3, 2, 0], [4, 2, 10], [6, 5, 8]]


def test_quota_by_lang_matches_oracle(entry):
    got = _assert_matches(entry, "q_quota_by_lang", min_rows=20)
    # each language lands in [budget, budget + one doc): over budget but
    # dropping its last-drawn doc would fall under
    totals = got.groupby("lang").n_tokens.sum()
    budgets = {"en": 4000, "de": 1500}
    for lang, total in totals.items():
        assert total >= budgets.get(lang, 800)


def test_quota_by_lang_greedy_fill(tmp_path):
    """Docs are taken in (md5(doc_id), doc_id) draw order until the budget
    is crossed; the crossing doc is kept, later ones dropped."""
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    from hunt_ray.pipelines.curate import quota_by_lang

    ids = list(range(10))
    pq.write_table(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(["w1 w2 w3 w4" for _ in ids]),   # 4 tokens each
        "lang": pa.array(["xx"] * len(ids)),
    }), tmp_path / "documents.parquet")
    out = quota_by_lang(str(tmp_path), budgets={},
                        default_budget=10).to_pandas()
    # greedy: prior < 10 keeps the first 3 docs in draw order (0,4,8 prior)
    order = sorted(ids, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
    assert sorted(out.doc_id) == sorted(order[:3])
    assert out.n_tokens.sum() == 12               # crossed the budget of 10


def test_distinct_kmv_matches_oracle(entry):
    got = _assert_matches(entry, "q_distinct_kmv", min_rows=3)
    assert (got.k == 64).all()
    # accuracy: within 25% of the exact distinct-bigram count per lang
    # (k=64 → expected relative error ~1/√62 ≈ 13%)
    import duckdb

    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    exact = con.execute("""
WITH toks AS (
  SELECT doc_id, lang, unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS term,
         generate_subscripts(regexp_extract_all(lower(text), '[a-z0-9_]+'), 1) AS pos
  FROM documents)
SELECT a.lang, count(DISTINCT a.term || ' ' || b.term) AS n
FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
GROUP BY a.lang""").df().set_index("lang").n
    for _, row in got.iterrows():
        assert abs(row.est_distinct / exact[row.lang] - 1) < 0.25


def test_kmv_exact_when_under_k(tmp_path):
    """A corpus whose distinct-bigram count is ≤ k is counted exactly
    (the sketch holds the full hash set), across multiple input blocks."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hunt_ray.pipelines.sketch import distinct_bigrams_kmv

    d = tmp_path / "documents.parquet"
    d.mkdir()
    for f in range(3):  # same 5 bigrams in every block → union collapses
        ids = list(range(f * 4, f * 4 + 4))
        pq.write_table(pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(["w1 w2 w3 w4 w5 w6" for _ in ids]),
            "lang": pa.array(["xx"] * len(ids)),
        }), d / f"part-{f}.parquet")
    out = distinct_bigrams_kmv(str(tmp_path), k=64).to_pandas()
    assert out.lang.tolist() == ["xx"]
    assert out.est_distinct.tolist() == [5.0]


def test_redact_pii_matches_oracle(entry):
    got = _assert_matches(entry, "q_redact_pii", min_rows=100)
    # the synthetic injection plants exactly one of each class per doc
    assert (got.n_emails == 1).all()
    assert (got.n_ips == 1).all()
    assert (got.n_phones == 1).all()


def test_redact_pii_hand_case():
    import pyarrow as pa

    from hunt_ray.pipelines.curate import redact_pii_batch

    t = ("mail a.b-c%d@sub.example.org then 192.168.0.1 and "
         "+49-123-4567 done; not-an-ip 1.2.3 and bare @ stay")
    out = redact_pii_batch(pa.table({
        "doc_id": pa.array([1], pa.int64()),
        "text": pa.array([t]),
    })).to_pandas()
    assert out.n_emails.tolist() == [1]
    assert out.n_ips.tolist() == [1]
    assert out.n_phones.tolist() == [1]
    # redaction is idempotent: replacement tokens match no pattern
    import hashlib

    red = t.replace("a.b-c%d@sub.example.org", "<EMAIL>") \
           .replace("192.168.0.1", "<IP>").replace("+49-123-4567", "<PHONE>")
    assert out.redacted_md5.tolist() == [hashlib.md5(red.encode()).hexdigest()]
    again = redact_pii_batch(pa.table({
        "doc_id": pa.array([1], pa.int64()), "text": pa.array([red]),
    })).to_pandas()
    assert again.redacted_md5.tolist() == out.redacted_md5.tolist()
    assert again[["n_emails", "n_ips", "n_phones"]].sum().sum() == 0


def test_source_rollup_matches_oracle(entry):
    got = _assert_matches(entry, "q_source_rollup", min_rows=5)
    assert (got.n_docs >= 1).all()
    assert got.stopword_ratio.between(0, 1).all()


def test_source_filter_matches_oracle(entry):
    got = _assert_matches(entry, "q_source_filter", min_rows=10)
    roll = entry.queries()["q_source_rollup"](SF).to_pandas()
    passing = set(roll[roll.stopword_ratio <= 0.065].source)
    assert set(got.source) == passing        # non-vacuous both ways
    assert passing < set(roll.source)


def test_repeated_ngrams_matches_oracle(entry):
    got = _assert_matches(entry, "q_repeated_ngrams", min_rows=2)
    assert (got.n_repeated_grams >= 1).all()


def test_repeated_ngrams_planted(tmp_path):
    """Two docs sharing one 6-token passage are both flagged with exactly
    one repeated 6-gram; the unrelated doc is absent. Result is invariant
    to the bucket count (grams never straddle buckets)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hunt_ray.pipelines.curate import repeated_ngrams

    passage = "alpha beta gamma delta epsilon zeta"
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([
            f"one {passage} tail1",
            f"two two {passage} tail2",
            "nothing shared here at all among these words",
        ]),
    }), tmp_path / "documents.parquet")
    for p in (2, 7):
        out = (repeated_ngrams(str(tmp_path), n=6, num_buckets=p)
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        assert out.doc_id.tolist() == [1, 2]
        assert out.n_repeated_grams.tolist() == [1, 1]


def test_snapshot_dedup_matches_oracle(entry):
    got = _assert_matches(entry, "q_snapshot_dedup", min_rows=100)
    # every doc folds to exactly one canonical url; recrawled docs kept
    # the newest variant (the %3 trailing-slash recrawl outranks both)
    assert got.n_snapshots.between(1, 3).all()
    ids = got.canonical_url.str.rsplit("/", n=1).str[-1].astype(int)
    assert len(got) == ids.nunique()
    both = got[(ids % 15 == 0)]
    assert (both.n_snapshots == 3).all() and (both.variant_kept == 1).all()


def test_snapshot_canonicalize_rules():
    import polars as pl

    from hunt_ray.pipelines.curate import canonicalize_urls

    urls = pl.Series([
        "HTTPS://WWW.Example.com/A/B/",
        "http://example.com/a/b?q=1#x",
        "https://sub.www.example.com/a",   # www. strips only at host start
        "example.com/plain",
    ])
    assert canonicalize_urls(urls).to_list() == [
        "example.com/a/b", "example.com/a/b",
        "sub.www.example.com/a", "example.com/plain"]


def test_normalize_text_matches_oracle(entry):
    got = _assert_matches(entry, "q_normalize_text", min_rows=100)
    # every decorated class actually changed; clean docs with already-
    # normalized text stay unchanged
    ids = got.doc_id % 4
    assert (got[ids == 1].changed == 1).all()  # decomposed accent composed
    assert (got[ids == 2].changed == 1).all()  # control char stripped
    assert (got[ids == 3].changed == 1).all()  # whitespace collapsed+trimmed
    assert not got.text_norm.str.contains("\x07").any()
    assert not got.text_norm.str.contains("  ").any()


def test_normalize_text_kernels():
    import pyarrow as pa

    from hunt_ray.pipelines.curate import normalize_text_batch

    t = pa.table({"doc_id": pa.array([0, 4, 8], type=pa.int64()),
                  "text": ["café nfd", "a\x00b\x1fc", " lead  in\ttab "]})
    out = normalize_text_batch(t).to_pandas()
    assert out.text_norm.tolist() == ["café nfd", "abc", "lead in tab"]
    assert out.changed.tolist() == [1, 1, 1]


# --------------------------------------- Bloom decontamination (r4 scale mode)

def test_bloom_kernel_rates():
    """The bit-array kernels: every member hits (no false negatives by
    construction), random non-members false-positive at ~0.5^k — in
    particular NOT at n/m, the failure mode of deriving both probe bases
    from the hash's low bits (see _bloom_bases)."""
    from hunt_ray.pipelines.curate import bloom_build, bloom_probe

    rng = np.random.default_rng(0)
    members = rng.integers(0, 2**63, 4000, dtype=np.uint64)
    arr, m, k = bloom_build(members, 24)
    assert bloom_probe(arr, m, k, members).all()
    probes = rng.integers(0, 2**63, 200_000, dtype=np.uint64)
    fp = bloom_probe(arr, m, k, probes).mean()
    assert fp < 1e-4, fp  # n/m would be ~0.03


def test_decontaminate_bloom_superset_and_audit(entry):
    """Bloom mode flags every exactly-contaminated doc (no false
    negatives); the audit row records the comparison."""
    from hunt_ray.pipelines.curate import (decontaminate,
                                           decontaminate_bloom,
                                           decontaminate_bloom_audit)

    exact = decontaminate(SF).to_pandas().set_index("doc_id")
    bloom = decontaminate_bloom(SF).to_pandas().set_index("doc_id")
    assert set(exact.index) <= set(bloom.index)
    # per-doc Bloom hit counts dominate the exact counts
    j = exact.join(bloom, lsuffix="_e", rsuffix="_b")
    assert (j["n_hit_grams_b"] >= j["n_hit_grams_e"]).all()
    audit = decontaminate_bloom_audit(SF).to_pandas()
    assert bool(audit["no_false_negatives"].iloc[0])
    assert audit["missed_docs"].iloc[0] == 0
    assert audit["doc_fp_rate"].iloc[0] < 0.01
