"""Order-independent exact summation in the driver's value aggregates
(q_lineitem_q1, q_events_range): both sum fixed-2-decimal doubles as
integer-scaled int64 — a float64 sum is summation-order-sensitive, and a
7% row-drop differential sweep produced a lineitem group whose engine
(block-order) sum rounded to ...,34 while DuckDB's scan-order sum rounded
to ...,33. The oracles use exact DECIMAL / integer-cents sums, so both
sides are now exact for ANY row set; these tests pin that on an
adversarial half-cent tie (round half-away-from-zero, matching DuckDB)
and on a seeded random 2dp table under several row permutations."""

from __future__ import annotations

import importlib.util

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(autouse=True)
def _ray(ray_session):
    return ray_session


@pytest.fixture(scope="module")
def entry():
    spec = importlib.util.spec_from_file_location(
        "ray_entry_sums", "/root/repo/__ray_entry__.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def _run_vs_oracle(entry, sf, name, table, tbl):
    pq.write_table(tbl, f"{sf}/{table}.parquet")
    keys = (["l_returnflag", "l_linestatus"] if table == "lineitem"
            else ["event_type"])
    got = (entry.queries()[name](str(sf)).to_pandas()
           .sort_values(keys).reset_index(drop=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW {table} AS SELECT * FROM "
                f"read_parquet('{sf}/{table}.parquet')")
    want = (con.execute(entry.oracle_sql()[name]).df()
            .sort_values(keys).reset_index(drop=True)[got.columns])
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()),
                                  check_exact=True)
    return got


def test_lineitem_half_cent_tie(entry, tmp_path):
    # exact revenue 0.01*(1-0.50) = 0.0050 — a half-cent tie. DuckDB's
    # DECIMAL round is half-away-from-zero → 0.01; the engine's
    # (s+50)//100 integer round must agree (float64 0.01*0.5 is
    # 0.005000000000000000104, but a half-even float round of a true-tie
    # dataset WOULD disagree — the integer path makes the rule explicit)
    tbl = pa.table({
        "l_returnflag": ["A"], "l_linestatus": ["F"],
        "l_quantity": [1.0], "l_extendedprice": [0.01],
        "l_discount": [0.50],
    })
    got = _run_vs_oracle(entry, tmp_path, "q_lineitem_q1", "lineitem", tbl)
    assert got["sum_revenue"].iloc[0] == 0.01


def test_lineitem_sum_is_permutation_invariant(entry, tmp_path):
    rng = np.random.default_rng(7)
    n = 4000
    price = np.round(rng.uniform(900, 105000, n), 2)
    disc = np.round(rng.uniform(0, 0.10, n), 2)
    qty = rng.integers(1, 51, n).astype(np.float64)
    rf = rng.choice(["A", "N", "R"], n)
    ls = rng.choice(["F", "O"], n)
    results = []
    for perm_seed in (0, 1):
        order = (np.arange(n) if perm_seed == 0
                 else np.random.default_rng(perm_seed).permutation(n))
        tbl = pa.table({
            "l_returnflag": rf[order], "l_linestatus": ls[order],
            "l_quantity": qty[order], "l_extendedprice": price[order],
            "l_discount": disc[order],
        })
        got = _run_vs_oracle(entry, tmp_path, "q_lineitem_q1",
                             "lineitem", tbl)
        results.append(got)
    pd.testing.assert_frame_equal(results[0], results[1], check_exact=True)


def test_events_range_exact_cents(entry, tmp_path):
    # values straddling ts bounds + 2dp cents; engine int64-cents sum
    # must equal the oracle's round(value*100)::BIGINT sum exactly
    rng = np.random.default_rng(11)
    n = 3000
    # span 2024-01-01..2024-01-24 so rows fall on both sides of the
    # query's [2024-01-08, 2024-01-15) window
    ts = (np.datetime64("2024-01-01T00:00:00", "us")
          + (rng.integers(0, 2_000_000, n)).astype("timedelta64[s]"))
    tbl = pa.table({
        "ts": pa.array(ts, pa.timestamp("us")),
        "event_type": pa.array(rng.choice(["click", "view", "buy"], n)),
        "value": pa.array(np.round(rng.uniform(0, 600, n), 2)),
    })
    _run_vs_oracle(entry, tmp_path, "q_events_range", "events", tbl)
