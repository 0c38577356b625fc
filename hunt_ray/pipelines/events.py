"""Windowed / sessionized aggregates over the events table.

The reference has no streaming or windowing surface (SURVEY §2.10) — this
is a driver-mandate operator: gap-based sessionization, the canonical
keyed-window operation Ray Data lacks natively, expressed as
``groupby(user_id).map_groups`` with a fully vectorized in-group kernel.

Partitioning assumption (documented per the custom-operator rule): all
events of one user land in one group — the shuffle key is user_id, so
per-group memory is bounded by the hottest user's event count, not the
corpus. Gap sessions cannot be split by time range without a stitch pass
(a session may straddle any boundary); if a single user exceeds worker
memory at web scale, the standard fix is time-bucketing plus a
boundary-session merge — not needed at any realistic per-user volume.
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa


def session_rows(uid: np.ndarray, ts: np.ndarray, eid: np.ndarray,
                 gap_us: int) -> dict[str, np.ndarray]:
    """The vectorized session kernel over one group of (user_id, ts_us,
    event_id) rows, any order: a new session opens at every user change
    or strict gap breach (ts gap > gap_us). Returns per-session columns
    with session_seq numbered 1.. per user in (ts, event_id) order.
    Pure numpy — property-tested against a naive loop model."""
    uid = np.asarray(uid, np.int64)
    ts = np.asarray(ts, np.int64)
    if not len(uid):
        z = np.empty(0, np.int64)
        return {"user_id": z, "session_seq": z, "n_events": z,
                "session_start": z, "session_end": z}
    order = np.lexsort((np.asarray(eid, np.int64), ts, uid))
    uid, ts = uid[order], ts[order]
    new = np.r_[True, (uid[1:] != uid[:-1]) |
                (ts[1:] - ts[:-1] > np.int64(gap_us))]
    starts = np.flatnonzero(new)
    ends = np.r_[starts[1:], len(ts)]
    ustart = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
    # session_seq restarts at 1 per user: subtract the index of each
    # user's first session (every user-start row opens a session)
    first = np.searchsorted(starts, ustart)
    per_user = np.diff(np.r_[first, len(starts)])
    seq = np.arange(len(starts)) - np.repeat(first, per_user) + 1
    return {"user_id": uid[starts], "session_seq": seq,
            "n_events": ends - starts,
            "session_start": ts[starts], "session_end": ts[ends - 1]}


def sessionize(sf_dir: str, *, gap_minutes: int = 480):
    """Per-user gap sessions: a new session starts when the time since the
    user's previous event exceeds ``gap_minutes``. Returns one row per
    session: (user_id, session_seq, n_events, session_start, session_end)
    with session_seq numbered 1.. per user in time order (ties broken by
    event_id, matching the oracle's window ORDER BY).
    """
    import ray.data as rd

    gap_us = int(gap_minutes) * 60_000_000

    def sessions(group: pa.Table) -> pa.Table:
        r = session_rows(
            group.column("user_id").to_numpy(zero_copy_only=False),
            group.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False),
            group.column("event_id").to_numpy(zero_copy_only=False), gap_us)
        return pa.table({
            "user_id": pa.array(r["user_id"], pa.int64()),
            "session_seq": pa.array(r["session_seq"], pa.int64()),
            "n_events": pa.array(r["n_events"], pa.int64()),
            "session_start": pa.array(r["session_start"], pa.int64()).cast(
                pa.timestamp("us")),
            "session_end": pa.array(r["session_end"], pa.int64()).cast(
                pa.timestamp("us")),
        })

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_id"])
    return ds.groupby("user_id").map_groups(sessions, batch_format="pyarrow")
