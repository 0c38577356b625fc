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


def sessionize(sf_dir: str, *, gap_minutes: int = 480):
    """Per-user gap sessions: a new session starts when the time since the
    user's previous event exceeds ``gap_minutes``. Returns one row per
    session: (user_id, session_seq, n_events, session_start, session_end)
    with session_seq numbered 1.. per user in time order (ties broken by
    event_id, matching the oracle's window ORDER BY).
    """
    import ray.data as rd

    gap_us = np.int64(gap_minutes) * 60_000_000

    def sessions(group: pa.Table) -> pa.Table:
        ts = group.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = group.column("event_id").to_numpy(zero_copy_only=False)
        uid = group.column("user_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, uid))
        uid, ts = uid[order], ts[order]
        # new session at every user change or gap breach
        new = np.r_[True, (uid[1:] != uid[:-1]) | (ts[1:] - ts[:-1] > gap_us)]
        sess = np.cumsum(new) - 1
        starts = np.flatnonzero(new)
        ends = np.r_[starts[1:], len(ts)]
        ustart = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
        # session_seq restarts at 1 per user: subtract the index of each
        # user's first session (every user-start row opens a session)
        first = np.searchsorted(starts, ustart)
        per_user = np.diff(np.r_[first, len(starts)])
        seq = np.arange(len(starts)) - np.repeat(first, per_user) + 1
        return pa.table({
            "user_id": pa.array(uid[starts], pa.int64()),
            "session_seq": pa.array(seq, pa.int64()),
            "n_events": pa.array(ends - starts, pa.int64()),
            "session_start": pa.array(ts[starts], pa.int64()).cast(
                pa.timestamp("us")),
            "session_end": pa.array(ts[ends - 1], pa.int64()).cast(
                pa.timestamp("us")),
        })

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_id"])
    return ds.groupby("user_id").map_groups(sessions, batch_format="pyarrow")
