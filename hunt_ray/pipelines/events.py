"""Windowed / sessionized aggregates over the events table.

The reference has no streaming or windowing surface (SURVEY §2.10) — this
is a driver-mandate operator: gap-based sessionization, the canonical
keyed-window operation Ray Data lacks natively, expressed as a user-keyed
co-location shuffle (``common.grouped.sorted_groups`` — the same sort
``map_groups`` uses internally) with a kernel vectorized across every
user in a block, so there is no per-user Python call at any scale.

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

from hunt_ray.common.grouped import sorted_groups


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


def asof_rows(uid: np.ndarray, ts: np.ndarray, eid: np.ndarray,
              et: np.ndarray, left_type: str, right_type: str
              ) -> dict[str, np.ndarray]:
    """The vectorized as-of kernel over one group of (user_id, ts_us,
    event_id, event_type) rows: each left event joins the right event
    with the max (ts, event_id) ≤ (its ts, ∞) for the same user; lefts
    with no prior right are dropped. Pure numpy — property-tested
    against a naive loop model."""
    uid = np.asarray(uid, np.int64)
    ts = np.asarray(ts, np.int64)
    eid = np.asarray(eid, np.int64)
    et = np.asarray(et)
    lm, rm = et == left_type, et == right_type
    z = np.empty(0, np.int64)
    empty = {"event_id": z, "user_id": z, "view_event_id": z, "lag_us": z}
    keep = lm | rm
    if not lm.any() or not rm.any():
        return empty
    uid, ts, eid, isl = uid[keep], ts[keep], eid[keep], lm[keep]
    # merged-stream forward fill, vectorized across ALL users in the
    # batch: sort by (uid, ts, rights-before-lefts, eid), so the running
    # max of right-row indices at each left IS "the right with max
    # (ts, event_id) ≤ (left ts, ∞)"; a fill that crosses a user
    # boundary points before the user's first row and is dropped
    order = np.lexsort((eid, isl, ts, uid))
    uid, ts, eid, isl = uid[order], ts[order], eid[order], isl[order]
    n = len(uid)
    idx = np.arange(n, dtype=np.int64)
    last_r = np.maximum.accumulate(np.where(~isl, idx, np.int64(-1)))
    seg = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
    seg_start = np.repeat(seg, np.diff(np.r_[seg, n]))
    take = isl & (last_r >= seg_start)
    src = last_r[take]
    return {"event_id": eid[take], "user_id": uid[take],
            "view_event_id": eid[src], "lag_us": ts[take] - ts[src]}


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
    # same user-keyed co-location shuffle as map_groups, but the kernel is
    # multi-user vectorized, so hand it whole blocks — no per-user UDF loop
    return sorted_groups(ds, "user_id", sessions)


def window_agg(sf_dir: str, *, unit: str = "hour"):
    """Tumbling-window aggregate: events bucketed into calendar windows
    (``floor_temporal``), counts + value sums per (window, event_type).
    Partial combine per batch (the shuffle moves one row per (window,
    type, batch), never an event), then a small global groupby — the
    partial+final pattern; window count grows with time span, not volume.
    """
    import pyarrow.compute as pc
    import ray.data as rd
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        win = pc.floor_temporal(batch.column("ts"), unit=unit)
        # sum in integer cents: float summation order differs between the
        # partial+final combine and any oracle, so a float sum is only
        # ulp-reproducible — the cent sum is exact and order-free
        cents = np.round(batch.column("value").to_numpy(zero_copy_only=False)
                         * 100.0).astype(np.int64)
        df = pl.DataFrame({
            "win": pl.from_arrow(win.combine_chunks()
                                 if isinstance(win, pa.ChunkedArray) else win),
            "event_type": pl.from_arrow(batch.column("event_type").combine_chunks()
                                        if isinstance(batch.column("event_type"), pa.ChunkedArray)
                                        else batch.column("event_type")),
            "cents": cents,
        })
        out = df.group_by(["win", "event_type"]).agg(
            n=pl.len().cast(pl.Int64), cents=pl.col("cents").sum())
        return out.to_arrow().cast(pa.schema([
            ("win", pa.timestamp("us")), ("event_type", pa.string()),
            ("n", pa.int64()), ("cents", pa.int64())]))

    def finish(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc2

        i = batch.column_names.index("cents")
        val = pc2.divide(pc2.cast(batch.column("cents"), pa.float64()), 100.0)
        return batch.remove_column(i).append_column("sum_value", val)

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "event_type", "value"])
    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(["win", "event_type"])
            .aggregate(Sum("n", alias_name="n"),
                       Sum("cents", alias_name="cents"))
            .map_batches(finish, batch_format="pyarrow"))


def asof_join(sf_dir: str, *, left_type: str = "click",
              right_type: str = "view"):
    """Per-user as-of join: each ``left_type`` event matched to the most
    recent ``right_type`` event with ts ≤ its own (ties on ts broken by
    max event_id — deterministic, unlike a bare SQL ASOF JOIN); left
    events with no prior match are dropped (inner semantics).

    The composition the driver calls out for operators Ray Data lacks:
    a user-keyed co-location sort + a merged-stream forward-fill kernel
    vectorized across every user in the block — no per-row or per-user
    Python. Same user-keyed partitioning assumption as
    :func:`sessionize`.
    """
    import ray.data as rd

    def join(group: pa.Table) -> pa.Table:
        r = asof_rows(
            group.column("user_id").to_numpy(zero_copy_only=False),
            group.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False),
            group.column("event_id").to_numpy(zero_copy_only=False),
            group.column("event_type").to_numpy(zero_copy_only=False),
            left_type, right_type)
        return pa.table({
            "event_id": pa.array(r["event_id"], pa.int64()),
            "user_id": pa.array(r["user_id"], pa.int64()),
            "view_event_id": pa.array(r["view_event_id"], pa.int64()),
            "lag_us": pa.array(r["lag_us"], pa.int64()),
        })

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_id", "event_type"])
    return sorted_groups(ds, "user_id", join)
