"""Streaming-shaped event operators (SURVEY §2.11).

Sessionization — the classic gap-window: consecutive events of one user
belong to one session while inter-event gaps stay <= ``gap_s``. The
distributed shape mirrors dedup's sorted-run scanner: ONE global sort on
(user, ts), a fully vectorized per-block session scan, and a tiny second
pass over only the blocks' EDGE sessions (a block's first/last session
may continue in the neighbouring block; interior sessions are provably
complete because a confirmed >gap boundary closes them). No per-user
Python, no per-group UDFs — the shuffle moves events once.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_SESSION_SCHEMA = pa.schema(
    [
        ("user_id", pa.int64()),
        ("session_start", pa.int64()),  # epoch seconds
        ("n_events", pa.int64()),
        ("sum_value", pa.float64()),
    ]
)


def _scan_sessions(u: np.ndarray, t: np.ndarray, v: np.ndarray, gap_s: int):
    """(session_of_row, starts) for rows sorted by (user, ts)."""
    if u.shape[0] == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    new = np.ones(u.shape[0], dtype=bool)
    new[1:] = (u[1:] != u[:-1]) | (t[1:] - t[:-1] > gap_s)
    sid = np.cumsum(new) - 1
    starts = np.nonzero(new)[0]
    return sid, starts


def sessionize(events, gap_s: int = 1800, user_col: str = "user_id",
               ts_col: str = "ts", value_col: str = "value"):
    """Dataset of (user_id, session_start, n_events, sum_value) sessions."""

    def _epoch_seconds(col) -> np.ndarray:
        """ts column -> epoch seconds: timestamps scale by their unit,
        integer columns are taken AS seconds already."""
        if pa.types.is_timestamp(col.type):
            div = {"s": 1, "ms": 1_000, "us": 1_000_000, "ns": 1_000_000_000}[
                col.type.unit
            ]
            return col.cast(pa.int64()).to_numpy(zero_copy_only=False) // div
        return col.cast(pa.int64()).to_numpy(zero_copy_only=False)

    def block_sessions(b: pa.Table) -> pa.Table:
        u = b[user_col].to_numpy(zero_copy_only=False).astype(np.int64)
        tsec = _epoch_seconds(
            b[ts_col].combine_chunks() if isinstance(b[ts_col], pa.ChunkedArray)
            else b[ts_col]
        )
        order = np.lexsort((tsec, u))
        t = tsec[order]
        u = u[order]
        v = b[value_col].to_numpy(zero_copy_only=False).astype(np.float64)[order]
        sid, starts = _scan_sessions(u, t, v, gap_s)
        if sid.shape[0] == 0:
            return pa.table({
                "user_id": pa.array([], pa.int64()),
                "session_start": pa.array([], pa.int64()),
                "n_events": pa.array([], pa.int64()),
                "sum_value": pa.array([], pa.float64()),
                "_edge": pa.array([], pa.bool_()),
                "_ts": pa.array([], pa.int64()),
                "_value": pa.array([], pa.float64()),
            })
        n_sessions = int(sid[-1]) + 1
        counts = np.bincount(sid, minlength=n_sessions)
        sums = np.zeros(n_sessions)
        np.add.at(sums, sid, v)
        first_last = {0, n_sessions - 1}
        interior = np.ones(n_sessions, dtype=bool)
        for e in first_last:
            interior[e] = False
        # interior sessions are final; edge sessions emit their RAW events
        # (deferred to the boundary pass)
        rows_int = interior[sid]
        out_int = pa.table({
            "user_id": u[starts][interior],
            "session_start": t[starts][interior],
            "n_events": counts[interior].astype(np.int64),
            "sum_value": sums[interior],
            "_edge": np.zeros(int(interior.sum()), dtype=bool),
            "_ts": np.zeros(int(interior.sum()), dtype=np.int64),
            "_value": np.zeros(int(interior.sum())),
        })
        edge_rows = ~rows_int
        out_edge = pa.table({
            "user_id": u[edge_rows],
            "session_start": np.zeros(int(edge_rows.sum()), dtype=np.int64),
            "n_events": np.zeros(int(edge_rows.sum()), dtype=np.int64),
            "sum_value": np.zeros(int(edge_rows.sum())),
            "_edge": np.ones(int(edge_rows.sum()), dtype=bool),
            "_ts": t[edge_rows],
            "_value": v[edge_rows],
        })
        return pa.concat_tables([out_int, out_edge])

    mixed = (
        events.sort([user_col, ts_col])
        .map_batches(block_sessions, batch_size=None, batch_format="pyarrow")
        .materialize()
    )
    interior = mixed.map_batches(
        lambda b: b.filter(pc.invert(b["_edge"])).select(
            ["user_id", "session_start", "n_events", "sum_value"]
        ),
        batch_format="pyarrow",
    )

    def boundary(b: pa.Table) -> pa.Table:
        u = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        t = b["_ts"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = b["_value"].to_numpy(zero_copy_only=False).astype(np.float64)
        order = np.lexsort((t, u))
        u, t, v = u[order], t[order], v[order]
        sid, starts = _scan_sessions(u, t, v, gap_s)
        if sid.shape[0] == 0:
            return _SESSION_SCHEMA.empty_table()
        n_sessions = int(sid[-1]) + 1
        counts = np.bincount(sid, minlength=n_sessions)
        sums = np.zeros(n_sessions)
        np.add.at(sums, sid, v)
        return pa.table({
            "user_id": u[starts],
            "session_start": t[starts],
            "n_events": counts.astype(np.int64),
            "sum_value": sums,
        }, schema=_SESSION_SCHEMA)

    deferred = (
        mixed.map_batches(
            lambda b: b.filter(b["_edge"]).select(["user_id", "_ts", "_value"]),
            batch_format="pyarrow",
        )
        .repartition(1)
        .map_batches(boundary, batch_size=None, batch_format="pyarrow")
    )
    return interior.union(deferred)


def _epoch_us(col) -> np.ndarray:
    """ts column -> epoch MICROseconds (full timestamp precision)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_timestamp(col.type):
        mul = {"s": 1_000_000, "ms": 1_000, "us": 1, "ns": None}[col.type.unit]
        v = col.cast(pa.int64()).to_numpy(zero_copy_only=False)
        return v * mul if mul is not None else v // 1_000
    return col.cast(pa.int64()).to_numpy(zero_copy_only=False)


def _dedup_right(rts: np.ndarray, rval: np.ndarray):
    """One right row per timestamp: keep the MAX value (the documented
    tie rule — both the engine and the SQL twin apply it, since 'which
    of several equal-ts rows wins' is otherwise unspecified)."""
    if rts.shape[0] == 0:
        return rts, rval
    order = np.lexsort((rval, rts))
    rts, rval = rts[order], rval[order]
    last = np.concatenate((rts[1:] != rts[:-1], [True]))
    return rts[last], rval[last]


def asof_join(left, right, on: str = "user_id", ts_col: str = "ts",
              id_col: str = "event_id", value_col: str = "value",
              tolerance_s: "int | None" = None):
    """AS-OF join — the streaming/temporal operator Ray Data lacks (and
    the graft brief names): for each LEFT row, the RIGHT row of the same
    ``on`` key with the greatest ts <= left ts (optionally within
    ``tolerance_s``). Returns (on, left id, left ts_us, right ts_us,
    right value) with nulls when no prior right row exists.

    Distributed shape + partitioning assumption: both sides tag and
    union into ONE dataset, then ``groupby(on).map_groups`` co-locates
    each key's rows (one shuffle); the per-group probe is a single
    ``searchsorted`` over the key's sorted right timestamps. Per-key
    volume must fit a worker (true for per-user event streams; salt the
    key upstream if a key is pathological). Equal-ts right duplicates
    resolve to the max value (documented tie rule)."""
    sides = []
    for tag, ds in ((1, left), (0, right)):
        def tag_side(b: pa.Table, _t=tag) -> pa.Table:
            return pa.table({
                on: b[on].cast(pa.int64()),
                "_id": b[id_col].cast(pa.int64()),
                "_ts_us": pa.array(_epoch_us(b[ts_col])),
                "_val": b[value_col].cast(pa.float64()),
                "_side": pa.array(np.full(b.num_rows, _t, np.int8)),
            })
        sides.append(ds.map_batches(tag_side, batch_format="pyarrow"))
    both = sides[0].union(sides[1])

    def per_key(g: pa.Table) -> pa.Table:
        side = g["_side"].to_numpy(zero_copy_only=False)
        ts = g["_ts_us"].to_numpy(zero_copy_only=False)
        val = g["_val"].to_numpy(zero_copy_only=False)
        ids = g["_id"].to_numpy(zero_copy_only=False)
        lmask = side == 1
        lts, lids = ts[lmask], ids[lmask]
        rts, rval = _dedup_right(ts[~lmask], val[~lmask])
        if rts.shape[0]:
            idx = np.searchsorted(rts, lts, side="right") - 1
            ok = idx >= 0
            idx_c = np.clip(idx, 0, rts.shape[0] - 1)
            if tolerance_s is not None:
                ok &= lts - rts[idx_c] <= tolerance_s * 1_000_000
            mt = np.where(ok, rts[idx_c], 0)
            mv = np.where(ok, rval[idx_c], 0.0)
        else:
            ok = np.zeros(lts.shape[0], dtype=bool)
            mt = np.zeros(lts.shape[0], dtype=np.int64)
            mv = np.zeros(lts.shape[0], dtype=np.float64)
        order = np.argsort(lids)
        key = g[on].to_numpy(zero_copy_only=False)[lmask]
        return pa.table({
            on: pa.array(key[order]),
            "left_id": pa.array(lids[order]),
            "left_ts_us": pa.array(lts[order]),
            "right_ts_us": pc.if_else(
                pa.array(ok[order]), pa.array(mt[order], pa.int64()),
                pa.scalar(None, pa.int64())),
            "right_value": pc.if_else(
                pa.array(ok[order]), pa.array(mv[order], pa.float64()),
                pa.scalar(None, pa.float64())),
        })

    return both.groupby(on).map_groups(per_key, batch_format="pyarrow")


def range_join(left, right, on: str = "user_id", ts_col: str = "ts",
               id_col: str = "event_id", value_col: str = "value",
               lo_s: int = -600, hi_s: int = 0):
    """RANGE join (count + sum form): for each LEFT row, the number and
    value-sum of RIGHT rows of the same key with ts in
    [left_ts + lo_s, left_ts + hi_s]. Same co-location shape and
    assumption as :func:`asof_join`; the per-group probe is two
    ``searchsorted`` bounds + a prefix-sum difference (no per-pair
    work, so an N x M windowed join costs O((N+M) log M) per key)."""
    sides = []
    for tag, ds in ((1, left), (0, right)):
        def tag_side(b: pa.Table, _t=tag) -> pa.Table:
            return pa.table({
                on: b[on].cast(pa.int64()),
                "_id": b[id_col].cast(pa.int64()),
                "_ts_us": pa.array(_epoch_us(b[ts_col])),
                "_val": b[value_col].cast(pa.float64()),
                "_side": pa.array(np.full(b.num_rows, _t, np.int8)),
            })
        sides.append(ds.map_batches(tag_side, batch_format="pyarrow"))
    both = sides[0].union(sides[1])

    def per_key(g: pa.Table) -> pa.Table:
        side = g["_side"].to_numpy(zero_copy_only=False)
        ts = g["_ts_us"].to_numpy(zero_copy_only=False)
        val = g["_val"].to_numpy(zero_copy_only=False)
        ids = g["_id"].to_numpy(zero_copy_only=False)
        lmask = side == 1
        lts, lids = ts[lmask], ids[lmask]
        order_r = np.argsort(ts[~lmask], kind="stable")
        rts = ts[~lmask][order_r]
        rcs = np.concatenate(([0.0], np.cumsum(val[~lmask][order_r])))
        lo = np.searchsorted(rts, lts + lo_s * 1_000_000, side="left")
        hi = np.searchsorted(rts, lts + hi_s * 1_000_000, side="right")
        n = (hi - lo).astype(np.int64)
        s = rcs[hi] - rcs[lo]
        order = np.argsort(lids)
        key = g[on].to_numpy(zero_copy_only=False)[lmask]
        return pa.table({
            on: pa.array(key[order]),
            "left_id": pa.array(lids[order]),
            "n_right": pa.array(n[order]),
            "sum_right": pa.array(s[order]),
        })

    return both.groupby(on).map_groups(per_key, batch_format="pyarrow")
