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


def _tag_union(left, right, on, ts_col, id_col, value_col):
    """Tag both sides (left=1, right=0) and union into one Dataset of
    (on, _id, _ts_us, _val, _side) rows."""
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
    return sides[0].union(sides[1])


def _searchsorted_by_key(rk: np.ndarray, rts: np.ndarray,
                         qk: np.ndarray, qts: np.ndarray,
                         side: str) -> np.ndarray:
    """Vectorized PER-KEY searchsorted over MANY keys at once: for each
    query (qk[i], qts[i]), the insertion index into the (rk, rts) rows
    — which are sorted by (key, ts) — as if ``np.searchsorted`` ran on
    the query's key segment alone (the returned index is global into the
    right arrays, and always lands inside that key's segment because the
    composite (key, ts) order bounds it). One lexsort of the merged
    arrays replaces a Python loop over keys: O((m+q) log(m+q))."""
    m, q = rk.shape[0], qk.shape[0]
    all_k = np.concatenate([rk, qk])
    all_t = np.concatenate([rts, qts])
    # at equal (key, ts): side='left' places the query BEFORE right rows,
    # side='right' after — same semantics as np.searchsorted's `side`
    qflag = np.empty(m + q, np.int8)
    qflag[:m] = 1 if side == "left" else 0
    qflag[m:] = 0 if side == "left" else 1
    order = np.lexsort((qflag, all_t, all_k))
    rank = np.empty(m + q, np.int64)
    rank[order] = np.arange(m + q)
    queries_at_or_before = np.cumsum(order >= m)
    qpos = rank[m:]
    return qpos - (queries_at_or_before[qpos] - 1)


def _split_mixed(ds, result_cols: list):
    """(interior results, deferred raw rows) from a mixed scan output."""
    interior = ds.map_batches(
        lambda b: b.filter(pc.invert(b["_edge"])).select(result_cols),
        batch_format="pyarrow",
    )
    deferred_rows = ds.map_batches(
        lambda b: b.filter(b["_edge"]).select(
            [result_cols[0], "_id", "_ts_us", "_val", "_side"]),
        batch_format="pyarrow",
    ).repartition(1)
    return interior, deferred_rows


def asof_join(left, right, on: str = "user_id", ts_col: str = "ts",
              id_col: str = "event_id", value_col: str = "value",
              tolerance_s: "int | None" = None):
    """AS-OF join — the streaming/temporal operator Ray Data lacks (and
    the graft brief names): for each LEFT row, the RIGHT row of the same
    ``on`` key with the greatest ts <= left ts (optionally within
    ``tolerance_s``). Returns (on, left id, left ts_us, right ts_us,
    right value) with nulls when no prior right row exists.

    Distributed shape (the sessionization pattern, NOT per-key
    map_groups — per-group UDF dispatch pays one Python call per key and
    dominates at millions of keys): both sides tag and union, ONE global
    sort on (key, ts, side, value) co-locates and orders everything,
    then a single vectorized pass per block matches every left row to
    the latest preceding right row of ITS key via one
    ``np.maximum.accumulate`` (a right row from an earlier key can never
    shadow a same-key one — keys are contiguous in sort order, so a
    cross-key last-seen index simply fails the key-equality check).
    Only the rows of each block's FIRST and LAST key — the keys that can
    straddle a block boundary — defer to a small second pass; interior
    keys are provably complete in-block. Equal-ts right duplicates
    resolve to the max value (the sort puts it last; documented tie
    rule). Skew caveat: one pathological key's rows all land in the
    boundary pass — salt upstream if a single key exceeds a worker."""
    both = _tag_union(left, right, on, ts_col, id_col, value_col)
    tol_us = None if tolerance_s is None else tolerance_s * 1_000_000

    def scan(key, ts, val, ids, side):
        """Per sorted-run AS-OF matching; returns left-row result arrays."""
        n = key.shape[0]
        idx = np.arange(n)
        is_right = side == 0
        last_r = np.maximum.accumulate(np.where(is_right, idx, -1))
        lmask = ~is_right
        lr = last_r[lmask]
        ok = lr >= 0
        lr_c = np.clip(lr, 0, max(n - 1, 0))
        ok &= key[lr_c] == key[lmask]
        mt, mv = ts[lr_c], val[lr_c]
        if tol_us is not None:
            ok &= ts[lmask] - mt <= tol_us
        return key[lmask], ids[lmask], ts[lmask], ok, mt, mv

    def result_table(k, i, t, ok, mt, mv,
                     edge_keys: "np.ndarray | None" = None) -> pa.Table:
        # the `on` column doubles as the raw key for deferred edge rows —
        # the boundary pass re-reads it, so it must NOT be zero-padded
        if edge_keys is None:
            edge_keys = np.empty(0, np.int64)
        edge_pad = edge_keys.shape[0]
        pad = np.zeros(edge_pad, np.int64)
        return pa.table({
            on: pa.array(np.concatenate([k, edge_keys])),
            "left_id": pa.array(np.concatenate([i, pad])),
            "left_ts_us": pa.array(np.concatenate([t, pad])),
            "right_ts_us": pc.if_else(
                pa.array(np.concatenate([ok, np.zeros(edge_pad, bool)])),
                pa.array(np.concatenate([mt, pad]), pa.int64()),
                pa.scalar(None, pa.int64())),
            "right_value": pc.if_else(
                pa.array(np.concatenate([ok, np.zeros(edge_pad, bool)])),
                pa.array(np.concatenate([mv, pad.astype(np.float64)]),
                         pa.float64()),
                pa.scalar(None, pa.float64())),
        })

    def _unpack(b: pa.Table):
        return (b[on].to_numpy(zero_copy_only=False).astype(np.int64),
                b["_ts_us"].to_numpy(zero_copy_only=False).astype(np.int64),
                b["_val"].to_numpy(zero_copy_only=False).astype(np.float64),
                b["_id"].to_numpy(zero_copy_only=False).astype(np.int64),
                b["_side"].to_numpy(zero_copy_only=False).astype(np.int8))

    def block_scan(b: pa.Table) -> pa.Table:
        key, ts, val, ids, side = _unpack(b)
        n = key.shape[0]
        if n == 0:
            t = result_table(*(np.empty(0, np.int64),) * 3,
                             np.empty(0, bool), np.empty(0, np.int64),
                             np.empty(0, np.float64))
            return t.append_column("_edge", pa.array([], pa.bool_())) \
                    .append_column("_id", pa.array([], pa.int64())) \
                    .append_column("_ts_us", pa.array([], pa.int64())) \
                    .append_column("_val", pa.array([], pa.float64())) \
                    .append_column("_side", pa.array([], pa.int8()))
        edge = (key == key[0]) | (key == key[-1])
        k, i, t, ok, mt, mv = scan(key[~edge], ts[~edge], val[~edge],
                                   ids[~edge], side[~edge])
        n_edge = int(edge.sum())
        res = result_table(k, i, t, ok, mt, mv, edge_keys=key[edge])
        n_int = res.num_rows - n_edge
        z = np.zeros(n_int, np.int64)
        return (res
                .append_column("_edge", pa.array(np.concatenate(
                    [np.zeros(n_int, bool), np.ones(n_edge, bool)])))
                .append_column("_id", pa.array(np.concatenate([z, ids[edge]])))
                .append_column("_ts_us", pa.array(np.concatenate([z, ts[edge]])))
                .append_column("_val", pa.array(np.concatenate(
                    [z.astype(np.float64), val[edge]])))
                .append_column("_side", pa.array(np.concatenate(
                    [np.zeros(n_int, np.int8), side[edge]]))))

    mixed = (
        both.sort([on, "_ts_us", "_side", "_val"])
        .map_batches(block_scan, batch_size=None, batch_format="pyarrow")
        .materialize()
    )
    result_cols = [on, "left_id", "left_ts_us", "right_ts_us", "right_value"]
    interior, deferred_rows = _split_mixed(mixed, result_cols)

    def boundary(b: pa.Table) -> pa.Table:
        key, ts, val, ids, side = _unpack(b)
        order = np.lexsort((val, side, ts, key))
        return result_table(*scan(key[order], ts[order], val[order],
                                  ids[order], side[order]))

    deferred = deferred_rows.map_batches(boundary, batch_size=None,
                                         batch_format="pyarrow")
    return interior.union(deferred)


def range_join(left, right, on: str = "user_id", ts_col: str = "ts",
               id_col: str = "event_id", value_col: str = "value",
               lo_s: int = -600, hi_s: int = 0):
    """RANGE join (count + sum form): for each LEFT row, the number and
    value-sum of RIGHT rows of the same key with ts in
    [left_ts + lo_s, left_ts + hi_s].

    Same sessionization-shaped distributed plan as :func:`asof_join`
    (one global (key, ts) sort, vectorized per-block pass, first/last
    key of each block deferred to a small boundary pass — NOT per-key
    map_groups). The per-block probe runs one
    :func:`_searchsorted_by_key` per bound over ALL keys at once, then a
    prefix-sum difference: an N x M windowed join costs
    O((N+M) log(N+M)) per block with zero per-key Python."""
    both = _tag_union(left, right, on, ts_col, id_col, value_col)
    lo_us, hi_us = lo_s * 1_000_000, hi_s * 1_000_000

    def scan(key, ts, val, ids, side):
        """Rows sorted by (key, ts); returns left-row result arrays."""
        is_right = side == 0
        rk, rts, rval = key[is_right], ts[is_right], val[is_right]
        lk, lts, lids = key[~is_right], ts[~is_right], ids[~is_right]
        rcs = np.concatenate(([0.0], np.cumsum(rval)))
        lo = _searchsorted_by_key(rk, rts, lk, lts + lo_us, side="left")
        hi = _searchsorted_by_key(rk, rts, lk, lts + hi_us, side="right")
        return lk, lids, (hi - lo).astype(np.int64), rcs[hi] - rcs[lo]

    def result_table(k, i, n, s,
                     edge_keys: "np.ndarray | None" = None) -> pa.Table:
        # the `on` column doubles as the raw key for deferred edge rows
        if edge_keys is None:
            edge_keys = np.empty(0, np.int64)
        edge_pad = edge_keys.shape[0]
        pad = np.zeros(edge_pad, np.int64)
        return pa.table({
            on: pa.array(np.concatenate([k, edge_keys])),
            "left_id": pa.array(np.concatenate([i, pad])),
            "n_right": pa.array(np.concatenate([n, pad])),
            "sum_right": pa.array(np.concatenate([s, pad.astype(np.float64)])),
        })

    def _unpack(b: pa.Table):
        return (b[on].to_numpy(zero_copy_only=False).astype(np.int64),
                b["_ts_us"].to_numpy(zero_copy_only=False).astype(np.int64),
                b["_val"].to_numpy(zero_copy_only=False).astype(np.float64),
                b["_id"].to_numpy(zero_copy_only=False).astype(np.int64),
                b["_side"].to_numpy(zero_copy_only=False).astype(np.int8))

    def block_scan(b: pa.Table) -> pa.Table:
        key, ts, val, ids, side = _unpack(b)
        n = key.shape[0]
        if n == 0:
            t = result_table(np.empty(0, np.int64), np.empty(0, np.int64),
                             np.empty(0, np.int64), np.empty(0, np.float64))
            return t.append_column("_edge", pa.array([], pa.bool_())) \
                    .append_column("_id", pa.array([], pa.int64())) \
                    .append_column("_ts_us", pa.array([], pa.int64())) \
                    .append_column("_val", pa.array([], pa.float64())) \
                    .append_column("_side", pa.array([], pa.int8()))
        edge = (key == key[0]) | (key == key[-1])
        k, i, cnt, s = scan(key[~edge], ts[~edge], val[~edge],
                            ids[~edge], side[~edge])
        n_edge = int(edge.sum())
        res = result_table(k, i, cnt, s, edge_keys=key[edge])
        n_int = res.num_rows - n_edge
        z = np.zeros(n_int, np.int64)
        return (res
                .append_column("_edge", pa.array(np.concatenate(
                    [np.zeros(n_int, bool), np.ones(n_edge, bool)])))
                .append_column("_id", pa.array(np.concatenate([z, ids[edge]])))
                .append_column("_ts_us", pa.array(np.concatenate([z, ts[edge]])))
                .append_column("_val", pa.array(np.concatenate(
                    [z.astype(np.float64), val[edge]])))
                .append_column("_side", pa.array(np.concatenate(
                    [np.zeros(n_int, np.int8), side[edge]]))))

    mixed = (
        both.sort([on, "_ts_us"])
        .map_batches(block_scan, batch_size=None, batch_format="pyarrow")
        .materialize()
    )
    interior, deferred_rows = _split_mixed(
        mixed, [on, "left_id", "n_right", "sum_right"])

    def boundary(b: pa.Table) -> pa.Table:
        key, ts, val, ids, side = _unpack(b)
        order = np.lexsort((ts, key))
        return result_table(*scan(key[order], ts[order], val[order],
                                  ids[order], side[order]))

    deferred = deferred_rows.map_batches(boundary, batch_size=None,
                                         batch_format="pyarrow")
    return interior.union(deferred)
