"""Temporal operators: session windows and as-of joins.

Both are "custom operators the reference-class engines lack" expressed
as Ray Data compositions (SURVEY.md §2.6a): hash-bucket the key space
(ONE groupby shuffle), then a vectorized per-bucket kernel — sessions
via diff/cumsum over a (key, ts)-sorted frame, as-of via
``pd.merge_asof`` (compiled, no Python row loop). Bucket count bounds
group size skew; per-key state never leaves its bucket.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from graphscope_ray.util import round_half_away

_NUM_BUCKETS = 64


def _arrow_schema(ds: ray.data.Dataset) -> pa.Schema:
    """Dataset schema as a pyarrow Schema regardless of block format
    (pandas-backed blocks report a PandasBlockSchema)."""
    sch = ds.schema().base_schema
    if isinstance(sch, pa.Schema):
        return sch
    fields = []
    for name, typ in zip(sch.names, sch.types):
        if isinstance(typ, pa.DataType):
            fields.append(pa.field(name, typ))
        else:
            fields.append(pa.field(name, pa.from_numpy_dtype(typ)))
    return pa.schema(fields)


def session_windows(
    ds: ray.data.Dataset,
    *,
    key: str = "user_id",
    ts: str = "ts",
    value: str = "value",
    order_col: str = "event_id",
    gap: np.timedelta64 = np.timedelta64(30, "m"),
    num_buckets: int = _NUM_BUCKETS,
) -> ray.data.Dataset:
    """Session windows: per key, consecutive events whose gap exceeds
    ``gap`` start a new session. → (key, session_start, session_end,
    n_events, sum_value[6dp]).

    SQL twin: lag/sum window functions (gaps-and-islands); the Ray
    shape is one bucket shuffle + a vectorized multi-key kernel per
    bucket (sort by (key, ts, order_col); session breaks where the key
    changes or the gap exceeds the threshold; reduceat-style groupby
    aggregation)."""
    gap64 = np.timedelta64(gap)

    def bucket(t: pa.Table) -> pa.Table:
        b = t[key].to_numpy() % num_buckets
        return t.append_column("_b", pa.array(b.astype(np.int64)))

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, ts, order_col], kind="mergesort")
        k = g[key].to_numpy()
        t = g[ts].to_numpy()
        v = g[value].to_numpy()
        brk = np.ones(len(g), dtype=bool)
        if len(g) > 1:
            brk[1:] = (k[1:] != k[:-1]) | ((t[1:] - t[:-1]) > gap64)
        sid = np.cumsum(brk) - 1
        starts = np.flatnonzero(brk)
        ends = np.r_[starts[1:], len(g)] - 1
        return pd.DataFrame({
            key: k[starts],
            "session_start": t[starts],
            "session_end": t[ends],
            "n_events": np.diff(np.r_[starts, len(g)]).astype(np.int64),
            "sum_value": round_half_away(
                np.add.reduceat(v, starts), 6),
        })

    return (ds.map_batches(bucket, batch_format="pyarrow")
            .groupby("_b")
            .map_groups(sessions, batch_format="pandas"))


def hopping_windows(
    ds: ray.data.Dataset,
    *,
    key: str = "user_id",
    ts: str = "ts",
    value: str = "value",
    size_us: int = 3600 * 1_000_000,
    hop_us: int = 900 * 1_000_000,
) -> ray.data.Dataset:
    """Hopping (sliding, hop-aligned) windows: per key, count + 6dp
    sum over every ``size_us`` window whose start is a multiple of
    ``hop_us`` — each event lands in exactly ``size_us // hop_us``
    overlapping windows. → (key, wstart_us:int64, n_events, sum_value).

    ``size_us`` must be a multiple of ``hop_us``; then an event at
    epoch-us ``e`` belongs to the k = size/hop grid-aligned starts in
    ``(e - size, e]``, so the per-batch expansion is an exact
    ``np.repeat`` with no post-filter. Expansion happens BEFORE the
    single (key, wstart) groupby shuffle — k× the rows move, the
    classic space/shuffle trade of hopping windows; use session or
    tumbling windows when k is large."""
    if size_us % hop_us:
        raise ValueError("size_us must be a multiple of hop_us")
    k = size_us // hop_us

    def expand(t: pa.Table) -> pa.Table:
        e = t[ts].to_numpy().astype("datetime64[us]").astype(np.int64)
        base = (e // hop_us) * hop_us
        j = np.tile(np.arange(k, dtype=np.int64) * hop_us, len(e))
        return pa.table({
            key: pa.array(np.repeat(t[key].to_numpy(), k)),
            "wstart_us": pa.array(np.repeat(base, k) - j),
            value: pa.array(np.repeat(t[value].to_numpy(), k)),
        })

    from graphscope_ray.util import bucketed_sum
    out = bucketed_sum(ds.map_batches(expand, batch_format="pyarrow"),
                       [key, "wstart_us"], value, count_as="n_events")

    def rnd(t: pa.Table) -> pa.Table:
        return pa.table({
            key: t[key],
            "wstart_us": t["wstart_us"],
            "n_events": t["n_events"],
            "sum_value": pa.array(
                round_half_away(t[value].to_numpy(), 6)),
        })

    return out.map_batches(rnd, batch_format="pyarrow")


def _restore_left_types(lschema: pa.Schema):
    """Per-bucket pandas kernels see left int columns as float64 (the
    union pads them with nulls on right-side rows); cast them back to
    their source arrow types — left rows are null-free there."""
    import pyarrow.compute as pc

    def restore(t: pa.Table) -> pa.Table:
        for name in lschema.names:
            i = t.schema.get_field_index(name)
            if i >= 0 and t.schema.field(i).type != lschema.field(name).type:
                t = t.set_column(
                    i, name, pc.cast(t[name], lschema.field(name).type))
        return t

    return restore


def asof_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    *,
    by: str,
    right_by: str | None = None,
    on: str,
    right_on: str | None = None,
    value_cols: tuple = (),
    direction: str = "backward",
    tiebreak: tuple = (),
    num_buckets: int = _NUM_BUCKETS,
) -> ray.data.Dataset:
    """As-of join: for each left row, attach ``value_cols`` from the
    right row with the greatest ``right_on`` <= ``on`` (direction
    'backward'; 'forward' = smallest >=) sharing the same ``by`` key;
    unmatched rows keep nulls. ``tiebreak`` names value_cols that
    order rows sharing the same ``right_on`` (ascending; the LAST one
    wins, pandas semantics) so duplicate timestamps resolve
    deterministically at any parallelism.

    Distributed shape: both sides are tagged and hash-bucketed by the
    join key (one co-grouping shuffle), then each bucket runs
    ``pd.merge_asof`` — compiled and vectorized, every key's timeline
    co-located. With duplicate ``right_on`` values the LAST row in
    (right_on, original order) wins, matching pandas; keep the right
    side deduped per (key, on) for full determinism."""
    right_by = right_by or by
    right_on = right_on or on
    value_cols = tuple(value_cols)

    lschema = _arrow_schema(left)
    rschema = _arrow_schema(right)
    lcols = list(lschema.names)
    rmap = {"_k": rschema.field(right_by).type,
            "_on": rschema.field(right_on).type}
    for c in value_cols:
        rmap[f"_r_{c}"] = rschema.field(c).type
    # union schema: left cols + right aux cols + bucket/side tags —
    # both sides emit it (typed nulls on the absent side) so
    # Dataset.union sees one schema
    uni = ([(c, lschema.field(c).type) for c in lcols]
           + list(rmap.items()))

    def tag_left(t: pa.Table) -> pa.Table:
        n = len(t)
        cols = {c: (t[c] if c in t.column_names
                    else pa.nulls(n, type=typ)) for c, typ in uni}
        out = pa.table(cols)
        b = t[by].to_numpy() % num_buckets
        out = out.append_column("_b", pa.array(b.astype(np.int64)))
        return out.append_column("_side",
                                 pa.array(np.zeros(n, dtype=np.int8)))

    def tag_right(t: pa.Table) -> pa.Table:
        n = len(t)
        src = {"_k": t[right_by], "_on": t[right_on]}
        for c in value_cols:
            src[f"_r_{c}"] = t[c]
        cols = {c: src.get(c, pa.nulls(n, type=typ)) for c, typ in uni}
        out = pa.table(cols)
        b = t[right_by].to_numpy() % num_buckets
        out = out.append_column("_b", pa.array(b.astype(np.int64)))
        return out.append_column("_side",
                                 pa.array(np.ones(n, dtype=np.int8)))

    lt = left.map_batches(tag_left, batch_format="pyarrow")
    rt = right.map_batches(tag_right, batch_format="pyarrow")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g["_side"] == 0]
        rg = g[g["_side"] == 1]
        lg = lg[lcols].sort_values(on, kind="mergesort")
        rg = (rg[["_k", "_on"] + [f"_r_{c}" for c in value_cols]]
              .sort_values(["_on"] + [f"_r_{c}" for c in tiebreak],
                           kind="mergesort"))
        lg[by] = lg[by].astype("int64")
        rg["_k"] = rg["_k"].astype("int64")
        out = pd.merge_asof(lg, rg, left_on=on, right_on="_on",
                            left_by=by, right_by="_k",
                            direction=direction)
        out = out.drop(columns=["_k", "_on"], errors="ignore")
        return out.rename(columns={f"_r_{c}": c for c in value_cols})

    return (lt.union(rt)
            .groupby("_b")
            .map_groups(merge, batch_format="pandas")
            .map_batches(_restore_left_types(lschema),
                         batch_format="pyarrow"))


def range_join_count(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    *,
    by: str,
    right_by: str | None = None,
    on: str,
    right_on: str | None = None,
    window: np.timedelta64 = np.timedelta64(7, "D"),
    out_col: str = "n_in_range",
    num_buckets: int = _NUM_BUCKETS,
) -> ray.data.Dataset:
    """Banded range join, aggregate form: for each left row, the count
    of right rows with the same key whose ``right_on`` lies in
    ``(on - window, on]``. → left columns + ``out_col``.

    Shape: the same key-bucket co-grouping shuffle as ``asof_join``;
    per bucket a key-equijoin then a vectorized band filter + count.
    Per-bucket fanout is Σ_k |L_k|·|R_k| — fine for bounded per-key
    cardinality (user event/order timelines); salt hot keys into
    sub-buckets and sum the counts if a key's timeline is huge."""
    right_by = right_by or by
    right_on = right_on or on
    win = np.timedelta64(window)
    lschema = _arrow_schema(left)
    lcols = list(lschema.names)
    uni = ([(c, lschema.field(c).type) for c in lcols]
           + [("_k", _arrow_schema(right).field(right_by).type),
              ("_on", _arrow_schema(right).field(right_on).type)])

    def tag_left(t: pa.Table) -> pa.Table:
        n = len(t)
        cols = {c: (t[c] if c in t.column_names
                    else pa.nulls(n, type=typ)) for c, typ in uni}
        out = pa.table(cols)
        b = t[by].to_numpy() % num_buckets
        out = out.append_column("_b", pa.array(b.astype(np.int64)))
        return out.append_column("_side",
                                 pa.array(np.zeros(n, dtype=np.int8)))

    def tag_right(t: pa.Table) -> pa.Table:
        n = len(t)
        src = {"_k": t[right_by], "_on": t[right_on]}
        cols = {c: src.get(c, pa.nulls(n, type=typ)) for c, typ in uni}
        out = pa.table(cols)
        b = t[right_by].to_numpy() % num_buckets
        out = out.append_column("_b", pa.array(b.astype(np.int64)))
        return out.append_column("_side",
                                 pa.array(np.ones(n, dtype=np.int8)))

    def count(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g["_side"] == 0][lcols].reset_index(drop=True)
        rg = g[g["_side"] == 1][["_k", "_on"]]
        if not len(lg):
            return lg.assign(**{out_col: pd.Series([], dtype="int64")})
        lg[out_col] = np.zeros(len(lg), dtype=np.int64)
        if len(rg):
            li = lg[[by, on]].reset_index(names="_li")
            pairs = li.merge(rg, left_on=by, right_on="_k")
            t_l = pairs[on].to_numpy()
            t_r = pairs["_on"].to_numpy()
            hit = (t_r > t_l - win) & (t_r <= t_l)
            cnt = np.bincount(pairs["_li"].to_numpy()[hit],
                              minlength=len(lg))
            lg[out_col] = cnt.astype(np.int64)
        return lg

    lt = left.map_batches(tag_left, batch_format="pyarrow")
    rt = right.map_batches(tag_right, batch_format="pyarrow")
    return (lt.union(rt)
            .groupby("_b")
            .map_groups(count, batch_format="pandas")
            .map_batches(_restore_left_types(lschema),
                         batch_format="pyarrow"))


def funnel(
    ds: ray.data.Dataset,
    steps: list,
    *,
    key: str = "user_id",
    ts: str = "ts",
    type_col: str = "event_type",
    horizon: np.timedelta64 = np.timedelta64(72, "h"),
    num_buckets: int = _NUM_BUCKETS,
) -> ray.data.Dataset:
    """Ordered funnel analysis: per key, how many of ``steps`` were
    completed strictly in order, earliest-first — ``t_0`` = min ts of
    ``steps[0]``; ``t_k`` = min ts of ``steps[k]`` with ``ts > t_{k-1}``
    and ``ts <= t_0 + horizon``. → one row ``(key, steps_completed)``
    per distinct key.

    100 TB shape: one coarse-bucket shuffle co-locates each key's
    events (the session_windows pattern), then a vectorized pandas
    kernel walks the steps with groupby-min + inner joins — per-step
    cost is O(events of that type in bucket), never per-row Python.
    SQL twin: one chained min-join CTE per step
    (oracle_sql.funnel_sql)."""
    if not steps:
        raise ValueError("funnel needs at least one step")
    hor = np.timedelta64(horizon)

    def bucket(t: pa.Table) -> pa.Table:
        b = t[key].to_numpy() % num_buckets
        return t.append_column("_b", pa.array(b.astype(np.int64)))

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        uniq = np.unique(g[key].to_numpy())
        done = pd.Series(np.zeros(len(uniq), dtype=np.int64), index=uniq)
        t0 = g[g[type_col] == steps[0]].groupby(key)[ts].min()
        done[t0.index] = 1
        prev = t0
        for s in steps[1:]:
            f = g.loc[g[type_col] == s, [key, ts]].copy()
            f["_prev"] = f[key].map(prev)
            f["_t0"] = f[key].map(t0)
            f = f[f["_prev"].notna()
                  & (f[ts].to_numpy() > f["_prev"].to_numpy())
                  & (f[ts].to_numpy() <= f["_t0"].to_numpy() + hor)]
            nxt = f.groupby(key)[ts].min()
            if not len(nxt):
                break
            done[nxt.index] += 1
            prev = nxt
        return pd.DataFrame({key: uniq,
                             "steps_completed": done.to_numpy()})

    return (ds.map_batches(bucket, batch_format="pyarrow")
            .groupby("_b")
            .map_groups(kernel, batch_format="pandas"))


def retention(
    ds: ray.data.Dataset,
    *,
    key: str = "user_id",
    ts: str = "ts",
    unit_days: int = 7,
    num_buckets: int = _NUM_BUCKETS,
) -> ray.data.Dataset:
    """Cohort retention matrix: cohort = the ``unit_days``-period of a
    key's FIRST event (periods are epoch-day // unit_days); one output
    row ``(cohort, offset_p, n_users)`` counts the distinct keys of
    that cohort active ``offset_p`` periods later.

    100 TB shape: one coarse-bucket shuffle co-locates each key's
    events (the funnel/session pattern) — first-event period, offsets
    and the per-key dedup all complete inside the bucket with
    vectorized pandas groupbys, so each bucket emits exact partial
    counts for its keys. The final (cohort, offset) reduce is
    util.bucketed_sum over a #cohorts × #offsets-sized table (a plain
    aggregate would pay per-distinct-key Python dispatch). SQL twin:
    oracle_sql.retention_sql."""
    from graphscope_ray.util import bucketed_sum

    def bucket(t: pa.Table) -> pa.Table:
        b = t[key].to_numpy() % num_buckets
        return t.append_column("_b", pa.array(b.astype(np.int64)))

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        per = (g[ts].to_numpy().astype("datetime64[D]").astype(np.int64)
               // unit_days)
        df = pd.DataFrame({key: g[key].to_numpy(), "_per": per})
        first = df.groupby(key)["_per"].transform("min")
        df["cohort"] = first
        df["offset_p"] = df["_per"] - first
        d = df[[key, "cohort", "offset_p"]].drop_duplicates()
        out = (d.groupby(["cohort", "offset_p"], sort=False).size()
               .rename("n_users").reset_index())
        out["n_users"] = out["n_users"].astype(np.int64)
        return out

    parts = (ds.map_batches(bucket, batch_format="pyarrow")
             .groupby("_b").map_groups(kernel, batch_format="pandas"))
    return bucketed_sum(parts, ["cohort", "offset_p"], "n_users")


def rolling_window(
    ds: ray.data.Dataset,
    *,
    key: str = "user_id",
    ts: str = "ts",
    value: str = "value",
    order_col: str = "event_id",
    window: np.timedelta64 = np.timedelta64(7, "D"),
    num_buckets: int = _NUM_BUCKETS,
) -> ray.data.Dataset:
    """Per-event trailing window aggregate: for every event, the count
    and sum of ``value`` over that key's events in ``[t - window, t]``
    (closed frame, matching SQL ``RANGE ... PRECEDING``); ties on ts
    are all included regardless of order (peer semantics). → one row per event:
    (order_col, key, ts, w_count, w_sum_e6).

    Sums are exact: values are scaled to e6 integers with half-away
    rounding BEFORE aggregation (both sides compute round(value·1e6)
    from the same IEEE product), so the integer prefix-sum differences
    here equal DuckDB's window sum bit-for-bit — no float-order drift.

    100 TB shape: one coarse-bucket shuffle co-locates each key's
    events; per bucket, one (key, ts) mergesort + integer cumsum + a
    single np.searchsorted over each key segment finds every left
    boundary — O(n log n) per bucket, no per-row Python. SQL twin:
    ``RANGE BETWEEN <window> PRECEDING AND CURRENT ROW``
    (oracle_sql.rolling_window_sql)."""
    w64 = np.timedelta64(window)

    def bucket(t: pa.Table) -> pa.Table:
        b = t[key].to_numpy() % num_buckets
        return t.append_column("_b", pa.array(b.astype(np.int64)))

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, ts, order_col], kind="mergesort")
        k = g[key].to_numpy()
        t = g[ts].to_numpy()
        v_e6 = np.asarray(
            round_half_away(g[value].to_numpy() * 1e6, 0),
        ).astype(np.int64)
        n = len(g)
        if n == 0:
            return pd.DataFrame({order_col: [], key: [], ts: [],
                                 "w_count": pd.Series([], dtype=np.int64),
                                 "w_sum_e6": pd.Series([], dtype=np.int64)})
        cum_cnt = np.arange(1, n + 1, dtype=np.int64)
        cum_sum = np.cumsum(v_e6)
        brk = np.r_[True, k[1:] != k[:-1]]
        # boundary search: shift each key segment's int64-us times into
        # disjoint ascending ranges, so ONE global searchsorted answers
        # every per-key query (left edge: first idx with t >= t_i - w —
        # the closed SQL RANGE frame; right edge: past ALL ts-peers)
        t_us = t.astype("datetime64[us]").astype(np.int64)
        w_us = np.timedelta64(w64, "us").astype(np.int64)
        seg_id = np.cumsum(brk) - 1
        span = int(t_us.max()) - int(t_us.min()) + w_us + 2
        if int(seg_id[-1] + 1) * span < 2**62:
            t_adj = (t_us - t_us.min()) + seg_id * span
            lo = np.searchsorted(t_adj, t_adj - w_us, side="left")
            hi = np.searchsorted(t_adj, t_adj, side="right")
        else:  # degenerate span × segment-count overflow: per-segment
            lo = np.empty(n, dtype=np.int64)
            hi = np.empty(n, dtype=np.int64)
            starts = np.flatnonzero(brk)
            ends = np.r_[starts[1:], n]
            for s, e in zip(starts, ends):
                lo[s:e] = s + np.searchsorted(t_us[s:e], t_us[s:e] - w_us,
                                              side="left")
                hi[s:e] = s + np.searchsorted(t_us[s:e], t_us[s:e],
                                              side="right")
        w_cnt = cum_cnt[hi - 1] - np.where(lo > 0, cum_cnt[lo - 1], 0)
        w_sum = cum_sum[hi - 1] - np.where(lo > 0, cum_sum[lo - 1], 0)
        return pd.DataFrame({
            order_col: g[order_col].to_numpy(),
            key: k, ts: t,
            "w_count": w_cnt.astype(np.int64),
            "w_sum_e6": w_sum.astype(np.int64),
        })

    return (ds.map_batches(bucket, batch_format="pyarrow")
            .groupby("_b")
            .map_groups(kernel, batch_format="pandas"))


def attribute_conversions(
    ds: ray.data.Dataset,
    *,
    key: str = "user_id",
    ts: str = "ts",
    etype: str = "event_type",
    conv_type: str = "purchase",
    touch_types: tuple = ("click", "view"),
    value: str = "value",
    order_col: str = "event_id",
    window: np.timedelta64 = np.timedelta64(7, "D"),
    num_buckets: int = _NUM_BUCKETS,
) -> ray.data.Dataset:
    """Conversion attribution: for every ``conv_type`` event, the
    FIRST and LAST ``touch_types`` event of the same key whose
    timestamp falls in ``[conv_ts - window, conv_ts]`` (last = max
    (ts, order_col), first = min). Conversions with no touch in the
    window are dropped (inner-join semantics).
    → (conv_id, key, first_touch_id, last_touch_id, value).

    Shape: one bucket shuffle by key hash (a bucket owns every event
    of its keys), then a fully vectorized kernel — the per-user time
    axes are fused into ONE global searchsorted pair by adding a
    per-key offset larger than the window (the events_rolling
    segment-offset trick), so candidate windows never cross keys and
    no per-key Python runs. SQL twin: a windowed join + row_number
    argmin/argmax."""
    window64 = np.timedelta64(window).astype("timedelta64[ns]")
    wns = window64.astype(np.int64)
    touch_set = set(touch_types)

    def bucket(t: pa.Table) -> pa.Table:
        keep = pa.compute.is_in(
            t[etype], value_set=pa.array([conv_type, *touch_types]))
        t = t.filter(keep)
        b = t[key].to_numpy() % num_buckets
        return t.append_column("_b", pa.array(b.astype(np.int64)))

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, ts, order_col], kind="mergesort")
        k = g[key].to_numpy()
        tns = g[ts].to_numpy().astype("datetime64[ns]").astype(np.int64)
        # per-key offset > window so fused axes never overlap
        uk, inv = np.unique(k, return_inverse=True)
        span = (tns.max() - tns.min() + wns + 1) if len(tns) else 1
        adj = tns + inv * (span + wns + 1)
        is_touch = g[etype].isin(touch_set).to_numpy()
        is_conv = (g[etype] == conv_type).to_numpy()
        t_adj = adj[is_touch]
        t_ids = g[order_col].to_numpy()[is_touch]
        c_adj = adj[is_conv]
        if not is_conv.any() or not is_touch.any():
            return pd.DataFrame({
                "conv_id": pd.Series([], dtype=np.int64),
                key: pd.Series([], dtype=np.int64),
                "first_touch_id": pd.Series([], dtype=np.int64),
                "last_touch_id": pd.Series([], dtype=np.int64),
                value: pd.Series([], dtype=np.float64)})
        hi = np.searchsorted(t_adj, c_adj, side="right") - 1
        lo = np.searchsorted(t_adj, c_adj - wns, side="left")
        ok = lo <= hi
        return pd.DataFrame({
            "conv_id": g[order_col].to_numpy()[is_conv][ok],
            key: k[is_conv][ok],
            "first_touch_id": t_ids[lo[ok]],
            "last_touch_id": t_ids[hi[ok]],
            value: g[value].to_numpy()[is_conv][ok],
        })

    return (ds.map_batches(bucket, batch_format="pyarrow")
            .groupby("_b")
            .map_groups(kernel, batch_format="pandas"))


def user_zscores(
    ds: ray.data.Dataset,
    *,
    key: str = "user_id",
    value: str = "value",
    order_col: str = "event_id",
    num_buckets: int = _NUM_BUCKETS,
) -> ray.data.Dataset:
    """Per-event anomaly score: z = (x − mean_key) / stddev_key with
    the SAMPLE standard deviation of the event's own key group
    (stddev_samp semantics; keys with < 2 events or zero variance get
    no row, matching SQL's NULL/div-by-zero drop).

    Exactness: event values are 2-decimal money-like doubles, so they
    are scaled to integer cents first — the per-key sums (n, Σx, Σx²)
    are exact int64 and the final float expression
    ``(cents·n − Σ) / sqrt(n·(n·Σx² − Σx²sums)/(n−1))``-shaped math is
    bit-reproducible by the SQL twin; z is rounded half-away at 6 dp.
    Shape: ONE bucket shuffle by key hash (a bucket owns all rows of
    its keys, so local moments are global) + a vectorized per-bucket
    kernel. → (order_col, key, z)."""

    def bucket(t: pa.Table) -> pa.Table:
        b = t[key].to_numpy() % num_buckets
        return t.append_column("_b", pa.array(b.astype(np.int64)))

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, order_col], kind="mergesort")
        k = g[key].to_numpy()
        cents = round_half_away(
            g[value].to_numpy() * 100.0, 0).astype(np.int64)
        brk = np.r_[True, k[1:] != k[:-1]] if len(k) else np.array([], bool)
        starts = np.flatnonzero(brk)
        n = np.diff(np.r_[starts, len(k)]).astype(np.int64)
        sx = np.add.reduceat(cents, starts)
        sxx = np.add.reduceat(cents * cents, starts)
        gid = np.cumsum(brk) - 1
        nn, sxg, sxxg = n[gid], sx[gid], sxx[gid]
        ok = nn >= 2
        # sample variance over exact integer sums:
        # var = (n·Σx² − (Σx)²) / (n·(n−1)), in cents²
        num = (nn * sxx[gid] - sxg * sxg).astype(np.float64)
        den = (nn * (nn - 1)).astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            sd = np.sqrt(num / den)
            z = ((cents * nn - sxg).astype(np.float64)
                 / (sd * nn))
        ok &= np.isfinite(z)
        return pd.DataFrame({
            order_col: g[order_col].to_numpy()[ok],
            key: k[ok],
            "z": round_half_away(z[ok], 6),
        })

    return (ds.map_batches(bucket, batch_format="pyarrow")
            .groupby("_b").map_groups(kernel, batch_format="pandas"))
