"""Relational pipeline queries over the TPC-H-ish tables.

The reference's data-processing surface is graph-shaped, but its users
also run plain table pipelines over the same loaded tables (CONTEXT /
GRAPH extraction feeding dataframes — SURVEY.md §2.3); these two
queries demonstrate the engine's relational patterns at scale:

- ``pricing_summary`` — TPC-H Q1-shaped aggregate with the
  combiner-before-shuffle pattern: every batch collapses to ≤6 partial
  rows inside ``map_batches``, so the groupby exchange moves O(groups
  × blocks) rows, never O(rows).
- ``nation_revenue`` — two broadcast lookups (customer → nation key,
  nation → name via :func:`graphscope_ray.graph.joins.attach_values`,
  which auto-falls-back to a hash join above 20M rows) + the same
  partial-aggregation shape.

Money sums are carried as integer cents / 1e-4-scaled int64 so the
distributed sum is EXACT and associative — float partial sums would
make the result depend on block combine order (hash-compare vs the
DuckDB oracle would flake). Per-row scaling rounds half-away-from-zero
on both sides (util.round_half_away ↔ DuckDB round()).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from graphscope_ray.util import round_half_away


def pricing_summary(sf_dir: str, *, cutoff: str = "2001-06-01"
                    ) -> ray.data.Dataset:
    """Q1-shaped summary: per (l_returnflag, l_linestatus) over rows
    with ``l_shipdate <= cutoff`` — sum_qty, sum_base_price,
    sum_disc_price, sum_charge, avg_qty, avg_price, avg_disc,
    count_order."""
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_quantity", "l_extendedprice", "l_discount", "l_tax",
                 "l_returnflag", "l_linestatus", "l_shipdate"])
    cut = np.datetime64(cutoff, "us")

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t["l_shipdate"],
                                   pa.scalar(cut.item(), pa.timestamp("us"))))
        rf = t["l_returnflag"].to_numpy(zero_copy_only=False).astype(str)
        ls = t["l_linestatus"].to_numpy(zero_copy_only=False).astype(str)
        key = np.char.add(rf, ls)  # both single-char flags
        uk, inv = np.unique(key, return_inverse=True)
        qty = t["l_quantity"].to_numpy()
        ext = t["l_extendedprice"].to_numpy()
        disc = t["l_discount"].to_numpy()
        tax = t["l_tax"].to_numpy()
        # integer-scaled per-row values -> exact associative sums
        base_c = round_half_away(ext * 100.0, 0)
        disc_e4 = round_half_away((ext * (1.0 - disc)) * 10_000.0, 0)
        chrg_e4 = round_half_away(
            (ext * (1.0 - disc)) * (1.0 + tax) * 10_000.0, 0)
        disc_e6 = round_half_away(disc * 1_000_000.0, 0)

        def s(w):  # batch partial sums stay < 2^53: exact in float64
            return np.bincount(inv, weights=w).astype(np.int64)

        return pa.table({
            "l_returnflag": pa.array([k[0] for k in uk]),
            "l_linestatus": pa.array([k[1] for k in uk]),
            "sum_qty": pa.array(s(qty)),
            "_base_c": pa.array(s(base_c)),
            "_disc_e4": pa.array(s(disc_e4)),
            "_chrg_e4": pa.array(s(chrg_e4)),
            "_disc_e6": pa.array(s(disc_e6)),
            "count_order": pa.array(
                np.bincount(inv).astype(np.int64)),
        })

    from ray.data.aggregate import Sum
    agg = (li.map_batches(partial, batch_format="pyarrow")
           .groupby(["l_returnflag", "l_linestatus"])
           .aggregate(Sum("sum_qty", alias_name="sum_qty"),
                      Sum("_base_c", alias_name="_base_c"),
                      Sum("_disc_e4", alias_name="_disc_e4"),
                      Sum("_chrg_e4", alias_name="_chrg_e4"),
                      Sum("_disc_e6", alias_name="_disc_e6"),
                      Sum("count_order", alias_name="count_order")))

    def finish(t: pa.Table) -> pa.Table:
        cnt = t["count_order"].to_numpy().astype(np.float64)
        base = t["_base_c"].to_numpy() / 100.0
        return pa.table({
            "l_returnflag": t["l_returnflag"],
            "l_linestatus": t["l_linestatus"],
            "sum_qty": t["sum_qty"],
            "sum_base_price": pa.array(base),
            "sum_disc_price": pa.array(
                t["_disc_e4"].to_numpy() / 10_000.0),
            "sum_charge": pa.array(t["_chrg_e4"].to_numpy() / 10_000.0),
            "avg_qty": pa.array(round_half_away(
                t["sum_qty"].to_numpy() / cnt, 6)),
            "avg_price": pa.array(round_half_away(base / cnt, 6)),
            "avg_disc": pa.array(round_half_away(
                (t["_disc_e6"].to_numpy() / 1_000_000.0) / cnt, 6)),
            "count_order": t["count_order"],
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def pricing_summary_sql(cutoff: str = "2001-06-01") -> str:
    """DuckDB twin of :func:`pricing_summary` — identical scaling,
    rounding and operation order (FP products are not associative, so
    the parenthesization mirrors the numpy kernel exactly)."""
    return f"""
WITH f AS (SELECT * FROM lineitem WHERE l_shipdate <= TIMESTAMP '{cutoff}'),
s AS (SELECT l_returnflag, l_linestatus,
        sum(l_quantity)::BIGINT AS sum_qty,
        sum(round(l_extendedprice * 100)::BIGINT) AS base_c,
        sum(round((l_extendedprice * (1.0 - l_discount)) * 10000)::BIGINT)
            AS disc_e4,
        sum(round((l_extendedprice * (1.0 - l_discount)) * (1.0 + l_tax)
                  * 10000)::BIGINT) AS chrg_e4,
        sum(round(l_discount * 1000000)::BIGINT) AS disc_e6,
        count(*)::BIGINT AS count_order
      FROM f GROUP BY 1, 2)
SELECT l_returnflag, l_linestatus, sum_qty,
       base_c / 100.0 AS sum_base_price,
       disc_e4 / 10000.0 AS sum_disc_price,
       chrg_e4 / 10000.0 AS sum_charge,
       round(sum_qty / count_order::DOUBLE, 6) AS avg_qty,
       round((base_c / 100.0) / count_order::DOUBLE, 6) AS avg_price,
       round((disc_e6 / 1000000.0) / count_order::DOUBLE, 6) AS avg_disc,
       count_order
FROM s ORDER BY l_returnflag, l_linestatus"""


def nation_revenue(sf_dir: str) -> ray.data.Dataset:
    """Total order revenue (integer cents, reported in dollars) per
    customer nation: two broadcast lookups onto orders, then the
    partial-aggregation groupby."""
    from graphscope_ray.graph.joins import attach_values

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"])
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    nat = ray.data.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])

    o = attach_values(orders, cust, on="o_custkey", table_key="c_custkey",
                      value_names=["c_nationkey"], defaults={"c_nationkey": -1})
    o = attach_values(o, nat, on="c_nationkey", table_key="n_nationkey",
                      value_names=["n_name"], defaults={"n_name": ""})

    def partial(t: pa.Table) -> pa.Table:
        name = t["n_name"].to_numpy(zero_copy_only=False).astype(str)
        # inner-join semantics like the SQL twin: drop orders whose
        # customer or nation lookup missed (default-filled "")
        hit = name != ""
        t = t.filter(pa.array(hit))
        name = name[hit]
        uk, inv = np.unique(name, return_inverse=True)
        cents = round_half_away(t["o_totalprice"].to_numpy() * 100.0, 0)
        return pa.table({
            "n_name": pa.array(uk),
            "_rev_c": pa.array(
                np.bincount(inv, weights=cents).astype(np.int64)),
            "n_orders": pa.array(np.bincount(inv).astype(np.int64)),
        })

    from ray.data.aggregate import Sum
    agg = (o.map_batches(partial, batch_format="pyarrow")
           .groupby("n_name")
           .aggregate(Sum("_rev_c", alias_name="_rev_c"),
                      Sum("n_orders", alias_name="n_orders")))

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "n_name": t["n_name"],
            "revenue": pa.array(t["_rev_c"].to_numpy() / 100.0),
            "n_orders": t["n_orders"],
        })

    return agg.map_batches(finish, batch_format="pyarrow")


NATION_REVENUE_SQL = """
SELECT n.n_name,
       sum(round(o.o_totalprice * 100)::BIGINT) / 100.0 AS revenue,
       count(*)::BIGINT AS n_orders
FROM orders o
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
GROUP BY n.n_name ORDER BY n.n_name"""


def shipping_priority(sf_dir: str, *, cutoff: str = "1998-06-01",
                      segment: str = "BUILDING",
                      k: int = 10) -> ray.data.Dataset:
    """Q3-shaped "top unshipped orders": revenue per order for
    ``segment`` customers, orders placed before ``cutoff`` with
    lineitems shipping after it; top ``k`` by revenue (desc,
    date + orderkey tie-break — fully deterministic so the SQL twin
    hash-matches).

    Shape: segment semi-join and the orderdate attach both go through
    :func:`attach_values` (broadcast ≤20M keys, hash join above);
    revenue partials are per-batch integer-e4 bincounts (combiner), so
    the groupby moves O(orders-per-block) not O(lineitems); the top-k
    is a per-block trim (≤k rows per block survive) + one-partition
    final — no global sort."""
    from graphscope_ray.graph.joins import attach_values

    cut = np.datetime64(cutoff, "us")
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_mktsegment"])
    cust = cust.map_batches(
        lambda t: (lambda m: pa.table(
            {"c_custkey": t["c_custkey"].filter(m),
             "_seg": pa.array(np.ones(m.to_numpy(
                 zero_copy_only=False).sum(), dtype=np.int64))}))(
            pc.equal(t["c_mktsegment"], segment)),
        batch_format="pyarrow")

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def o_filter(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less(t["o_orderdate"],
                             pa.scalar(cut.item(), pa.timestamp("us"))))
        return pa.table({
            "o_orderkey": t["o_orderkey"],
            "o_custkey": t["o_custkey"],
            "_odate": pa.array(t["o_orderdate"].to_numpy()
                               .astype("datetime64[us]")
                               .astype(np.int64)),
        })

    o = orders.map_batches(o_filter, batch_format="pyarrow")
    o = attach_values(o, cust, on="o_custkey", table_key="c_custkey",
                      value_names=["_seg"], defaults={"_seg": 0})
    o = o.map_batches(
        lambda t: t.filter(pc.equal(t["_seg"], 1))
                   .select(["o_orderkey", "_odate"]),
        batch_format="pyarrow")

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount",
                 "l_shipdate"])

    def rev_partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["l_shipdate"],
                                pa.scalar(cut.item(), pa.timestamp("us"))))
        ok = t["l_orderkey"].to_numpy()
        ext = t["l_extendedprice"].to_numpy()
        disc = t["l_discount"].to_numpy()
        e4 = round_half_away((ext * (1.0 - disc)) * 10_000.0, 0)
        uk, inv = np.unique(ok, return_inverse=True)
        return pa.table({
            "l_orderkey": pa.array(uk),
            "_rev_e4": pa.array(
                np.bincount(inv, weights=e4).astype(np.int64)),
        })

    from graphscope_ray.util import bucketed_sum
    rev = bucketed_sum(li.map_batches(rev_partial, batch_format="pyarrow"),
                       "l_orderkey", "_rev_e4")
    rev = attach_values(rev, o, on="l_orderkey", table_key="o_orderkey",
                        value_names=["_odate"], defaults={"_odate": -1})

    def trim(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t["_odate"], 0))
        if len(t) == 0:
            return t
        order = np.lexsort((t["l_orderkey"].to_numpy(),
                            t["_odate"].to_numpy(),
                            -t["_rev_e4"].to_numpy()))[:k]
        return t.take(pa.array(order))

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "l_orderkey": t["l_orderkey"],
            "revenue": pa.array(t["_rev_e4"].to_numpy() / 10_000.0),
            "o_orderdate": pa.array(t["_odate"].to_numpy()
                                    .astype("datetime64[us]")),
        })

    return (rev.map_batches(trim, batch_format="pyarrow")
            .repartition(1)
            .map_batches(trim, batch_format="pyarrow")
            .map_batches(finish, batch_format="pyarrow"))


def shipping_priority_sql(cutoff: str = "1998-06-01",
                          segment: str = "BUILDING", k: int = 10) -> str:
    """DuckDB twin of :func:`shipping_priority` (same e4 integer
    scaling and full deterministic order, so LIMIT k picks identical
    rows)."""
    return f"""
WITH c AS (SELECT c_custkey FROM customer
           WHERE c_mktsegment = '{segment}'),
o AS (SELECT o_orderkey, o_orderdate FROM orders
      JOIN c ON c_custkey = o_custkey
      WHERE o_orderdate < TIMESTAMP '{cutoff}'),
r AS (SELECT l_orderkey,
             sum(round((l_extendedprice * (1.0 - l_discount))
                       * 10000)::BIGINT) AS rev_e4
      FROM lineitem WHERE l_shipdate > TIMESTAMP '{cutoff}'
      GROUP BY 1)
SELECT r.l_orderkey, rev_e4 / 10000.0 AS revenue, o.o_orderdate
FROM r JOIN o ON o.o_orderkey = r.l_orderkey
ORDER BY rev_e4 DESC, o.o_orderdate, r.l_orderkey
LIMIT {k}"""


def local_supplier_volume(sf_dir: str, *, region: str = "ASIA",
                          date_lo: str = "1996-01-01",
                          date_hi: str = "1997-01-01"
                          ) -> ray.data.Dataset:
    """TPC-H Q5-shaped pipeline: revenue per nation from lineitems
    where the CUSTOMER and the SUPPLIER share a nation inside
    ``region``, over one order-date year. The six-table join chain is
    realized Ray-Data-first:

    - nation⋈region and supplier collapse to broadcast lookups
      (``ray.put`` once, probed per batch);
    - orders (date-filtered at the parquet read) and customer attach
      onto LINEITEM — the one big table, which never shuffles — via
      ``attach_values`` (broadcast under 20M rows, hash join above);
    - the same-nation filter + per-batch nation partials (integer
      cents, exact) feed one tiny groupby.

    → (n_name, revenue, n_items) ordered by revenue desc."""
    from graphscope_ray.graph.joins import attach_values

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                 "l_discount"])
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"])

    lo = np.datetime64(date_lo)
    hi = np.datetime64(date_hi)

    def keep_dates(t: pa.Table) -> pa.Table:
        d = t["o_orderdate"].to_numpy(zero_copy_only=False)
        m = (d >= lo) & (d < hi)
        return t.filter(pa.array(m)).select(["o_orderkey", "o_custkey"])

    # pin: attach_values consumes its lookup table twice (count() for
    # route selection + the broadcast/to_pandas read)
    orders = orders.map_batches(keep_dates,
                                batch_format="pyarrow").materialize()
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey"]).materialize()
    supp = ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet",
        columns=["s_suppkey", "s_nationkey"]).to_pandas()
    nat = ray.data.read_parquet(
        f"{sf_dir}/nation.parquet").to_pandas()
    reg = ray.data.read_parquet(
        f"{sf_dir}/region.parquet").to_pandas()
    rkeys = set(reg.loc[reg.r_name == region, "r_regionkey"])
    nat = nat[nat.n_regionkey.isin(rkeys)]
    nation_name = dict(zip(nat.n_nationkey, nat.n_name))
    # pre-sorted searchsorted-ready arrays, put ONCE (zero-copy reads)
    sorder = np.argsort(supp.s_suppkey.to_numpy())
    sks_arr = supp.s_suppkey.to_numpy()[sorder].astype(np.int64)
    svs_arr = supp.s_nationkey.to_numpy()[sorder].astype(np.int64)

    import ray as _ray
    supp_ref = _ray.put((sks_arr, svs_arr))
    name_ref = _ray.put(nation_name)

    # lineitem ← orders (drops out-of-window lineitems), ← customer
    rows = attach_values(li, orders, on="l_orderkey",
                         table_key="o_orderkey",
                         value_names=["o_custkey"],
                         defaults={"o_custkey": -1})

    def drop_missed(t: pa.Table) -> pa.Table:
        return t.filter(pc.not_equal(t["o_custkey"], -1))

    rows = rows.map_batches(drop_missed, batch_format="pyarrow")
    rows = attach_values(rows, cust, on="o_custkey",
                         table_key="c_custkey",
                         value_names=["c_nationkey"],
                         defaults={"c_nationkey": -1})

    def partial(t: pa.Table) -> pa.Table:
        sks, svs = _ray.get(supp_ref)
        nm_map = _ray.get(name_ref)
        sk = t["l_suppkey"].to_numpy()
        # vectorized lookup: suppkey → nation (−1 = unknown)
        pos = np.searchsorted(sks, sk)
        pos = np.clip(pos, 0, len(sks) - 1)
        ok = sks[pos] == sk
        s_nat = np.where(ok, svs[pos], -1)
        c_nat = t["c_nationkey"].to_numpy()
        m = (s_nat == c_nat) & np.isin(s_nat, list(nm_map))
        if not m.any():
            return pa.table({
                "n_name": pa.array([], pa.string()),
                "_rev_c": pa.array([], pa.int64()),
                "n_items": pa.array([], pa.int64())})
        ext = t["l_extendedprice"].to_numpy()[m]
        dis = t["l_discount"].to_numpy()[m]
        cents = round_half_away(ext * (1.0 - dis) * 100.0, 0)
        names = np.array([nm_map[n] for n in s_nat[m]], dtype=object)
        uk, inv = np.unique(names, return_inverse=True)
        return pa.table({
            "n_name": pa.array(uk.astype(str)),
            "_rev_c": pa.array(
                np.bincount(inv, weights=cents).astype(np.int64)),
            "n_items": pa.array(np.bincount(inv).astype(np.int64))})

    from ray.data.aggregate import Sum
    agg = (rows.map_batches(partial, batch_format="pyarrow")
           .groupby("n_name")
           .aggregate(Sum("_rev_c", alias_name="_rev_c"),
                      Sum("n_items", alias_name="n_items")))

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "n_name": t["n_name"],
            "revenue": pa.array(t["_rev_c"].to_numpy() / 100.0),
            "n_items": t["n_items"]})

    return (agg.map_batches(finish, batch_format="pyarrow")
            .sort(["revenue", "n_name"], descending=[True, False]))


LOCAL_SUPPLIER_VOLUME_SQL = """
SELECT n.n_name,
       sum(round(l.l_extendedprice * (1 - l.l_discount) * 100)::BIGINT)
         / 100.0 AS revenue,
       count(*)::BIGINT AS n_items
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
WHERE c.c_nationkey = s.s_nationkey
  AND r.r_name = 'ASIA'
  AND o.o_orderdate >= DATE '1996-01-01'
  AND o.o_orderdate < DATE '1997-01-01'
GROUP BY n.n_name ORDER BY revenue DESC, n_name"""


def rfm_segments(sf_dir: str) -> ray.data.Dataset:
    """RFM customer segmentation over ``orders`` — the classic
    marketing rollup: per customer recency (max order date),
    frequency (order count), monetary (exact integer-cents total),
    each scored 1-4 by quartile-threshold bucketing
    (``score = 1 + Σ_k [x > quantile_disc(k/4)]`` — explicit
    thresholds, NOT ntile, so ties score deterministically on both
    sides), plus the combined ``rfm = 100r + 10f + m``.

    Shape: per-batch combiner (np.unique per custkey: max/count/sum),
    one bucket-shuffle merge kernel, the three quartile thresholds
    via the profile module's block-skipping order statistics (only
    the blocks holding a requested rank are read), then a stateless
    scoring map. Money is integer cents end to end (the relational
    family's exactness convention)."""
    import pandas as pd
    from graphscope_ray.data.profile import _order_statistics
    from graphscope_ray.util import round_half_away
    import math

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pd.DataFrame:
        ck = t["o_custkey"].to_numpy()
        dt = (t["o_orderdate"].to_numpy()
              .astype("datetime64[ns]").astype(np.int64))
        cents = round_half_away(
            t["o_totalprice"].to_numpy() * 100.0, 0).astype(np.int64)
        order = np.argsort(ck, kind="mergesort")
        ck, dt, cents = ck[order], dt[order], cents[order]
        brk = np.r_[True, ck[1:] != ck[:-1]]
        starts = np.flatnonzero(brk)
        ends = np.r_[starts[1:], len(ck)]
        return pd.DataFrame({
            "cust": ck[starts],
            "rec": np.maximum.reduceat(dt, starts),
            "freq": (ends - starts).astype(np.int64),
            "mon": np.add.reduceat(cents, starts),
            "_b": ck[starts] % 32,
        })

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("cust", sort=False).agg(
            rec=("rec", "max"), freq=("freq", "sum"),
            mon=("mon", "sum")).reset_index()
        agg["freq"] = agg["freq"].astype(np.int64)
        agg["mon"] = agg["mon"].astype(np.int64)
        return agg

    cust = (orders.map_batches(partial, batch_format="pyarrow")
            .groupby("_b").map_groups(merge, batch_format="pandas")
            .materialize())
    n = cust.count()
    ranks = [max(0, math.ceil(q * n) - 1) for q in (0.25, 0.5, 0.75)]
    th = {m: _order_statistics(cust, m, ranks)
          for m in ("rec", "freq", "mon")}
    ref = ray.put(th)

    def score(t: pa.Table) -> pa.Table:
        thr = ray.get(ref)

        def s(col):
            x = t[col].to_numpy()
            q = thr[col]
            return (1 + (x > q[0]).astype(np.int64)
                    + (x > q[1]) + (x > q[2])).astype(np.int64)

        r, f, m = s("rec"), s("freq"), s("mon")
        return pa.table({"cust": t["cust"],
                         "r_score": r, "f_score": f, "m_score": m,
                         "rfm": 100 * r + 10 * f + m})

    return cust.map_batches(score, batch_format="pyarrow")
