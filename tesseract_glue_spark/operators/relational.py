"""Relational operator coverage over the TPC-H-ish driver tables
(SURVEY §2B: scan, filter, projection, join, aggregation, window,
top-k). Dual-dialect SQL like every other operator family.

Cross-engine determinism: monetary/real-valued columns are quantized to
integer cents *inside* the query (``round(x*100)`` — same argument as
the embedding quantization: a 2-decimal value stored as double never
lands exactly on .5 when scaled), so sums/averages are exact integer
arithmetic regardless of each engine's summation order. Timestamps are
reduced to date strings via per-dialect formatting. Every SUM is
wrapped in CAST(... AS BIGINT): DuckDB's SUM(BIGINT) yields HUGEINT,
which pandas materializes as float64 and breaks strict value-hashing.
"""

from __future__ import annotations

from tesseract_glue_spark.functions import dialect as D


def _cents(col: str) -> str:
    return f"CAST(round({col} * 100) AS BIGINT)"


def _pct(col: str) -> str:
    """0.07 → 7 (integer percent)."""
    return f"CAST(round({col} * 100) AS BIGINT)"


def _date_str(d: str, col: str) -> str:
    if d == D.SPARK:
        return f"date_format({col}, 'yyyy-MM-dd')"
    return f"strftime({col}, '%Y-%m-%d')"


def pricing_summary_sql(d: str, table: str = "lineitem") -> str:
    """TPC-H Q1-shaped aggregation: group-scan with partial (map-side)
    aggregation — Catalyst plans HashAggregate(partial) → shuffle →
    HashAggregate(final), the at-scale shape."""
    qty = "CAST(round(l_quantity) AS BIGINT)"
    price = _cents("l_extendedprice")
    disc = _pct("l_discount")
    tax = _pct("l_tax")
    return f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM({qty}) AS BIGINT) AS sum_qty,
           CAST(SUM({price}) AS BIGINT) AS sum_base_cents,
           CAST(SUM({price} * (100 - {disc})) AS BIGINT) AS sum_disc_x100,
           CAST(SUM({price} * (100 - {disc}) * (100 + {tax})) AS BIGINT) AS sum_charge_x10k,
           {D.scaled_ratio(d, f"SUM({qty})", "COUNT(*)")} AS avg_qty_x10k,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM {table}
    WHERE {_date_str(d, "l_shipdate")} <= '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """.strip()


def top_customers_sql(d: str, table: str = "orders") -> str:
    """Join + aggregation + deterministic top-k (ties broken by key).
    At scale: broadcast the customer dim; Catalyst/AQE picks it."""
    total = _cents("o_totalprice")
    return f"""
    SELECT c.c_custkey, c.c_name,
           CAST(SUM({total}) AS BIGINT) AS revenue_cents,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM {table} o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_name
    ORDER BY revenue_cents DESC, c.c_custkey
    LIMIT 20
    """.strip()


def order_rank_window_sql(d: str, table: str = "orders") -> str:
    """Window function: per-customer order ranking by value."""
    total = _cents("o_totalprice")
    return f"""
    SELECT o_custkey, o_orderkey, total_cents, CAST(rnk AS BIGINT) AS rnk
    FROM (
        SELECT o_custkey, o_orderkey, {total} AS total_cents,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY {total} DESC, o_orderkey) AS rnk
        FROM {table}
    ) t
    WHERE rnk <= 3
    """.strip()


def events_hourly_sql(d: str, table: str = "events") -> str:
    """Time-bucketed aggregation over the event stream (the batch twin
    of the Structured Streaming windowed aggregation)."""
    if d == D.SPARK:
        hour = "date_format(ts, 'yyyy-MM-dd HH:00:00')"
    else:
        hour = "strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00')"
    val = "CAST(round(value * 100) AS BIGINT)"
    return f"""
    SELECT {hour} AS hour_bucket, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(SUM({val}) AS BIGINT) AS sum_value_cents
    FROM {table}
    GROUP BY {hour}, event_type
    """.strip()


def nation_rollup_sql(d: str, table: str = "customer") -> str:
    """Multi-way join + hierarchy aggregation (region→nation)."""
    bal = _cents("c_acctbal")
    return f"""
    SELECT r.r_name AS region, n.n_name AS nation,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM({bal}) AS BIGINT) AS sum_acctbal_cents
    FROM {table} c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """.strip()


def user_sessions_sql(d: str, table: str = "events") -> str:
    """Sessionization via gaps-and-islands window functions (the batch
    twin of streaming ``session_window``): a new session starts when the
    gap to the previous event of the same user exceeds 30 minutes;
    session id = running count of session starts."""
    if d == D.SPARK:
        ts_str = "date_format(min_ts, 'yyyy-MM-dd HH:mm:ss')"
        gap_sec = "(unix_timestamp(ts) - unix_timestamp(prev_ts))"
    else:
        ts_str = "strftime(min_ts, '%Y-%m-%d %H:%M:%S')"
        gap_sec = "CAST(epoch(ts) - epoch(prev_ts) AS BIGINT)"
    return f"""
    WITH ordered AS (
        SELECT user_id, event_id, ts,
               LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        FROM {table}
    ),
    marked AS (
        SELECT user_id, event_id, ts,
               CASE WHEN prev_ts IS NULL OR {gap_sec} > 1800 THEN 1 ELSE 0 END AS is_start
        FROM ordered
    ),
    sessions AS (
        -- the running sum MUST use the same total order as the LAG
        -- (ties on ts broken by event_id) or engines disagree on ties
        SELECT user_id, ts,
               SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS session_no
        FROM marked
    )
    SELECT user_id,
           CAST(session_no AS BIGINT) AS session_no,
           {ts_str.replace("min_ts", "MIN(ts)")} AS session_start,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM sessions
    GROUP BY user_id, session_no
    """.strip()


def value_quantiles_sql(d: str, table: str = "events") -> str:
    """Exact DISCRETE quantiles per event_type via window ranks —
    integer-deterministic across engines (interpolating percentile
    functions round differently between engines; approx sketches
    differ by construction)."""
    val = "CAST(round(value * 100) AS BIGINT)"
    picks = []
    for q, name in ((50, "p50"), (90, "p90"), (99, "p99")):
        # discrete quantile: the ceil(q/100 * n)-th smallest value
        picks.append(
            f"MAX(CASE WHEN rn = CAST(ceil({q} / 100.0 * cnt) AS BIGINT) THEN v END) AS {name}_cents"
        )
    return f"""
    WITH ranked AS (
        SELECT event_type, {val} AS v,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY {val}, event_id) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS cnt
        FROM {table}
    )
    SELECT event_type,
           CAST(MAX(cnt) AS BIGINT) AS n_events,
           {', '.join(picks)}
    FROM ranked
    GROUP BY event_type
    """.strip()


def top_parts_sql(d: str, table: str = "lineitem") -> str:
    """Fact⋈dim join over part/supplier: revenue per part with its
    top supplier, deterministic top-25."""
    rev = "CAST(round(l.l_extendedprice * 100) AS BIGINT)"
    return f"""
    SELECT p.p_partkey,
           CAST(SUM({rev}) AS BIGINT) AS revenue_cents,
           CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS n_suppliers
    FROM {table} l
    JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_partkey
    ORDER BY revenue_cents DESC, p.p_partkey
    LIMIT 25
    """.strip()


def supplier_nations_sql(d: str, table: str = "lineitem") -> str:
    """Revenue by supplier nation (fact ⋈ supplier ⋈ nation) — touches
    the last otherwise-uncovered driver table."""
    # quantize price and discount separately (exact ints) — rounding a
    # float PRODUCT is not covered by the 2-decimal .5-safety argument
    rev = (
        "(CAST(round(l.l_extendedprice * 100) AS BIGINT)"
        " * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))"
    )
    return f"""
    SELECT n.n_name AS nation,
           CAST(COUNT(DISTINCT s.s_suppkey) AS BIGINT) AS n_suppliers,
           CAST(SUM({rev}) AS BIGINT) AS revenue_x10k
    FROM {table} l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """.strip()


def pricing_rollup_sql(d: str, table: str = "lineitem") -> str:
    """ROLLUP hierarchy totals (returnflag → linestatus → grand total);
    NULL rollup keys are coalesced to 'ALL' so group labels hash
    identically across engines."""
    price = _cents("l_extendedprice")
    return f"""
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           CAST(SUM({price}) AS BIGINT) AS sum_base_cents,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM {table}
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """.strip()


def retained_users_sql(d: str, table: str = "events") -> str:
    """Set-op coverage: users active in BOTH halves of the observed
    time range (INTERSECT)."""
    # midpoint in exact integer MICROSECONDS on both sides: Spark's
    # second-granular timestampadd vs DuckDB's exact interval division
    # would disagree on events inside the sub-second boundary window;
    # D.epoch_us is session-timezone-independent (NTZ wall-clock diff)
    us = D.epoch_us(d, "ts")
    mid = f"(SELECT (min({us}) + max({us})) DIV 2 FROM events_src)" \
        if d == D.SPARK else f"(SELECT (min({us}) + max({us})) // 2 FROM events_src)"
    return f"""
    WITH events_src AS (SELECT * FROM {table})
    SELECT user_id FROM events_src WHERE {us} < {mid}
    INTERSECT
    SELECT user_id FROM events_src WHERE {us} >= {mid}
    """.strip()


def events_pivot_sql(d: str, table: str = "events") -> str:
    """Pivot event types to columns via conditional aggregation (the
    engine-portable pivot form) — one row per user."""
    types = ["click", "view", "purchase", "signup", "error"]
    cols = ",\n           ".join(
        f"CAST(SUM(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS n_{t}"
        for t in types
    )
    return f"""
    SELECT user_id,
           {cols},
           CAST(COUNT(*) AS BIGINT) AS n_total
    FROM {table}
    GROUP BY user_id
    """.strip()


def events_asof_join_sql(d: str, table: str = "events") -> str:
    """As-of join — the canonical time-series operator Spark lacks as a
    built-in: each 'click' event matched to the MOST RECENT strictly
    prior 'view' by the same user (the attribution shape; same
    semantics as pandas merge_asof / kdb aj).

    Scale shape (Spark): ONE sorted window pass over the whole stream —
    a single user_id shuffle + per-key sort, with the prior-view
    timestamp carried by a MAX over a strict RANGE frame. Never the
    naive ``v.ts < c.ts`` inequality join, whose per-key candidate set
    is quadratic at 10^12 events. The DuckDB rendering uses the
    engine's NATIVE ``ASOF LEFT JOIN``, so the oracle is an
    independent implementation of the semantics, not a template mirror
    (strict ``<`` on both sides keeps tie behavior identical).
    Epoch extraction is session-timezone-independent (``D.epoch_us``,
    round-4 advisor fix)."""
    if d == D.SPARK:
        return f"""
    SELECT event_id, user_id,
           CAST(ts_us AS BIGINT) AS click_us,
           CAST(asof_view_us AS BIGINT) AS asof_view_us
    FROM (
        SELECT event_id, user_id, event_type, ts_us,
               MAX(CASE WHEN event_type = 'view' THEN ts_us END) OVER (
                   PARTITION BY user_id ORDER BY ts_us
                   RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS asof_view_us
        FROM (SELECT event_id, user_id, event_type,
                     {D.epoch_us(d, "ts")} AS ts_us
              FROM {table}) t0
    ) w
    WHERE event_type = 'click'
    """.strip()
    return f"""
    SELECT c.event_id, c.user_id,
           CAST(epoch_us(c.ts) AS BIGINT) AS click_us,
           CAST(epoch_us(v.ts) AS BIGINT) AS asof_view_us
    FROM (SELECT * FROM {table} WHERE event_type = 'click') c
    ASOF LEFT JOIN (SELECT * FROM {table} WHERE event_type = 'view') v
      ON c.user_id = v.user_id AND v.ts < c.ts
    """.strip()


def events_range_join_sql(d: str, table: str = "events") -> str:
    """Range/interval join — the second canonical time-series shape
    Spark lacks natively: each 'click' event matched to every
    post-'purchase' attribution window ``[purchase_ts, purchase_ts +
    30min]`` of the same user that CONTAINS it (inclusive bounds).

    Scale shape (Spark): the BUCKETED-BY-TIME-BIN plan — intervals are
    at most ``W`` (= the window length) long, so each spans ≤2 bins of
    width ``W``; explode every interval to its covered bins (≤2×
    row expansion), equi-join probes on ``(user_id, bin)``, then filter
    exact containment. Each matching pair surfaces EXACTLY once (a
    probe lives in one bin; an interval lists each bin once), so no
    dedup stage is needed. NEVER the raw inequality join: Catalyst can
    only plan ``t BETWEEN s AND e`` as a per-key nested loop whose
    candidate set is quadratic at 10^12 events.

    The DuckDB rendering is the PLAIN inequality join — DuckDB plans it
    natively via its IEJoin/range-join machinery — so the oracle is an
    independent implementation of the semantics, not a template mirror.
    Epoch extraction is session-timezone-independent (``D.epoch_us``)."""
    us = D.epoch_us(d, "ts")
    window_us = 30 * 60 * 1_000_000  # 30-minute attribution window
    if d == D.SPARK:
        return f"""
    WITH ev AS (
        SELECT event_id, user_id, event_type, {us} AS ts_us FROM {table}
    ),
    windows AS (
        SELECT event_id AS purchase_event_id, user_id,
               ts_us AS start_us, ts_us + {window_us} AS end_us
        FROM ev WHERE event_type = 'purchase'
    ),
    window_bins AS (
        SELECT purchase_event_id, user_id, start_us, end_us,
               explode(sequence(start_us DIV {window_us}, end_us DIV {window_us})) AS bin
        FROM windows
    ),
    clicks AS (
        SELECT event_id, user_id, ts_us, ts_us DIV {window_us} AS bin
        FROM ev WHERE event_type = 'click'
    )
    SELECT c.event_id, c.user_id,
           CAST(c.ts_us AS BIGINT) AS click_us,
           b.purchase_event_id,
           CAST(b.start_us AS BIGINT) AS window_start_us
    FROM clicks c
    JOIN window_bins b ON c.user_id = b.user_id AND c.bin = b.bin
    WHERE c.ts_us BETWEEN b.start_us AND b.end_us
    """.strip()
    return f"""
    SELECT c.event_id, c.user_id,
           CAST(epoch_us(c.ts) AS BIGINT) AS click_us,
           p.event_id AS purchase_event_id,
           CAST(epoch_us(p.ts) AS BIGINT) AS window_start_us
    FROM (SELECT * FROM {table} WHERE event_type = 'click') c
    JOIN (SELECT * FROM {table} WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id
     AND epoch_us(c.ts) BETWEEN epoch_us(p.ts) AND epoch_us(p.ts) + {window_us}
    """.strip()


def events_funnel_sql(d: str, table: str = "events") -> str:
    """Ordered-sequence funnel (view → click → purchase): for every user
    who viewed, the earliest click STRICTLY AFTER the first view and the
    earliest purchase STRICTLY AFTER that click, plus the funnel stage
    reached — the conversion-attribution query every event pipeline runs.

    Scale shape: three stage aggregates, each a groupBy(user_id) with
    map-side partial aggregation, chained by EQUI-joins on the same
    ``user_id`` key — one shuffle key throughout, so AQE reuses the
    exchange across stages and no stage is an inequality join (the
    ``ts >`` predicates are plain filters against the previous stage's
    one-row-per-user aggregate, never a range-join candidate set).
    Missing stages surface as ``-1`` (NULL-free output keeps the
    cross-engine value-hash exact).
    """
    v_us = D.epoch_us(d, "v.t_view")
    c_us = D.epoch_us(d, "c.t_click")
    p_us = D.epoch_us(d, "p.t_purchase")
    return f"""
    WITH v AS (
        SELECT user_id, MIN(ts) AS t_view
        FROM {table} WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, MIN(e.ts) AS t_click
        FROM {table} e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click' AND e.ts > v.t_view
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, MIN(e.ts) AS t_purchase
        FROM {table} e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND e.ts > c.t_click
        GROUP BY e.user_id
    )
    SELECT v.user_id,
           CAST({v_us} AS BIGINT) AS view_us,
           CAST(COALESCE({c_us}, -1) AS BIGINT) AS click_us,
           CAST(COALESCE({p_us}, -1) AS BIGINT) AS purchase_us,
           CAST(CASE WHEN p.user_id IS NOT NULL THEN 3
                     WHEN c.user_id IS NOT NULL THEN 2
                     ELSE 1 END AS BIGINT) AS funnel_stage
    FROM v
    LEFT JOIN c ON v.user_id = c.user_id
    LEFT JOIN p ON v.user_id = p.user_id
    """.strip()


RELATIONAL_OPS = {
    "rel_pricing_summary": (pricing_summary_sql, ("lineitem",)),
    "rel_top_customers": (top_customers_sql, ("orders", "customer")),
    "rel_order_rank_window": (order_rank_window_sql, ("orders",)),
    "rel_events_hourly": (events_hourly_sql, ("events",)),
    "rel_nation_rollup": (nation_rollup_sql, ("customer", "nation", "region")),
    "rel_user_sessions": (user_sessions_sql, ("events",)),
    "rel_value_quantiles": (value_quantiles_sql, ("events",)),
    "rel_top_parts": (top_parts_sql, ("lineitem", "part")),
    "rel_supplier_nations": (supplier_nations_sql, ("lineitem", "supplier", "nation")),
    "rel_pricing_rollup": (pricing_rollup_sql, ("lineitem",)),
    "rel_retained_users": (retained_users_sql, ("events",)),
    "rel_events_pivot": (events_pivot_sql, ("events",)),
    "rel_events_asof_join": (events_asof_join_sql, ("events",)),
    "rel_events_range_join": (events_range_join_sql, ("events",)),
    "rel_events_funnel": (events_funnel_sql, ("events",)),
}
