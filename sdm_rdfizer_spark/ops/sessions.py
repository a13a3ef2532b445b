"""Event sessionization: gap-based session assignment + per-session stats.

Beyond the reference surface (it has no windowed/stateful operators —
SURVEY §2.7); this is the standard large-scale event-pipeline shape:
``lag`` over (user, time) marks session starts, a running sum turns the
marks into session sequence numbers, then one aggregation per session.

Scale posture: one shuffle on user_id (the window partition key) feeds
both window functions and the final aggregation — Catalyst reuses the
partitioning, so the whole operator is a single exchange over the
events; no driver state, no iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sessionize(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    value_col: str = "value",
    chunk_seconds: int | None = None,
) -> DataFrame:
    """Assign events to sessions (a new session starts after a gap of
    more than ``gap_minutes`` of inactivity) and return per-session stats:
    (user_id, session_seq, session_start, session_end, n_events,
    sum_value). Timestamps render second-resolution for engine-portable
    comparison; the value sum is exact decimal.

    ``chunk_seconds`` is the hot-key escape hatch (same trick as
    ``asof_join``): the event-level window partitions on (user, coarse
    time chunk) so a celebrity user's rows spread over many tasks, and
    the cross-chunk stitching happens on tiny per-chunk summaries —
    whether a chunk's first event continues the previous chunk's session
    (gap vs the previous non-empty chunk's last timestamp) and the
    running session-count offset. Sessions spanning chunk edges merge in
    the final combinable (user, seq) aggregation. Output is identical to
    the unchunked path.
    """
    # TIMESTAMP_NTZ (parquet timestamps without zone) casts to long only
    # via TIMESTAMP; the session tz is UTC so the hop is value-preserving
    if dict(events.dtypes).get(ts_col) == "timestamp_ntz":
        events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    gap = gap_minutes * 60
    if chunk_seconds is None:
        w = Window.partitionBy(user_col).orderBy(ts_col)
        prev = F.lag(ts_col).over(w)
        new_session = (
            prev.isNull()
            | (F.col(ts_col).cast("long") - prev.cast("long") > gap)
        )
        seq = F.sum(new_session.cast("long")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        marked = events.select(
            F.col(user_col),
            F.col(ts_col),
            F.col(value_col),
            seq.alias("session_seq"),
        )
    else:
        cs = float(chunk_seconds)
        ev = events.select(user_col, ts_col, value_col).withColumn(
            "__c", F.floor(F.col(ts_col).cast("double") / cs).cast("long"))
        wch = Window.partitionBy(user_col, "__c").orderBy(ts_col)
        prev_in = F.lag(ts_col).over(wch)
        # internal mark: gap vs the previous event IN THE SAME CHUNK; a
        # chunk's first event is decided by the summary-level carry below
        int_new = F.when(prev_in.isNull(), F.lit(0)).otherwise(
            (F.col(ts_col).cast("long") - prev_in.cast("long") > gap)
            .cast("long"))
        marked_c = ev.withColumn("__int_new", int_new).withColumn(
            "__local",
            F.sum("__int_new").over(
                wch.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        # one tiny row per non-empty (user, chunk): combinable aggregates
        summ = marked_c.groupBy(user_col, "__c").agg(
            F.min(ts_col).alias("__first_ts"),
            F.max(ts_col).alias("__last_ts"),
            F.sum("__int_new").alias("__n_int"))
        wu = Window.partitionBy(user_col).orderBy("__c")
        carry_last = F.lag("__last_ts").over(wu)
        first_new = (
            carry_last.isNull()
            | (F.col("__first_ts").cast("long") - carry_last.cast("long")
               > gap)).cast("long")
        summ = summ.withColumn("__first_new", first_new)
        offset = F.coalesce(
            F.sum(F.col("__first_new") + F.col("__n_int")).over(
                wu.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0))
        summ = summ.withColumn("__offset", offset)
        # global seq = sessions before this chunk + this chunk's first-
        # event decision + internal marks up to the event (the first
        # event's own __int_new is 0 by construction)
        joined = marked_c.join(
            summ.select(user_col, "__c", "__first_new", "__offset"),
            [user_col, "__c"])
        marked = joined.select(
            F.col(user_col),
            F.col(ts_col),
            F.col(value_col),
            (F.col("__offset") + F.col("__first_new") + F.col("__local"))
            .alias("session_seq"),
        )
    return (
        marked.groupBy(user_col, "session_seq")
        .agg(
            F.date_format(F.min(ts_col), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format(F.max(ts_col), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col(value_col).cast("decimal(18,2)")).alias("sum_value"),
        )
        .select(
            F.col(user_col).cast("long").alias(user_col),
            F.col("session_seq").cast("long").alias("session_seq"),
            "session_start",
            "session_end",
            F.col("n_events").cast("long").alias("n_events"),
            F.col("sum_value").cast("string").alias("sum_value"),
        )
    )


def funnel(
    events: DataFrame,
    steps: list[str],
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    skew_safe: bool = False,
) -> DataFrame:
    """Ordered funnel analysis: per user, the earliest time each step
    was reached STRICTLY AFTER the previous step (classic product
    funnel — view → click → purchase). Returns one row per user:
    (user, t_1..t_n [timestamps], completed).

    Each step is a whole-partition min() window conditioned on the
    previous step's column; the chain of windows shares ONE shuffle on
    the user key (ENSURE_REQUIREMENTS reuses the exchange), then a
    per-user dedup collapses to user grain. A user who skipped step k
    gets NULL from k on (the strict ts > t_{k-1} comparison propagates
    NULL), matching the left-join oracle semantics.

    ``skew_safe=True`` replaces the whole-partition windows with a chain
    of per-step combinable min-aggregations joined back on the user key
    — no window puts all of a user's rows in one task, so a celebrity
    user costs nothing extra (map-side partial aggregation absorbs the
    skew; the per-step joins are shuffle joins AQE can skew-split).
    Output is identical; the windowed path stays the default because it
    reads the events once instead of once per step.
    """
    from pyspark.sql.window import Window

    if dict(events.dtypes).get(ts_col) == "timestamp_ntz":
        events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    tcols = [f"t_{i}" for i in range(1, len(steps) + 1)]
    if skew_safe:
        base = events.select(user_col, ts_col, type_col)
        cur = (base.where(F.col(type_col) == steps[0])
               .groupBy(user_col).agg(F.min(ts_col).alias("t_1")))
        for i, step in enumerate(steps[1:], start=2):
            cand = (
                base.where(F.col(type_col) == step)
                .join(cur.select(user_col, f"t_{i-1}"), user_col)
                .where(F.col(ts_col) > F.col(f"t_{i-1}"))
                .groupBy(user_col).agg(F.min(ts_col).alias(f"t_{i}"))
            )
            cur = cur.join(cand, user_col, "left")
        return (
            base.select(user_col).distinct()
            .join(cur, user_col, "left")
            .select(user_col, *tcols)
            .withColumn("completed", F.col(tcols[-1]).isNotNull())
        )
    w = Window.partitionBy(user_col)
    df = events
    prev = None
    for i, step in enumerate(steps, start=1):
        cond = F.col(type_col) == step
        if prev is not None:
            cond = cond & (F.col(ts_col) > F.col(prev))
        df = df.withColumn(f"t_{i}", F.min(F.when(cond, F.col(ts_col))).over(w))
        prev = f"t_{i}"
    return (
        df.select(user_col, *tcols).dropDuplicates([user_col])
        .withColumn("completed", F.col(tcols[-1]).isNotNull())
    )


def sliding_window_agg(
    events: DataFrame,
    *,
    size_minutes: int = 10,
    slide_minutes: int = 5,
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Sliding (hopping) window aggregation: each event counts toward
    ``size/slide`` overlapping windows — the moving-average shape
    tumbling windows can't express. Returns (window_start, event_type,
    n_events, sum_value) with an exact decimal sum.

    ``F.window`` with a slide expands each row into its windows via the
    Expand operator BEFORE the aggregation, and count/sum are map-side
    combinable, so the shuffle carries one row per (window, type) per
    input partition — fan-out factor size/slide never reaches the
    exchange. Windows align to the epoch (multiples of the slide),
    matching DuckDB's time_bucket grid.
    """
    if size_minutes % slide_minutes:
        raise ValueError("size_minutes must be a multiple of slide_minutes")
    if dict(events.dtypes).get(ts_col) == "timestamp_ntz":
        events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    w = F.window(ts_col, f"{size_minutes} minutes", f"{slide_minutes} minutes")
    return (
        events.groupBy(w.alias("w"), F.col(type_col))
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"),
             F.sum(F.col(value_col).cast("decimal(18,2)")).alias("sum_value"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss")
            .alias("window_start"),
            type_col,
            "n_events",
            F.col("sum_value").cast("string").alias("sum_value"),
        )
    )


def retention(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly cohort retention: users grouped by first-seen week
    (cohort), counted in each later week they were active —
    (cohort_week, week_offset, n_users), the classic retention matrix.

    Three combinable aggregations, no windows: distinct (user, week)
    collapses activity first (shuffle volume = active user-weeks, not
    events), the per-user min gives the cohort, and the final count
    groups the join result. All shuffles key on the user or the
    (cohort, offset) pair.
    """
    if dict(events.dtypes).get(ts_col) == "timestamp_ntz":
        events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    wk = F.date_trunc("week", F.col(ts_col)).cast("date")
    weeks = events.select(F.col(user_col), wk.alias("wk")).distinct()
    first = weeks.groupBy(user_col).agg(F.min("wk").alias("cohort"))
    joined = weeks.join(first, user_col)
    return (
        joined.groupBy(
            "cohort",
            (F.datediff(F.col("wk"), F.col("cohort")) / 7)
            .cast("long").alias("week_offset"))
        .agg(F.count("*").cast("long").alias("n_users"))
        .select(F.col("cohort").cast("string").alias("cohort_week"),
                "week_offset", "n_users")
    )


def value_anomalies(
    events: DataFrame,
    *,
    type_col: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
    z_threshold: float = 3.0,
) -> DataFrame:
    """Per-type z-score anomaly flags: events whose value deviates more
    than ``z_threshold`` population standard deviations from their
    type's mean — the monitoring pass over an event stream.

    Determinism across engines: the per-type moments (count, sum,
    sum-of-squares) are EXACT decimal sums, so mean/std are identical
    doubles on any engine/partitioning — a raw double sum would drift
    in the last bits and flip knife-edge flags. One combinable
    aggregation + a broadcast join back; z is rounded to a 1e-6 grid.
    """
    v = F.col(value_col).cast("decimal(18,2)")
    stats = (
        events.groupBy(type_col)
        .agg(F.count(F.lit(1)).cast("long").alias("__n"),
             F.sum(v).alias("__s"),
             F.sum((v * v).cast("decimal(38,4)")).alias("__ss"))
        .select(
            type_col, "__n",
            (F.col("__s").cast("double") / F.col("__n")).alias("__mean"),
            F.sqrt(F.greatest(
                F.col("__ss").cast("double") / F.col("__n")
                - F.pow(F.col("__s").cast("double") / F.col("__n"),
                        F.lit(2.0)),
                F.lit(0.0))).alias("__std"))
    )
    z = F.when(F.col("__std") > 0,
               F.round((F.col(value_col) - F.col("__mean"))
                       / F.col("__std"), 6)).otherwise(F.lit(0.0))
    return (
        events.join(F.broadcast(stats), type_col)
        .select(F.col(id_col), F.col(type_col), F.col(value_col),
                F.round("__mean", 6).alias("type_mean"),
                F.round("__std", 6).alias("type_std"),
                z.alias("z"),
                (F.abs(z) > z_threshold).alias("anomaly"))
    )
