"""Time-series joins Spark lacks as built-ins: as-of join and
range-containment (interval) join, both expressed with shuffle-safe
compositions of existing operators — no BroadcastNestedLoopJoin, no
per-row Python.

Beyond the reference surface (SURVEY §2.4 notes it has no theta/range/
as-of joins); these are the joins a feature-engineering pipeline over a
100 TB event log needs.

Scale posture:
  * asof_join: ONE shuffle on the `by` keys via the classic
    union-and-running-last trick — no range predicate ever reaches a
    join operator (Spark would nested-loop it). All rows of one key
    land in one task for the time ordering (inherent to per-key
    as-of semantics); for a pathological hot key, pre-split by coarse
    time chunk and stitch chunk boundaries.
  * interval_bucket_join: each interval explodes over the fixed-width
    time buckets it covers, then an EQUI-join on (keys…, bucket)
    followed by the exact containment filter. A left row owns exactly
    one bucket, so no post-join dedup is needed. Bucket width trades
    explode factor against join selectivity; set it near the typical
    interval length.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _as_timestamp(df: DataFrame, col: str) -> DataFrame:
    # TIMESTAMP_NTZ (parquet timestamps without zone) lacks long casts;
    # the session tz is UTC so the hop is value-preserving
    if dict(df.dtypes).get(col) == "timestamp_ntz":
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str = "ts",
    by: Sequence[str] = ("user_id",),
    right_cols: Sequence[str] = ("value",),
    prefix: str = "asof_",
    direction: str = "backward",
    chunk_seconds: int | None = None,
) -> DataFrame:
    """For every left row, attach the single right row with the largest
    ``on`` ≤ left's ``on`` (direction="backward"; "forward" = smallest
    ≥), matching on the ``by`` keys — DuckDB/pandas ``ASOF JOIN``
    semantics, left-outer: unmatched left rows keep NULL right columns.

    Implementation: tag and union both sides, then one running
    ``last(payload, ignorenulls=True)`` window per key ordered by time
    (right rows sort before left rows at equal timestamps, making the
    match inclusive). The window's running frame streams — rows are
    never buffered beyond the frame boundary — and the only shuffle is
    the partitionBy on the keys.

    If multiple right rows share (keys…, on), the last one in that
    group wins nondeterministically — pre-aggregate the right side to
    one row per (keys…, on) for deterministic output.

    ``chunk_seconds`` is the hot-key mitigation: the window partitions
    by (keys…, coarse time chunk) instead of the keys alone, so a
    celebrity key's rows spread over ``n_chunks`` tasks instead of
    stalling one. Boundary stitching: the last right payload of each
    (key, chunk) is reduced to a per-chunk summary (combinable
    ``max_by`` — tiny), a running window over those summaries computes
    each chunk's carry-in, and the carry-in is injected as a synthetic
    right row ordered before everything in its chunk. Output is
    identical to the unchunked path. Pick a chunk width that yields
    thousands of chunks across the hot key's time range.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    by = list(by)
    left = _as_timestamp(left, on)
    right = _as_timestamp(right, on)

    payload = F.struct(
        F.col(on).alias(f"{prefix}{on}"),
        *[F.col(c).alias(f"{prefix}{c}") for c in right_cols],
    )
    payload_t = right.select(payload.alias("p")).schema["p"].dataType
    row = F.struct(*[F.col(c) for c in left.columns])
    row_t = left.select(row.alias("r")).schema["r"].dataType

    l_t = left.select(
        *[F.col(c) for c in by],
        F.col(on).alias("__on"),
        F.lit(1).alias("__is_left"),
        row.alias("__row"),
        F.lit(None).cast(payload_t).alias("__p"),
    )
    r_t = right.select(
        *[F.col(c) for c in by],
        F.col(on).alias("__on"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(row_t).alias("__row"),
        payload.alias("__p"),
    )
    order = F.col("__on").asc() if direction == "backward" else F.col("__on").desc()
    if chunk_seconds is None:
        w = (
            Window.partitionBy(*by)
            # right rows first at equal __on → the match is inclusive
            .orderBy(order, F.col("__is_left").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        filled = l_t.unionByName(r_t).withColumn(
            "__last", F.last("__p", ignorenulls=True).over(w))
        return filled.where(F.col("__is_left") == 1).select(
            "__row.*", "__last.*")

    # ---- hot-key chunked path ----
    cs = float(chunk_seconds)
    backward = direction == "backward"

    def chunked(df: DataFrame) -> DataFrame:
        return df.withColumn(
            "__c", F.floor(F.col("__on").cast("double") / cs).cast("long"))

    l_c, r_c = chunked(l_t), chunked(r_t)
    # per-(key, chunk) best right payload: the one a row in a LATER
    # chunk would match — combinable agg, one tiny row per populated
    # chunk (max_by on __on picks the latest for backward, earliest for
    # forward; ties resolve arbitrarily, matching the unchunked path's
    # documented nondeterminism on duplicate (key, on) right rows)
    pick = F.max_by if backward else F.min_by
    summaries = r_c.groupBy(*by, "__c").agg(
        pick("__p", F.col("__on")).alias("__chunk_best"))
    # every (key, chunk) that holds a LEFT row needs a carry-in defined,
    # even when no right row shares the chunk. One FULL OUTER join gives
    # exactly the union of both (key, chunk) sets with __chunk_best
    # attached (summaries is unique per key by construction) — the old
    # union+distinct+left-join shape re-shuffled the summary rows twice
    # (guide §2.4); both sides here arrive already hash-partitioned on
    # the join key (distinct / groupBy), so the join adds no exchange.
    frame = l_c.select(*by, "__c").distinct()
    order_c = F.col("__c").asc() if backward else F.col("__c").desc()
    wc = (Window.partitionBy(*by).orderBy(order_c)
          .rowsBetween(Window.unboundedPreceding, -1))
    carries = (
        frame.join(summaries, [*by, "__c"], "full_outer")
        .withColumn("__carry", F.last("__chunk_best", ignorenulls=True).over(wc))
        .where(F.col("__carry").isNotNull())
    )
    # synthetic right row per (key, chunk): pinned to the chunk edge the
    # scan enters from (start for backward, end for forward) with
    # __is_left=-1 so a REAL right row at the exact same timestamp still
    # wins the running last
    edge = (F.col("__c") * F.lit(cs)) if backward else \
           ((F.col("__c") + 1) * F.lit(cs))
    on_type = dict(l_t.dtypes)["__on"]
    edge_on = (F.timestamp_seconds(edge) if on_type.startswith("timestamp")
               else edge).cast(on_type)
    synth = carries.select(
        *by,
        edge_on.alias("__on"),
        F.lit(-1).alias("__is_left"),
        F.lit(None).cast(row_t).alias("__row"),
        F.col("__carry").alias("__p"),
        F.col("__c"),
    )
    w = (
        Window.partitionBy(*by, "__c")
        .orderBy(order, F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l_c.unionByName(r_c).unionByName(synth).withColumn(
        "__last", F.last("__p", ignorenulls=True).over(w))
    return filled.where(F.col("__is_left") == 1).select("__row.*", "__last.*")


def interval_bucket_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str = "ts",
    start: str = "start_ts",
    end: str = "end_ts",
    by: Sequence[str] = ("user_id",),
    bucket_seconds: int = 600,
) -> DataFrame:
    """Inner range-containment join: left rows with ``start ≤ on ≤ end``
    against each right interval sharing the ``by`` keys.

    Spark executes a raw inequality join as a nested loop; instead each
    interval is exploded over the fixed-width time buckets it covers
    and the join becomes an equi-join on (keys…, bucket) plus the exact
    containment filter. Every left row owns exactly one bucket, so each
    qualifying (left, interval) pair appears exactly once — no dedup
    shuffle. Degenerate giant intervals explode into many buckets;
    clamp ``bucket_seconds`` near the typical interval width.

    Output: all left columns plus the right side's non-key columns.
    """
    by = list(by)
    left = _as_timestamp(left, on)
    right = _as_timestamp(right, start)
    right = _as_timestamp(right, end)

    bs = F.lit(int(bucket_seconds))
    l_b = left.withColumn("__b", (F.col(on).cast("long") / bs).cast("long"))
    r_b = right.withColumn(
        "__b",
        F.explode(F.sequence(
            (F.col(start).cast("long") / bs).cast("long"),
            (F.col(end).cast("long") / bs).cast("long"),
        )),
    )
    joined = l_b.join(r_b, [*by, "__b"]).where(
        (F.col(on) >= F.col(start)) & (F.col(on) <= F.col(end)))
    right_extra = [c for c in right.columns if c not in by]
    return joined.select(*left.columns, *right_extra)
