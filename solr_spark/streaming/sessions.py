"""Sessionization: gap-based event sessions, batch + stateful streaming.

The reference's analytics stack expresses sessions client-side over
sorted exports; at 100 TB the right Spark shapes are:

- BATCH (`sessionize`): one shuffle on the user key; the session id is
  a per-user running count of gap breaks (lag + cumulative sum inside
  the same window partition — no second shuffle), then one grouped
  aggregate. Fully SQL-expressible, so the gate oracles it exactly.
- STREAMING (`sessionize_stream`): applyInPandasWithState keyed by
  user — the custom-stateful-operator pattern (SURVEY §streaming):
  state carries (session_start, last_ts, n_events, sum_value); a
  session EMITS when the event-time timeout fires after `gap` with no
  new events for the key. Late data beyond the watermark is dropped by
  the engine, matching the documented contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType, LongType, StringType, StructField, StructType, TimestampType,
)


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: float = 30.0,
) -> DataFrame:
    """(user, session_id, n_events, sum_value, session_start,
    session_end) — a new session starts when the gap since the user's
    previous event exceeds `gap_minutes`. session_id numbers a user's
    sessions from 1 in time order (deterministic; ties broken by the
    full ordering of (ts, event_id) when present)."""
    from pyspark.sql import Window

    order = [F.col(ts_col)] + (
        [F.col("event_id")] if "event_id" in df.columns else []
    )
    w = Window.partitionBy(user_col).orderBy(*order)
    gap_s = gap_minutes * 60.0
    # NTZ timestamps refuse a direct double cast (Spark 4); the ltz hop
    # is a no-op under the session's pinned UTC timezone
    secs = F.col(ts_col).cast("timestamp").cast("double")
    prev = F.lag(secs).over(w)
    is_break = F.when(
        prev.isNull() | (secs - prev > gap_s), F.lit(1)
    ).otherwise(F.lit(0))
    with_sid = df.withColumn(
        "session_id", F.sum(is_break).over(w).cast("long")
    )
    agg = [
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
    ]
    if "value" in df.columns:
        agg.append(F.round(F.sum("value"), 4).alias("sum_value"))
    return (
        with_sid.groupBy(F.col(user_col).alias("user_id"), "session_id")
        .agg(*agg)
        .orderBy("user_id", "session_id")
    )


def sessionize_sql(
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: float = 30.0,
    table: str = "events",
) -> str:
    """DuckDB twin of `sessionize` (same lag + running-sum formulation)."""
    gap_s = gap_minutes * 60.0
    return f"""
WITH brk AS (
  SELECT {user_col}, {ts_col}, value,
         CASE WHEN lag({ts_col}) OVER w IS NULL
                   OR epoch({ts_col}) - epoch(lag({ts_col}) OVER w) > {gap_s}
              THEN 1 ELSE 0 END AS is_break
  FROM {table}
  WINDOW w AS (PARTITION BY {user_col} ORDER BY {ts_col}, event_id)
),
sid AS (
  SELECT {user_col}, {ts_col}, value,
         sum(is_break) OVER (PARTITION BY {user_col} ORDER BY {ts_col}
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
           AS session_id
  FROM brk
)
SELECT {user_col} AS user_id, session_id,
       count(*) AS n_events,
       min({ts_col}) AS session_start,
       max({ts_col}) AS session_end,
       round(sum(value), 4) AS sum_value
FROM sid GROUP BY {user_col}, session_id
ORDER BY user_id, session_id
"""


SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("start_s", DoubleType()),
        StructField("last_s", DoubleType()),
        StructField("n", LongType()),
        StructField("sv", DoubleType()),
    ]
)


def sessionize_stream(
    stream: DataFrame,
    gap_minutes: float = 30.0,
    watermark: str = "2 hours",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Stateful streaming sessionization (applyInPandasWithState keyed
    by user, EventTimeTimeout): a session row emits when `gap_minutes`
    of event time pass with no new events for the key. State per key is
    four scalars — bounded regardless of stream length."""
    import pandas as pd

    gap_ms = int(gap_minutes * 60_000)

    def fn(key, pdfs, state):
        from pyspark.sql.streaming.state import GroupStateTimeout  # noqa: F401

        (uid,) = key
        rows = []
        if state.hasTimedOut:
            start_s, last_s, n, sv = state.get
            rows.append(
                (
                    uid,
                    pd.Timestamp(start_s, unit="s"),
                    pd.Timestamp(last_s, unit="s"),
                    int(n),
                    round(float(sv), 4),
                )
            )
            state.remove()
        else:
            ts_vals, vals = [], []
            for pdf in pdfs:
                ts_vals.extend(pdf[ts_col].astype("int64") / 1e9)
                vals.extend(pdf["value"].astype(float))
            if ts_vals:
                order = sorted(range(len(ts_vals)), key=lambda i: ts_vals[i])
                ts_sorted = [ts_vals[i] for i in order]
                v_sorted = [vals[i] for i in order]
                if state.exists:
                    start_s, last_s, n, sv = state.get
                else:
                    start_s, last_s, n, sv = ts_sorted[0], ts_sorted[0], 0, 0.0
                for t, v in zip(ts_sorted, v_sorted):
                    if t - last_s > gap_ms / 1000.0:
                        rows.append(
                            (
                                uid,
                                pd.Timestamp(start_s, unit="s"),
                                pd.Timestamp(last_s, unit="s"),
                                int(n),
                                round(float(sv), 4),
                            )
                        )
                        start_s, n, sv = t, 0, 0.0
                    last_s = max(last_s, t)
                    n += 1
                    sv += v
                state.update((start_s, last_s, n, sv))
                state.setTimeoutTimestamp(int(last_s * 1000) + gap_ms)
        yield pd.DataFrame(
            rows,
            columns=[
                "user_id", "session_start", "session_end", "n_events",
                "sum_value",
            ],
        )

    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(user_col)
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf="EventTimeTimeout",
        )
    )
