"""Cross-batch stateful alerting (SURVEY §2.9, the last 'partial').

The reference's monitor keeps in-process state between ticks — it
alerts on threshold crossings per 5 s poll and its channel back-pressure
implicitly debounces (``realtime_performance_monitor.go:421-481``). The
stateless ladder in ``streaming/alerts.py`` covers the per-epoch filter;
THIS module adds the genuinely stateful policy a production monitor
wants: **alert only after K consecutive breaching epochs** (debounce),
and emit a ``resolved`` row when a breach streak ends.

Spark restatement: ``applyInPandasWithState`` over the per-epoch metric
stream, keyed by (query_id, metric). State = (current streak length,
whether the alert already fired) — a few bytes per key, stored in the
streaming state store, checkpointed, and restored across restarts; the
streak survives micro-batch boundaries, which a stateless filter cannot
express. Arrow-vectorized like every other Python hook in this repo.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

ALERT_SCHEMA = T.StructType(
    [
        T.StructField("query_id", T.StringType()),
        T.StructField("metric", T.StringType()),
        T.StructField("epoch_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("streak", T.IntegerType()),
        T.StructField("event", T.StringType()),  # 'alert' | 'resolved'
    ]
)

# state = (streak length, alert currently firing)
_STATE_SCHEMA = T.StructType(
    [T.StructField("streak", T.IntegerType()), T.StructField("firing", T.BooleanType())]
)


def consecutive_breach_alerts(
    metrics: DataFrame,
    metric_col: str,
    threshold: float,
    k: int = 3,
) -> DataFrame:
    """Streaming transform: one 'alert' row when ``metric_col`` breaches
    ``threshold`` for the K-th consecutive epoch (then stays silent while
    it keeps breaching), one 'resolved' row when the streak ends.

    ``metrics`` is a *streaming* DataFrame with at least
    (query_id, epoch_id, <metric_col>). Epochs are processed in epoch_id
    order within each group; state persists across micro-batches via the
    checkpointed state store, so a streak spanning triggers (or a
    restart) is still detected — the stateless ladder cannot do this.
    """

    def update(
        key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        streak, firing = state.get if state.exists else (0, False)
        rows: list[dict[str, Any]] = []
        batch = pd.concat(list(pdfs), ignore_index=True).sort_values("epoch_id")
        for _, r in batch.iterrows():
            breached = bool(r[metric_col] > threshold)
            if breached:
                streak += 1
                if streak == k and not firing:
                    firing = True
                    rows.append(
                        {
                            "query_id": key[0],
                            "metric": metric_col,
                            "epoch_id": int(r["epoch_id"]),
                            "value": float(r[metric_col]),
                            "streak": int(streak),
                            "event": "alert",
                        }
                    )
            else:
                if firing:
                    rows.append(
                        {
                            "query_id": key[0],
                            "metric": metric_col,
                            "epoch_id": int(r["epoch_id"]),
                            "value": float(r[metric_col]),
                            "streak": int(streak),
                            "event": "resolved",
                        }
                    )
                streak, firing = 0, False
        state.update((int(streak), bool(firing)))
        yield pd.DataFrame(rows, columns=[f.name for f in ALERT_SCHEMA.fields])

    keyed = metrics.select("query_id", F.col("epoch_id").cast("long"), F.col(metric_col))
    return keyed.groupBy("query_id").applyInPandasWithState(
        update,
        outputStructType=ALERT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
