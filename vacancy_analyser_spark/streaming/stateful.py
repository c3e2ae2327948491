"""ST5/A6: custom stateful streaming operator via applyInPandasWithState.

The reference keeps imperative per-run tallies — items added/updated/removed
counters (feeder_postgres.py:115-117,151,178,192-194) and a seen-id set
(get_vacancies.py:67-72). Their streaming generalization is a keyed running
aggregate that survives micro-batches: per key, maintain (count, first_ts,
last_ts) and emit the refreshed row whenever the key appears in a batch.

Built-in windowed aggregation cannot express this (the state is unbounded in
event-time — no window closes it), which is exactly the case the prompt's
operator tiering reserves for ``applyInPandasWithState``: state lives in the
state store (RocksDB/HDFS-backed on a cluster, checkpointed), the update
function sees Arrow-batched pandas frames, and output mode ``update`` emits
one row per touched key per micro-batch.

Scale: state size is O(distinct keys × 3 longs) — a running counter, not a
buffer of rows; the state store shards by key hash across executors. The
batch twin (one groupBy) is registered as the oracle-checked
``stateful_dedup`` query (plans/streaming_batch.py) — same semantics on a
static frame.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Iterator

from pyspark.sql import DataFrame

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, first_ts timestamp, last_ts timestamp"
#: (count, first_ts_us, last_ts_us) — microseconds since epoch, matching
#: Spark's internal timestamp precision so no information is lost in state.
STATE_SCHEMA = "n bigint, first_us bigint, last_us bigint"


def running_user_counters(events: DataFrame) -> DataFrame:
    """Running (count, first_ts, last_ts) per ``user_id`` over a stream.

    ``events`` must be a streaming DataFrame with ``user_id`` and a
    timestamp column ``ts``. Emits in ``update`` mode: every micro-batch
    produces the refreshed totals for the keys it touched.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(
        key: tuple, pdfs: Iterator["pd.DataFrame"], state: "GroupState"
    ) -> Iterator["pd.DataFrame"]:
        n, first_us, last_us = state.get if state.exists else (0, None, None)
        for pdf in pdfs:
            if pdf.empty:
                continue
            n += len(pdf)
            ts_us = pdf["ts"].astype("int64") // 1_000  # pandas ns → Spark µs
            lo, hi = int(ts_us.min()), int(ts_us.max())
            first_us = lo if first_us is None else min(first_us, lo)
            last_us = hi if last_us is None else max(last_us, hi)
        state.update((n, first_us, last_us))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "first_ts": [pd.Timestamp(first_us, unit="us")],
                "last_ts": [pd.Timestamp(last_us, unit="us")],
            }
        )

    return events.select("user_id", "ts").groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_user_counters_tws(events: DataFrame) -> DataFrame:
    """The same running counters on Spark 4's transformWithStateInPandas —
    the successor API to applyInPandasWithState: state is named and typed
    per variable (ValueState/ListState/MapState with optional TTL and
    timers) instead of one opaque tuple, and the engine requires the
    RocksDB state store provider, which is also the right provider at
    100 TB (incremental checkpoints, state larger than executor memory).

    Kept semantically identical to ``running_user_counters`` so the test
    can assert the two APIs produce the same totals on the same stream.

    Runtime note: the transformWithState protocol talks protobuf to the
    JVM state server; this container lacks ``google.protobuf``, so the
    equivalence test auto-skips here and the plan-build test runs instead
    (tests/test_streaming.py) — on a real cluster (protobuf ships with
    Spark's requirements) the operator runs as-is.
    """
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class UserCounterProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):  # noqa: N802 (Spark API)
            prev = self._totals.get()
            n, first_us, last_us = prev if prev is not None else (0, None, None)
            for pdf in rows:
                if pdf.empty:
                    continue
                n += len(pdf)
                ts_us = pdf["ts"].astype("int64") // 1_000
                lo, hi = int(ts_us.min()), int(ts_us.max())
                first_us = lo if first_us is None else min(first_us, lo)
                last_us = hi if last_us is None else max(last_us, hi)
            self._totals.update((n, first_us, last_us))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "first_ts": [pd.Timestamp(first_us, unit="us")],
                    "last_ts": [pd.Timestamp(last_us, unit="us")],
                }
            )

        def close(self) -> None:
            pass

    return events.select("user_id", "ts").groupBy("user_id").transformWithStateInPandas(
        UserCounterProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
