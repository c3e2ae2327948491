"""Streaming drift/outlier monitor: prequential z-score over a stateful
running mean/variance per event type — the streaming twin of
``value_zscore_outliers`` (plans/behavior.py).

Prequential semantics (test-then-train, the standard online-monitoring
contract): each arriving event is scored against the statistics of all
PREVIOUS micro-batches only, then the batch is folded into state. Scoring
before folding is what makes the operator deterministic: flags cannot
depend on the nondeterministic row order within the current batch, and an
alert fires against a stable baseline rather than one the offending batch
itself has already contaminated.

State is (version, count, mean, M2) per event type — O(|types|) rows
total, the smallest useful sketch (Welford's running form; see
streaming_zscore's docstring for why not raw sums). The batch fold sorts by event_id first, so the
float accumulation order is a deterministic function of the data and the
batch boundaries (pinned by replay in tests/test_streaming.py). At scale
this runs exactly like the other stateful operators: RocksDB-backed state,
one shuffle on the group key per micro-batch, and the per-(type, day)
drift variant widens the key without changing the shape.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Iterator

from pyspark.sql import DataFrame

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState

OUTPUT_SCHEMA = "event_id bigint, event_type string, value double, zscore double"
#: CHECKPOINT COMPATIBILITY: the (n, mean, m2) Welford layout replaced
#: (n, s, s2) in r4 — positionally identical (bigint, double, double), so
#: a stream RESUMED from a pre-change checkpoint would silently have read
#:  Σv as the mean. The leading version field (r5) makes that failure
#: LOUD twice over: the 4-field layout is arity-incompatible with any
#: 3-field checkpoint (Spark's state-schema compatibility check rejects
#: the resume at query start), and ``update`` validates the stored
#: version besides, covering deployments that disable the schema check.
#: Bump _STATE_VER on ANY future change to the fields' meaning, even a
#: layout-preserving one.
STATE_SCHEMA = "ver bigint, n bigint, mean double, m2 double"
_STATE_VER = 2


def streaming_zscore(events: DataFrame, limit: float = 3.0) -> DataFrame:
    """Append-mode stream of (event_id, event_type, value, zscore) rows
    whose value sits more than ``limit`` standard deviations from the
    running mean of their event type at the time the batch arrives.

    State is the Welford running form (n, mean, M2), not raw
    (n, Σv, Σv²): on long streams with large means the naive
    var = s2/n − mean² cancels catastrophically — it can drift to ≤ 0 and
    silently disable scoring for that event type forever. Welford's M2 is
    nonnegative by construction, so var == 0 now means the values really
    are constant (scoring is genuinely undefined), never lost precision."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(
        key: tuple, pdfs: Iterator["pd.DataFrame"], state: "GroupState"
    ) -> Iterator["pd.DataFrame"]:
        import numpy as np

        ver, n, mean_st, m2 = state.get if state.exists else (_STATE_VER, 0, 0.0, 0.0)
        if ver != _STATE_VER:
            raise ValueError(
                f"monitor state version {ver} != expected {_STATE_VER}: "
                "this checkpoint was written by an incompatible state "
                "layout — restart from a fresh checkpoint (state rebuilds "
                "from the stream)"
            )
        batch = pd.concat(list(pdfs), ignore_index=True)
        # NULL/non-finite values are dropped BEFORE scoring and folding —
        # the batch twin's SQL SUM/COUNT skip nulls, and one NaN folded
        # into (s, s2) would poison the state forever (var = NaN → the
        # monitor silently never flags this type again)
        batch = batch[np.isfinite(batch["value"].astype("float64"))]
        # deterministic fold order: the shuffle's intra-group row order is
        # not stable, the data's own key is
        batch = batch.sort_values("event_id", ignore_index=True)
        out = []
        if n > 1:
            mean = mean_st
            var = m2 / n  # population variance; M2 ≥ 0 by construction
            if var > 0.0:
                std = var**0.5
                z = (batch["value"] - mean) / std
                hit = z.abs() > limit
                out = [
                    pd.DataFrame(
                        {
                            "event_id": batch.loc[hit, "event_id"],
                            "event_type": key[0],
                            "value": batch.loc[hit, "value"],
                            "zscore": z[hit].round(6),
                        }
                    )
                ]
        for v in batch["value"]:
            v = float(v)
            n += 1
            d = v - mean_st
            mean_st += d / n
            m2 += d * (v - mean_st)
        state.update((_STATE_VER, n, mean_st, m2))
        yield from out or [
            pd.DataFrame(
                {
                    "event_id": pd.Series([], dtype="int64"),
                    "event_type": pd.Series([], dtype="object"),
                    "value": pd.Series([], dtype="float64"),
                    "zscore": pd.Series([], dtype="float64"),
                }
            )
        ]

    return (
        events.select("event_id", "event_type", "value")
        .groupBy("event_type")
        .applyInPandasWithState(
            update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
