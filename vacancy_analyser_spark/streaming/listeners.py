"""ST6: freshness metrics as a StreamingQueryListener.

The reference polls for freshness from outside the pipeline: a Prometheus
collector re-lists snapshot dirs, re-queries Postgres max-dates, and probes
WebHDFS on every scrape (metrics_exporter.py:31-96,113-151). The engine
inverts that: queries annotate themselves with ``observe_freshness``
(streaming/windows.py) and this listener receives the observed metrics
per micro-batch — no extra scans, no polling, metrics ride the data path.

``publish`` is the export hook (Prometheus gauge setter, StatsD, a log —
exporter.py ships the two standard bindings: a node_exporter textfile
writer and an HTTP /metrics endpoint, both rendering the reference's
gauge names);
the listener also keeps the latest observation per query name for pull-
style consumers, mirroring the reference's gauges:
``vacancy_lastdata{source}`` → max_event_time, size gauges → rows.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Callable
from typing import Any

from pyspark.sql.streaming import StreamingQueryListener

OBSERVATION_NAME = "freshness"


class FreshnessListener(StreamingQueryListener):
    """Collects the ``freshness`` observation of every progressing query."""

    def __init__(self, publish: Callable[[str, dict[str, Any]], None] | None = None) -> None:
        #: query name (or id) → latest observation + staleness at receipt
        self.latest: dict[str, dict[str, Any]] = {}
        self._publish = publish

    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        progress = event.progress
        obs = (progress.observedMetrics or {}).get(OBSERVATION_NAME)
        if obs is None:
            return
        max_ts = obs["max_event_time"]
        record = {
            "max_event_time": max_ts,
            "rows": obs["rows"],
            "batch_id": progress.batchId,
            # the reference's staleness-in-days gauge (metrics_exporter.py:123-127)
            "staleness_s": (
                (dt.datetime.now(dt.timezone.utc).replace(tzinfo=None) - max_ts).total_seconds()
                if max_ts is not None
                else None
            ),
        }
        key = progress.name or str(progress.id)
        self.latest[key] = record
        if self._publish is not None:
            self._publish(key, record)

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass


class WatermarkDropListener(StreamingQueryListener):
    """Accumulates ``numRowsDroppedByWatermark`` per query across the WHOLE
    stream lifetime — the durable form of the ST1 drop-late metric.

    ``late_drop_count`` (streaming/windows.py) sums the query's
    ``recentProgress``, which Spark caps at
    ``spark.sql.streaming.numRecentProgressUpdates`` (default 100)
    micro-batches and clears on restart — right for tests and short jobs,
    an undercount on a long-running stream. This listener receives every
    progress event exactly once and adds the per-operator drop counts into
    a monotone counter, so an alerting export sees the true total no
    matter how many batches ran (checkpoint-restart resets it like any
    process-local counter — export deltas, as Prometheus counters do)."""

    def __init__(self, publish: Callable[[str, int], None] | None = None) -> None:
        #: query name (or id) → total rows dropped as later-than-watermark
        self.dropped: dict[str, int] = {}
        self._publish = publish

    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        from .windows import batch_drop_count

        progress = event.progress
        batch_drops = batch_drop_count(progress)
        if batch_drops == 0:
            return
        key = progress.name or str(progress.id)
        self.dropped[key] = self.dropped.get(key, 0) + batch_drops
        if self._publish is not None:
            self._publish(key, self.dropped[key])

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass
