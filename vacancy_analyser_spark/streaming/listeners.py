"""ST6: freshness metrics as a StreamingQueryListener.

The reference polls for freshness from outside the pipeline: a Prometheus
collector re-lists snapshot dirs, re-queries Postgres max-dates, and probes
WebHDFS on every scrape (metrics_exporter.py:31-96,113-151). The engine
inverts that: queries annotate themselves with ``observe_freshness``
(streaming/windows.py) and this listener receives the observed metrics
per micro-batch — no extra scans, no polling, metrics ride the data path.

``publish`` is the export hook (Prometheus gauge setter, StatsD, a log);
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
