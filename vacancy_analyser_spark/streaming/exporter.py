"""Prometheus export for the observed streaming metrics (SURVEY §2.8 ST6,
reference parity: metrics_exporter.py:113-151).

The reference runs a standalone collector that re-scans its stores on every
scrape and serves ``vacancy_lastdata{source}`` (staleness in days),
row/size gauges, and service-up probes over ``start_http_server(9144)``.
The engine's listeners (listeners.py) already observe the same facts ON the
data path; this module is the missing last inch — turning
``FreshnessListener.latest`` into actual Prometheus exposition text, via
either of the two standard transports:

- **textfile**: atomic write of a ``.prom`` file for node_exporter's
  textfile collector (write-to-tmp + rename, so a scrape never reads a
  half-written file). Zero extra daemons; right for batch/replay jobs.
- **HTTP**: a stdlib ``http.server`` thread serving the same rendering —
  the shape of the reference's ``start_http_server``. Right for
  long-running streams; no third-party client library required.

Gauge-name parity with the reference (tested):

    vacancy_lastdata{source="<query>"}  staleness, fractional DAYS
    vacancy_rows{source="<query>"}      rows in the latest micro-batch
    vacancy_late_dropped_total{source}  WatermarkDropListener counter

Wiring: ``TextfileExporter`` IS a valid ``publish`` hook for
``FreshnessListener`` — each publish re-renders the full gauge set from the
record store, so the file is always a complete, consistent scrape."""

from __future__ import annotations

import http.server
import os
import tempfile
import threading
from typing import Any

#: Reference gauge name (metrics_exporter.py:113: GaugeMetricFamily
#: "vacancy_lastdata", "Last vacancy data update in days from now").
LASTDATA = "vacancy_lastdata"
ROWS = "vacancy_rows"
DROPPED = "vacancy_late_dropped_total"

_SECONDS_PER_DAY = 86_400.0


def _escape(label: str) -> str:
    return label.replace("\\", r"\\").replace('"', r'\"').replace("\n", r"\n")


def _fmt(value: float | int) -> str:
    # Prometheus exposition renders integers bare; floats with repr-precision
    if isinstance(value, bool):
        return str(int(value))
    if isinstance(value, int):
        return str(value)
    return repr(float(value))


def render_prometheus(
    latest: dict[str, dict[str, Any]],
    dropped: dict[str, int] | None = None,
) -> str:
    """Exposition-format text for the listeners' current state.

    ``latest`` is ``FreshnessListener.latest`` (query name → record with
    ``staleness_s``/``rows``); ``dropped`` is
    ``WatermarkDropListener.dropped``. Sources render sorted so the output
    is deterministic for tests and for diff-based scrape debugging."""
    lines = [
        f"# HELP {LASTDATA} Last vacancy data update in days from now",
        f"# TYPE {LASTDATA} gauge",
    ]
    for name in sorted(latest):
        staleness_s = latest[name].get("staleness_s")
        if staleness_s is None:
            continue
        lines.append(
            f'{LASTDATA}{{source="{_escape(name)}"}} {_fmt(staleness_s / _SECONDS_PER_DAY)}'
        )
    lines += [f"# HELP {ROWS} Rows in the latest micro-batch", f"# TYPE {ROWS} gauge"]
    for name in sorted(latest):
        rows = latest[name].get("rows")
        if rows is not None:
            lines.append(f'{ROWS}{{source="{_escape(name)}"}} {_fmt(int(rows))}')
    if dropped:
        lines += [
            f"# HELP {DROPPED} Rows dropped as later than the watermark",
            f"# TYPE {DROPPED} counter",
        ]
        for name in sorted(dropped):
            lines.append(f'{DROPPED}{{source="{_escape(name)}"}} {_fmt(int(dropped[name]))}')
    return "\n".join(lines) + "\n"


class TextfileExporter:
    """``publish`` hook that keeps a node_exporter textfile up to date.

    Callable with the FreshnessListener publish signature ``(name,
    record)``; every call folds the record into the store and atomically
    rewrites ``path`` with the full rendering. ``attach_drops`` accepts a
    WatermarkDropListener whose counters render alongside."""

    def __init__(self, path: str) -> None:
        self.path = path
        self._latest: dict[str, dict[str, Any]] = {}
        self._dropped: dict[str, int] | None = None
        self._lock = threading.Lock()

    def attach_drops(self, drop_listener) -> None:
        self._dropped = drop_listener.dropped

    def __call__(self, name: str, record: dict[str, Any]) -> None:
        with self._lock:
            self._latest[name] = record
            # snapshot: attach_drops keeps a reference to the listener's
            # LIVE dict, which the listener-bus thread mutates — HttpExporter
            # snapshots for exactly this race; render from a copy here too
            dropped = dict(self._dropped) if self._dropped is not None else None
            text = render_prometheus(self._latest, dropped)
            d = os.path.dirname(os.path.abspath(self.path))
            fd, tmp = tempfile.mkstemp(dir=d, suffix=".prom.tmp")
            try:
                with os.fdopen(fd, "w") as f:
                    f.write(text)
                os.replace(tmp, self.path)  # atomic on POSIX: scrapes never tear
            finally:
                if os.path.exists(tmp):
                    os.unlink(tmp)


class HttpExporter:
    """Minimal ``/metrics`` endpoint over a stdlib HTTP server thread — the
    reference's ``start_http_server(9144)`` shape without the prometheus
    client dependency. Same publish-hook contract as TextfileExporter."""

    def __init__(self, port: int = 0, host: str = "127.0.0.1") -> None:
        self._latest: dict[str, dict[str, Any]] = {}
        self._dropped: dict[str, int] | None = None
        self._lock = threading.Lock()
        exporter = self

        class Handler(http.server.BaseHTTPRequestHandler):
            def do_GET(self) -> None:  # noqa: N802 (stdlib API)
                if self.path.rstrip("/") not in ("", "/metrics"):
                    self.send_error(404)
                    return
                with exporter._lock:
                    # snapshot the drop counters: the listener-bus thread
                    # mutates the live dict mid-scrape; dict() is a single
                    # C-level copy (atomic under the GIL), unlike the
                    # Python-level iteration inside render_prometheus
                    dropped = (
                        dict(exporter._dropped) if exporter._dropped is not None else None
                    )
                    body = render_prometheus(exporter._latest, dropped).encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/plain; version=0.0.4")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *a) -> None:  # silence per-scrape stderr
                pass

        self._server = http.server.ThreadingHTTPServer((host, port), Handler)
        self.port = self._server.server_address[1]
        self._thread = threading.Thread(target=self._server.serve_forever, daemon=True)
        self._thread.start()

    def attach_drops(self, drop_listener) -> None:
        self._dropped = drop_listener.dropped

    def __call__(self, name: str, record: dict[str, Any]) -> None:
        with self._lock:
            self._latest[name] = record

    def close(self) -> None:
        self._server.shutdown()
        self._server.server_close()
