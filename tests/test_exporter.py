"""Metrics export parity (reference: metrics_exporter.py:113-151): the
observed streaming metrics must reach an actual Prometheus surface — a
node_exporter textfile and an HTTP /metrics endpoint — with the reference's
gauge names (``vacancy_lastdata{source}`` = staleness in days)."""

from __future__ import annotations

import datetime as dt
import urllib.request

from vacancy_analyser_spark.streaming.exporter import (
    HttpExporter,
    TextfileExporter,
    render_prometheus,
)
from vacancy_analyser_spark.streaming.listeners import FreshnessListener


def _record(staleness_s: float, rows: int) -> dict:
    return {
        "max_event_time": dt.datetime(2024, 1, 2, 6),
        "rows": rows,
        "batch_id": 0,
        "staleness_s": staleness_s,
    }


def test_render_matches_reference_gauge_names():
    text = render_prometheus(
        {"db": _record(2 * 86_400.0, 7), "file": _record(86_400.0, 3)},
        dropped={"db": 4},
    )
    lines = text.splitlines()
    # reference gauge: vacancy_lastdata{source} in DAYS from now
    assert 'vacancy_lastdata{source="db"} 2.0' in lines
    assert 'vacancy_lastdata{source="file"} 1.0' in lines
    assert 'vacancy_rows{source="db"} 7' in lines
    assert 'vacancy_late_dropped_total{source="db"} 4' in lines
    assert "# TYPE vacancy_lastdata gauge" in lines
    assert "# TYPE vacancy_late_dropped_total counter" in lines
    # deterministic ordering: sources sorted within each family
    assert lines.index('vacancy_lastdata{source="db"} 2.0') < lines.index(
        'vacancy_lastdata{source="file"} 1.0'
    )


def test_render_escapes_labels_and_skips_null_staleness():
    text = render_prometheus({'we"ird\nname': {"rows": 1, "staleness_s": None}})
    assert 'vacancy_rows{source="we\\"ird\\nname"} 1' in text
    assert "vacancy_lastdata{source=" not in text  # no staleness → no gauge


def test_textfile_exporter_atomic_full_rewrite(tmp_path):
    path = str(tmp_path / "vacancy.prom")
    export = TextfileExporter(path)
    export("db", _record(86_400.0, 5))
    export("file", _record(43_200.0, 2))
    content = open(path).read()
    assert 'vacancy_lastdata{source="db"} 1.0' in content
    assert 'vacancy_lastdata{source="file"} 0.5' in content
    assert content.endswith("\n")
    # no tmp litter from the atomic rename protocol
    assert [p.name for p in tmp_path.iterdir()] == ["vacancy.prom"]


def test_http_exporter_serves_metrics():
    export = HttpExporter(port=0)
    try:
        export("stream_a", _record(86_400.0, 9))
        body = urllib.request.urlopen(
            f"http://127.0.0.1:{export.port}/metrics", timeout=5
        ).read().decode()
        assert 'vacancy_lastdata{source="stream_a"} 1.0' in body
        assert 'vacancy_rows{source="stream_a"} 9' in body
    finally:
        export.close()


def test_exporter_wired_to_replayed_stream(spark, tmp_path):
    """End-to-end: a replayed stream's observed metrics land in the
    textfile with the reference gauge names and values that match the
    listener's own record store."""
    import time as _time

    from vacancy_analyser_spark.streaming.windows import observe_freshness

    prom = str(tmp_path / "vacancy.prom")
    export = TextfileExporter(prom)
    listener = FreshnessListener(publish=export)
    spark.streams.addListener(listener)
    try:
        rows = [
            (1, dt.datetime(2024, 1, 1, 5), 10, "click", 1.0),
            (2, dt.datetime(2024, 1, 2, 6), 11, "view", 2.0),
        ]
        src = str(tmp_path / "events_exp")
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
        )
        df.write.mode("append").parquet(src)
        stream = spark.readStream.schema(df.schema).parquet(src)
        q = (
            observe_freshness(stream)
            .writeStream.format("memory")
            .queryName("exp_out")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt_exp"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        for _ in range(100):  # listener delivery is async
            if listener.latest:
                break
            _time.sleep(0.1)
        content = open(prom).read()
        rec = listener.latest["exp_out"]
        days = repr(rec["staleness_s"] / 86_400.0)
        assert f'vacancy_lastdata{{source="exp_out"}} {days}' in content
        assert 'vacancy_rows{source="exp_out"} 2' in content
    finally:
        spark.streams.removeListener(listener)
