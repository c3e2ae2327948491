"""Structured Streaming tests: snapshot-merge stream (D2), windowed aggs
(ST2-ST4), stateful dedup (ST5) — real readStream/writeStream with file
sources, Trigger.AvailableNow, and checkpoints in tmp dirs."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from vacancy_analyser_spark.streaming.snapshot_stream import (
    ParquetStateStore,
    start_snapshot_merge_stream,
)
from vacancy_analyser_spark.streaming.windows import (
    deduplicate,
    session_counts,
    tumbling_counts,
)

SNAP_DDL = "id long, name string, salary long, archived boolean"


def _write_snapshot(spark, root, date_str, rows):
    (
        spark.createDataFrame(rows, SNAP_DDL)
        .write.mode("overwrite")
        .parquet(f"{root}/snapshot_date={date_str}")
    )


def _events(spark, rows):
    return spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long, event_type string, value double")


TS = dt.datetime


def test_snapshot_merge_stream(spark, tmp_path):
    from pyspark.sql import types as T

    schema = T.StructType.fromDDL(SNAP_DDL)
    root = str(tmp_path / "snaps")
    store = ParquetStateStore(str(tmp_path / "state"))
    ckpt = str(tmp_path / "ckpt")

    _write_snapshot(spark, root, "2024-01-01", [(1, "dev", 100, False), (2, "ops", 200, False)])
    q = start_snapshot_merge_stream(spark, root, store, ckpt, schema)
    q.awaitTermination(120)

    state1 = {r["id"]: r.asDict() for r in store.read(spark).collect()}
    assert set(state1) == {1, 2}
    assert state1[1]["added_at"] == dt.date(2024, 1, 1)

    # second snapshot: salary update for 1, removal of 2, insert of 3
    _write_snapshot(spark, root, "2024-01-08", [(1, "dev", 150, False), (3, "qa", 300, False)])
    q = start_snapshot_merge_stream(spark, root, store, ckpt, schema)
    q.awaitTermination(120)

    state2 = {r["id"]: r.asDict() for r in store.read(spark).collect()}
    assert state2[1]["salary"] == 150 and state2[1]["updated_at"] == dt.date(2024, 1, 8)
    assert state2[2]["removed_at"] == dt.date(2024, 1, 8)
    assert state2[3]["added_at"] == dt.date(2024, 1, 8)
    # checkpoint = exactly-once: re-running with no new files is a no-op
    q = start_snapshot_merge_stream(spark, root, store, ckpt, schema)
    q.awaitTermination(120)
    state3 = {r["id"]: r.asDict() for r in store.read(spark).collect()}
    assert state3 == state2


def test_tumbling_stream_matches_batch(spark, tmp_path):
    rows = [
        (1, TS(2024, 1, 1, 5), 10, "click", 1.0),
        (2, TS(2024, 1, 1, 7), 11, "click", 2.0),
        (3, TS(2024, 1, 2, 5), 10, "view", 3.0),
        (4, TS(2024, 1, 3, 5), 12, "click", 4.0),
    ]
    src = str(tmp_path / "events")
    _events(spark, rows).repartition(2).write.mode("overwrite").parquet(src)

    batch = sorted(map(tuple, tumbling_counts(_events(spark, rows)).collect()))

    stream = spark.readStream.schema(_events(spark, rows).schema).parquet(src)
    q = (
        tumbling_counts(stream)
        .writeStream.format("memory")
        .queryName("tumbling_out")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = sorted(map(tuple, spark.sql("select * from tumbling_out").collect()))
    assert streamed == batch


def test_streaming_dedup_within_watermark(spark, tmp_path):
    src = str(tmp_path / "events")
    # same event_id appears in two separate files (micro-batches may differ)
    _events(spark, [(1, TS(2024, 1, 1, 5), 10, "click", 1.0)]).write.mode("append").parquet(src)
    _events(spark, [(1, TS(2024, 1, 1, 6), 10, "click", 1.0),
                    (2, TS(2024, 1, 1, 7), 11, "view", 2.0)]).write.mode("append").parquet(src)

    stream = spark.readStream.schema(_events(spark, []).schema).option("maxFilesPerTrigger", 1).parquet(src)
    q = (
        deduplicate(stream, keys=["event_id"], watermark="2 days")
        .writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("select event_id from dedup_out").collect()
    assert sorted(r["event_id"] for r in out) == [1, 2]


def test_watermark_drops_late_rows_with_metric(spark, tmp_path):
    """ST1 end-to-end: a row arriving later than the watermark is DROPPED
    by the engine, the drop is COUNTED (late_drop_count reads Spark's
    numRowsDroppedByWatermark), and the on-time aggregate is untouched.

    Two availableNow runs over one checkpoint make the sequencing
    deterministic: run 1 establishes the watermark (max 10:05 − 10 min =
    09:55, persisted in the checkpoint offset log); run 2 delivers one
    on-time row (10:20) and one row whose whole window closed before the
    watermark (08:30, window 08:00–09:00 < 09:55) — the late one must not
    create or touch any window.

    Both metric paths are pinned: late_drop_count (recentProgress sum —
    exact within its retained-batch window) and WatermarkDropListener
    (the accumulating lifetime counter a long-running stream needs)."""
    from vacancy_analyser_spark.streaming.listeners import WatermarkDropListener

    drop_listener = WatermarkDropListener()
    spark.streams.addListener(drop_listener)
    try:
        _watermark_metric_body(spark, tmp_path, drop_listener)
    finally:
        # never leak the listener into the session-scoped SparkSession
        spark.streams.removeListener(drop_listener)


def _watermark_metric_body(spark, tmp_path, drop_listener) -> None:
    from vacancy_analyser_spark.streaming.windows import late_drop_count

    src = str(tmp_path / "events")
    ckpt = str(tmp_path / "ckpt_late")
    schema = _events(spark, []).schema

    def run():
        # foreachBatch, not the memory sink: only foreachBatch supports
        # resuming from the checkpoint, and watermark recovery across the
        # two runs is the whole point of the fixture
        emitted: list = []
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            tumbling_counts(stream, window="1 hour", watermark="10 minutes")
            .writeStream.foreachBatch(
                lambda df, _bid: emitted.extend(df.collect())
            )
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return q, emitted

    _events(spark, [(1, TS(2024, 1, 1, 10, 0), 1, "click", 1.0),
                    (2, TS(2024, 1, 1, 10, 5), 1, "click", 1.0)]).write.mode("append").parquet(src)
    q1, out1 = run()
    assert late_drop_count(q1) == 0
    assert [(r["window_start"], r["n_events"]) for r in out1] == [(TS(2024, 1, 1, 10, 0), 2)]

    _events(spark, [(3, TS(2024, 1, 1, 10, 20), 1, "click", 1.0),   # on time
                    (4, TS(2024, 1, 1, 8, 30), 1, "click", 1.0)]).write.mode("append").parquet(src)
    q2, out2 = run()

    # the metric: exactly the one late row was dropped, and it is visible
    assert late_drop_count(q2) == 1
    # on-time row updated its window to 3; the 08:00 window never appears
    assert [(r["window_start"], r["n_events"]) for r in out2] == [(TS(2024, 1, 1, 10, 0), 3)]
    # the accumulating listener saw the same single drop (listener events
    # deliver asynchronously — give the bus a moment)
    import time as _time

    for _ in range(50):
        if sum(drop_listener.dropped.values()) >= 1:
            break
        _time.sleep(0.2)
    assert sum(drop_listener.dropped.values()) == 1


def test_session_windows_batch_fixture(spark):
    """Two bursts for user 10 separated by > gap → two sessions; the
    reference has no session concept — hand-computed expectation."""
    rows = [
        (1, TS(2024, 1, 1, 10, 0), 10, "click", 1.0),
        (2, TS(2024, 1, 1, 10, 10), 10, "click", 1.0),
        (3, TS(2024, 1, 1, 12, 0), 10, "click", 1.0),
        (4, TS(2024, 1, 1, 10, 5), 11, "view", 1.0),
    ]
    out = session_counts(_events(spark, rows), gap="30 minutes").collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r["user_id"], []).append(r)
    assert len(by_user[10]) == 2
    first = min(by_user[10], key=lambda r: r["session_start"])
    assert first["n_events"] == 2
    assert first["session_end"] == TS(2024, 1, 1, 10, 40)  # last event + gap
    assert len(by_user[11]) == 1


def test_stateful_running_counters_across_batches(spark, tmp_path):
    """applyInPandasWithState keeps per-key state across micro-batches:
    user 10 appears in both files — the final emitted row must carry the
    accumulated count and the min/max ts across BOTH batches."""
    from vacancy_analyser_spark.streaming.stateful import running_user_counters

    src = str(tmp_path / "events")
    _events(spark, [(1, TS(2024, 1, 1, 5), 10, "click", 1.0),
                    (2, TS(2024, 1, 1, 6), 11, "view", 2.0)]).write.mode("append").parquet(src)
    _events(spark, [(3, TS(2024, 1, 2, 7), 10, "click", 3.0)]).write.mode("append").parquet(src)

    stream = spark.readStream.schema(_events(spark, []).schema).option("maxFilesPerTrigger", 1).parquet(src)
    q = (
        running_user_counters(stream)
        .writeStream.format("memory")
        .queryName("counters_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_state"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql(
        "select * from counters_out order by n_events desc, user_id"
    ).collect()
    # update mode: one row per touched key per batch; the LAST row per key
    # has the running totals. Collapse to the max-count row per user.
    final = {}
    for r in rows:
        if r["user_id"] not in final or r["n_events"] > final[r["user_id"]]["n_events"]:
            final[r["user_id"]] = r
    assert final[10]["n_events"] == 2
    assert final[10]["first_ts"] == TS(2024, 1, 1, 5)
    assert final[10]["last_ts"] == TS(2024, 1, 2, 7)
    assert final[11]["n_events"] == 1


def _tws_available() -> bool:
    # transformWithStateInPandas speaks protobuf to the JVM state server;
    # the container has no google.protobuf, so the runtime path can't run
    # here (pip installs are off-limits). The operator stays import-clean
    # and plan-buildable either way — that part is asserted unconditionally.
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def test_tws_operator_builds_unanalyzed_plan(spark):
    """Even without protobuf the transformWithState operator must compose:
    building the streaming plan (schema resolution, grouping) happens
    JVM-side and catches signature errors early."""
    from vacancy_analyser_spark.streaming.stateful import running_user_counters_tws

    stream = spark.readStream.format("rate").load().select(
        F.col("value").alias("user_id"), F.col("timestamp").alias("ts")
    )
    out = running_user_counters_tws(stream)
    assert out.isStreaming
    assert [f.name for f in out.schema.fields] == ["user_id", "n_events", "first_ts", "last_ts"]


@pytest.mark.skipif(not _tws_available(), reason="google.protobuf not in container")
def test_transform_with_state_matches_apply_in_pandas_with_state(spark, tmp_path):
    """The Spark-4 transformWithStateInPandas processor must produce the
    same running totals as the applyInPandasWithState operator on the same
    two-batch stream. Requires the RocksDB state store provider (which is
    also the provider a 100 TB deployment wants)."""
    from vacancy_analyser_spark.streaming.stateful import running_user_counters_tws

    src = str(tmp_path / "events_tws")
    _events(spark, [(1, TS(2024, 1, 1, 5), 10, "click", 1.0),
                    (2, TS(2024, 1, 1, 6), 11, "view", 2.0)]).write.mode("append").parquet(src)
    _events(spark, [(3, TS(2024, 1, 2, 7), 10, "click", 3.0)]).write.mode("append").parquet(src)

    provider_key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(provider_key, None)
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = spark.readStream.schema(_events(spark, []).schema).option("maxFilesPerTrigger", 1).parquet(src)
        q = (
            running_user_counters_tws(stream)
            .writeStream.format("memory")
            .queryName("tws_out")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt_tws"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    finally:
        if old is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, old)
    rows = spark.sql("select * from tws_out").collect()
    final = {}
    for r in rows:
        if r["user_id"] not in final or r["n_events"] > final[r["user_id"]]["n_events"]:
            final[r["user_id"]] = r
    assert final[10]["n_events"] == 2
    assert final[10]["first_ts"] == TS(2024, 1, 1, 5)
    assert final[10]["last_ts"] == TS(2024, 1, 2, 7)
    assert final[11]["n_events"] == 1


def test_bucketed_state_store_avoids_state_side_shuffle(spark, tmp_path):
    """The repeat-merge join over bucketed state must exchange ONLY the
    snapshot side; plain-parquet state would show two hashpartitioning
    exchanges (one per join input)."""
    import datetime as dtm

    from vacancy_analyser_spark.operators.merge import bootstrap_state, merge_snapshot
    from vacancy_analyser_spark.streaming.snapshot_stream import BucketedStateStore

    store = BucketedStateStore(spark, "state_bucket_test", key="id", n_buckets=4)
    try:
        snap0 = spark.createDataFrame(
            [(i, f"n{i}", 100 + i, False) for i in range(50)], SNAP_DDL
        )
        store.write(bootstrap_state(snap0, dtm.date(2024, 1, 1)))

        snap1 = spark.createDataFrame(
            [(i, f"n{i}x" if i % 7 == 0 else f"n{i}", 100 + i, False) for i in range(5, 55)],
            SNAP_DDL,
        )
        state = store.read()
        merged = merge_snapshot(state, snap1, dtm.date(2024, 1, 8), strict=False)
        plan = merged._jdf.queryExecution().executedPlan().toString()
        n_exchanges = plan.count("Exchange hashpartitioning")
        assert n_exchanges == 1, f"expected snapshot-side exchange only, got {n_exchanges}:\n{plan}"

        # and the merge itself is still correct end-to-end through the store
        store.write(merged)
        final = store.read()
        row = {r["id"]: r for r in final.collect()}
        assert row[0]["removed_at"] == dtm.date(2024, 1, 8)      # dropped from snap1
        assert row[7]["updated_at"] == dtm.date(2024, 1, 8)      # name changed
        assert row[6]["updated_at"] == dtm.date(2024, 1, 1)      # unchanged keeps date
        assert row[54]["added_at"] == dtm.date(2024, 1, 8)       # new id
    finally:
        for t in list(spark.catalog.listTables()):
            if t.name.startswith("state_bucket_test_v"):
                spark.sql(f"DROP TABLE IF EXISTS {t.name}")


def test_sliding_and_session_streams_match_batch(spark, tmp_path):
    """ST3/ST4 under a real stream (two micro-batches) must equal the same
    builder applied to the batch frame — shared-builder equivalence is the
    whole point of streaming/windows.py."""
    from vacancy_analyser_spark.streaming.windows import session_counts, sliding_counts

    rows1 = [(1, TS(2024, 1, 1, 10, 0), 10, "click", 1.0),
             (2, TS(2024, 1, 1, 10, 10), 10, "view", 2.0),
             (3, TS(2024, 1, 2, 9, 0), 11, "click", 4.0)]
    rows2 = [(4, TS(2024, 1, 2, 9, 20), 11, "view", 8.0),
             (5, TS(2024, 1, 3, 15, 0), 10, "click", 16.0)]
    src = str(tmp_path / "events_sl")
    _events(spark, rows1).write.mode("append").parquet(src)
    _events(spark, rows2).write.mode("append").parquet(src)

    batch = _events(spark, rows1 + rows2)
    stream = spark.readStream.schema(batch.schema).option("maxFilesPerTrigger", 1).parquet(src)

    for name, build in [("sliding", lambda df: sliding_counts(df, window="2 days", slide="1 day")),
                        ("session", session_counts)]:
        q = (
            build(stream)
            .writeStream.format("memory")
            .queryName(f"{name}_eq_out")
            .outputMode("complete")
            .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        streamed = sorted(map(tuple, spark.sql(f"select * from {name}_eq_out").collect()))
        expected = sorted(map(tuple, build(batch).collect()))
        assert streamed == expected, name


def test_interval_join_stream_matches_batch(spark, tmp_path):
    """ST7: a real stream-stream join — views and clicks as two readStream
    sources with watermarks, joined on key + time range. Across micro-batch
    boundaries the engine must buffer the view until its click arrives; the
    result must equal the shared builder applied to the batch frames."""
    from vacancy_analyser_spark.streaming.windows import attribution_join

    views = [(1, TS(2024, 1, 1, 10, 0), 10, "view", 1.0),
             (2, TS(2024, 1, 1, 18, 0), 10, "view", 1.0),
             (3, TS(2024, 1, 1, 10, 30), 11, "view", 1.0)]
    clicks = [(4, TS(2024, 1, 1, 11, 0), 10, "click", 1.0),   # matches view 1 only
              (5, TS(2024, 1, 1, 19, 0), 10, "click", 1.0),   # matches view 2 only
              (6, TS(2024, 1, 2, 9, 0), 11, "click", 1.0)]    # outside gap: no match
    vsrc, csrc = str(tmp_path / "views"), str(tmp_path / "clicks")
    # two files per side so the join spans micro-batches
    for r in views:
        _events(spark, [r]).write.mode("append").parquet(vsrc)
    for r in clicks:
        _events(spark, [r]).write.mode("append").parquet(csrc)

    schema = _events(spark, []).schema
    vstream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(vsrc)
    cstream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(csrc)
    q = (
        attribution_join(vstream, cstream, gap="4 hours", watermark="1 day")
        .writeStream.format("memory")
        .queryName("attrib_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_attrib"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = sorted(map(tuple, spark.sql("select * from attrib_out").collect()))
    expected = sorted(map(tuple, attribution_join(
        _events(spark, views), _events(spark, clicks), gap="4 hours"
    ).collect()))
    assert streamed == expected
    assert [(u, v, c) for u, v, c, _ in expected] == [(10, 1, 4), (10, 2, 5)]


def test_freshness_listener_receives_observed_metrics(spark, tmp_path):
    """ST6: metrics ride the data path — the listener must see max event
    time and row count for each micro-batch, no extra scans."""
    import time as _time

    from vacancy_analyser_spark.streaming.listeners import FreshnessListener
    from vacancy_analyser_spark.streaming.windows import observe_freshness

    published = []
    listener = FreshnessListener(publish=lambda name, rec: published.append((name, rec)))
    spark.streams.addListener(listener)
    try:
        rows = [(1, TS(2024, 1, 1, 5), 10, "click", 1.0),
                (2, TS(2024, 1, 2, 6), 11, "view", 2.0)]
        src = str(tmp_path / "events_obs")
        _events(spark, rows).write.mode("append").parquet(src)
        stream = spark.readStream.schema(_events(spark, []).schema).parquet(src)
        q = (
            observe_freshness(stream)
            .writeStream.format("memory")
            .queryName("obs_out")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt_obs"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        for _ in range(100):  # listener delivery is async
            if listener.latest:
                break
            _time.sleep(0.1)
        rec = listener.latest["obs_out"]
        assert rec["rows"] == 2
        assert rec["max_event_time"] == TS(2024, 1, 2, 6)
        assert rec["staleness_s"] > 0
        assert published and published[-1][0] == "obs_out"
    finally:
        spark.streams.removeListener(listener)


def test_streaming_near_dup_matches_batch_lsh(spark, tmp_path, sf_dir):
    """The banded-state streaming near-dup must emit EXACTLY the pair set
    the batch minhash_lsh_dedup computes over the union of the
    micro-batches — state carries earlier batches, the first-agreeing-band
    filter dedups across buckets, and signatures are bit-identical between
    the row-local (streaming) and aggregate (batch) formulations."""
    from vacancy_analyser_spark.plans.dedup import minhash_lsh_dedup
    from vacancy_analyser_spark.streaming.neardup import streaming_near_dup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    # three micro-batches: even doc_ids, odd, then the evens RE-DELIVERED —
    # at-least-once replay must not duplicate pairs or grow state
    src = str(tmp_path / "docs_stream")
    docs.filter("doc_id % 2 = 0").write.mode("append").parquet(src)
    docs.filter("doc_id % 2 = 1").write.mode("append").parquet(src)
    docs.filter("doc_id % 2 = 0").write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(docs.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = (
        streaming_near_dup(stream)
        .writeStream.format("memory")
        .queryName("near_dup_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_neardup"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    streamed = {
        (r["a_id"], r["b_id"]) for r in spark.sql("select * from near_dup_stream").collect()
    }
    batch = {(r["a_id"], r["b_id"]) for r in minhash_lsh_dedup(spark, sf_dir).collect()}
    assert streamed == batch
    assert len(batch) > 0  # the fixture corpus does contain collisions
    # no pair may be emitted twice (the first-agreeing-band contract)
    n_rows = spark.sql("select count(*) c from near_dup_stream").collect()[0]["c"]
    assert n_rows == len(streamed)


def test_streaming_near_dup_salted_shards_are_exactly_replayable(spark, tmp_path, sf_dir):
    """bucket_salt=3: per-bucket state is sharded by a doc hash, and the
    emitted set must equal the deterministic replay — a pair survives iff
    some band both agrees AND co-shards, emitted exactly once. The salted
    set is a subset of the unsalted one (the documented recall trade)."""
    from vacancy_analyser_spark.streaming.neardup import (
        _owning_band,
        minhash_banded,
        streaming_near_dup,
    )

    SALT = 3
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    sig_rows = minhash_banded(docs).select("doc_id", "sig").distinct().collect()
    sigs = {r["doc_id"]: [int(x) for x in r["sig"]] for r in sig_rows}
    ids = sorted(sigs)
    expected = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if _owning_band(sigs[a], sigs[b], a, b, SALT) is not None:
                expected.add((a, b))

    src = str(tmp_path / "docs_salted")
    docs.filter("doc_id % 2 = 0").write.mode("append").parquet(src)
    docs.filter("doc_id % 2 = 1").write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(docs.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = (
        streaming_near_dup(stream, bucket_salt=SALT)
        .writeStream.format("memory")
        .queryName("near_dup_salted")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_salted"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql("select * from near_dup_salted").collect()
    got = {(r["a_id"], r["b_id"]) for r in rows}
    assert got == expected
    assert len(rows) == len(got)  # exactly-once per pair, even sharded
    # and the recall trade is visible but not total
    from vacancy_analyser_spark.plans.dedup import minhash_lsh_dedup

    full = {(r["a_id"], r["b_id"]) for r in minhash_lsh_dedup(spark, sf_dir).collect()}
    assert got <= full
    assert 0 < len(got)


def test_recommend_salt_probes_bucket_sizes(spark, sf_dir):
    """The salt planner returns 1 when every LSH bucket fits the budget,
    the exact ceil(max_bucket / budget) when one does not, and the
    recommended S genuinely bounds the largest post-shard bucket on the
    probe corpus."""
    from vacancy_analyser_spark.streaming.neardup import (
        _SHARD_A,
        _SHARD_B,
        _SHARD_P,
        minhash_banded,
        recommend_salt,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    sizes = [
        r["n"]
        for r in minhash_banded(docs)
        .groupBy("band_id", "band_val")
        .agg(F.count("*").alias("n"))
        .collect()
    ]
    top = max(sizes)
    assert recommend_salt(docs, max_bucket_rows=top) == 1
    assert recommend_salt(docs, max_bucket_rows=top + 1) == 1
    budget = max(1, top // 3)
    s = recommend_salt(docs, max_bucket_rows=budget)
    assert s == -(-top // budget)
    # applying the recommended salt shards the hottest bucket below ~budget
    # (hash splits are uneven; allow the binomial tail some slack)
    salted = (
        minhash_banded(docs)
        .withColumn(
            "shard",
            (
                (F.pmod(F.col("doc_id"), F.lit(_SHARD_P)) * _SHARD_A + F.col("band_id") * _SHARD_B)
                % _SHARD_P
                % s
            ).cast("int"),
        )
        .groupBy("band_id", "band_val", "shard")
        .agg(F.count("*").alias("n"))
        .agg(F.max("n").alias("m"))
        .first()["m"]
    )
    assert salted <= 2 * budget + 8
    assert salted < top


def test_streaming_zscore_prequential_replay(spark, tmp_path, sf_dir):
    """The drift monitor's flags must equal a driver-side prequential
    replay: each batch scored against the stats of PRIOR batches only
    (first batch flags nothing), then folded into state in event_id
    order. Late batches flag against a baseline the offending batch has
    not contaminated."""
    from vacancy_analyser_spark.streaming.monitor import streaming_zscore

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "event_type", "value"
    )
    b0 = ev.filter("event_id % 3 = 0")
    b1 = ev.filter("event_id % 3 = 1")
    b2 = ev.filter("event_id % 3 = 2")
    src = str(tmp_path / "ev_stream")
    for b in (b0, b1, b2):
        b.coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = (
        streaming_zscore(stream, limit=2.0)
        .writeStream.format("memory")
        .queryName("zmon")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_zmon"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        r["event_id"]: r["zscore"]
        for r in spark.sql("select * from zmon").collect()
    }

    # prequential replay (batches in write order, Welford fold by event_id
    # — the monitor's exact state arithmetic, so floats match bit-for-bit)
    stats: dict[str, tuple[int, float, float]] = {}
    expected: dict[int, float] = {}
    for b in (b0, b1, b2):
        rows = sorted(b.collect(), key=lambda r: r["event_id"])
        for r in rows:
            n, mean, m2 = stats.get(r["event_type"], (0, 0.0, 0.0))
            if n > 1:
                var = m2 / n
                if var > 0.0:
                    z = (r["value"] - mean) / var**0.5
                    if abs(z) > 2.0:
                        expected[r["event_id"]] = round(z, 6)
        for r in rows:
            n, mean, m2 = stats.get(r["event_type"], (0, 0.0, 0.0))
            v = float(r["value"])
            n += 1
            d = v - mean
            mean += d / n
            m2 += d * (v - mean)
            stats[r["event_type"]] = (n, mean, m2)
    assert got == expected
    assert got  # the heavy-tailed fixture produces flags from batch 2 on


def test_corpus_ingest_stream_matches_sequential_replay(spark, tmp_path, sf_dir):
    """The foreachBatch dedup-ingest loop must produce EXACTLY the corpus a
    sequential driver-side replay of dedup_gate builds over the same
    batches — exact dups and batch-vs-corpus near-dups are dropped,
    in-batch near-dups survive (the incremental_dedup one-sided
    contract), and restarts resume from the durable corpus, not operator
    memory."""
    from vacancy_analyser_spark.streaming.ingest import corpus_ingest_stream, dedup_gate

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    batches = [
        docs.filter("doc_id % 3 = 0"),
        docs.filter("doc_id % 3 = 1"),
        docs.filter("doc_id % 3 = 2"),
    ]
    src = str(tmp_path / "ingest_src")
    for b in batches:
        # one file per logical batch: maxFilesPerTrigger=1 equates files
        # with micro-batches, so a multi-part append would split a batch
        b.coalesce(1).write.mode("append").parquet(src)

    corpus_dir = str(tmp_path / "corpus")
    stream = (
        spark.readStream.schema(docs.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = (
        corpus_ingest_stream(stream, corpus_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt_ingest"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {r["doc_id"] for r in spark.read.parquet(corpus_dir).collect()}

    # sequential replay with the same gate over the same batch order
    replay_dir = str(tmp_path / "replay")
    corpus = None
    for b in batches:
        surv = dedup_gate(b, corpus)
        surv.write.mode("append").parquet(replay_dir)
        corpus = spark.read.parquet(replay_dir)
    expected = {r["doc_id"] for r in corpus.collect()}
    assert got == expected
    # the gate actually dropped something (the fixture has dups) but not
    # everything
    total = docs.count()
    assert 0 < len(got) < total


def test_dedup_gate_intra_batch_redelivery(spark):
    """A source that re-delivers the SAME (doc_id, text) row within one
    micro-batch must contribute the document to the corpus ONCE — the
    min-doc_id keeper semi-join alone keeps every row of the keeper id,
    so the gate dedups on doc_id before anything else."""
    from vacancy_analyser_spark.streaming.ingest import dedup_gate

    batch = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (1, "alpha beta gamma delta"),
         (2, "wholly unrelated text here")],
        "doc_id long, text string",
    )
    out = dedup_gate(batch, None).collect()
    assert sorted(r["doc_id"] for r in out) == [1, 2]


def test_streaming_zscore_survives_large_means(spark, tmp_path):
    """The ADVICE-fix regression: with raw (n, Σv, Σv²) state, values
    around 1e9 with unit-scale spread cancel catastrophically — computed
    variance collapses to ≤ 0 and the monitor silently stops flagging.
    Welford (n, mean, M2) state must keep flagging the planted outlier."""
    from vacancy_analyser_spark.streaming.monitor import streaming_zscore

    base = 1_000_000_000.0
    rows = []
    # batch 0 and 1: tight unit-scale noise around a huge mean
    for i in range(40):
        rows.append((i * 3, TS(2024, 1, 1, 5), 1, "evt", base + (i % 7) - 3.0))
    for i in range(40):
        rows.append((i * 3 + 1, TS(2024, 1, 1, 6), 1, "evt", base + (i % 5) - 2.0))
    # batch 2: one far outlier that MUST be flagged
    rows.append((998, TS(2024, 1, 1, 7), 1, "evt", base + 1000.0))
    rows.append((999, TS(2024, 1, 1, 7), 1, "evt", base))
    src = str(tmp_path / "bigmean")
    batches = [
        [r for r in rows if r[0] < 120 and r[0] % 3 == 0],
        [r for r in rows if r[0] < 120 and r[0] % 3 == 1],
        [r for r in rows if r[0] >= 998],
    ]
    for batch in batches:
        _events(spark, batch).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(_events(spark, []).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        streaming_zscore(stream, limit=3.0)
        .writeStream.format("memory")
        .queryName("zmon_bigmean")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_bigmean"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    flagged = {r["event_id"] for r in spark.sql("select * from zmon_bigmean").collect()}
    assert 998 in flagged  # naive s2/n - mean^2 state suppresses this
