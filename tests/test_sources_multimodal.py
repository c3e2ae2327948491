"""S1/S2 source scaffolding + multimodal plumbing tests."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from vacancy_analyser_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    extract_features,
    fake_image_features,
    media_metadata_stats,
    real_decode,
    sample_frames,
)
from vacancy_analyser_spark.sources.rest import (
    Range,
    bisect_ranges,
    id_scan_source,
    range_scan_source,
)


# --- S1: recursive range bisection (get_vacancies.py:48-59 semantics) -------

def test_bisect_splits_until_fit():
    # density: 10 items per unit → [0, 1000) holds 10k items, limit 2000
    count = lambda a, b: (b - a) * 10
    ranges = bisect_ranges(count, 0, 1000, max_per_range=2000, min_width=1)
    assert all(count(r.lo, r.hi) <= 2000 for r in ranges)
    # full coverage, no overlap, ascending
    assert ranges[0].lo == 0 and ranges[-1].hi == 1000
    for prev, nxt in zip(ranges, ranges[1:]):
        assert prev.hi == nxt.lo


def test_bisect_respects_min_width():
    # pathological density: everything in one unit — floor must stop descent
    count = lambda a, b: 100_000 if a <= 5 < b else 0
    ranges = bisect_ranges(count, 0, 1000, max_per_range=2000, min_width=60)
    assert all((r.hi - r.lo) >= 1 for r in ranges)
    assert any(r.lo <= 5 < r.hi for r in ranges)
    assert all((r.hi - r.lo) <= 63 for r in ranges)  # narrowed to the floor


def test_bisect_drops_empty_ranges():
    count = lambda a, b: 0
    assert bisect_ranges(count, 0, 1000) == []


# --- S2: distributed id scan -------------------------------------------------

VAC_DDL = T.StructType(
    [T.StructField("id", T.LongType()), T.StructField("name", T.StringType())]
)


def test_id_scan_source(spark):
    # defined inside the test: cloudpickle serializes closures by value, so
    # executors don't need the tests/ dir on their import path
    def fake_fetch(ids: pd.Series) -> pd.DataFrame:
        # even ids "exist", odd ids are 404 → absent (reference skips non-200)
        found = [i for i in ids if i % 2 == 0]
        return pd.DataFrame({"id": found, "name": [f"vac-{i}" for i in found]})

    df = id_scan_source(spark, 100, VAC_DDL, fetch_fn=fake_fetch, num_partitions=4)
    rows = df.collect()
    assert len(rows) == 50
    assert df.rdd.getNumPartitions() == 4
    assert {r["name"] for r in rows} == {f"vac-{i}" for i in range(0, 100, 2)}


def test_range_scan_source(spark):
    def fetch_range(lo: int, hi: int) -> pd.DataFrame:
        ids = list(range(lo, hi))
        return pd.DataFrame({"id": ids, "name": [f"vac-{i}" for i in ids]})

    ranges = [Range(0, 10), Range(10, 30), Range(50, 55)]
    df = range_scan_source(spark, ranges, VAC_DDL, fetch_range_fn=fetch_range)
    assert df.count() == 35


def test_bisect_plus_range_scan_end_to_end(spark):
    """S1 integration over a fake API fixture (no network): a corpus whose
    timestamp density exceeds the 2000-item window forces recursive
    bisection (get_vacancies.py:48-59 semantics), and the mapInPandas
    fan-out over the resulting plan must return every item EXACTLY once —
    the splits may neither overlap nor leave gaps, and no single fetch may
    ever need more items than the window allows (the API would truncate)."""
    # 3000 items spread over a day + a 3000-item burst inside 2 minutes:
    # the burst region must bisect down to the 60 s floor to fit
    items = [(i, (i * 29) % 86_400) for i in range(3000)]
    items += [(3000 + i, 40_000 + (i * 7) % 120) for i in range(3000)]

    def count(a: int, b: int) -> int:  # the cheap `found`-field probe
        return sum(1 for _, t in items if a <= t < b)

    from vacancy_analyser_spark.sources.rest import bisect_ranges

    ranges = bisect_ranges(count, 0, 86_400, max_per_range=2000, min_width=60)
    assert len(ranges) > 4  # recursion actually happened
    for prev, nxt in zip(ranges, ranges[1:]):  # ascending, disjoint
        assert prev.hi <= nxt.lo
    # every piece fits the window or sits at the indivisible floor
    assert all(count(r.lo, r.hi) <= 2000 or (r.hi - r.lo) <= 60 for r in ranges)

    def fetch_range(lo: int, hi: int) -> pd.DataFrame:
        got = [(i, t) for i, t in items if lo <= t < hi]
        assert len(got) <= 2000  # a real API would silently truncate past this
        return pd.DataFrame(
            {"id": [i for i, _ in got], "name": [f"vac-{i}" for i, _ in got]}
        )

    df = range_scan_source(spark, ranges, VAC_DDL, fetch_range_fn=fetch_range)
    got_ids = [r["id"] for r in df.collect()]
    assert len(got_ids) == len(set(got_ids)) == len(items)  # exactly once
    assert set(got_ids) == {i for i, _ in items}


# --- multimodal plumbing -----------------------------------------------------

@pytest.fixture()
def media_df(spark):
    rows = [
        (1, b"\x89PNG fake bytes", "image/png", (640, 480, None)),
        (2, b"RIFF fake wav", "audio/wav", (None, None, 3500)),
        (3, None, "image/png", (10, 10, None)),
        (4, b"\x00\x00ftyp fake mp4", "video/mp4", (1920, 1080, 4200)),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_extract_features_deterministic(spark, media_df):
    out = {r["media_id"]: r for r in extract_features(media_df).collect()}
    assert len(out) == 4
    assert out[1]["n_bytes"] == len(b"\x89PNG fake bytes")
    assert out[3]["n_bytes"] == 0
    # deterministic fake: same payload → same feature vector
    expected = fake_image_features(b"\x89PNG fake bytes", "image/png")
    assert out[1]["feature"] == pytest.approx(expected)
    assert len(out[1]["feature"]) == 8


def test_real_decode_is_gated():
    with pytest.raises(NotImplementedError):
        real_decode(b"x", "image/png")


def test_metadata_stats_prunes_payload(spark, media_df, tmp_path):
    # through parquet so ReadSchema reflects pruning
    p = str(tmp_path / "media")
    media_df.write.parquet(p)
    stats = media_metadata_stats(spark.read.parquet(p))
    plan = stats._jdf.queryExecution().executedPlan().toString()
    assert "payload" not in plan  # payload column never read
    rows = {r["mime"]: r for r in stats.collect()}
    assert rows["image/png"]["n_media"] == 2


def test_resize_images_plumbing(spark, media_df):
    from vacancy_analyser_spark.operators.multimodal import fake_resize, resize_images

    out = {r["media_id"]: r for r in resize_images(media_df, 512, 512).collect()}
    assert set(out) == {1, 2, 3, 4}
    # oversized image 1 (640x480) shrinks aspect-preserving to 512x384
    assert (out[1]["meta"]["width"], out[1]["meta"]["height"]) == (512, 384)
    assert bytes(out[1]["payload"]) == fake_resize(b"\x89PNG fake bytes", "image/png", 512, 384)
    # image 3 (10x10) fits the box: passes through untouched, no Python hop
    assert (out[3]["meta"]["width"], out[3]["meta"]["height"]) == (10, 10)
    assert out[3]["payload"] is None
    # non-images pass through regardless of geometry
    assert bytes(out[4]["payload"]) == b"\x00\x00ftyp fake mp4"
    # schema is closed under resize: output == MEDIA_SCHEMA
    assert resize_images(media_df).schema == media_df.schema


def test_sample_frames_row_explosion(spark, media_df):
    frames = sample_frames(media_df, every_ms=1000).collect()
    by_id = {}
    for r in frames:
        by_id.setdefault(r["media_id"], []).append(r["frame_offset_ms"])
    assert sorted(by_id[4]) == [0, 1000, 2000, 3000]  # 4200 ms → 4 frames
    assert by_id[1] == [0]  # no duration → 1 frame


# --- retry/backoff/pacing contract (get_hist_vacancies.py:15-21) -------------

def test_call_with_retry_recovers_and_backs_off():
    from vacancy_analyser_spark.sources.rest import (
        RetryPolicy,
        TransientFetchError,
        call_with_retry,
    )
    import time as _time

    attempts = []

    def flaky():
        attempts.append(_time.monotonic())
        if len(attempts) < 3:
            raise TransientFetchError("503")
        return pd.DataFrame({"id": [1]})

    t0 = _time.monotonic()
    out = call_with_retry(
        flaky, RetryPolicy(max_retries=3, backoff_s=0.05, backoff_multiplier=2.0)
    )
    assert len(out) == 1 and len(attempts) == 3
    # two backoffs slept: 0.05 + 0.10
    assert _time.monotonic() - t0 >= 0.15


def test_call_with_retry_exhausts_then_raises():
    from vacancy_analyser_spark.sources.rest import (
        RetryPolicy,
        TransientFetchError,
        call_with_retry,
    )

    calls = []

    def always_down():
        calls.append(1)
        raise TransientFetchError("503")

    with pytest.raises(TransientFetchError):
        call_with_retry(always_down, RetryPolicy(max_retries=2, backoff_s=0.01))
    assert len(calls) == 3  # initial + 2 retries


def test_call_with_retry_propagates_permanent_errors():
    from vacancy_analyser_spark.sources.rest import RetryPolicy, call_with_retry

    def permanent():
        raise ValueError("schema drift is not transient")

    with pytest.raises(ValueError):
        call_with_retry(permanent, RetryPolicy(max_retries=5, backoff_s=0.01))


def test_id_scan_retries_flaky_partitions_and_passes_timeout(spark, tmp_path):
    """The distributed form of the reference's pacing loop: a fetcher that
    fails transiently on its first attempt per chunk must still deliver
    every row exactly once, and a fetcher that accepts timeout_s must
    receive the policy deadline."""
    from vacancy_analyser_spark.sources.rest import RetryPolicy, TransientFetchError

    marker_dir = str(tmp_path)  # executor-visible scratch (local mode)

    def flaky_fetch(ids: pd.Series, timeout_s: float = None) -> pd.DataFrame:
        import os

        assert timeout_s == 42.0  # policy deadline reaches the transport
        marker = os.path.join(marker_dir, f"seen_{int(ids.iloc[0])}")
        if not os.path.exists(marker):
            open(marker, "w").close()
            raise TransientFetchError("first attempt on this chunk fails")
        return pd.DataFrame({"id": list(ids), "name": [f"vac-{i}" for i in ids]})

    df = id_scan_source(
        spark,
        40,
        VAC_DDL,
        fetch_fn=flaky_fetch,
        num_partitions=4,
        batch_size=10,
        retry=RetryPolicy(pause_s=0.0, timeout_s=42.0, max_retries=2, backoff_s=0.01),
    )
    rows = df.collect()
    assert len(rows) == 40
    assert {r["id"] for r in rows} == set(range(40))


def test_id_scan_paces_from_policy_pause(spark):
    """pause_s is the reference's PAUSE=1 knob: with no explicit
    requests_per_sec, chunks within a partition are spaced ≥ pause_s·len."""
    import time as _time

    from vacancy_analyser_spark.sources.rest import RetryPolicy

    def instant_fetch(ids: pd.Series) -> pd.DataFrame:
        return pd.DataFrame({"id": list(ids), "name": ["x"] * len(ids)})

    t0 = _time.monotonic()
    id_scan_source(
        spark,
        8,
        VAC_DDL,
        fetch_fn=instant_fetch,
        num_partitions=1,
        batch_size=2,
        retry=RetryPolicy(pause_s=0.05),
    ).collect()
    # 4 chunks × 2 ids × 0.05 s/request = 0.4 s of enforced pacing
    assert _time.monotonic() - t0 >= 0.4


def test_range_scan_retry_contract(spark, tmp_path):
    from vacancy_analyser_spark.sources.rest import RetryPolicy, TransientFetchError

    marker_dir = str(tmp_path)

    def flaky_range(lo: int, hi: int, timeout_s: float = None) -> pd.DataFrame:
        import os

        assert timeout_s == 7.0
        marker = os.path.join(marker_dir, f"r_{lo}_{hi}")
        if not os.path.exists(marker):
            open(marker, "w").close()
            raise TransientFetchError("flap")
        ids = list(range(lo, hi))
        return pd.DataFrame({"id": ids, "name": [f"vac-{i}" for i in ids]})

    df = range_scan_source(
        spark,
        [Range(0, 5), Range(5, 12)],
        VAC_DDL,
        fetch_range_fn=flaky_range,
        retry=RetryPolicy(pause_s=0.0, timeout_s=7.0, max_retries=1, backoff_s=0.01),
    )
    assert df.count() == 12
