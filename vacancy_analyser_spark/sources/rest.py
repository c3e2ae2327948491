"""S1/S2: distributed REST-scan sources (SURVEY.md §2.1).

The reference scrapes hh.ru single-threaded from the driver process:
- S1 (get_vacancies.py:24-64): paged search; when a date range exceeds the
  API's 2000-item window it recursively bisects the range until each piece
  fits, then pages through it.
- S2 (get_hist_vacancies.py:15-21,191-214): probes ids 0..40M one GET at a
  time, 1 req/s.

Engine form: *range splitting is partitioning*. The driver enumerates
work units (id ranges / date ranges — cheap metadata probes), then executors
fetch their partitions in parallel via mapInPandas with a per-partition rate
limit. No HTTP library ships in this container, so the actual transport is
injected (``fetch_fn``); tests inject deterministic fakes and the default
raises NotImplementedError with instructions.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


@dataclass(frozen=True)
class Range:
    """Half-open work unit [lo, hi); for date scans these are epoch seconds."""

    lo: int
    hi: int


def bisect_ranges(
    count_fn: Callable[[int, int], int],
    lo: int,
    hi: int,
    max_per_range: int = 2000,
    min_width: int = 60,
) -> list[Range]:
    """S1's recursive range bisection as a pure, testable function.

    ``count_fn(lo, hi)`` is the cheap metadata probe (the reference reads
    the `found` field of page 0, get_vacancies.py:36-47). Ranges whose count
    exceeds ``max_per_range`` split at the midpoint until they fit or reach
    ``min_width`` (the reference floors at 60 s spans, :48-59). The result
    is the partition plan for the distributed fetch.
    """
    out: list[Range] = []
    stack = [(lo, hi)]
    while stack:
        a, b = stack.pop()
        if b <= a:
            continue
        n = count_fn(a, b)
        if n <= max_per_range or (b - a) <= min_width:
            if n > 0:
                out.append(Range(a, b))
            continue
        mid = (a + b) // 2
        # LIFO: push the right half first so the left half pops (and emits)
        # first → output stays ascending.
        stack.append((mid, b))
        stack.append((a, mid))
    return out


def fetch_not_implemented(ids: pd.Series) -> pd.DataFrame:
    raise NotImplementedError(
        "no HTTP transport in this environment — inject fetch_fn(ids: pd.Series)"
        " -> pd.DataFrame matching the declared schema"
    )


def id_scan_source(
    spark: SparkSession,
    max_id: int,
    schema: T.StructType,
    fetch_fn: Callable[[pd.Series], pd.DataFrame] = fetch_not_implemented,
    num_partitions: int = 32,
    requests_per_sec: float | None = None,
    batch_size: int = 100,
) -> DataFrame:
    """S2: probe the id space [0, max_id) in parallel partitions.

    ``spark.range`` gives an evenly partitioned id backbone; each partition
    fetches its ids in ``batch_size`` chunks through ``fetch_fn`` (Arrow
    batches in/out), honoring an optional per-partition rate limit — the
    distributed version of the reference's PAUSE=1 loop. Missing ids are
    simply absent from the returned frames (the reference skips non-200s).
    """
    backbone = spark.range(0, max_id, 1, num_partitions)

    def fetch_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"]
            for start in range(0, len(ids), batch_size):
                chunk = ids.iloc[start : start + batch_size]
                t0 = time.monotonic()
                yield fetch_fn(chunk)
                if requests_per_sec:
                    elapsed = time.monotonic() - t0
                    min_elapsed = len(chunk) / requests_per_sec
                    if elapsed < min_elapsed:
                        time.sleep(min_elapsed - elapsed)

    return backbone.mapInPandas(fetch_partition, schema)


def range_scan_source(
    spark: SparkSession,
    ranges: list[Range],
    schema: T.StructType,
    fetch_range_fn: Callable[[int, int], pd.DataFrame] = None,  # type: ignore[assignment]
    partitions_per_range: int = 1,
) -> DataFrame:
    """S1: fetch pre-bisected ranges in parallel — one task per range.

    The plan from bisect_ranges becomes a tiny DataFrame repartitioned so
    each range lands in its own task; executors page through their range via
    ``fetch_range_fn(lo, hi)``.
    """
    if fetch_range_fn is None:
        raise NotImplementedError("inject fetch_range_fn(lo, hi) -> pd.DataFrame")
    plan = spark.createDataFrame(
        [(r.lo, r.hi) for r in ranges], "lo long, hi long"
    ).repartition(max(1, len(ranges) // partitions_per_range))

    def fetch_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for lo, hi in zip(pdf["lo"], pdf["hi"]):
                yield fetch_range_fn(int(lo), int(hi))

    return plan.mapInPandas(fetch_partition, schema)
