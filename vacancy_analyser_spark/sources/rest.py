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

import inspect
import time
from collections.abc import Callable, Iterator
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


class TransientFetchError(Exception):
    """A fetch failure worth retrying (5xx, connection reset, timeout).

    Transports classify their own errors: raise this (or subclass it) for
    transient conditions; any other exception propagates immediately and
    fails the task — Spark's task-retry ladder is the LAST resort, not the
    first, because a task retry refetches the whole partition."""


@dataclass(frozen=True)
class RetryPolicy:
    """The reference's pacing/timeout constants plus retry semantics, as a
    declarative contract executed INSIDE mapInPandas (per partition — the
    distributed analogue of the reference's single global loop).

    - ``pause_s``: sleep between successive requests within a partition
      (reference PAUSE = 1, get_hist_vacancies.py:21). Per-partition, so
      cluster-wide rate = partitions / pause_s — size num_partitions to the
      API budget.
    - ``timeout_s``: per-request deadline (reference TIMEOUT = 600,
      get_hist_vacancies.py:18). Delivered to the transport: a ``fetch_fn``
      that accepts a ``timeout_s`` keyword receives it; one that doesn't is
      assumed to manage its own deadline.
    - ``max_retries`` / ``backoff_s`` / ``backoff_multiplier``: up to
      max_retries re-attempts of a failed chunk on TransientFetchError,
      sleeping backoff_s · multiplierⁿ between attempts (the reference has
      NO retry — a 600 s hang then a skip; exponential backoff is the
      polite-scraper upgrade). Non-transient errors propagate at once.
    """

    pause_s: float = 1.0
    timeout_s: float = 600.0
    max_retries: int = 3
    backoff_s: float = 1.0
    backoff_multiplier: float = 2.0


def _accepts_timeout(fn: Callable) -> bool:
    try:
        params = inspect.signature(fn).parameters
    except (TypeError, ValueError):  # builtins/partials without signatures
        return False
    return "timeout_s" in params or any(
        p.kind is inspect.Parameter.VAR_KEYWORD for p in params.values()
    )


def call_with_retry(call: Callable[[], pd.DataFrame], policy: RetryPolicy) -> pd.DataFrame:
    """Run ``call`` under the policy's retry/backoff ladder (pure helper —
    unit-testable without Spark; the mapInPandas closures below use it)."""
    delay = policy.backoff_s
    for attempt in range(policy.max_retries + 1):
        try:
            return call()
        except TransientFetchError:
            if attempt == policy.max_retries:
                raise
            time.sleep(delay)
            delay *= policy.backoff_multiplier
    raise AssertionError("unreachable")


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
    retry: RetryPolicy | None = None,
) -> DataFrame:
    """S2: probe the id space [0, max_id) in parallel partitions.

    ``spark.range`` gives an evenly partitioned id backbone; each partition
    fetches its ids in ``batch_size`` chunks through ``fetch_fn`` (Arrow
    batches in/out), honoring an optional per-partition rate limit — the
    distributed version of the reference's PAUSE=1 loop. Missing ids are
    simply absent from the returned frames (the reference skips non-200s).

    ``retry`` layers the reference's pacing/timeout constants and an
    exponential-backoff retry ladder on top (see RetryPolicy): chunks are
    re-attempted on TransientFetchError, fetchers that accept ``timeout_s``
    get the policy deadline, and requests within a partition are spaced by
    ``pause_s`` when no explicit ``requests_per_sec`` is given.
    """
    backbone = spark.range(0, max_id, 1, num_partitions)
    rate = requests_per_sec
    if rate is None and retry is not None and retry.pause_s > 0:
        rate = 1.0 / retry.pause_s
    pass_timeout = retry is not None and _accepts_timeout(fetch_fn)

    def fetch_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"]
            for start in range(0, len(ids), batch_size):
                chunk = ids.iloc[start : start + batch_size]
                if pass_timeout:
                    call = lambda c=chunk: fetch_fn(c, timeout_s=retry.timeout_s)  # noqa: E731
                else:
                    call = lambda c=chunk: fetch_fn(c)  # noqa: E731
                t0 = time.monotonic()
                yield call() if retry is None else call_with_retry(call, retry)
                if rate:
                    elapsed = time.monotonic() - t0
                    min_elapsed = len(chunk) / rate
                    if elapsed < min_elapsed:
                        time.sleep(min_elapsed - elapsed)

    return backbone.mapInPandas(fetch_partition, schema)


def range_scan_source(
    spark: SparkSession,
    ranges: list[Range],
    schema: T.StructType,
    fetch_range_fn: Callable[[int, int], pd.DataFrame] = None,  # type: ignore[assignment]
    partitions_per_range: int = 1,
    retry: RetryPolicy | None = None,
) -> DataFrame:
    """S1: fetch pre-bisected ranges in parallel — one task per range.

    The plan from bisect_ranges becomes a tiny DataFrame repartitioned so
    each range lands in its own task; executors page through their range via
    ``fetch_range_fn(lo, hi)``. ``retry`` applies the same declarative
    pacing/timeout/backoff contract as id_scan_source, per range."""
    if fetch_range_fn is None:
        raise NotImplementedError("inject fetch_range_fn(lo, hi) -> pd.DataFrame")
    plan = spark.createDataFrame(
        [(r.lo, r.hi) for r in ranges], "lo long, hi long"
    ).repartition(max(1, len(ranges) // partitions_per_range))
    pass_timeout = retry is not None and _accepts_timeout(fetch_range_fn)

    def fetch_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for lo, hi in zip(pdf["lo"], pdf["hi"]):
                if pass_timeout:
                    call = lambda a=int(lo), b=int(hi): fetch_range_fn(a, b, timeout_s=retry.timeout_s)  # noqa: E731
                else:
                    call = lambda a=int(lo), b=int(hi): fetch_range_fn(a, b)  # noqa: E731
                t0 = time.monotonic()
                yield call() if retry is None else call_with_retry(call, retry)
                if retry is not None and retry.pause_s > 0:
                    elapsed = time.monotonic() - t0
                    if elapsed < retry.pause_s:
                        time.sleep(retry.pause_s - elapsed)

    return plan.mapInPandas(fetch_partition, schema)
