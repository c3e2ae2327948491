"""Per-key job/time profiler for the optimization rounds.

Runs named registered keys N times each (min-of-N wall into the noop
sink, clearCache between runs — the bench's own methodology) and records
the SPARK JOB COUNT per run via DAGScheduler.numTotalJobs, which is the
scheduling-floor evidence the r12/r13 driver-orchestration work keys on
(each job is a driver round-trip + stage schedule; a replay key's cost at
bench scale is mostly its serial job chain).

Usage: python tools/job_profile.py key1 key2 ... [--runs N]
Prints one JSON line per key: {"key": ..., "runs": [...], "jobs": [...]}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _n_jobs(spark) -> int:
    return spark.sparkContext._jsc.sc().dagScheduler().numTotalJobs()


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    runs_n = 3
    for a in sys.argv[1:]:
        if a.startswith("--runs="):
            runs_n = int(a.split("=", 1)[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from vacancy_analyser_spark.plans import queries
    from vacancy_analyser_spark.session import get_spark

    spark = get_spark("job-profile")
    qs = queries()
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for name in args:
        fn = qs[name]
        walls, jobs = [], []
        for _ in range(runs_n):
            spark.catalog.clearCache()
            j0 = _n_jobs(spark)
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            walls.append(round(time.perf_counter() - t0, 3))
            jobs.append(_n_jobs(spark) - j0)
        print(json.dumps({"key": name, "wall": walls, "min": min(walls), "jobs": jobs}), flush=True)


if __name__ == "__main__":
    main()
