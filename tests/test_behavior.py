"""Property tests for the behavioral analytics ops (plans/behavior.py) and
the SemDeDup-style semantic_dedup (plans/similarity.py) beyond oracle
parity: funnel monotonicity and ordering semantics vs a driver-side replay,
z-score outliers vs a pandas recompute, and semantic_dedup's
precision-1/containment-in-exact contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from vacancy_analyser_spark.io import load_table
from vacancy_analyser_spark.plans.behavior import (
    FUNNEL_STAGES,
    ZSCORE_LIMIT,
    funnel_conversion,
    value_zscore_outliers,
)
from vacancy_analyser_spark.plans.similarity import (
    SEMANTIC_TAU,
    exact_near_dup,
    semantic_dedup,
)


def _events(spark, sf_dir):
    return load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")


def test_funnel_matches_sequence_replay(spark, sf_dir):
    rows = _events(spark, sf_dir).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append((r["ts"], r["event_type"]))
    expected = []
    survivors = None
    prev_t: dict[int, object] = {}
    for etype in FUNNEL_STAGES:
        nxt = {}
        pool = by_user if survivors is None else {u: by_user[u] for u in survivors}
        for u, evs in pool.items():
            ts = [t for t, e in evs if e == etype and (u not in prev_t or t > prev_t[u])]
            if ts:
                nxt[u] = min(ts)
        expected.append(len(nxt))
        survivors = set(nxt)
        prev_t = nxt
    got = {r["stage"]: r for r in funnel_conversion(spark, sf_dir).collect()}
    assert [got[i + 1]["n_users"] for i in range(3)] == expected
    # monotone: each stage keeps at most the previous stage's users
    assert expected[0] >= expected[1] >= expected[2]
    assert got[1]["conv_from_prev"] is None
    if expected[0]:
        assert got[2]["conv_from_prev"] == round(expected[1] / expected[0], 6)


def test_funnel_requires_order_not_just_presence(spark, sf_dir):
    # users with all three event types but NOT in funnel order must not all
    # convert: the stage-3 count is <= the unordered any-presence count.
    ev = _events(spark, sf_dir)
    unordered = (
        ev.filter(F.col("event_type").isin(*FUNNEL_STAGES))
        .groupBy("user_id")
        .agg(F.countDistinct("event_type").alias("k"))
        .filter(F.col("k") == len(FUNNEL_STAGES))
        .count()
    )
    stage3 = (
        funnel_conversion(spark, sf_dir).filter(F.col("stage") == 3).collect()[0]["n_users"]
    )
    assert stage3 <= unordered


def test_zscore_outliers_match_pandas(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    pdf = ev.toPandas()
    from decimal import ROUND_HALF_UP, Decimal

    q12 = Decimal("1e-12")
    expected = set()
    for etype, grp in pdf.groupby("event_type"):
        # mirror the fixed-point discipline: scaled-long mean (DECIMAL(18,6)
        # equivalent) and a DECIMAL(38,12) sum for the squares
        sv = (grp["value"] * 10**6).round().astype("int64")
        # float() first: numpy >= 2 reprs scalars as 'np.float64(x)',
        # which Decimal cannot parse
        sq_sum = sum(
            Decimal(repr(float(v) * float(v))).quantize(q12, ROUND_HALF_UP)
            for v in grp["value"]
        )
        n = len(grp)
        mean_v = (float(sv.sum()) / 10**6) / n
        mean_sq = float(sq_sum) / n
        var = mean_sq - mean_v * mean_v
        if n <= 1 or var <= 0:
            continue
        z = (grp["value"] - mean_v) / var**0.5
        expected |= set(grp.loc[abs(z) > ZSCORE_LIMIT, "event_id"])
    got = {r["event_id"] for r in value_zscore_outliers(spark, sf_dir).collect()}
    assert got == expected
    assert got  # heavy-tailed fixture values do contain outliers


def test_semantic_dedup_subset_of_exact_with_exact_sims(spark, sf_dir):
    # every within-cluster pair must appear in the all-pairs exact set with
    # the same similarity (precision 1.0); misses are cross-cluster only.
    exact = {
        (r["a_id"], r["b_id"]): r["sim"]
        for r in exact_near_dup(spark, sf_dir, threshold=SEMANTIC_TAU).collect()
    }
    got = semantic_dedup(spark, sf_dir).collect()
    assert got  # fixture embeddings contain within-cluster near-dups
    for r in got:
        assert (r["a_id"], r["b_id"]) in exact
        assert r["sim"] == exact[(r["a_id"], r["b_id"])]


def test_semantic_dedup_pairs_share_cluster_assignment(spark, sf_dir):
    from vacancy_analyser_spark.plans.similarity import _ivf_ranked, _vectors

    assigned = {
        r["vec_id"]: r["centroid_id"]
        for r in _ivf_ranked(_vectors(spark, sf_dir))
        .filter(F.col("rn") == 1)
        .select("vec_id", "centroid_id")
        .collect()
    }
    for r in semantic_dedup(spark, sf_dir).collect():
        assert assigned[r["a_id"]] == assigned[r["b_id"]] == r["centroid_id"]


def test_retention_cohorts_invariants(spark, sf_dir):
    from vacancy_analyser_spark.plans.behavior import retention_cohorts

    rows = retention_cohorts(spark, sf_dir).collect()
    assert rows
    by_cohort: dict[int, dict[int, int]] = {}
    for r in rows:
        assert r["age_days"] >= 0  # nothing happens before a user's first event
        by_cohort.setdefault(r["cohort_day"], {})[r["age_days"]] = r["n_users"]
    users_total = (
        load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    )
    # every user appears in exactly one cohort at age 0, and no later age
    # can exceed the cohort's size
    assert sum(c[0] for c in by_cohort.values()) == users_total
    for c in by_cohort.values():
        assert all(n <= c[0] for n in c.values())


def test_event_transition_matrix_mass_and_replay(spark, sf_dir):
    from vacancy_analyser_spark.plans.behavior import event_transition_matrix

    got = {(r["src"], r["dst"]): (r["n"], r["p"]) for r in
           event_transition_matrix(spark, sf_dir).collect()}
    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    from collections import Counter

    seqs: dict[int, list] = {}
    for r in ev:
        seqs.setdefault(r["user_id"], []).append((r["ts"], r["event_id"], r["event_type"]))
    c = Counter()
    for s in seqs.values():
        s.sort()
        for (_, _, a), (_, _, b) in zip(s, s[1:]):
            c[(a, b)] += 1
    assert {k: v[0] for k, v in got.items()} == dict(c)
    # per-src probability mass closes to 1 within rounding
    srcs: dict[str, float] = {}
    for (s, _), (_, p) in got.items():
        srcs[s] = srcs.get(s, 0.0) + p
    for s, mass in srcs.items():
        k = sum(1 for (a, _) in got if a == s)
        assert abs(mass - 1.0) <= 5e-7 * k + 1e-12


def test_active_users_rollup_consistency(spark, sf_dir):
    from vacancy_analyser_spark.plans.behavior import active_users_rollup

    rows = active_users_rollup(spark, sf_dir).collect()
    by_gran: dict[str, dict[int, int]] = {}
    for r in rows:
        by_gran.setdefault(r["granularity"], {})[r["bucket"]] = r["n_users"]
    assert set(by_gran) == {"day", "week", "month"}
    total_users = (
        load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    )
    for gran, buckets in by_gran.items():
        # no bucket exceeds the population; every bucket is non-empty
        assert all(0 < n <= total_users for n in buckets.values())
    # a week's actives are at least the max of its days, at most their sum
    for wk, wn in by_gran["week"].items():
        days = [n for d, n in by_gran["day"].items() if d // 7 == wk]
        assert days
        assert max(days) <= wn <= sum(days)
    # a month covers its weeks the same way (30-day fixed windows do not
    # align with 7-day windows, so compare via days)
    for mo, mn in by_gran["month"].items():
        days = [n for d, n in by_gran["day"].items() if d // 30 == mo]
        assert max(days) <= mn <= sum(days)


def test_semantic_multiprobe_recall_dominates_single_probe(spark, sf_dir):
    """Multiprobe pairs ⊇ single-probe pairs (never lose a pair by adding
    probes), still ⊆ the exact all-pairs set with identical sims."""
    from vacancy_analyser_spark.plans.similarity import semantic_dedup_multiprobe

    single = {
        (r["a_id"], r["b_id"]): r["sim"] for r in semantic_dedup(spark, sf_dir).collect()
    }
    multi = {
        (r["a_id"], r["b_id"]): r["sim"]
        for r in semantic_dedup_multiprobe(spark, sf_dir).collect()
    }
    exact = {
        (r["a_id"], r["b_id"]): r["sim"]
        for r in exact_near_dup(spark, sf_dir, threshold=SEMANTIC_TAU).collect()
    }
    assert set(single) <= set(multi) <= set(exact)
    for p, s in multi.items():
        assert s == exact[p]


def test_value_drift_by_day_matches_replay(spark, sf_dir):
    """Flagged (type, day) cells must equal a pandas replay of the same
    fixed-point z-test, and daily means must come from the same decimal
    discipline."""
    from vacancy_analyser_spark.plans.behavior import DRIFT_Z, value_drift_by_day

    ev = load_table(spark, sf_dir, "events")
    pdf = ev.selectExpr(
        "event_type",
        "floor(timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        " / 86400000000) AS day",
        "value",
    ).toPandas()
    from decimal import ROUND_HALF_UP, Decimal

    q12 = Decimal("1e-12")
    expected = set()
    for etype, grp in pdf.groupby("event_type"):
        n = len(grp)
        sv = (grp["value"] * 10**6).round().astype("int64")
        mean_v = (float(sv.sum()) / 10**6) / n
        sq_sum = sum(
            Decimal(repr(float(v) * float(v))).quantize(q12, ROUND_HALF_UP)
            for v in grp["value"]
        )
        var = float(sq_sum) / n - mean_v * mean_v
        if n <= 1 or var <= 0:
            continue
        for day, dgrp in grp.groupby("day"):
            dsv = (dgrp["value"] * 10**6).round().astype("int64")
            dmean = (float(dsv.sum()) / 10**6) / len(dgrp)
            z = (dmean - mean_v) * len(dgrp) ** 0.5 / var**0.5
            if abs(z) > DRIFT_Z:
                expected.add((etype, int(day)))
    got = {
        (r["event_type"], r["day"]) for r in value_drift_by_day(spark, sf_dir).collect()
    }
    assert got == expected
    assert got  # iid daily means still produce ~5% two-sided exceedances


def test_approx_quantile_contract_bound_is_real_not_vacuous(spark, sf_dir):
    """Replay the rank-interval contract in pure Python: for each group and
    percentile, the sketch's answer must sit within the merge-safe slack of ceil(p·n) —
    and the replayed interval test must agree with the query's booleans
    (proving they are computed from real ranks, not constants). Also pin
    that a deliberately out-of-bound value FAILS the same test."""
    import math

    from vacancy_analyser_spark.io import load_table
    from vacancy_analyser_spark.plans.aggregates import (
        _AQ_ACC,
        _AQ_PS,
        approx_quantile_contract,
    )
    from pyspark.sql import functions as F

    got = {r["event_type"]: r for r in approx_quantile_contract(spark, sf_dir).collect()}

    ev = load_table(spark, sf_dir, "events").select("event_type", "value").collect()
    by_type = {}
    for r in ev:
        if r["value"] is not None:
            by_type.setdefault(r["event_type"], []).append(r["value"])

    # the sketch's actual answers, recomputed for the replay
    qs = {
        r["event_type"]: r["qs"]
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.percentile_approx("value", list(_AQ_PS), _AQ_ACC).alias("qs"))
        .collect()
    }

    def interval_ok(vals, q, p):
        n = len(vals)
        lo = sum(1 for v in vals if v < q)
        hi = sum(1 for v in vals if v <= q)
        slack = 2.0 * n / _AQ_ACC + 1.0
        target = math.ceil(p * n)
        return (lo + 1) <= target + slack and hi >= target - slack

    for et, vals in by_type.items():
        assert got[et]["n"] == len(vals)
        for i, p in enumerate(_AQ_PS):
            want = interval_ok(sorted(vals), qs[et][i], p)
            key = f"p{int(p * 100)}_ok"
            assert got[et][key] == want
            assert want  # the sketch satisfies its guarantee at this SF
        # a value far outside the distribution must fail the same test
        assert not interval_ok(sorted(vals), min(vals) - 1.0, 0.5)
