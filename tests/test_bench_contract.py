"""The bench harness is a driver contract: every headline key must resolve
in the registry (a query rename must fail CI, not silently break the
driver's recorded bench)."""

from __future__ import annotations


def test_headline_keys_all_registered():
    import bench
    from vacancy_analyser_spark.plans import queries

    qs = queries()
    missing = [k for k in bench.HEADLINE if k not in qs]
    assert not missing, f"bench.HEADLINE keys absent from registry: {missing}"
    assert len(bench.HEADLINE) == len(set(bench.HEADLINE))  # no dupes
    missing_ext = [k for k in bench.EXT if k not in qs]
    assert not missing_ext, f"bench.EXT keys absent from registry: {missing_ext}"
    assert len(bench.EXT) == len(set(bench.EXT))
    assert not set(bench.EXT) & set(bench.HEADLINE)  # headline stays frozen


def test_ext_regression_gate_pins_resolve():
    """Every pinned ext baseline (r4 provenance table and the effective
    r5-merged gate) must still be a timed ext query — a renamed/dropped
    key would silently un-gate itself otherwise. Every r5-REWRITTEN key
    must carry an r5 re-pin (an r4-era pin on a now-faster plan makes
    the 2x gate slack)."""
    import bench

    stale = [k for k in bench.EXT_BASELINE if k not in bench.EXT]
    assert not stale, f"EXT_BASELINE pins not in bench.EXT: {stale}"
    assert bench.EXT_BASELINE["containment_dedup"] < bench.EXT_BASELINE_R4["containment_dedup"]
    assert bench.EXT_BASELINE["tfidf_cosine_capped"] < bench.EXT_BASELINE_R4["tfidf_cosine_capped"]
    assert bench.EXT_BASELINE["corpus_keep_list"] < bench.EXT_BASELINE_R4["corpus_keep_list"]


def test_queries_md_catalog_in_sync():
    """QUERIES.md is generated from the registry; a stale catalog means a
    registry change shipped without regenerating it."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, "tools/catalog.py"],
        capture_output=True,
        text=True,
        cwd=repo,
        check=True,
    ).stdout
    with open(os.path.join(repo, "QUERIES.md")) as f:
        assert f.read() == out
