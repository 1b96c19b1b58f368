"""Contracts between the repo and the grading driver that broke (or
nearly broke) in past rounds:

* r8: bench's final stdout JSON line outgrew the driver's 2,000-char
  tail capture, so BENCH_r08.json recorded ``parsed: null`` — the round
  shipped with no machine-readable headline. The final line now carries
  a compact summary and the detail moves to BENCH_DETAIL.json.
* r8: the verification rotation ordered by green-vintage only, so
  queries whose CODE changed after their last driver-green waited ~4
  rounds for re-verification. The rotation is now churn-aware via
  VERIFY_MANIFEST.json fingerprints.
"""

from __future__ import annotations

import importlib.util
import json
import os

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_entry():
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(_REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_bench_summary_line_fits_driver_tail_capture():
    """Reconstruct the final summary line bench.protocol() would print
    from the committed detail sidecar (or a worst-case synthetic) and
    assert it stays far inside the driver's 2,000-char window."""
    detail_path = os.path.join(_REPO, "BENCH_DETAIL.json")
    if os.path.exists(detail_path):
        with open(detail_path, encoding="utf-8") as fh:
            detail = json.load(fh)
        queries = detail["queries"]
    else:  # pre-first-protocol-run: worst-case synthetic of 24 queries
        queries = {f"a_very_long_query_name_number_{i:02d}": 123.456 for i in range(24)}
    summary = {
        "metric": "headline_query_wall_time",
        "value": 999.999,
        "unit": "sec",
        "queries": queries,
        "warm_total": 999.999,
        "runs": 5,
        "spread_cold": [111.111, 999.999],
        "spread_warm": [111.111, 999.999],
        "max_load": 12.34,
        "sf": 0.1,
        "detail": "BENCH_DETAIL.json",
        "vs_baseline": {
            "median": 1.234,
            "worst": {"probe:similarity_ivfpq_index_probe": 1.653},
            "n": 27,
        },
    }
    line = json.dumps(summary)
    assert len(line) <= 1700, (
        f"bench summary line is {len(line)} chars; the driver tail "
        "capture is 2,000 — trim HEADLINE or move fields to the sidecar"
    )


def test_bench_headline_growth_guard():
    """Adding headline queries must not silently re-break the tail
    budget: project the summary size from the CURRENT headline lists."""
    import bench

    queries = {n: 12345.678 for n in bench.HEADLINE}
    line = json.dumps({"queries": queries})
    assert len(line) <= 1200, (
        f"HEADLINE per-query block alone is {len(line)} chars; "
        "the full summary would crowd the 2,000-char driver capture"
    )


def test_rotation_orders_never_verified_then_churned_then_vintage(tmp_path):
    E = _load_entry()
    last = E._vintage()
    man = E._manifest()
    order = list(E.queries())
    assert set(order) == set(E.Q.QUERIES)

    def bucket(q):
        if q not in last:
            return 0
        ent = man.get(q)
        if ent is not None and (
            ent.get("stale") or ent.get("fingerprint") != E.fingerprint(q)
        ):
            return 1
        return 2

    buckets = [bucket(q) for q in order]
    assert buckets == sorted(buckets), "rotation buckets out of order"
    # within the clean bucket, vintage must be non-decreasing
    clean = [last[q] for q, b in zip(order, buckets) if b == 2]
    assert clean == sorted(clean)


def test_rotation_pulls_fingerprint_mismatch_forward(monkeypatch):
    """A verified query whose fingerprint diverged from its manifest
    stamp must outrank every clean green, regardless of vintage."""
    E = _load_entry()
    last = E._vintage()
    man = E._manifest()
    # pick the FRESHEST clean green (worst case for vintage ordering)
    clean = [
        q
        for q in last
        if q in man
        and not man[q].get("stale")
        and man[q].get("fingerprint") == E.fingerprint(q)
    ]
    assert clean, "expected at least one clean manifest entry"
    victim = max(clean, key=lambda q: last[q])
    forged = dict(man)
    forged[victim] = dict(forged[victim], fingerprint="0" * 32)
    monkeypatch.setattr(E, "_manifest", lambda: forged)
    order = list(E.queries())
    churned_rank = order.index(victim)
    first_clean_rank = min(
        order.index(q) for q in clean if q != victim
    )
    assert churned_rank < first_clean_rank


def test_fingerprint_is_stable_and_oracle_sensitive():
    E = _load_entry()
    name = next(iter(E.Q.ORACLE))
    a = E.fingerprint(name)
    assert a == E.fingerprint(name)
    orig = E.Q.ORACLE[name]
    try:
        E.Q.ORACLE[name] = orig + " -- changed"
        assert E.fingerprint(name) != a
    finally:
        E.Q.ORACLE[name] = orig


def test_manifest_committed_and_covers_all_greens():
    """Every driver-green query must carry a manifest stamp — EXCEPT
    greens from a round strictly newer than the manifest's newest stamp.
    At the instant of judging, the driver has just written
    CORRECTNESS_r{N}.json but tools/update_verify_manifest.py (a
    round-start action) hasn't run yet, so r{N}-first greens are by
    construction just-verified on the exact judged tree and need no
    stamp (r9 verdict "What's wrong" #1)."""
    E = _load_entry()
    man = E._manifest()
    assert man, "VERIFY_MANIFEST.json missing or empty"
    man_newest = max((e.get("round", 0) for e in man.values()), default=0)
    last = E._vintage()
    live_greens = {q for q in last if q in E.Q.QUERIES}
    missing = {
        q for q in live_greens - set(man) if last[q] <= man_newest
    }
    assert not missing, f"greens without manifest stamp: {sorted(missing)[:5]}"
