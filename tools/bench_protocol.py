"""Bench variance protocol (VERDICT r2 item 5): median of N ISOLATED cold
runs, each a fresh python/JVM process running bench.py with nothing else on
the box — the single-cold-run numbers recorded per-round swing ±25-50%
with environment noise (r1->r2 regressed 13.5% uniformly while warm times
fell, a contradiction a single run cannot resolve).

Usage: python tools/bench_protocol.py [runs=3]
Prints one JSON line:
  {"runs": N, "median_cold": s, "spread_cold": [min, max],
   "median_warm": s, "queries_median": {...}, "per_run_cold": [...]}

Do NOT run concurrently with pytest/selfcheck — measured +20% inflation.
"""

from __future__ import annotations

import json
import statistics
import subprocess
import sys

REPO = "/root/repo"


def main() -> int:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    results = []
    for i in range(runs):
        out = subprocess.run(
            [sys.executable, f"{REPO}/bench.py", "--single"],
            capture_output=True,
            text=True,
            cwd=REPO,
            timeout=900,
        )
        line = [
            ln for ln in out.stdout.splitlines() if ln.startswith("{")
        ][-1]
        rec = json.loads(line)
        results.append(rec)
        print(
            f"# run {i + 1}/{runs}: cold={rec['value']} "
            f"warm={rec['warm_total']} load={rec.get('load_avg')}",
            file=sys.stderr,
        )
    colds = [r["value"] for r in results]
    warms = [r["warm_total"] for r in results]
    names = results[0]["queries"].keys()
    qmed = {
        n: round(statistics.median(r["queries"][n] for r in results), 3)
        for n in names
    }
    print(
        json.dumps(
            {
                "runs": runs,
                "median_cold": round(statistics.median(colds), 3),
                "spread_cold": [min(colds), max(colds)],
                "median_warm": round(statistics.median(warms), 3),
                "spread_warm": [min(warms), max(warms)],
                "queries_median": qmed,
                "per_run_cold": colds,
                "load_avg_per_run": [r.get("load_avg") for r in results],
                "sf": results[0].get("sf"),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
