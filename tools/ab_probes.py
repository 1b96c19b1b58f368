"""Isolated fresh-JVM A/B for the KiB-state probe family (VERDICT r10
item 2).

Round 10's committed bench artifact recorded probe-only warm ratios of
2.52x (search_near), 2.13x (heavy_hitters_store), 1.89x
(quantile_histogram_store) against the load-gated baseline — but the
protocol's first run started at load 6.41 (the co-tenant signature the
bench instrumentation exists to catch), and two of the regressed probes
sit where round 10 changed code (histstore drift accounting, freqstore
new). "It's just load" needs an isolated experiment, not an assertion:

  * each probe's fixture is built UNTIMED in a fresh subprocess/JVM
    (the ab_ivfpq discipline), then ONE untimed warm-up pass and
    ``runs`` timed probe-only executions; the median is reported;
  * every subprocess start is LOAD-GATED (1-min loadavg < --max-load,
    default 1.5 — the make_baseline gate) and loads are sampled around
    the timed section, so a contaminated measurement is visibly
    disqualified rather than silently averaged in;
  * ratios are against the committed BASELINE_LOCAL.json probes_warm —
    the same anchor bench.py reports, so the verdict's 2x bar applies
    directly.

Usage: python tools/ab_probes.py [sf_dir] [runs] [--max-load 1.5]
       python tools/ab_probes.py --child <probe> <sf_dir> <runs>  # internal
Prints one JSON line: per-probe medians, baseline ratios, gate loads.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

PROBES = [
    "search_phrase",
    "search_near",
    "quantile_histogram_store",
    "heavy_hitters_store",
    "approx_distinct_store",
]


def _child(name: str, sf_dir: str, runs: int) -> None:
    from cernbox_migration_database_spark import queries as Q
    from cernbox_migration_database_spark import util as U
    from cernbox_migration_database_spark.session import get_spark

    spark = get_spark(app_name=f"ab_probe_{name}")
    build, probe = Q.PHASED[name]
    t0 = time.time()
    ctx = build(spark, sf_dir)
    build_s = time.time() - t0
    probe(spark, ctx).write.format("noop").mode("overwrite").save()
    U.release_persisted()
    load0 = os.getloadavg()[0]
    times = []
    for _ in range(runs):
        t0 = time.time()
        probe(spark, ctx).write.format("noop").mode("overwrite").save()
        times.append(round(time.time() - t0, 3))
        U.release_persisted()
    print(
        "#AB "
        + json.dumps(
            {
                "probe": name,
                "median": round(statistics.median(times), 3),
                "times": times,
                "build_s": round(build_s, 3),
                "load": {
                    "start": round(load0, 2),
                    "end": round(os.getloadavg()[0], 2),
                },
            }
        )
    )


def _wait_for_idle(max_load: float, timeout: float = 600.0) -> float:
    deadline = time.monotonic() + timeout
    while True:
        load = os.getloadavg()[0]
        if load < max_load or time.monotonic() > deadline:
            return load
        time.sleep(15)


def main(argv: list[str]) -> int:
    if argv and argv[0] == "--child":
        _child(argv[1], argv[2], int(argv[3]))
        return 0
    probes = list(PROBES)
    if "--probes" in argv:
        i = argv.index("--probes")
        probes = argv[i + 1].split(",")
        del argv[i:i + 2]
    # strip every flag/value pair BEFORE consuming positionals — a flag
    # left in argv[0] used to become sf_dir (r11 advice)
    max_load = 1.5
    if "--max-load" in argv:
        i = argv.index("--max-load")
        max_load = float(argv[i + 1])
        del argv[i:i + 2]
    unknown = [a for a in argv if a.startswith("--")]
    if unknown:
        raise SystemExit(
            f"ab_probes: unknown flag(s) {unknown}; usage: ab_probes.py "
            "[--probes a,b] [--max-load F] [sf_dir] [runs]"
        )
    sf_dir = argv[0] if argv else "/root/testdata/sf0.1"
    runs = int(argv[1]) if len(argv) > 1 else 3
    base = {}
    bpath = os.path.join(_REPO, "BASELINE_LOCAL.json")
    if os.path.exists(bpath):
        with open(bpath, encoding="utf-8") as fh:
            base = json.load(fh).get("probes_warm", {})
    out = {"sf_dir": sf_dir, "runs": runs, "max_load": max_load,
           "probes": {}}
    for name in probes:
        gate = _wait_for_idle(max_load)
        print(f"# {name}: gate released at load {gate:.2f}",
              file=sys.stderr)
        res = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--child", name, sf_dir, str(runs)],
            capture_output=True, text=True, cwd=_REPO, timeout=900,
        )
        rec = None
        for ln in res.stdout.splitlines():
            if ln.startswith("#AB "):
                rec = json.loads(ln[4:])
        if rec is None:
            out["probes"][name] = {
                "error": res.stderr[-300:] or "no output"
            }
            continue
        rec["gate_load"] = round(gate, 2)
        b = base.get(name)
        if b:
            rec["baseline"] = b
            rec["ratio"] = round(rec["median"] / b, 3)
        out["probes"][name] = rec
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
