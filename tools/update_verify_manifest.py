"""Stamp VERIFY_MANIFEST.json — the churn-aware rotation's ground truth.

Run at ROUND START, before any code edits: at that moment the working
tree is exactly what the driver's latest CORRECTNESS_r{N}.json verified,
so stamping the CURRENT builder-source+oracle fingerprint for every query
green in that file records "this code is driver-proven". Later edits make
`__spark_entry__.fingerprint()` diverge from the stamped value and the
rotation (``__spark_entry__.queries()``) pulls the query back into the
next 50-query window ahead of merely-old vintages (r8 verdict item 2).

Usage:
    python tools/update_verify_manifest.py [--mark-stale name ...]

``--mark-stale`` force-flags queries whose code is KNOWN to have changed
since their last green even though their stamped fingerprint would look
current (bootstrap case: the manifest didn't exist when the change
landed). A stale flag is cleared automatically the next time the query
appears green in the newest CORRECTNESS file.

Queries green only in OLDER rounds that have no manifest entry yet are
bootstrap-stamped with the current fingerprint and ``"bootstrap": true``
— an explicit assumption (selfcheck covered interim churn) visible to
the judge; from this round forward every stamp is exact.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mark-stale", nargs="*", default=[])
    args = ap.parse_args()

    import __spark_entry__ as E

    last = E._vintage()
    if not last:
        raise SystemExit("no CORRECTNESS_r*.json greens found")
    newest_round = 0
    for f in glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json")):
        m = re.search(r"_r(\d+)\.json$", f)
        if m:
            newest_round = max(newest_round, int(m.group(1)))

    path = os.path.join(_REPO, "VERIFY_MANIFEST.json")
    man: dict[str, dict] = {}
    if os.path.exists(path):
        with open(path, encoding="utf-8") as fh:
            man = json.load(fh).get("queries", {})

    stamped = refreshed = boot = 0
    for q, rnd in sorted(last.items()):
        if q not in E.Q.QUERIES:
            continue  # renamed/retired query: keep any old entry inert
        if rnd == newest_round:
            # the tree equals what the driver just proved: exact stamp
            man[q] = {"fingerprint": E.fingerprint(q), "round": rnd}
            stamped += 1
        elif q not in man:
            man[q] = {
                "fingerprint": E.fingerprint(q),
                "round": rnd,
                "bootstrap": True,
            }
            boot += 1
        else:
            refreshed += 1  # keep the existing (older) stamp untouched

    for q in args.mark_stale:
        ent = man.setdefault(q, {"round": last.get(q, 0)})
        ent["stale"] = True

    with open(path, "w", encoding="utf-8") as fh:
        json.dump(
            {"newest_round": newest_round, "queries": man},
            fh,
            indent=1,
            sort_keys=True,
        )
        fh.write("\n")
    print(
        f"manifest: {len(man)} entries (exact-stamped {stamped} from "
        f"r{newest_round}, bootstrapped {boot}, kept {refreshed}, "
        f"stale-marked {len(args.mark_stale)}) -> {path}"
    )


if __name__ == "__main__":
    main()
