"""Attestation-freshness ledger: replay every CORRECTNESS_r*.json against
the live query registry and print, per registered query, the latest round
that carried a driver verdict and whether it was green.

The driver only verdicts the FIRST 50 entries of ``queries()`` per round
(memory: driver-window-discipline), so the per-round `_FIRST_50` rotation
in ``__spark_entry__.py`` has to target the stalest evidence.  Every
round before this tool existed, that stale-cohort computation was
re-derived by hand from the JSON files; this makes it mechanical:

    python tools/freshness.py            # distribution + problem lists
    python tools/freshness.py --suggest  # next-window candidates, oldest
                                         # verdict first, alphabetical
                                         # within a round (the VERDICT r6
                                         # fill rule)

Exit status is non-zero if any registered query has no verdict at all or
its LATEST verdict is red — the two states the judge flags as ledger
debt.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_ledger() -> dict[str, tuple[int, bool]]:
    """name -> (latest round with a verdict, latest verdict is green)."""
    ledger: dict[str, tuple[int, bool]] = {}
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)\.json$", os.path.basename(path))
        if not m:  # e.g. a stray CORRECTNESS_rerun.json
            continue
        rnd = int(m.group(1))
        with open(path) as f:
            rows = json.load(f)
        for name, v in rows.items():
            if name in ledger and ledger[name][0] >= rnd:
                continue  # latest-round-wins by PARSED round, not filename sort
            green = bool(
                v.get("rows_match")
                and v.get("schema_match")
                # rows-only queries have no hash comparison recorded
                and v.get("hash_match") in (True, None)
                and not v.get("err")
            )
            ledger[name] = (rnd, green)
    return ledger


def main() -> int:
    sys.path.insert(0, REPO)
    import __spark_entry__ as e

    registry = list(e.queries())
    ledger = load_ledger()

    dist: dict[int, int] = {}
    never, stale_red = [], []
    for name in registry:
        if name not in ledger:
            never.append(name)
            continue
        rnd, green = ledger[name]
        dist[rnd] = dist.get(rnd, 0) + 1
        if not green:
            stale_red.append((name, rnd))

    print(f"registered: {len(registry)}")
    print(
        "latest-verdict distribution:",
        " ".join(f"r{r}:{n}" for r, n in sorted(dist.items())),
    )
    print(f"never-attested: {never or 'none'}")
    print(f"stale-red: {stale_red or 'none'}")

    if "--suggest" in sys.argv:
        attested = [n for n in registry if n in ledger]
        attested.sort(key=lambda n: (ledger[n][0], n))
        print("\nnext-window candidates (oldest verdict first):")
        for n in never + attested[: max(0, 50 - len(never))]:
            rnd = f"r{ledger[n][0]}" if n in ledger else "NEVER"
            print(f"  {rnd:>6}  {n}")

    return 1 if (never or stale_red) else 0


if __name__ == "__main__":
    raise SystemExit(main())
