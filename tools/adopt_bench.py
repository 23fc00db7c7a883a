"""Adopt the latest bench sweep as the committed seed (r12 verdict
item 4: the "adopt the lowest-IQR reading of the day" protocol must be
auditable from DATA, not ledger prose).

Usage:  python tools/adopt_bench.py [--dry-run]

Copies ``bench_result.out.json`` (the gitignored live output) over the
committed ``bench_result.json`` seed, flipping ``adopted: true`` on the
final entry of the rolling ``readings`` array — the entry describing
the run being adopted.  Refuses to adopt a reading stamped
``load_contaminated``/``contaminated`` (the r13 load gate) or
``canary_degraded`` (the r13 canary gate: host delivering a fraction
of its parallel capacity while loadavg reads idle), unless ``--force``
is given with a reason recorded in the seed.

The round-open checklist runs this instead of a bare ``cp``, so the
seed always carries the day's full sweep history with exactly one
adopted row per adoption.
"""

from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "bench_result.out.json")
SEED = os.path.join(ROOT, "bench_result.json")


def adopt(out_path: str = OUT, seed_path: str = SEED,
          force: bool = False, dry_run: bool = False) -> dict:
    with open(out_path) as fh:
        full = json.load(fh)
    readings = full.get("readings") or []
    if not readings:
        raise SystemExit("no readings array in %s — rerun bench.py" % out_path)
    latest = readings[-1]
    if latest.get("contaminated") and not force:
        raise SystemExit(
            "latest reading is load-contaminated (loadavg_1m=%s); rerun "
            "bench.py on a quiet machine or pass --force with a reason"
            % latest.get("loadavg_1m")
        )
    if latest.get("canary_degraded") and not force:
        raise SystemExit(
            "latest reading is canary-degraded (agg %s MB/s vs the "
            "history best — the host was delivering a fraction of its "
            "parallel capacity); rerun bench.py when the canary gate "
            "passes or pass --force with a reason"
            % latest.get("canary_agg_mb_per_s")
        )
    for r in readings:
        r["adopted"] = False
    latest["adopted"] = True
    if force:
        latest["force_adopted"] = True
    # merge canary_observations from the OUTGOING seed before the
    # overwrite: bench.py carries them forward at run start, but an
    # observation committed to the seed AFTER the day's sweep wrote
    # out.json would otherwise vanish here — collapsing the canary
    # gate's history back to whatever the sweeps saw
    try:
        with open(seed_path) as fh:
            old_seed = json.load(fh)
    except (OSError, ValueError):
        old_seed = {}
    out_obs = full.get("canary_observations")
    merged = list(out_obs) if isinstance(out_obs, list) else []
    old_obs = old_seed.get("canary_observations") if isinstance(
        old_seed, dict) else None
    if isinstance(old_obs, list):
        for o in old_obs:
            if o not in merged:
                merged.append(o)
    if merged:
        full["canary_observations"] = merged
    if dry_run:
        return full
    with open(seed_path, "w") as fh:
        json.dump(full, fh, indent=1)
    return full


if __name__ == "__main__":
    full = adopt(
        force="--force" in sys.argv, dry_run="--dry-run" in sys.argv
    )
    latest = full["readings"][-1]
    print(
        "adopted: value=%s iqr=%s loadavg_1m=%s (%d readings carried)"
        % (latest["value"], latest["iqr"], latest["loadavg_1m"],
           len(full["readings"]))
    )
