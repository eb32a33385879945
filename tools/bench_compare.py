"""Round-over-round bench diff: which per-query moves are real?

Usage: python tools/bench_compare.py OLD_BENCH_FULL.json NEW_BENCH_FULL.json

The round-8 verdict's "What's wrong #2": this host's noise band (±12% on
totals, per-query spreads up to 10s) is wider than a plausible regression,
so eyeballing best-of sums cannot distinguish a real 1.4x slowdown on a 2s
query from pass-to-pass jitter. bench.py now records median-of-3 and the
per-query spread (max-min across passes); this tool turns those into a
mechanical verdict per query:

  REGRESSION  median grew >1.3x AND the absolute growth exceeds the wider
              of the two rounds' measured spreads (the move is outside the
              noise the harness itself observed)
  noise       median grew >1.3x but within the measured spread
  ok          everything else

Older BENCH_FULL.json files (pre-median) fall back to best-of timings with
their recorded spread. Prints one JSON line: flagged lists, core-subset
totals when both rounds carry them, and the common-set median ratio (the
honest round-over-round number — catalog growth changes the raw total).
Always exits 0: this is a diagnostic, not a gate; the driver's 2x baseline
gate stays the enforcement point.
"""

from __future__ import annotations

import json
import sys


def _load(path: str) -> dict:
    with open(path, encoding="utf-8") as fh:
        return json.load(fh)


def main() -> None:
    if len(sys.argv) != 3:
        sys.exit(__doc__.strip().splitlines()[2])
    old, new = _load(sys.argv[1]), _load(sys.argv[2])
    # Same statistic on BOTH sides: medians only when both rounds carry
    # them, else best-of for both — a best-of vs median cross-compare
    # would manufacture ~15% phantom regressions on its own.
    stat = "medians" if ("medians" in old and "medians" in new) else "queries"
    ot, osp = old.get(stat) or {}, old.get("spread") or {}
    nt, nsp = new.get(stat) or {}, new.get("spread") or {}
    common = sorted(set(ot) & set(nt))

    regressions, noise, improved = [], [], []
    for q in common:
        o, n = ot[q], nt[q]
        if o <= 0:
            continue
        ratio = n / o
        band = max(osp.get(q, 0.0), nsp.get(q, 0.0))
        rec = {
            "query": q,
            "old": o,
            "new": n,
            "ratio": round(ratio, 2),
            "spread_band": round(band, 3),
        }
        # A move is a REGRESSION only if it clears the measured noise
        # band AND a 1s absolute floor: this host's documented swings
        # make sub-second deltas undiagnosable regardless of ratio
        # (SKILL.md: identical runs differ 1.5x).
        if ratio > 1.3:
            real = (n - o) > band and (n - o) >= 1.0
            (regressions if real else noise).append(rec)
        elif ratio < 1 / 1.3:
            improved.append(rec)

    out = {
        "old": sys.argv[1],
        "new": sys.argv[2],
        "stat": stat,
        "n_common": len(common),
        "common_old_total": round(sum(ot[q] for q in common), 3),
        "common_new_total": round(sum(nt[q] for q in common), 3),
        "regressions": sorted(
            regressions, key=lambda r: -r["ratio"]
        ),
        "noise_moves": sorted(noise, key=lambda r: -r["ratio"]),
        "improved": sorted(improved, key=lambda r: r["ratio"]),
    }
    if out["common_old_total"]:
        out["common_ratio"] = round(
            out["common_new_total"] / out["common_old_total"], 3
        )
    for key in ("core_subset_median_total", "core_subset_total"):
        if key in old and key in new:
            out[key] = {"old": old[key], "new": new[key]}
            break
    print(json.dumps(out))


if __name__ == "__main__":
    main()
