#!/usr/bin/env python3
"""Assemble the round-5 parity evidence into docs/parity_curves.json.

Merges the round-4 artifact (kept for any family the round-5 campaign
did not re-run — real evidence, just at 128^2 for the deterministic
families) with every per-seed output under docs/parity_r5/, newest
winning per (arch, seed). Then prints the summary table used by
PARITY.md, including the seed max-gap distribution vs the chaos-probe
max-gap distribution for the adversarial families.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO / "scripts"))
from merge_parity import merge  # noqa: E402


def main() -> int:
    old = REPO / "docs" / "parity_curves.json"
    new = sorted((REPO / "docs" / "parity_r5").glob("parity_*.json"))
    inputs = ([str(old)] if old.exists() else []) + [str(p) for p in new]
    merged = merge(inputs)
    out = REPO / "docs" / "parity_curves.json"
    out.write_text(json.dumps(merged, indent=2))

    probe = json.loads(
        (REPO / "docs" / "vaegan_chaos_probe.json").read_text())
    probe_maxes = sorted(probe["probe_max_gaps"])
    print(f"chaos probes (n={probe['n_probes']}): max gaps "
          + ", ".join(f"{g:.2%}" for g in probe_maxes)
          + f"; band max {probe['band_max']:.2%}")
    print()
    print("| family | size | seeds | max rel. G_loss gap | final |")
    print("|---|---|---|---|---|")
    for r in merged:
        if "per_step_metrics" in r:
            continue
        if "seeds" in r:
            gaps = r["max_relative_gap_per_seed"]
            finals = r["final_relative_gap_per_seed"]
            print(f"| {r['architecture']} | {r['image_size']} | "
                  f"{len(r['seeds'])} | "
                  f"{min(gaps):.2%}-{max(gaps):.2%} | "
                  f"{min(finals):.2%}-{max(finals):.2%} |")
        else:
            print(f"| {r['architecture']} | {r['image_size']} | 1 | "
                  f"{r['max_relative_gap']:.2%} | "
                  f"{r['final_relative_gap']:.2%} |")
    print(f"\nwrote {out} ({len(merged)} records)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
