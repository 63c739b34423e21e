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

    # trajectory-mean gap: the unbiasedness statistic — chaos wobble is
    # mean-zero, a framework wiring error would bias the whole curve
    import statistics

    def mean_gap(t, j):
        mt, mj = statistics.mean(t), statistics.mean(j)
        return abs(mj - mt) / abs(mt)

    a = probe["G_loss_a"]
    ctrl = [mean_gap(a, p["G_loss_b"]) for p in probe["probes"]]
    allulp = REPO / "docs" / "vaegan_chaos_allulp.json"
    if allulp.exists():
        al = json.loads(allulp.read_text())
        ctrl.append(mean_gap(a, al["G_loss_perturbed"]))
    print("torch-vs-torch control mean-of-curve gaps: "
          + ", ".join(f"{g:.2%}" for g in sorted(ctrl)))
    print()
    print("| family | size | seeds | max rel. G_loss gap | "
          "mean-of-curve gap | final |")
    print("|---|---|---|---|---|---|")
    for r in merged:
        if "per_step_metrics" in r:
            continue
        runs = r["runs"] if "seeds" in r else [r]
        mgaps = [mean_gap(x["torch_G_loss"], x["jax_G_loss"])
                 for x in runs]
        gaps = [x["max_relative_gap"] for x in runs]
        finals = [x["final_relative_gap"] for x in runs]

        def fr(v):
            return (f"{v[0]:.2%}" if len(v) == 1
                    else f"{min(v):.2%}-{max(v):.2%}")

        print(f"| {r['architecture']} | {r['image_size']} | {len(runs)} "
              f"| {fr(gaps)} | {fr(mgaps)} | {fr(finals)} |")
    print(f"\nwrote {out} ({len(merged)} records)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
