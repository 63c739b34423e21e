#!/usr/bin/env python3
"""Merge per-stage / per-seed parity_curves outputs into one
docs/parity_curves.json.

The round-5 evidence protocol runs `scripts/parity_curves.py` in many
small invocations (one arch or one (arch, seed) per process) so a
wall-clock cap can never destroy finished work. Each invocation writes a
list of single-run records; this tool groups them by architecture and —
where an arch has several seeds — rebuilds the same multi-seed
distribution record `parity_curves.py --seeds` would have emitted
(max/final gap per seed, chaos-band verdicts, full runs inline).

Usage:
    python scripts/merge_parity.py --out docs/parity_curves.json \
        /tmp/parity_*.json
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path


def merge(paths):
    by_arch: dict[str, list] = {}
    order: list[str] = []
    for p in paths:
        try:
            records = json.loads(Path(p).read_text())
        except (OSError, ValueError) as e:
            print(f"SKIP {p}: {e}")
            continue
        for r in records:
            arch = r["architecture"]
            if arch not in by_arch:
                by_arch[arch] = []
                order.append(arch)
            # a multi-seed record carries its runs inline; flatten them
            by_arch[arch].extend(r["runs"] if "runs" in r else [r])

    merged = []
    for arch in order:
        runs = by_arch[arch]
        # de-dup (same seed re-run): last write wins
        seen = {}
        for r in runs:
            seen[r.get("seed", 0)] = r
        runs = [seen[s] for s in sorted(seen)]
        if len(runs) == 1:
            merged.append(runs[0])
            continue
        merged.append({
            "architecture": arch,
            "steps": runs[0]["steps"],
            "image_size": runs[0]["image_size"],
            "batch": runs[0]["batch"],
            "seeds": [r.get("seed", 0) for r in runs],
            "max_relative_gap_per_seed":
                [r["max_relative_gap"] for r in runs],
            "final_relative_gap_per_seed":
                [r["final_relative_gap"] for r in runs],
            "max_relative_gap": max(r["max_relative_gap"] for r in runs),
            "within_chaos_band_per_seed":
                [r.get("within_chaos_band") for r in runs],
            "runs": runs,
        })
    return merged


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("inputs", nargs="+")
    ap.add_argument("--out", default="docs/parity_curves.json")
    args = ap.parse_args(argv)
    merged = merge(args.inputs)
    Path(args.out).write_text(json.dumps(merged, indent=2))
    for r in merged:
        if "seeds" in r:
            gaps = ", ".join(f"{g:.4%}" for g in
                             r["max_relative_gap_per_seed"])
            print(f"{r['architecture']:12s} {r['image_size']}px "
                  f"seeds {r['seeds']}: max gaps [{gaps}]")
        else:
            print(f"{r['architecture']:12s} {r['image_size']}px "
                  f"seed {r.get('seed', 0)}: max "
                  f"{r['max_relative_gap']:.4%} final "
                  f"{r['final_relative_gap']:.4%}")
    print(f"wrote {args.out} ({len(merged)} architectures)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
