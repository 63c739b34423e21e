#!/usr/bin/env bash
# One-command first session on a real v5e-8 slice (VERDICT r4 item 7).
# Pins mesh 8 / global batch 192 (24/chip, bf16) / expected per-chip rate
# and the host feed-rate check; details + gates in scripts/run_v5e8.py.
#
#   ./scripts/run_v5e8.sh             # scaling + feed gates, one JSON line
#   ./scripts/run_v5e8.sh --spatial   # also price the (4x2) SP mesh
set -euo pipefail
cd "$(dirname "$0")/.."
exec python scripts/run_v5e8.py "$@"
