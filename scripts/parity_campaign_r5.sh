#!/bin/bash
# Round-5 parity evidence campaign (VERDICT r4 item 2), run serially on
# the 1-core dev host. Each stage is its own process writing its own
# artifact, so a wall-clock cap never destroys finished work; merge with
#   python scripts/merge_parity.py --out docs/parity_curves.json \
#       /tmp/parity_r5/parity_*.json
# Stage order = evidence value per minute: the chaos band and the
# formally-failing family (vaegan) first, then the at-the-line flagship,
# then the deterministic families re-run at the reference's native 256^2.
set -e
cd "$(dirname "$0")/.."
# per-stage outputs live IN the repo so a wall-clock cap can never
# destroy finished work (the driver commits stragglers at round end)
OUT=docs/parity_r5
mkdir -p "$OUT"

log() { echo "[$(date +%H:%M:%S)] $*"; }

# stage 1: torch-vs-torch chaos band, 5 one-ulp probes (torch only)
if [ ! -f docs/vaegan_chaos_probe.json ] || \
   ! python -c "import json,sys; d=json.load(open('docs/vaegan_chaos_probe.json')); sys.exit(0 if d.get('n_probes',1)>=5 else 1)"; then
  log "stage 1: vaegan chaos probe x5"
  python scripts/vaegan_chaos_probe.py --steps 40 --probes 5 \
      --out docs/vaegan_chaos_probe.json
fi

# stage 2: vaegan gap distribution, 5 seeds vs the band
for s in 0 1 2 3 4; do
  f="$OUT/parity_vaegan_s$s.json"
  [ -f "$f" ] && continue
  log "stage 2: vaegan seed $s"
  python scripts/parity_curves.py --archs vaegan --steps 40 --seed "$s" \
      --chaos_band docs/vaegan_chaos_probe.json --out "$f"
done

# stage 3: cyclevaegan distribution (as many seeds as wall-clock allows)
for s in 0 1 2; do
  f="$OUT/parity_cyclevaegan_s$s.json"
  [ -f "$f" ] && continue
  log "stage 3: cyclevaegan seed $s"
  python scripts/parity_curves.py --archs cyclevaegan --steps 40 \
      --seed "$s" --chaos_band docs/vaegan_chaos_probe.json --out "$f"
done

# stage 4: remaining families at the native 256^2 — the Double*
# pretraining feeders first (VERDICT r4 item 5 names their curves a
# done-criterion), then the families that already hold <0.5-1.9%
# 128^2 curves, then aegan/cyclevae (both already oracle-tested)
for a in doubleae doublevae autoencoder vae cycleae aegan cyclevae; do
  f="$OUT/parity_${a}_s0.json"
  [ -f "$f" ] && continue
  log "stage 4: $a @256"
  python scripts/parity_curves.py --archs "$a" --steps 40 --seed 0 \
      --image_size 256 --out "$f"
done

log "campaign complete"
