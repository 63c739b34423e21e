#!/bin/bash
# Final-priority remainder of the round-5 parity campaign (see
# parity_campaign_r5b.sh). Reprioritized mid-session: three vaegan seeds
# are a sufficient distribution, so the all-tensors-one-ulp chaos
# control (equivalent-magnitude perturbation) and the Double* /
# 256^2-family curves outrank vaegan seeds 3-4 and the flagship seeds.
# Waits for the in-flight invocation (PID $1) to finish first.
set -e
cd "$(dirname "$0")/.."
OUT=docs/parity_r5
mkdir -p "$OUT"

log() { echo "[$(date +%H:%M:%S)] $*"; }

if [ -n "$1" ]; then
  log "waiting for in-flight run (pid $1)..."
  while kill -0 "$1" 2>/dev/null; do sleep 20; done
  log "in-flight run done"
fi

if [ ! -f docs/vaegan_chaos_allulp.json ]; then
  log "all-ulp chaos control"
  python scripts/vaegan_chaos_allulp.py
fi

for a in doubleae doublevae autoencoder vae cycleae; do
  f="$OUT/parity_${a}_s0.json"
  [ -f "$f" ] && continue
  log "$a @256"
  python scripts/parity_curves.py --archs "$a" --steps 40 --seed 0 \
      --image_size 256 --out "$f"
done

for s in 3 4; do
  f="$OUT/parity_vaegan_s$s.json"
  [ -f "$f" ] && continue
  log "vaegan seed $s"
  python scripts/parity_curves.py --archs vaegan --steps 40 --seed "$s" \
      --chaos_band docs/vaegan_chaos_probe.json --out "$f"
done

for s in 0 1 2; do
  f="$OUT/parity_cyclevaegan_s$s.json"
  [ -f "$f" ] && continue
  log "cyclevaegan seed $s"
  python scripts/parity_curves.py --archs cyclevaegan --steps 40 \
      --seed "$s" --chaos_band docs/vaegan_chaos_probe.json --out "$f"
done

for a in aegan cyclevae; do
  f="$OUT/parity_${a}_s0.json"
  [ -f "$f" ] && continue
  log "$a @256"
  python scripts/parity_curves.py --archs "$a" --steps 40 --seed 0 \
      --image_size 256 --out "$f"
done

log "campaign complete"
