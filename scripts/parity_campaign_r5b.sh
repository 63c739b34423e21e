#!/bin/bash
# Remainder of the round-5 parity campaign, reordered so the cheap
# high-value stages (vaegan distribution, Double* curves — VERDICT r4
# item-5 done-criterion — and the deterministic 256^2 re-runs) all land
# before the expensive cyclevaegan seeds. Waits for the already-running
# chaos probe (PID $1) to finish first. Outputs are in-repo so the
# round-end auto-commit preserves partial work.
set -e
cd "$(dirname "$0")/.."
OUT=docs/parity_r5
mkdir -p "$OUT"

log() { echo "[$(date +%H:%M:%S)] $*"; }

if [ -n "$1" ]; then
  log "waiting for chaos probe (pid $1)..."
  while kill -0 "$1" 2>/dev/null; do sleep 20; done
  log "chaos probe done"
fi

# stage 2: vaegan gap distribution, 5 seeds vs the band
for s in 0 1 2 3 4; do
  f="$OUT/parity_vaegan_s$s.json"
  [ -f "$f" ] && continue
  log "stage 2: vaegan seed $s"
  python scripts/parity_curves.py --archs vaegan --steps 40 --seed "$s" \
      --chaos_band docs/vaegan_chaos_probe.json --out "$f"
done

# stage 3: Double* pretraining feeders (VERDICT r4 item 5) + the
# deterministic/variational families at the reference-native 256^2
for a in doubleae doublevae autoencoder vae cycleae; do
  f="$OUT/parity_${a}_s0.json"
  [ -f "$f" ] && continue
  log "stage 3: $a @256"
  python scripts/parity_curves.py --archs "$a" --steps 40 --seed 0 \
      --image_size 256 --out "$f"
done

# stage 4: flagship gap distribution (as many seeds as wall-clock allows)
for s in 0 1 2; do
  f="$OUT/parity_cyclevaegan_s$s.json"
  [ -f "$f" ] && continue
  log "stage 4: cyclevaegan seed $s"
  python scripts/parity_curves.py --archs cyclevaegan --steps 40 \
      --seed "$s" --chaos_band docs/vaegan_chaos_probe.json --out "$f"
done

# stage 5: remaining families at 256^2 (both already oracle-tested)
for a in aegan cyclevae; do
  f="$OUT/parity_${a}_s0.json"
  [ -f "$f" ] && continue
  log "stage 5: $a @256"
  python scripts/parity_curves.py --archs "$a" --steps 40 --seed 0 \
      --image_size 256 --out "$f"
done

log "campaign complete"
