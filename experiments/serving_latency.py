"""Single-chip serving latency of the flagship generator forward:
(a) live jitted G.apply (Pallas-on training config), and
(b) the exported StableHLO serving artifact (utils/export.py: pure-XLA,
    params embedded, seed-scalar API) loaded back and jitted via
    exp.call — the artifact a deployment actually runs
    (VERDICT r4 item 6: capture serving numbers through the export).

Slope-corrected timing (experiments/tpu_timer.py) strips the remote
tunnel's per-call host overhead.

Measured v5e (2026-08-19, live jit): batch 1 = 3.12 ms (320 img/s),
batch 4 = 5.75 ms (696 img/s), batch 16 = 16.0 ms (1000 img/s), bf16
256x256. Exported-artifact numbers: see docs/serving_latency_r05.json
(written by this script).
"""
import json
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_bench"))
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_bench"))
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/experiments")
from vae_cyclegan_tpu.config import ModelConfig
from vae_cyclegan_tpu.models.tasks import create_task
from tpu_timer import bench

results = {"image_size": 256, "dtype": "bf16", "arch": "cyclevaegan",
           "live_jit_pallas_ms": {}, "exported_xla_ms": {}}

task = create_task("cyclevaegan", model=ModelConfig(image_size=256, latent_dim=64, base_width=64, dtype=jnp.bfloat16), paired=False)
state = task.init_state(jax.random.PRNGKey(0))
rng = np.random.RandomState(0)
pG = state.params["G"]

def g_apply(x, p):
    out = task.G.apply({"params": p}, x, rngs={"reparam": jax.random.PRNGKey(0)})
    return out[0] if isinstance(out, tuple) else out

for b in (1, 4, 16):
    x = jnp.asarray(rng.rand(b, 256, 256, 3), jnp.float32)
    t = bench(lambda x_, p_: g_apply(x_, p_), x, pG, r1=16, r2=64, narrow=True)
    results["live_jit_pallas_ms"][b] = round(t, 3)
    print(f"live-jit generator fwd batch {b}: {t:.3f} ms  ({b/t*1000:.1f} img/s)")

# ---- exported serving artifact: export (pure-XLA task) -> save -> load ----
from vae_cyclegan_tpu.utils import export as vct_export

xtask = create_task("cyclevaegan", model=ModelConfig(
    image_size=256, latent_dim=64, base_width=64, dtype=jnp.bfloat16,
    use_pallas=False), paired=False)
exp = vct_export.export_generator(xtask, state)  # symbolic batch dim
path = "/tmp/serving_export_cvg.bin"
vct_export.save(exp, path)
loaded = vct_export.load(path)
serve = jax.jit(loaded.call)
seed = jnp.asarray(0, jnp.int32)

for b in (1, 4, 16):
    x = jnp.asarray(rng.rand(b, 256, 256, 3), jnp.float32)
    t = bench(lambda x_, s_: serve(x_, s_), x, seed, r1=16, r2=64, narrow=True)
    results["exported_xla_ms"][b] = round(t, 3)
    print(f"exported artifact batch {b}: {t:.3f} ms  ({b/t*1000:.1f} img/s)")

out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "docs", "serving_latency_r05.json")
with open(out, "w") as f:
    json.dump(results, f, indent=2)
print("wrote", out)
