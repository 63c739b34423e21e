"""Single-chip serving latency of the flagship generator forward
(jitted G.apply, slope-corrected timing — see README Serving section).

Measured v5e (2026-08-19): batch 1 = 3.12 ms (320 img/s), batch 4 =
5.75 ms (696 img/s), batch 16 = 16.0 ms (1000 img/s), bf16 256x256.
"""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_bench"))
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_bench"))
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/experiments")
from vae_cyclegan_tpu.config import ModelConfig
from vae_cyclegan_tpu.models.tasks import create_task
from tpu_timer import bench

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
    print(f"generator fwd batch {b}: {t:.3f} ms  ({b/t*1000:.1f} img/s)")
