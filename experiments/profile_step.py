"""Capture a jax.profiler trace of the flagship train step and print an
op-category cost breakdown from the xplane.

Usage: python experiments/profile_step.py [arch] [outdir]
"""
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def capture(arch="cyclevaegan", outdir="/tmp/vct_profile"):
    from vae_cyclegan_tpu.config import ModelConfig
    from vae_cyclegan_tpu.models.tasks import create_task

    batch = int(os.environ.get("B", "24"))
    mc = ModelConfig(image_size=256, latent_dim=64, base_width=64,
                     dtype=jnp.bfloat16)
    task = create_task(arch, model=mc, paired=False)
    state = task.init_state(jax.random.PRNGKey(0))
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    b = {
        "x": jax.random.uniform(k1, (batch, 256, 256, 3), jnp.float32),
        "y": jax.random.uniform(k2, (batch, 256, 256, 3), jnp.float32),
    }
    step = jax.jit(task.train_step, donate_argnums=(0,))
    for _ in range(3):
        state, m = step(state, b)
    float(m["G_loss"])
    with jax.profiler.trace(outdir):
        for _ in range(3):
            state, m = step(state, b)
        float(m["G_loss"])
    print(f"trace written to {outdir}", flush=True)


def summarize(outdir="/tmp/vct_profile", top=40):
    """Aggregate device op durations from the xplane protobuf."""
    from xprof.convert import _pywrap_profiler_plugin as pp  # noqa

    paths = sorted(glob.glob(f"{outdir}/**/*.xplane.pb", recursive=True))
    if not paths:
        print("no xplane found")
        return
    path = paths[-1]
    try:
        from tensorboard_plugin_profile.convert import raw_to_tool_data
        data, _ = raw_to_tool_data.xspace_to_tool_data(
            [path], "framework_op_stats", {"tqx": "out:csv;"})
        print(data[:20000])
        return
    except Exception as e:  # noqa: BLE001
        print(f"framework_op_stats failed: {e}; falling back to raw parse")
    _raw_parse(path, top)


def _raw_parse(path, top):
    from tensorflow.core.profiler.protobuf import xplane_pb2  # type: ignore

    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    totals = {}
    for plane in xs.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        for line in plane.lines:
            for ev in line.events:
                md = plane.event_metadata[ev.metadata_id]
                totals[md.name] = (totals.get(md.name, 0)
                                   + ev.duration_ps / 1e9)
    for name, ms in sorted(totals.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{ms:10.3f} ms  {name}")


if __name__ == "__main__":
    arch = sys.argv[1] if len(sys.argv) > 1 else "cyclevaegan"
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/vct_profile"
    if os.environ.get("SUMMARIZE_ONLY") != "1":
        capture(arch, outdir)
    summarize(outdir)
