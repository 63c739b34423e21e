"""D/U block reformulations that eliminate the pixel-(un)shuffle copies.

Round-3 HLO inspection of the autoencoder step found ~59 ms/step of
copies (62%!), dominated by the 6-D reshape+transpose lowerings of
pixel_unshuffle/pixel_shuffle around every D/U conv (2-4 ms each, ~6x
slower than a SOL copy) plus layout flips. ROADMAP item 4's algebra
removes them:

  DBlock:  conv3(unshuffle(x))  ==  conv6x6/s2(blockmirror_pad2(x))
           with w6[2dy+s1, 2dx+s2, c, f] = w3[dy, dx, (c,s1,s2), f]
           (identical MACs — the 36 taps ARE the 9 taps x 4 phases)
  UBlock:  conv3(shuffle(x))    ==  shuffle(4 phase convs k2x2)
           (1.78x MACs but dense channels; kills the PRE-shuffle)

This measures fwd and fwd+bwd of each form at the production shapes.
Usage: python experiments/block_forms.py [d|u|all]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from experiments.tpu_timer import bench, bench_grad
from vae_cyclegan_tpu.ops.pixel_shuffle import pixel_shuffle, pixel_unshuffle
from vae_cyclegan_tpu.ops.reflect_conv import reflect_conv

B = int(os.environ.get("B", "24"))
DT = jnp.bfloat16

D_LAYERS = [  # fine spatial, fine channels, out features
    ("D1", 256, 64, 128),
    ("D2", 128, 128, 256),
    ("D3", 64, 256, 512),
]
U_LAYERS = [  # coarse spatial, coarse channels, out features
    ("U3", 64, 256, 128),   # shuffle -> @128 x 64ch -> conv 64->128
    ("U4", 128, 128, 64),   # shuffle -> @256 x 32ch -> conv 32->64
]


def d_current(x, w3):
    return reflect_conv(pixel_unshuffle(x, 2), w3)


def _w6_from_w3(w3):
    k, _, cin4, f = w3.shape
    c = cin4 // 4
    w = w3.reshape(k, k, c, 2, 2, f)            # (dy, dx, c, s1, s2, f)
    w = w.transpose(0, 3, 1, 4, 2, 5)           # (dy, s1, dx, s2, c, f)
    return w.reshape(2 * k, 2 * k, c, f)


def _blockmirror2(x):
    x = jnp.concatenate([x[:, 2:4], x, x[:, -4:-2]], axis=1)
    return jnp.concatenate([x[:, :, 2:4], x, x[:, :, -4:-2]], axis=2)


def d_strided(x, w3):
    return jax.lax.conv_general_dilated(
        _blockmirror2(x), _w6_from_w3(w3), (2, 2), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def u_current(x, w3):
    return reflect_conv(pixel_shuffle(x, 2), w3)


def _phase_kernels(w3):
    """w3 (3,3,cf,F) on the fine grid -> per-(rho,sigma) coarse 2x2
    kernels over the coarse (c,s1,s2) channel layout.

    fine tap at row r = 2(i+m) + s1 contributes to output row 2i+rho when
    r = 2i+rho+dy-1, dy in [0,3) -> (m, s1) with 2m+s1 = rho+dy-1.
    """
    k, _, cf, f = w3.shape
    c4 = cf * 4
    out = []
    for rho in range(2):
        row = []
        for sig in range(2):
            wk = jnp.zeros((2, 2, c4, f), w3.dtype)
            for dy in range(k):
                a = rho + dy - 1          # fine row offset (from 2i)
                # kernel row index is m - min_m: rho=0 taps {-1,0},
                # rho=1 taps {0,1}
                m, s1 = a // 2 + (1 - rho), a % 2
                for dx in range(k):
                    b_ = sig + dx - 1
                    n_, s2 = b_ // 2 + (1 - sig), b_ % 2
                    # coarse channel block (c, s1, s2): offset into c4
                    wk = wk.at[m, n_, :, :].add(
                        _embed(w3[dy, dx], s1, s2, cf))
            row.append(wk)
        out.append(row)
    return out


def _embed(w_cf_f, s1, s2, cf):
    """Scatter (cf, F) into (4cf, F) at channel block (c, s1, s2)."""
    z = jnp.zeros((cf, 4, w_cf_f.shape[-1]), w_cf_f.dtype)
    z = z.at[:, 2 * s1 + s2].set(w_cf_f)
    return z.reshape(4 * cf, w_cf_f.shape[-1])


def u_phase(x, w3):
    """4 k2x2 coarse convs + interleave (depth_to_space) after."""
    n, hc, wc, c4 = x.shape
    ks = _phase_kernels(w3)
    f = w3.shape[-1]
    outs = []
    for rho in range(2):
        for sig in range(2):
            # taps m in {-1, 0} for rho=0 -> pad (1, 0); {0, 1} -> (0, 1)
            pad_r = (1, 0) if rho == 0 else (0, 1)
            pad_s = (1, 0) if sig == 0 else (0, 1)
            y = jax.lax.conv_general_dilated(
                x, ks[rho][sig], (1, 1), [pad_r, pad_s],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            outs.append(y)
    y4 = jnp.stack(outs, axis=3)          # (n, hc, wc, 4, f) (rho,sig)
    y4 = y4.reshape(n, hc, wc, 2, 2, f)
    y4 = y4.transpose(0, 1, 3, 2, 4, 5)
    return y4.reshape(n, 2 * hc, 2 * wc, f)


def check():
    key = jax.random.PRNGKey(0)
    for name, s, c, f in D_LAYERS[:1]:
        x = jax.random.normal(key, (2, s, s, c), jnp.float32)
        w3 = jax.random.normal(key, (3, 3, 4 * c, f), jnp.float32) * 0.05
        a = d_current(x, w3)
        b = d_strided(x, w3)
        print(f"D check {name}: max err "
              f"{float(jnp.max(jnp.abs(a - b))):.2e}", flush=True)
    for name, s, c4, f in U_LAYERS[:1]:
        x = jax.random.normal(key, (2, s, s, c4), jnp.float32)
        w3 = jax.random.normal(key, (3, 3, c4 // 4, f), jnp.float32) * 0.05
        a = u_current(x, w3)
        b = u_phase(x, w3)
        # u_phase uses coarse ZERO pad: exact only in the interior (the
        # 2-wide fine border needs reflect fixups, done at integration)
        err = float(jnp.max(jnp.abs(a[:, 2:-2, 2:-2] - b[:, 2:-2, 2:-2])))
        print(f"U check {name} (interior): max err {err:.2e}", flush=True)


def run_d():
    for name, s, c, f in D_LAYERS:
        x = jax.random.normal(jax.random.PRNGKey(0), (B, s, s, c),
                              jnp.float32).astype(DT)
        w3 = (jax.random.normal(jax.random.PRNGKey(1), (3, 3, 4 * c, f),
                                jnp.float32) * 0.05).astype(DT)
        tf_a = bench(d_current, x, w3)
        tf_b = bench(d_strided, x, w3)
        tg_a = bench_grad(d_current, x, w3, r1=8, r2=24)
        tg_b = bench_grad(d_strided, x, w3, r1=8, r2=24)
        print(f"{name}: fwd {tf_a:6.3f} -> {tf_b:6.3f} ms   "
              f"fwd+bwd {tg_a:6.3f} -> {tg_b:6.3f} ms", flush=True)


def run_u():
    for name, s, c4, f in U_LAYERS:
        x = jax.random.normal(jax.random.PRNGKey(0), (B, s, s, c4),
                              jnp.float32).astype(DT)
        w3 = (jax.random.normal(jax.random.PRNGKey(1), (3, 3, c4 // 4, f),
                                jnp.float32) * 0.05).astype(DT)
        tf_a = bench(u_current, x, w3)
        tf_b = bench(u_phase, x, w3)
        tg_a = bench_grad(u_current, x, w3, r1=8, r2=24)
        tg_b = bench_grad(u_phase, x, w3, r1=8, r2=24)
        print(f"{name}: fwd {tf_a:6.3f} -> {tf_b:6.3f} ms   "
              f"fwd+bwd {tg_a:6.3f} -> {tg_b:6.3f} ms", flush=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    print(f"backend={jax.default_backend()} B={B}", flush=True)
    check()
    if mode in ("d", "all"):
        run_d()
    if mode in ("u", "all"):
        run_u()
