"""Fused Pallas TPU kernels for MXU-starved stride-1 reflect convolutions.

The generators' slowest layers (reference hot pattern Networks.py:57-149;
measured in experiments/layer_bench.py + ROADMAP.md) are the big-spatial,
low-channel convs: the k7 3->64 head, the k7 64->3 tail, and the U4
32->64 upsample conv. XLA loses on them three ways, each measured with
the slope-corrected timer (experiments/tpu_timer.py):

  * conv channel dims pad to the 128-wide MXU lane tile (cin=3 -> 43x
    wasted contraction);
  * `jnp.pad(mode='reflect')` materializes a full padded copy (tail:
    +3.0 ms, U4: +1.9 ms per call);
  * the gradient convs (transposed / weight-grad forms) lower even
    worse (head dx ~8 ms vs ~1 ms of real work).

Round-2 lesson (ROADMAP.md round-2 findings): a separate "flatten"
relayout kernel writes an intermediate flat tensor to HBM and XLA adds
layout copies at every pallas boundary — isolated per-layer wins did not
survive composition. This round the relayout is FUSED: each conv site is
ONE pallas_call from NHWC input to NHWC output.

Kernel anatomy (shared by forward, input-grad and weight-grad):

  * input rows arrive through ordinary block specs — a (1, R, W, C) main
    block plus k-1 single-row specs whose index maps compute the
    reflected (or clamped) row index from the grid position, so vertical
    reflect padding costs nothing;
  * the kernel transposes rows to channels-on-sublanes and assembles a
    flat slab S[(c), j*Wp + u] in VMEM scratch with row stride
    Wp = W + 2*pad EXACTLY (block specs have no DMA alignment limits, so
    none of round 2's 128-lane row padding: at W=256/k=7 that alone is a
    1.47x matmul-N win); horizontal reflect borders are written during
    assembly via lane concats;
  * tap (dy, dx) is then the constant lane offset dy*Wp + dx: a dense
    (k_dy, ci) patch (form A, low cin) or the raw slab (form B, low
    cout) feeds M-stacked MXU matmuls (dx resp. (dy,dx) stacked into M
    until it reaches 128), and the tap fold-down is cheap unaligned lane
    slices on the f32 accumulator;
  * the NHWC output block is written directly (transpose + sublane
    reshape, the round-2-proven pattern).

`starved_reflect_conv(x, w)` wires them into a custom_vjp whose backward
is exact for reflect padding: dx = reflect-fold(full correlation with the
rotated kernel) — the same fused kernel in zero-pad mode — and dw is a
single lane-contracting NT dot per row chunk accumulated across the
sequential grid. Residuals are the raw (x, w): nothing extra hits HBM.
Non-TPU backends and unsupported shapes fall back to ops.reflect_conv.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .reflect_conv import reflect_conv

# When True (tests on CPU), every pallas_call runs in interpreter mode.
_INTERPRET = False


def set_interpret(value: bool) -> None:
    global _INTERPRET
    _INTERPRET = bool(value)


def _pallas(*args, **kwargs):
    return pl.pallas_call(*args, interpret=_INTERPRET, **kwargs)


def _rup(a: int, m: int) -> int:
    return -(-a // m) * m


def _vmem_cap() -> int:
    """Per-call VMEM budget (bytes) the R (rows-per-chunk) selection loops
    stay under. Default 10 MB leaves headroom in the 16 MB/core scoped
    space for Mosaic's own double-buffering; VCT_VMEM_CAP_MB raises it —
    bigger R halves the grid-step count, amortizing the per-step slab
    assembly and the starved-M (21-row) dots of the tail-class shapes."""
    import os

    return int(float(os.environ.get("VCT_VMEM_CAP_MB", "10")) * 2 ** 20)


def _r_max() -> int:
    """Starting rows-per-chunk for the R selection loops (halved until the
    VMEM estimate fits `_vmem_cap`). Default 16; VCT_R_MAX=32/64 A/Bs
    bigger chunks (fewer grid steps) together with VCT_VMEM_CAP_MB."""
    import os

    return int(os.environ.get("VCT_R_MAX", "16"))


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


# ---------------------------------------------------------------------------
# slab assembly (shared)
# ---------------------------------------------------------------------------


def _row_specs(*, n, h, w_in, c, R, chunks, p, k, reflect):
    """Main (1, R, C, W) block + k-1 single-row specs whose index maps
    resolve the chunk's border rows (reflected for the forward pass,
    clamped for the zero-padded gradient pass — invalid rows are zeroed
    in-kernel).

    The kernel consumes x in channel-major (N, H, C, W) form: with C
    minor an NHWC block DMA moves C*itemsize-byte rows (6 bytes for the
    k7 head!), which measured 3.8x slower than XLA; with W on lanes the
    DMA moves full 2*W-byte rows and the in-kernel row transpose
    disappears. The (cheap, small-tensor) NHWC<->NHCW transposes happen
    in XLA at the call boundary."""

    # Clamp the main block index: the grid may run past the input's last
    # row block (zero-padded gradient chunks); every main row of such a
    # chunk is out of range and zero-masked in-kernel, so any in-bounds
    # block serves as its placeholder.
    last_block = _cdiv(h, R) - 1

    def main_map(s):
        return (s // chunks, jnp.minimum(s % chunks, last_block), 0, 0)

    specs = [pl.BlockSpec((1, R, c, w_in), main_map,
                          memory_space=pltpu.VMEM)]

    def reflect_row(r):
        r = jnp.abs(r)
        r = jnp.where(r >= h, 2 * h - 2 - r, r)
        return jnp.clip(r, 0, h - 1)

    def clamp_row(r):
        return jnp.clip(r, 0, h - 1)

    fix = reflect_row if reflect else clamp_row
    for j in range(k - 1):
        if j < p:
            off = -p + j            # rows preceding the main block
        else:
            off = R + (j - p)       # rows following it

        def row_map(s, _off=off):
            return (s // chunks, fix((s % chunks) * R + _off), 0, 0)

        specs.append(pl.BlockSpec((1, 1, c, w_in), row_map,
                                  memory_space=pltpu.VMEM))
    return specs


def _padded_row(j, main_ref, row_refs, *, k, p, R, w_in, c, reflect, h,
                chunks):
    """Build padded row j (C, wp) of the chunk's slab: border rows come
    from the k-1 single-row refs, horizontal borders are reflected (or
    zeroed) via lane concats; in zero mode rows outside [0, h) are
    zeroed (their specs deliver clamped rows)."""
    if j < p:
        src = row_refs[j][0, 0]                 # (C, W)
    elif j < p + R:
        src = main_ref[0, j - p]
    else:
        # post specs sit after the p pre specs: ref index j - R
        src = row_refs[j - R][0, 0]
    if p and reflect:
        # Mosaic has no `rev`: build the reflected borders from p
        # single-column slices (p <= 6)
        left = jnp.concatenate(
            [src[:, p - b:p - b + 1] for b in range(p)], axis=1)
        right = jnp.concatenate(
            [src[:, w_in - 2 - b:w_in - 1 - b] for b in range(p)],
            axis=1)
        row = jnp.concatenate([left, src, right], axis=1)
    elif p:
        z = jnp.zeros((c, p), src.dtype)
        row = jnp.concatenate([z, src, z], axis=1)
    else:
        row = src
    if not reflect:
        r0 = (pl.program_id(0) % chunks) * R
        raw = r0 + j - p
        valid = jnp.logical_and(raw >= 0, raw < h)
        row = jnp.where(valid, row, jnp.zeros_like(row))
    return row


def _assemble_slab(S, main_ref, row_refs, *, k, p, R, w_in, wp, c,
                   reflect, h, chunks):
    """Write R+k-1 padded rows into the flat slab scratch S (c_p
    sublanes, row stride wp)."""
    nrows = R + k - 1
    c_p = S.shape[0]
    if c < c_p:
        # channel-pad sublanes multiply zero weight columns, but VMEM
        # scratch is uninitialized and 0 * NaN = NaN — zero them.
        S[c:c_p, :] = jnp.zeros((c_p - c, S.shape[1]), S.dtype)
    # zero the lane slack past the last slab row (read by the widest tap
    # slices; lands only in cropped output columns, but keep it finite)
    S[0:c, nrows * wp:] = jnp.zeros((c, S.shape[1] - nrows * wp), S.dtype)
    for j in range(nrows):
        row = _padded_row(j, main_ref, row_refs, k=k, p=p, R=R, w_in=w_in,
                          c=c, reflect=reflect, h=h, chunks=chunks)
        S[0:c, j * wp:(j + 1) * wp] = row


def _row_ref_order(k, p):
    """_row_specs appends pre rows (j < p) then post rows; map them back
    to slab positions. Returns (n_pre, n_post)."""
    return p, k - 1 - p


# ---------------------------------------------------------------------------
# fused conv kernel (forms A and B)
# ---------------------------------------------------------------------------


def _conv_kernel(*refs, k, p, R, w_in, wp, c, c_p, cout, co_p, co_t, out_w,
                 reflect, h, chunks, dtype):
    main_ref = refs[0]
    row_refs = refs[1:k]
    w_ref = refs[k]
    o_ref = refs[k + 1]

    L = R * wp
    Lp = L + k - 1
    # dense (dy, ci) patch staged through scratch (Mosaic cannot concat
    # vectors with mismatched lane offsets); K = k_dy*c_p, M stacks
    # (dx, co_p) groups up to 128 so even cout=3 runs a 56-row dot
    # (co_p-padded) and the tap fold is only k lane-sliced adds.
    # (A direct-to-patch assembly skipping S was built, measured, and
    # retired: e2e the per-row stores cost more DMA overlap than the
    # slab round-trip saves — 70.2 vs 70.5 img/s, ROADMAP r3 cont. 4;
    # code in git history, commit 429dc8f^.)
    P_ref = refs[-1]
    S = refs[-2]
    _assemble_slab(S, main_ref, row_refs, k=k, p=p, R=R, w_in=w_in,
                   wp=wp, c=c, reflect=reflect, h=h, chunks=chunks)
    for dy in range(k):
        P_ref[dy * c_p:(dy + 1) * c_p, :] = S[0:c_p,
                                              dy * wp:dy * wp + Lp]
    P = P_ref[...]
    # co_t is the per-dx row group in the M-stacked dot: co_p
    # (sublane-aligned slices) when cout fills a tile, or the TIGHT cout
    # itself when cout < 8 — the tail/head-dx class (cout=3) otherwise
    # streams 56 M rows of which only 21 are real (measured 2.9 ms vs
    # ~29 GFLOP of useful work); tight packing cuts M to 21-24.
    g = max(1, min(k, 128 // max(co_t, 1)))
    acc = jnp.zeros((co_t, L), jnp.float32)
    for g0 in range(0, k, g):
        gc = min(g, k - g0)
        z = jax.lax.dot_general(
            w_ref[g0 * co_t:(g0 + gc) * co_t], P,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        for t in range(gc):
            dx = g0 + t
            acc = acc + z[t * co_t:(t + 1) * co_t, dx:dx + L]
    accb = acc.astype(dtype)
    for r in range(R):
        o_ref[0, r] = accb[0:cout, r * wp:r * wp + out_w]


def _conv_vmem_estimate(*, k, R, wp, c_p, cout, co_p, co_t, w_in, c,
                        out_w, itemsize):
    L = R * wp
    Lp = L + k - 1
    slab = c_p * ((R + k - 1) * wp + 128) * itemsize
    blocks = 2 * ((R + k - 1) * _rup(c, 8) * _rup(w_in, 128) * itemsize
                  + R * _rup(cout, 8) * _rup(out_w, 128) * itemsize)
    acc = _rup(co_t, 8) * L * 4
    patch = k * c_p * Lp * itemsize
    g = max(1, min(k, 128 // max(co_t, 1)))
    z = _rup(g * co_t, 8) * Lp * 4
    return slab + blocks + 2 * acc + patch + z


def _conv_call(x, w_packed, *, k, p, cin, cout, reflect):
    """x: channel-major (N, H, C, W); returns (N, OH, CO, OW)."""
    n, h, _, w_in = x.shape
    c_p = _rup(max(cin, 1), 8)
    co_p = _rup(cout, 8)
    co_t = _tight_co(cout)
    wp = w_in + 2 * p
    out_h = h + 2 * p - (k - 1)
    out_w = wp - (k - 1)
    itemsize = jnp.dtype(x.dtype).itemsize
    cap = _vmem_cap()
    R = _r_max()
    while R > 4 and _conv_vmem_estimate(
            k=k, R=R, wp=wp, c_p=c_p, cout=cout, co_p=co_p, co_t=co_t,
            w_in=w_in, c=cin, out_w=out_w, itemsize=itemsize) > cap:
        R //= 2
    # Reflect mode has no in-kernel row masking, so the main block may
    # not run past the input: R must divide h (h % 8 == 0 per
    # _supported). Zero mode masks invalid rows and tolerates partial
    # chunks.
    if reflect:
        while R > 1 and h % R:
            R //= 2
    chunks = _cdiv(out_h, R)
    steps = n * chunks

    specs = _row_specs(n=n, h=h, w_in=w_in, c=cin, R=R, chunks=chunks,
                       p=p, k=k, reflect=reflect)
    specs.append(pl.BlockSpec(w_packed.shape, lambda s: (0, 0),
                              memory_space=pltpu.VMEM))
    kern = functools.partial(
        _conv_kernel, k=k, p=p, R=R, w_in=w_in, wp=wp, c=cin, c_p=c_p,
        cout=cout, co_p=co_p, co_t=co_t, out_w=out_w, reflect=reflect,
        h=h, chunks=chunks, dtype=x.dtype)
    y_spec = pl.BlockSpec(
        (1, R, cout, out_w), lambda s: (s // chunks, s % chunks, 0, 0),
        memory_space=pltpu.VMEM)
    y_shape = jax.ShapeDtypeStruct((n, out_h, cout, out_w), x.dtype)
    scratch = [
        pltpu.VMEM((c_p, (R + k - 1) * wp + 128), x.dtype),
        pltpu.VMEM((k * c_p, R * wp + k - 1), x.dtype),
    ]
    return _pallas(
        kern, grid=(steps,), in_specs=specs, out_specs=y_spec,
        out_shape=y_shape, scratch_shapes=scratch,
    )(*([x] * k), w_packed)


# ---------------------------------------------------------------------------
# weight gradient
# ---------------------------------------------------------------------------


def _dw_kernel(*refs, k, p, R, w_in, wp, c, c_p, cout, co_p, c_t, co_g,
               swap, h, chunks, steps, dtype):
    xmain_ref = refs[0]
    xrow_refs = refs[1:k]
    gmain_ref = refs[k]
    o_ref = refs[k + 1]
    Sx = refs[k + 2]
    Sg = refs[k + 3]
    dwacc = refs[k + 4]
    P_ref = refs[k + 5]
    G_ref = refs[k + 6]

    step = pl.program_id(0)
    _assemble_slab(Sx, xmain_ref, xrow_refs, k=k, p=p, R=R, w_in=w_in,
                   wp=wp, c=c, reflect=True, h=h, chunks=chunks)

    # g slab: rows at the same stride wp, zero lane tails + k-1 zero
    # lanes in FRONT so the dx shift becomes a left slice of Sg.
    L = R * wp
    Lp = L + k - 1
    zrow = jnp.zeros((cout, wp - w_in), dtype)
    Sg[:, 0:k - 1] = jnp.zeros((co_p, k - 1), dtype)
    for r in range(R):
        Sg[0:cout, k - 1 + r * wp:k - 1 + (r + 1) * wp] = (
            jnp.concatenate([gmain_ref[0, r], zrow], axis=1))
    Sg[:, k - 1 + L:k - 1 + L + 128] = jnp.zeros((co_p, 128), dtype)

    # Tight packs (c_t <= c_p, co_g <= co_p): padded-channel rows are
    # zero (Sx) or cropped later (Sg), so excluding them changes nothing
    # but the streamed M / padded N of the dot.
    for dy in range(k):
        P_ref[dy * c_t:(dy + 1) * c_t, :] = Sx[0:c_t, dy * wp:dy * wp + Lp]
    # G'[(dx, co), m] = g[co, m - dx] (zero out of range)
    for dx in range(k):
        G_ref[dx * co_g:(dx + 1) * co_g, :] = (
            Sg[0:co_g, (k - 1) - dx:(k - 1) - dx + Lp])

    if swap:
        # (k*co_g, k*c_t): chosen when streaming k*co_g rows against
        # ceil(k*c_t/128) lane tiles is cheaper than the reverse (tail
        # dw: 21 rows x 4 tiles vs 448 rows x 1 tile).
        part = jax.lax.dot_general(
            G_ref[...], P_ref[...],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
    else:
        part = jax.lax.dot_general(
            P_ref[...], G_ref[...],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # (k*c_t, k*co_g)

    @pl.when(step == 0)
    def _():
        dwacc[...] = jnp.zeros_like(dwacc)

    dwacc[...] = dwacc[...] + part

    @pl.when(step == steps - 1)
    def _():
        o_ref[...] = dwacc[...]


def _dw_call(x, g, *, k):
    """dw (k, k, cin, cout) f32 of conv(reflect_pad(x, k//2), w) wrt w.
    x, g are channel-major (N, H, C, W) / (N, H, CO, W).

    The dot packs channels tight (no 8-row pad when a side's channels
    are <8) and picks its orientation per shape: streamed-M rows times
    lane tiles of N is minimized, so the tail's dw runs (21, 448)
    instead of (448, 56) — 21 real M rows against 4 N tiles instead of
    448 streamed rows of which 7.6x are pad (measured 2.9 ms/call at
    ~38% MXU before)."""
    n, h, cin, w_in = x.shape
    cout = g.shape[2]
    p = k // 2
    c_p = _rup(max(cin, 1), 8)
    co_p = _rup(cout, 8)
    c_t = _tight_co(cin)
    co_g = _tight_co(cout)
    wp = w_in + 2 * p
    # A wide orientation (both tap factors on the narrow dot side) was
    # built, measured, and RETIRED (ROADMAP round 4): the dot itself wins
    # 30% (experiments/dw_dot_probe.py) but staging the k^2*narrow-row N
    # matrix through VMEM at 8-sublane store granularity eats it back —
    # tail 3.47 (classic) vs 3.76 (wide) ms whole-call. Kernel in git
    # history (commit b287a35:vae_cyclegan_tpu/ops/starved_conv.py).
    cost_orig = k * c_t * _cdiv(k * co_g, 128)
    cost_swap = k * co_g * _cdiv(k * c_t, 128)
    swap = _knob("VCT_DW_SWAP") and cost_swap < cost_orig
    out_rows, out_cols = (k * co_g, k * c_t) if swap else (k * c_t,
                                                           k * co_g)
    wp = w_in + 2 * p
    itemsize = jnp.dtype(x.dtype).itemsize
    cap = _vmem_cap()
    R = _r_max()

    def est(R):
        L = R * wp
        Lp = L + k - 1
        return (c_p * ((R + k - 1) * wp + 128) * itemsize      # Sx
                + co_p * (Lp + 256) * itemsize                 # Sg
                + k * c_t * Lp * itemsize                      # P
                + k * co_g * Lp * itemsize                     # G
                + 2 * _rup(out_rows, 8) * out_cols * 4         # dwacc+part
                + 2 * (R + k - 1) * _rup(w_in, 128)
                * (_rup(cin, 8) + _rup(cout, 8)) * itemsize)

    while R > 4 and est(R) > cap:
        R //= 2
    while R > 1 and h % R:  # Sx assembly is reflect mode: R must divide h
        R //= 2
    chunks = _cdiv(h, R)
    steps = n * chunks

    specs = _row_specs(n=n, h=h, w_in=w_in, c=cin, R=R, chunks=chunks,
                       p=p, k=k, reflect=True)
    specs.append(pl.BlockSpec((1, R, cout, w_in),
                              lambda s: (s // chunks, s % chunks, 0, 0),
                              memory_space=pltpu.VMEM))
    kern = functools.partial(
        _dw_kernel, k=k, p=p, R=R, w_in=w_in, wp=wp, c=cin, c_p=c_p,
        cout=cout, co_p=co_p, c_t=c_t, co_g=co_g, swap=swap, h=h,
        chunks=chunks, steps=steps, dtype=x.dtype)
    raw = _pallas(
        kern,
        grid=(steps,),
        in_specs=specs,
        out_specs=pl.BlockSpec((out_rows, out_cols), lambda s: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((out_rows, out_cols), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((c_p, (R + k - 1) * wp + 128), x.dtype),
            pltpu.VMEM((co_p, (R * wp + k - 1) + 256), x.dtype),
            pltpu.VMEM((out_rows, out_cols), jnp.float32),
            pltpu.VMEM((k * c_t, R * wp + k - 1), x.dtype),
            pltpu.VMEM((k * co_g, R * wp + k - 1), x.dtype),
        ],
    )(*([x] * k), g)
    if swap:
        dw = raw.reshape(k, co_g, k, c_t).transpose(2, 0, 3, 1)
    else:
        dw = raw.reshape(k, c_t, k, co_g).transpose(0, 2, 1, 3)
    return dw[:, :, :cin, :cout]


# ---------------------------------------------------------------------------
# weight packing
# ---------------------------------------------------------------------------


def _pack_w(w, c_p, co_t):
    """(k,k,cin,cout) -> (k_dx*co_t, k_dy*c_p). co_t is the per-dx row
    group: co_p for tile-aligned slicing, or the raw cout when the tight
    M pack engages (see _tight_co)."""
    k, _, cin, cout = w.shape
    wpad = jnp.pad(w, ((0, 0), (0, 0), (0, c_p - cin), (0, co_t - cout)))
    return wpad.transpose(1, 3, 0, 2).reshape(k * co_t, k * c_p)


def _tight_co(cout):
    """Per-dx M-row group for the forward/dx kernels. For cout < 8 the
    co_p pad makes the MXU stream 8/cout more M rows than exist (tail
    k7 64->3: M=56 for 21 real rows, measured 2.9 ms/call at ~14% MXU);
    packing rows as (dx, cout) with no pad cuts M to k*cout at the cost
    of sublane-unaligned accumulator slices (7 shifted adds on a
    (3, L) f32 — cheap)."""
    if cout >= 8 or not _knob("VCT_TIGHT_CO"):
        return _rup(cout, 8)
    return cout


# ---------------------------------------------------------------------------
# public op with exact reflect-pad VJP
# ---------------------------------------------------------------------------


def _conv_dispatch_cm(x_cm, w, *, pad_mode):
    """One fused pallas call on channel-major (N, H, C, W) data:
    reflect-SAME conv (pad_mode='reflect'), zero-padded FULL correlation
    (pad_mode='zero', p=k-1), or zero-padded SAME (pad_mode='zero_same',
    p=k//2 — the core of the reflect-pad adjoint fold, see
    `_dx_with_border_fold`). Returns (N, OH, CO, OW)."""
    k, _, cin, cout = w.shape
    reflect = pad_mode == "reflect"
    p = k // 2 if pad_mode in ("reflect", "zero_same") else k - 1
    c_p = _rup(max(cin, 1), 8)
    wp = _pack_w(w, c_p, _tight_co(cout)).astype(x_cm.dtype)
    return _conv_call(x_cm, wp, k=k, p=p, cin=cin, cout=cout,
                      reflect=reflect)


def _conv_dispatch(x, w, *, pad_mode):
    """NHWC wrapper: the channel-major kernel I/O transposes live here in
    XLA (cheap for the small-channel side; for 64-channel sides prefer
    the cm entry points so adjacent sites share the layout)."""
    xt = jnp.transpose(x, (0, 1, 3, 2))
    yt = _conv_dispatch_cm(xt, w, pad_mode=pad_mode)
    return jnp.transpose(yt, (0, 1, 3, 2))


def _knob(name):
    import os

    return os.environ.get(name, "1") != "0"


def _force():
    import os

    return os.environ.get("VCT_STARVED_FORCE") == "1"


def _fwd_wins(k, cin, cout):
    """Per-shape-class forward choice, measured on v5e (slope-corrected,
    experiments/starved_fused_bench.py): the Pallas fwd wins 2.0-2.3x on
    U4/tail but LOSES (0.79x) on the cin=3 head — the c_p=8 sublane pad
    wastes 2.7x of the matmul K and the 3-row slab assembly is pure VPU
    overhead. XLA's plain zero-pad fwd conv is fine there; only its
    *gradient* convs are catastrophic, so the bwd stays Pallas."""
    return cin >= 8 or _force()


# The cm<->NHWC handover transposes pin their adjoints to the cotangent's
# own dtype (same disease as the pixel-shuffle VJPs, ops/pixel_shuffle.py):
# the IN backward computes in f32 and XLA hoists its bf16->f32 convert
# across the adjoint transpose, running the 200 MB-class layout copies at
# double width (profiled: 4x 1.76 ms f32[24,256,256,64] + 4x 1.57 ms
# f32[24,256,256,32] flips per flagship step).


def _swap_wc(t):
    return jnp.transpose(t, (0, 1, 3, 2))


@jax.custom_vjp
def _to_nhwc(x_cm):
    return _swap_wc(x_cm)


def _pinned_swap(_, g):
    # Barrier on BOTH sides (same fix as ops/pixel_shuffle.py): the input
    # pin alone lets XLA sink a downstream f32 convert into the adjoint
    # transpose itself, doubling the copy width.
    out = _swap_wc(jax.lax.optimization_barrier(g))
    return (jax.lax.optimization_barrier(out),)


_to_nhwc.defvjp(lambda x_cm: (_swap_wc(x_cm), None), _pinned_swap)


@jax.custom_vjp
def _to_cm(x):
    return _swap_wc(x)


_to_cm.defvjp(lambda x: (_swap_wc(x), None), _pinned_swap)


def _fwd_impl_cm(x_cm, w):
    k, _, cin, cout = w.shape
    if not (_knob("VCT_STARVED_FWD") and _fwd_wins(k, cin, cout)):
        # XLA forward (head-class shapes): the boundary transposes cancel
        # against the NHWC wrapper's at HLO level, leaving a plain NHWC
        # conv; the custom_vjp still routes the backward to Pallas.
        return _to_cm(reflect_conv(_to_nhwc(x_cm), w))
    return _conv_dispatch_cm(x_cm, w, pad_mode="reflect")


def _reflect_fold_cm(gp, pad):
    """Adjoint of reflect padding on channel-major data: fold
    (N, H+2p, C, W+2p) back onto (N, H, C, W).

    Built as one concat per axis (the border corrections touch only
    2*pad rows/cols) — `.at[].add` chains would copy the full tensor
    once per border, which measured as the dominant backward cost."""
    if pad == 0:
        return gp
    n, hp, c, wp_ = gp.shape
    h = hp - 2 * pad
    core = gp[:, pad:hp - pad]
    gp = jnp.concatenate([
        core[:, 0:1],
        core[:, 1:pad + 1] + gp[:, pad - 1::-1],
        core[:, pad + 1:h - pad - 1],
        core[:, h - pad - 1:h - 1] + gp[:, :hp - pad - 1:-1],
        core[:, h - 1:h],
    ], axis=1)
    w = wp_ - 2 * pad
    core = gp[..., pad:wp_ - pad]
    return jnp.concatenate([
        core[..., 0:1],
        core[..., 1:pad + 1] + gp[..., pad - 1::-1],
        core[..., pad + 1:w - pad - 1],
        core[..., w - pad - 1:w - 1] + gp[..., :wp_ - pad - 1:-1],
        core[..., w - 1:w],
    ], axis=3)


def _full_corr_cm(s_cm, w):
    """Zero-padded full correlation (pad k-1 both dims) of a small
    channel-major strip via XLA; returns channel-major."""
    k = w.shape[0]
    y = jax.lax.conv_general_dilated(
        _to_nhwc(s_cm), w, (1, 1), [(k - 1, k - 1), (k - 1, k - 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return _to_cm(y)


def _dx_with_border_fold(g_cm, wrot, p):
    """dx of the reflect-SAME conv: one zero_same Pallas conv (the fold's
    interior) + O(p)-wide XLA strip corrections for the mirror borders.

    Mathematically identical to `_reflect_fold_cm(full_corr(g))` (the
    oracle, kept for tests) but never materializes the (H+2p, W+2p)
    correlation in HBM and replaces the fold's two full-tensor concat
    copies — profiled at ~25 ms/step of slice/concat/gather on the
    flagship — with strip convs and 6 small in-place adds.

    Derivation: with A = full_corr(g) (rows/cols in padded coords), the
    reflect-pad adjoint is a row fold B[r] = A[r+p] + A[p-r]|r∈[1,p] +
    A[2h+p-2-r]|r∈[h-p-1,h-2], then the same fold over columns of B.
    The interior A[p:h+p, p:w+p] is exactly the zero-padded SAME conv;
    every correction term lives in a p-wide strip of A.
    """
    n, h, c, w_ = g_cm.shape
    core = _conv_dispatch_cm(g_cm, wrot, pad_mode="zero_same")
    if p == 0:
        return core
    top = _full_corr_cm(g_cm[:, :p], wrot)[:, :p]          # A[0:p]
    bot = _full_corr_cm(g_cm[:, h - p:], wrot)[:, 2 * p:]  # A[h+p:h+2p]
    left = _full_corr_cm(g_cm[..., :p], wrot)[..., :p]     # A[:, 0:p]
    right = _full_corr_cm(g_cm[..., w_ - p:], wrot)[..., 2 * p:]
    rtop = top[:, ::-1]     # rtop[i] = A[p-1-i]: row r=1+i adds A[p-r]
    rbot = bot[:, ::-1]     # rbot[i] = A[h+2p-1-i]: row h-p-1+i adds it
    def _row_fold(t, fix_t, fix_b):
        # NOT .at[].add — that lowers to scatter-add (profiled at
        # 5 ms/site); concat assembly is one fused copy.
        return jnp.concatenate([
            t[:, 0:1],
            t[:, 1:p + 1] + fix_t,
            t[:, p + 1:h - p - 1],
            t[:, h - p - 1:h - 1] + fix_b,
            t[:, h - 1:h],
        ], axis=1)

    out = _row_fold(core, rtop[..., p:p + w_], rbot[..., p:p + w_])
    # column fold acts on the ROW-FOLDED tensor: fold rows into the
    # full-height col strips first (corner terms), then mirror columns.
    lB = _row_fold(left[:, p:h + p], rtop[..., :p], rbot[..., :p])
    rB = _row_fold(right[:, p:h + p], rtop[..., p + w_:],
                   rbot[..., p + w_:])
    return jnp.concatenate([
        out[..., 0:1],
        out[..., 1:p + 1] + lB[..., ::-1],
        out[..., p + 1:w_ - p - 1],
        out[..., w_ - p - 1:w_ - 1] + rB[..., ::-1],
        out[..., w_ - 1:w_],
    ], axis=3)


def _bwd_impl_cm(res, g_cm):
    x_cm, w = res
    k = w.shape[0]
    pad = k // 2
    g_cm = g_cm.astype(x_cm.dtype)
    dx_on, dw_on = _knob("VCT_STARVED_DX"), _knob("VCT_STARVED_DW")
    dxa = dwa = None
    if not (dx_on and dw_on):
        # A/B debug path: XLA's own gradient conv(s)
        _, vjp = jax.vjp(reflect_conv, _to_nhwc(x_cm), w)
        dxn, dwa = vjp(_to_nhwc(g_cm))
        dxa = _to_cm(dxn)
    if dx_on:
        # dx: zero_same gradient conv with in-strip reflect-adjoint fold
        wrot = w[::-1, ::-1].transpose(0, 1, 3, 2)  # (k, k, cout, cin)
        dx = _dx_with_border_fold(g_cm, wrot, pad)
    else:
        dx = dxa
    if dw_on:
        dw = _dw_call(x_cm, g_cm, k=k).astype(w.dtype)
    else:
        dw = dwa
    return dx, dw


@jax.custom_vjp
def _starved_conv_cm(x_cm, w):
    return _fwd_impl_cm(x_cm, w)


def _starved_conv_cm_fwd(x_cm, w):
    return _fwd_impl_cm(x_cm, w), (x_cm, w)


_starved_conv_cm.defvjp(_starved_conv_cm_fwd, _bwd_impl_cm)


def _starved_conv(x, w):
    """NHWC entry: boundary transposes around the channel-major op (the
    VJP flows through the cm custom_vjp; transposes differentiate
    trivially)."""
    return _to_nhwc(_starved_conv_cm(_to_cm(x), w))


def _supported(x_shape, w_shape, dtype) -> bool:
    if len(x_shape) != 4 or len(w_shape) != 4:
        return False
    k, k2, cin, cout = w_shape
    n, h, wd, cx = x_shape
    if k != k2 or k % 2 == 0 or k == 1 or cx != cin:
        return False
    if dtype not in (jnp.bfloat16, jnp.float32):
        return False
    # only the starved shapes: one side's channels small, spatial large
    # enough that relayout work amortizes
    if min(cin, cout) > 32 or max(cin, cout) > 512:
        return False
    if h < 32 or wd < 32 or h % 8 or wd % 8:
        return False
    return True


_DISABLED = False


def set_enabled(value: bool) -> None:
    """Process-wide programmatic gate, stronger than the env knobs. The
    train driver turns the suite off under --spatial: pallas_call has no
    SPMD partitioning rule, so a spatially sharded step must lower
    pure-XLA for GSPMD to insert the conv halo exchanges."""
    global _DISABLED
    _DISABLED = not value


def use_starved_conv() -> bool:
    """Default ON for TPU backends (VCT_STARVED_CONV=0 opts out): with
    the relayout fused into each conv call the round-2 pallas-boundary
    copies are gone and the kernels win end-to-end (see ROADMAP.md)."""
    import os

    if _DISABLED:
        return False
    env = os.environ.get("VCT_STARVED_CONV")
    if env is not None:
        return env == "1"
    if _INTERPRET:
        return True
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover - backend probing
        return False


def starved_reflect_conv(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Reflect-padded SAME conv (stride 1, odd k) dispatching the
    MXU-starved shapes to the fused Pallas kernels; others to
    reflect_conv."""
    if _supported(x.shape, jnp.shape(w), x.dtype) and use_starved_conv():
        return _starved_conv(x, w)
    return reflect_conv(x, w)


def cm_engaged(nhwc_shape, w_shape, dtype) -> bool:
    """Would the Pallas path run for this (logical NHWC) conv? Blocks use
    this to decide whether to hand channel-major tensors between adjacent
    starved sites (U4 -> IN -> tail), eliding the boundary transposes."""
    return _supported(tuple(nhwc_shape), tuple(w_shape), dtype) \
        and use_starved_conv()


def starved_reflect_conv_cm(x_cm: jnp.ndarray, w: jnp.ndarray
                            ) -> jnp.ndarray:
    """Channel-major (N, H, C, W) entry: same conv, no boundary
    transposes. Caller must have verified `cm_engaged` for this shape;
    unsupported shapes still compute correctly via the NHWC fallback."""
    n, h, c, wd = x_cm.shape
    if _supported((n, h, wd, c), jnp.shape(w), x_cm.dtype) \
            and use_starved_conv():
        return _starved_conv_cm(x_cm, w)
    return _to_cm(reflect_conv(_to_nhwc(x_cm), w))
