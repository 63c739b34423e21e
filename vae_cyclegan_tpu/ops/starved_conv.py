"""Pallas TPU kernels for MXU-starved stride-1 reflect convolutions.

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

These kernels fix the layout instead of the arithmetic: activations are
relaid to a flat "channels-on-sublanes" form (N, C_p, FLAT) where C_p =
ceil(C/8)*8 sits on sublanes (8-granular padding instead of 128) and the
padded spatial grid is flattened on lanes with row stride Wp (a lane-tile
multiple). Padded row j, padded column u of channel c sits at lane
    BASE + j*Wp + (u - pad),   BASE = 128,
so raw columns start lane-aligned, and the tap at (dy, dx) is the
constant lane offset dy*Wp + dx: dy taps come free via overlapping
row-slab DMAs and dx taps via (cheap, Mosaic-supported) unaligned lane
slices feeding dense MXU matmuls with f32 accumulation.

Kernels:
  flatten_nhwc   NHWC -> flat, with reflect or zero borders written
                 in-kernel (replaces both the XLA transpose and the XLA
                 reflect pad).
  _lowcin_call   conv with K = (dy, ci) dense on sublanes; one matmul
                 per dx; output transposed in-kernel and written NHWC.
                 Right when cin is small (head fwd, tail dx, U4 both).
  _lowcout_call  col2im form: per-dy matmuls lift cin to the (dx, co)
                 tap space, then lane-sliced accumulation folds taps
                 into rows. Right when cout is small (tail fwd, head dx).
  _dw_call       weight grad via lane-contracting (NT) dots per tap,
                 accumulated across the sequential grid in VMEM.

`starved_reflect_conv(x, w)` wires them into a custom_vjp whose backward
is exact for reflect padding (full-size gradient conv + border folds,
validated against jax.grad of the materialized reference). Non-TPU
backends and unsupported shapes fall back to ops.reflect_conv.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .reflect_conv import reflect_conv

_RF = 8         # rows per flatten chunk

# When True (tests on CPU), every pallas_call runs in interpreter mode.
_INTERPRET = False


def set_interpret(value: bool) -> None:
    global _INTERPRET
    _INTERPRET = bool(value)


def _pallas(*args, **kwargs):
    return pl.pallas_call(*args, interpret=_INTERPRET, **kwargs)


def _rup(a: int, m: int) -> int:
    return -(-a // m) * m


def _flat_geom(h: int, w: int, c: int, pad: int, wp_override: int = 0):
    """Geometry of the flat layout for an (., h, w, c) tensor with
    `pad`-wide borders. rows_flat covers the padded rows plus enough
    zero slack for consumers that round their output rows up to 16 and
    over-read one extra row-slab of DMA slack. base = lane offset of
    each padded row's raw column 0 within its wp-wide span; min(128, .)
    keeps big-image rows lane-aligned while guaranteeing every row fits
    its span (border spill into the next flatten window is handled by
    the window owner's extra preceding row)."""
    c_p = _rup(max(c, 1), 8)
    wp = wp_override or max(_rup(w + 2 * pad, 128), 128)
    base = min(128, wp - w)
    rows_pad = h + 2 * pad
    rows_flat = _rup(_rup(rows_pad, 16) + 8, _RF)
    return c_p, wp, base, rows_pad, rows_flat


# ---------------------------------------------------------------------------
# flatten
# ---------------------------------------------------------------------------


def flatten_nhwc(x: jnp.ndarray, pad: int, reflect: bool,
                 wp_override: int = 0) -> jnp.ndarray:
    """(N, H, W, C) -> (N, C_p, rows_flat*Wp) flat layout (see module
    docstring), borders reflected or zero, unwritten lanes zero.

    Raw manual DMAs require 128-multiple lane extents, which NHWC
    channel counts are not — so rows arrive via ordinary (Pallas-
    pipelined) block specs instead: the H borders are pre-extended with
    a cheap XLA row concat, and each chunk additionally receives the
    single preceding row so it can write the previous row's right
    border that spills across its window boundary."""
    n, h, w, c = x.shape
    c_p, wp, base, rows_pad, rows_flat = _flat_geom(h, w, c, pad, wp_override)
    chunks = rows_flat // _RF
    steps = n * chunks
    rf = _RF

    # XLA side: extend rows to exactly rows_flat padded rows
    if pad:
        if reflect:
            parts = [x[:, pad:0:-1], x, x[:, h - 2:h - 2 - pad:-1]]
        else:
            z = jnp.zeros((n, pad, w, c), x.dtype)
            parts = [z, x, z]
    else:
        parts = [x]
    tail = rows_flat - rows_pad
    parts.append(jnp.zeros((n, tail, w, c), x.dtype))
    xe = jnp.concatenate(parts, axis=1)  # (N, rows_flat, W, C)

    def kern(main_ref, prev_ref, o_ref):
        t = jnp.transpose(main_ref[0], (0, 2, 1))   # (rf, C, W)
        tp = prev_ref[0, 0].T                        # (C, W)
        o_ref[0] = jnp.zeros((c_p, rf * wp), o_ref.dtype)
        for r in range(rf):
            main_off = base + r * wp
            row = t[r]
            o_ref[0, 0:c, main_off:main_off + w] = row
            if pad and reflect:
                for b in range(pad):
                    left_off = main_off - pad + b
                    right_off = main_off + w + b
                    o_ref[0, 0:c, left_off:left_off + 1] = (
                        row[:, pad - b][:, None])
                    if right_off < rf * wp:
                        o_ref[0, 0:c, right_off:right_off + 1] = (
                            row[:, w - 2 - b][:, None])
        if pad and reflect and base + w + pad > wp:
            # previous row's right border spills into this window
            # (no previous row exists for the first window)
            @pl.when(pl.program_id(0) % chunks > 0)
            def _():
                for b in range(pad):
                    off = base - wp + w + b
                    if 0 <= off < rf * wp:
                        o_ref[0, 0:c, off:off + 1] = (
                            tp[:, w - 2 - b][:, None])

    return _pallas(
        kern,
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((1, rf, w, c),
                         lambda s: (s // chunks, s % chunks, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, w, c),
                         lambda s: (s // chunks,
                                    jnp.maximum((s % chunks) * rf - 1, 0),
                                    0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, c_p, rf * wp), lambda s: (s // chunks, 0, s % chunks),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, c_p, rows_flat * wp), x.dtype),
    )(xe, xe)


def flatten_nhwc_xla(x: jnp.ndarray, pad: int, reflect: bool,
                     wp_override: int = 0) -> jnp.ndarray:
    """XLA path for flatten (oracle + cheap for tiny channel counts)."""
    n, h, w, c = x.shape
    c_p, wp, base, rows_pad, rows_flat = _flat_geom(h, w, c, pad, wp_override)
    if pad:
        mode = "reflect" if reflect else "constant"
        xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode=mode)
    else:
        xp = x
    xp = jnp.pad(xp, ((0, 0), (0, 0), (0, wp - w - 2 * pad), (0, c_p - c)))
    xf = xp.transpose(0, 3, 1, 2).reshape(n, c_p, rows_pad * wp)
    lead = base - pad
    tail = rows_flat * wp - lead - rows_pad * wp
    return jnp.pad(xf, ((0, 0), (0, 0), (lead, tail)))


_FLATTEN_XLA_MAX_C = 8


def _flatten(x, pad, reflect, wp_override=0):
    if x.shape[-1] <= _FLATTEN_XLA_MAX_C or _INTERPRET:
        return flatten_nhwc_xla(x, pad, reflect, wp_override)
    return flatten_nhwc(x, pad, reflect, wp_override)


# ---------------------------------------------------------------------------
# primA: low-cin conv
# ---------------------------------------------------------------------------


def _lowcin_kernel(xf_ref, w_ref, o_ref, patch2, sem,
                   *, k, R, W, Wp, base, c_p, cout, pad, chunks, steps):
    step = pl.program_id(0)
    L = R * Wp
    # DMA lane starts must be 128-aligned: align down and absorb the
    # residual into the (cheap) in-kernel lane slices.
    delta = (base - pad) % 128

    def lane0(i, dy):
        return (base - pad - delta) + (i * R + dy) * Wp

    def start(slot, s):
        nn, ii = s // chunks, s % chunks
        for dy in range(k):
            pltpu.make_async_copy(
                xf_ref.at[nn].at[:, pl.ds(lane0(ii, dy), L + 256)],
                patch2.at[slot, pl.ds(dy * c_p, c_p), :],
                sem.at[slot, dy],
            ).start()

    @pl.when(step == 0)
    def _():
        start(0, step)

    @pl.when(step + 1 < steps)
    def _():
        start((step + 1) % 2, step + 1)

    slot = step % 2
    nn, ii = step // chunks, step % chunks
    for dy in range(k):
        pltpu.make_async_copy(
            xf_ref.at[nn].at[:, pl.ds(lane0(ii, dy), L + 256)],
            patch2.at[slot, pl.ds(dy * c_p, c_p), :],
            sem.at[slot, dy],
        ).wait()
    p = patch2[slot]
    acc = jnp.zeros((cout, L), jnp.float32)
    for dx in range(k):
        acc = acc + jax.lax.dot_general(
            w_ref[dx], p[:, delta + dx:delta + dx + L],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    accb = acc.astype(o_ref.dtype)
    o_ref[0] = accb.T.reshape(R, Wp, cout)[:, :W, :]


def _pick_r(out_h, pref):
    r = min(pref, out_h)
    while out_h % r:
        r //= 2
    return max(r, 1)


def _lowcin_call(xf, w_dx, *, k, pad, out_h, out_w, cout, c_p, wp, base,
                 R=32):
    n = xf.shape[0]
    itemsize = jnp.dtype(xf.dtype).itemsize
    # stay within VMEM: double-buffered patch + f32 accumulator (+its
    # transpose staging) + pipelined output blocks
    while R > 8 and (2 * k * c_p * (R * wp + 256) * itemsize
                     + 3 * cout * R * wp * 4) > 11 * 2 ** 20:
        R //= 2
    R = _pick_r(out_h, R)
    chunks = out_h // R
    steps = n * chunks
    kern = functools.partial(
        _lowcin_kernel, k=k, R=R, W=out_w, Wp=wp, base=base, c_p=c_p,
        cout=cout, pad=pad, chunks=chunks, steps=steps)
    return _pallas(
        kern,
        grid=(steps,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((k, cout, k * c_p), lambda s: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, R, out_w, cout), lambda s: (s // chunks, s % chunks, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, out_h, out_w, cout), xf.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, k * c_p, R * wp + 256), xf.dtype),
            pltpu.SemaphoreType.DMA((2, k)),
        ],
    )(xf, w_dx)


# ---------------------------------------------------------------------------
# primB: low-cout conv (col2im)
# ---------------------------------------------------------------------------


def _lowcout_kernel(xf_ref, w_ref, o_ref, slab2, sem,
                    *, k, R, W, Wp, base, c_p, cout, co_p, pad, chunks,
                    steps):
    step = pl.program_id(0)
    Ls = (R + k - 1) * Wp
    L = R * Wp
    delta = (base - pad) % 128

    def lane0(i):
        return (base - pad - delta) + i * R * Wp

    def start(slot, s):
        nn, ii = s // chunks, s % chunks
        pltpu.make_async_copy(
            xf_ref.at[nn].at[:, pl.ds(lane0(ii), Ls + 256)],
            slab2.at[slot],
            sem.at[slot],
        ).start()

    @pl.when(step == 0)
    def _():
        start(0, step)

    @pl.when(step + 1 < steps)
    def _():
        start((step + 1) % 2, step + 1)

    slot = step % 2
    nn, ii = step // chunks, step % chunks
    pltpu.make_async_copy(
        xf_ref.at[nn].at[:, pl.ds(lane0(ii), Ls + 256)],
        slab2.at[slot],
        sem.at[slot],
    ).wait()
    slab = slab2[slot]
    acc = jnp.zeros((co_p, L), jnp.float32)
    for dy in range(k):
        # z[(dx, co), :] = sum_ci w[dy, dx, ci, co] * slab[ci, :]
        # (full slab width incl. +128 slack so the dx slices below
        # never run off the end)
        z = jax.lax.dot_general(
            w_ref[dy], slab,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (k*co_p, Ls+128) f32
        for dx in range(k):
            off = delta + dy * Wp + dx
            acc = acc + z[dx * co_p:(dx + 1) * co_p, off:off + L]
    accb = acc.astype(o_ref.dtype)
    o_ref[0] = accb.T.reshape(R, Wp, co_p)[:, :W, :cout]


def _lowcout_call(xf, w_dy, *, k, pad, out_h, out_w, cout, c_p, wp, base,
                  R=16):
    n = xf.shape[0]
    co_p = _rup(cout, 8)
    itemsize = jnp.dtype(xf.dtype).itemsize
    while R > 8 and (2 * c_p * ((R + k - 1) * wp + 256) * itemsize
                     + (k * co_p + 2 * co_p) * (R + k - 1) * wp * 4
                     ) > 11 * 2 ** 20:
        R //= 2
    R = _pick_r(out_h, R)
    chunks = out_h // R
    steps = n * chunks
    kern = functools.partial(
        _lowcout_kernel, k=k, R=R, W=out_w, Wp=wp, base=base, c_p=c_p,
        cout=cout, co_p=co_p, pad=pad, chunks=chunks, steps=steps)
    return _pallas(
        kern,
        grid=(steps,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((k, k * co_p, c_p), lambda s: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, R, out_w, cout), lambda s: (s // chunks, s % chunks, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, out_h, out_w, cout), xf.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, c_p, (R + k - 1) * wp + 256), xf.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(xf, w_dy)


# ---------------------------------------------------------------------------
# primW: weight gradient
# ---------------------------------------------------------------------------


def _dw_kernel(xf_ref, gf_ref, o_ref, patch2, gy2, sem, gsem, dwacc,
               *, k, R, Wp, base, c_p, co_p, pad, chunks, steps):
    step = pl.program_id(0)
    L = R * Wp
    delta = (base - pad) % 128
    gdelta = base % 128

    def lane0(i, dy):
        return (base - pad - delta) + (i * R + dy) * Wp

    def glane0(i):
        return (base - gdelta) + i * R * Wp

    def start(slot, s):
        nn, ii = s // chunks, s % chunks
        for dy in range(k):
            pltpu.make_async_copy(
                xf_ref.at[nn].at[:, pl.ds(lane0(ii, dy), L + 256)],
                patch2.at[slot, pl.ds(dy * c_p, c_p), :],
                sem.at[slot, dy],
            ).start()
        pltpu.make_async_copy(
            gf_ref.at[nn].at[:, pl.ds(glane0(ii), L + 128)],
            gy2.at[slot],
            gsem.at[slot],
        ).start()

    @pl.when(step == 0)
    def _():
        start(0, step)

    @pl.when(step + 1 < steps)
    def _():
        start((step + 1) % 2, step + 1)

    slot = step % 2
    nn, ii = step // chunks, step % chunks
    for dy in range(k):
        pltpu.make_async_copy(
            xf_ref.at[nn].at[:, pl.ds(lane0(ii, dy), L + 256)],
            patch2.at[slot, pl.ds(dy * c_p, c_p), :],
            sem.at[slot, dy],
        ).wait()
    pltpu.make_async_copy(
        gf_ref.at[nn].at[:, pl.ds(glane0(ii), L + 128)],
        gy2.at[slot],
        gsem.at[slot],
    ).wait()

    @pl.when(step == 0)
    def _():
        dwacc[...] = jnp.zeros_like(dwacc)

    p = patch2[slot]
    g = gy2[slot]
    for dx in range(k):
        part = jax.lax.dot_general(
            p[:, delta + dx:delta + dx + L], g[:, gdelta:gdelta + L],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dwacc[dx] = dwacc[dx] + part

    @pl.when(step == steps - 1)
    def _():
        o_ref[...] = dwacc[...]


def _dw_call(xf, gf, *, k, pad, out_h, c_p, co_p, wp, base, R=16):
    """xf: flat input (pad=k//2 borders); gf: flat output-grad (pad=0,
    same wp). Returns (k_dx, k_dy*c_p, co_p) f32."""
    n = xf.shape[0]
    itemsize = jnp.dtype(xf.dtype).itemsize
    while R > 4 and 2 * k * c_p * (R * wp + 128) * itemsize > 8 * 2 ** 20:
        R //= 2
    R = _pick_r(out_h, R)
    chunks = out_h // R
    steps = n * chunks
    kern = functools.partial(
        _dw_kernel, k=k, R=R, Wp=wp, base=base, c_p=c_p, co_p=co_p,
        pad=pad, chunks=chunks, steps=steps)
    return _pallas(
        kern,
        grid=(steps,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((k, k * c_p, co_p), lambda s: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k, k * c_p, co_p), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, k * c_p, R * wp + 256), xf.dtype),
            pltpu.VMEM((2, co_p, R * wp + 128), xf.dtype),
            pltpu.SemaphoreType.DMA((2, k)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((k, k * c_p, co_p), jnp.float32),
        ],
    )(xf, gf)


# ---------------------------------------------------------------------------
# weight packing
# ---------------------------------------------------------------------------


def _pack_w_dx(w, c_p):
    """(k,k,cin,cout) -> (k_dx, cout, k_dy*c_p) for primA."""
    k, _, cin, cout = w.shape
    wpad = jnp.pad(w, ((0, 0), (0, 0), (0, c_p - cin), (0, 0)))
    return wpad.transpose(1, 3, 0, 2).reshape(k, cout, k * c_p)


def _pack_w_dy(w, co_p, c_p):
    """(k,k,cin,cout) -> (k_dy, k_dx*co_p, c_p) for primB."""
    k, _, cin, cout = w.shape
    wpad = jnp.pad(
        w, ((0, 0), (0, 0), (0, c_p - cin), (0, co_p - cout)))
    return wpad.transpose(0, 1, 3, 2).reshape(k, k * co_p, c_p)


# ---------------------------------------------------------------------------
# public op with exact reflect-pad VJP
# ---------------------------------------------------------------------------


def _conv_flat(xf, w, *, pad, out_h, out_w, c_p, wp, base):
    """Dispatch a flat input through primA or primB; output rows are
    rounded up to 16 internally and sliced by the caller."""
    k, _, cin, cout = w.shape
    out_h_pad = _rup(out_h, 16)
    if cout < cin:
        co_p = _rup(cout, 8)
        y = _lowcout_call(
            xf, _pack_w_dy(w, co_p, c_p).astype(xf.dtype),
            k=k, pad=pad, out_h=out_h_pad, out_w=out_w, cout=cout,
            c_p=c_p, wp=wp, base=base)
    else:
        y = _lowcin_call(
            xf, _pack_w_dx(w, c_p).astype(xf.dtype),
            k=k, pad=pad, out_h=out_h_pad, out_w=out_w, cout=cout,
            c_p=c_p, wp=wp, base=base)
    if out_h_pad != out_h:
        y = y[:, :out_h]
    return y


def _knob(name):
    import os

    return os.environ.get(name, "1") != "0"


def _fwd_impl(x, w):
    n, h, wd, cin = x.shape
    k = w.shape[0]
    pad = k // 2
    c_p, wp, base, _, _ = _flat_geom(h, wd, cin, pad)
    if not _knob("VCT_STARVED_FWD"):
        return reflect_conv(x, w), x
    xf = _flatten(x, pad, True)
    y = _conv_flat(xf, w, pad=pad, out_h=h, out_w=wd, c_p=c_p, wp=wp,
                   base=base)
    return y, xf


def _grad_x_full(g, w):
    """(N, H+2p, W+2p, cin) input gradient on the padded grid =
    full correlation of g with the rotated kernel."""
    n, h, wd, cout = g.shape
    k = w.shape[0]
    pad = k // 2
    full = k - 1
    wrot = w[::-1, ::-1].transpose(0, 1, 3, 2)  # (k, k, cout, cin)
    co_p, wp2, base2, _, _ = _flat_geom(h, wd, cout, full)
    gf = _flatten(g, full, False)
    return _conv_flat(gf, wrot, pad=full, out_h=h + 2 * pad,
                      out_w=wd + 2 * pad, c_p=co_p, wp=wp2, base=base2)


def _reflect_fold(gp, pad):
    """Adjoint of reflect padding: fold (N, H+2p, W+2p, C) back onto
    (N, H, W, C).

    Built as one concat per axis (the border corrections touch only
    2*pad rows/cols) — `.at[].add` chains would copy the full tensor
    once per border, which measured as the dominant backward cost."""
    if pad == 0:
        return gp
    n, hp, wp_, c = gp.shape
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
    core = gp[:, :, pad:wp_ - pad]
    return jnp.concatenate([
        core[:, :, 0:1],
        core[:, :, 1:pad + 1] + gp[:, :, pad - 1::-1],
        core[:, :, pad + 1:w - pad - 1],
        core[:, :, w - pad - 1:w - 1] + gp[:, :, :wp_ - pad - 1:-1],
        core[:, :, w - 1:w],
    ], axis=2)


def _unflatten(xf, h, wd, cin, pad):
    """Recover the raw NHWC tensor from its flat form."""
    c_p, wp, base, rows_pad, rows_flat = _flat_geom(h, wd, cin, pad)
    v = xf[:, :cin].reshape(xf.shape[0], cin, rows_flat, wp)
    v = v[:, :, pad:pad + h, base:base + wd]
    return v.transpose(0, 2, 3, 1)


def _grad_x_full_xla(g, w):
    """XLA version of _grad_x_full for A/B comparisons."""
    k = w.shape[0]
    full = k - 1
    wrot = w[::-1, ::-1].transpose(0, 1, 3, 2)
    gp = jnp.pad(g, ((0, 0), (full, full), (full, full), (0, 0)))
    return jax.lax.conv_general_dilated(
        gp, wrot, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _bwd_impl(res, g):
    xf, w = res
    k = w.shape[0]
    pad = k // 2
    cin, cout = w.shape[2], w.shape[3]
    n, h, wd = g.shape[0], g.shape[1], g.shape[2]
    g = g.astype(xf.dtype)
    if not _knob("VCT_STARVED_FWD"):
        # residual is the raw input (see _fwd_impl); XLA autodiff path
        x = xf
        _, vjp = jax.vjp(reflect_conv, x, w)
        return vjp(g)
    dx_on, dw_on = _knob("VCT_STARVED_DX"), _knob("VCT_STARVED_DW")
    dxa = dwa = None
    if not (dx_on and dw_on):
        # A/B debug path: XLA's own gradient conv(s)
        x = _unflatten(xf, h, wd, cin, pad)
        _, vjp = jax.vjp(reflect_conv, x, w)
        dxa, dwa = vjp(g)
    c_p, wp, base, _, _ = _flat_geom(h, wd, cin, pad)
    if dx_on:
        # dx: full-size gradient conv then reflect-pad adjoint fold
        dx = _reflect_fold(_grad_x_full(g, w), pad)
    else:
        dx = dxa
    if dw_on:
        # dw via lane-contracting dots; g flattened with the SAME row
        # stride as xf so lanes align tap-for-tap
        co_p = _rup(cout, 8)
        gf = _flatten(g, 0, False, wp_override=wp)
        out_h_pad = _rup(h, 16)
        dw_raw = _dw_call(xf, gf, k=k, pad=pad, out_h=out_h_pad,
                          c_p=c_p, co_p=co_p, wp=wp, base=base)
        dw = dw_raw.reshape(k, k, c_p, co_p)[:, :, :cin, :cout]
        dw = dw.transpose(1, 0, 2, 3).astype(w.dtype)
    else:
        dw = dwa
    return dx, dw


@jax.custom_vjp
def _starved_conv(x, w):
    y, _ = _fwd_impl(x, w)
    return y


def _starved_conv_fwd(x, w):
    y, xf = _fwd_impl(x, w)
    return y, (xf, w)


_starved_conv.defvjp(_starved_conv_fwd, _bwd_impl)


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


def use_starved_conv() -> bool:
    """Opt-in (VCT_STARVED_CONV=1): per-layer the kernels beat or match
    XLA in isolation, but in a full train step XLA inserts layout copies
    at every pallas boundary (~31 ms/step profiled on the autoencoder)
    which currently outweighs the win; default stays on the XLA path
    until the flatten+conv fusion lands."""
    import os

    if os.environ.get("VCT_STARVED_CONV", "0") != "1":
        return False
    if _INTERPRET:
        return True
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover - backend probing
        return False


def starved_reflect_conv(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Reflect-padded SAME conv (stride 1, odd k) dispatching the
    MXU-starved shapes to the Pallas kernels; others to reflect_conv."""
    if _supported(x.shape, jnp.shape(w), x.dtype) and use_starved_conv():
        return _starved_conv(x, w)
    return reflect_conv(x, w)
