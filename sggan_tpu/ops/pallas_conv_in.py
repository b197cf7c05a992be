"""Pallas TPU kernel: 3x3 stride-1 reflect-padded conv fused with
instance norm (+ optional relu) — the reference's resblock body
(module.py:208-217: reflect pad -> conv3x3 VALID -> IN -> relu) as ONE
pallas_call.

The north-star deliverable named by BASELINE's hard-part 4: settle with
silicon whether a hand-fused conv+IN epilogue beats XLA's (already
145+ TF/s) convolution fusions.  SETTLED (round 4, PERF.md table from
perf_conv_in.py): it does not — XLA's composition wins 17% fwd / 4.7%
fwd+bwd at the resblock shape and >2x at narrow channels, because the
contest is MXU rate (XLA's conv emitter outruns the in-kernel dot
pipeline) and not HBM traffic.  The default path stays
conv2d_reflect -> instance_norm; this module remains the measured
reference for VMEM-pipelined fused normalization.

Design (grid = (N,), everything else hand-pipelined):
  phase A: stream (tile_h+2, W+2, Cin) input slabs HBM->VMEM with
    double-buffered DMA; each tile's conv output is 9 shifted
    dot_generals (dy, dx taps) accumulated in f32 on the MXU, rounded
    once to the compute dtype (same single-rounding as XLA's conv),
    written back to HBM (the y16 output), while per-channel
    sum / sum-of-squares accumulate in VMEM f32 scratch — the IN
    moments pass rides the conv's own output traffic instead of
    costing a separate full-HBM read.
  phase B: re-stream the y16 tiles, normalize + gamma/beta + relu,
    write the final output.

HBM traffic: 1R(x_pad) + 1W(y16) + 1R(y16) + 1W(y)  — one full read
less than the XLA composition (conv 1R+1W, one-pass moments 1R,
normalize 1R+1W).

The backward is hand-written XLA with NO forward recompute: the kernel
also returns y16 + the (mean, rsig) stats, so the VJP is exactly the
stored-activation backward the XLA form uses (relu gate + one fused
reduction pass for dgamma/dbeta/dy16, then dgrad / wgrad-as-conv and
the reflect-pad strip adjoint).

Numerics: identical REAL function as instance_norm(conv2d_reflect(x))
with f32 accumulation and one rounding; bitwise equality with XLA is
not guaranteed (tap summation order differs), tests bound the error at
a few ulps of the compute dtype.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .layers import _unpad_reflect_transpose, reflect_pad
from .norm import IN_EPS

_K = 3  # kernel size (the resblock's only conv shape)


def supported(x, w) -> bool:
    """Shapes the kernel handles: 3x3 kernels, H divisible by the row
    tile, spatial plane >= one tile.  Narrow channels are allowed but
    expected to lose (lane waste) — perf_conv_in.py measures, callers
    gate on the measured table."""
    kh, kw, cin, cout = w.shape
    n, h, wd, c = x.shape
    th = _tile_h(h, wd, max(cin, 128), max(cout, 128), x.dtype.itemsize)
    return kh == _K and kw == _K and c == cin and h % th == 0 and h >= th


# Mosaic's scoped-VMEM stack limit is 16M; leave headroom for the weight
# buffer, the f32 moment scratch, and compiler temporaries.
_VMEM_BUDGET = 11 * 1024 * 1024


def _tile_h(h: int, wd: int, cin: int, cout: int, itemsize: int,
            tile_h=None, im2col: bool = False) -> int:
    """Largest power-of-two row tile whose scratch set (double-buffered
    input slabs + two double-buffered output stagings + the f32 conv
    accumulator on the stack + the pre-shift buffer when im2col) fits
    the scoped-VMEM budget."""
    if tile_h:
        assert h % tile_h == 0, (h, tile_h)
        return tile_h
    wp8 = -(-(wd + 2) // 8) * 8
    for th in (32, 16, 8, 4, 2):
        if h % th:
            continue
        slabs = 2 * (th + 2) * wp8 * cin * itemsize
        stage = 4 * th * wd * cout * itemsize
        acc = th * wd * cout * 4
        xsh = _K * (th + 2) * wd * cin * itemsize if im2col else 0
        if slabs + stage + acc + xsh <= _VMEM_BUDGET:
            return th
    return 1


def _kernel(xp_hbm, w_ref, gamma_ref, beta_ref, y_hbm, y16_hbm,
            mean_out, rsig_out, s1, s2, xslab, ystage, ynorm, sem_x,
            sem_yo, sem_yi, *rest, th: int, h: int, wd: int, wp8: int,
            cin: int, cout: int, eps: float, act: Optional[str],
            alpha: float, cd, im2col: bool):
    xsh = rest[0] if rest else None
    n = pl.program_id(0)
    n_tiles = h // th
    inv_n = 1.0 / (h * wd)

    def x_dma(slot, t):
        return pltpu.make_async_copy(
            xp_hbm.at[n, pl.ds(t * th, th + 2)], xslab.at[slot],
            sem_x.at[slot])

    def y_out_dma(slot, t, dst, src):
        return pltpu.make_async_copy(
            src.at[slot], dst.at[n, pl.ds(t * th, th)],
            sem_yo.at[slot])

    def y_in_dma(slot, t):
        return pltpu.make_async_copy(
            y16_hbm.at[n, pl.ds(t * th, th)], ystage.at[slot],
            sem_yi.at[slot])

    # ---------------- phase A: conv + bf16 round + moments ----------------
    s1[:] = jnp.zeros_like(s1)
    s2[:] = jnp.zeros_like(s2)
    x_dma(0, 0).start()

    def phase_a(t, _):
        slot = t % 2

        @pl.when(t + 1 < n_tiles)
        def _():
            x_dma((t + 1) % 2, t + 1).start()

        x_dma(slot, t).wait()
        slab = xslab[slot]  # (th+2, Wp8, Cin)
        acc = jnp.zeros((th, wd, cout), jnp.float32)
        if im2col:
            # pre-shift the three dx views once per tile (3 sublane
            # copies instead of 9 strided slices feeding the MXU); the
            # per-tap dy slice is on the untiled major dim (free)
            for dx in range(_K):
                xsh[dx] = slab[:, dx:dx + wd, :]
            for dy in range(_K):
                for dx in range(_K):
                    acc += lax.dot_general(
                        xsh[dx, dy:dy + th], w_ref[dy, dx],
                        dimension_numbers=(((2,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
        else:
            for dy in range(_K):
                for dx in range(_K):
                    xs = slab[dy:dy + th, dx:dx + wd, :]
                    acc += lax.dot_general(
                        xs, w_ref[dy, dx],
                        dimension_numbers=(((2,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
        y16 = acc.astype(cd)
        yf = y16.astype(jnp.float32)
        s1[:] = s1[:] + jnp.sum(yf, axis=(0, 1)).reshape(1, cout)
        s2[:] = s2[:] + jnp.sum(yf * yf, axis=(0, 1)).reshape(1, cout)

        @pl.when(t >= 2)
        def _():
            y_out_dma(slot, t - 2, y16_hbm, ystage).wait()

        ystage[slot] = y16
        y_out_dma(slot, t, y16_hbm, ystage).start()
        return 0

    lax.fori_loop(0, n_tiles, phase_a, 0)
    # drain the in-flight y16 writes before phase B reads them back
    for back in range(min(2, n_tiles)):
        t = n_tiles - 1 - back
        y_out_dma(t % 2, t, y16_hbm, ystage).wait()

    mean = s1[:] * inv_n
    var = jnp.maximum(s2[:] * inv_n - mean * mean, 0.0)
    rsig = lax.rsqrt(var + eps)
    mean_out[0] = mean
    rsig_out[0] = rsig
    gf = gamma_ref[:].astype(jnp.float32)
    bf = beta_ref[:].astype(jnp.float32)

    # ---------------- phase B: normalize + affine + act -------------------
    # separate in (ystage) and out (ynorm) buffers: the t+1 read-DMA may
    # land while the t-1 write-DMA is still draining the other slot
    y_in_dma(0, 0).start()

    def phase_b(t, _):
        slot = t % 2

        @pl.when(t + 1 < n_tiles)
        def _():
            y_in_dma((t + 1) % 2, t + 1).start()

        y_in_dma(slot, t).wait()
        yf = ystage[slot].astype(jnp.float32)
        out = (yf - mean) * rsig * gf + bf
        if act == "relu":
            out = jnp.maximum(out, 0)
        elif act == "leaky_relu":
            out = jnp.where(out >= 0, out, alpha * out)

        @pl.when(t >= 2)
        def _():
            y_out_dma(slot, t - 2, y_hbm, ynorm).wait()

        ynorm[slot] = out.astype(cd)
        y_out_dma(slot, t, y_hbm, ynorm).start()
        return 0

    lax.fori_loop(0, n_tiles, phase_b, 0)
    for back in range(min(2, n_tiles)):
        t = n_tiles - 1 - back
        y_out_dma(t % 2, t, y_hbm, ynorm).wait()


def _pallas_forward(x, w, gamma, beta, eps, act, alpha, interpret=False,
                    tile_h=None, im2col=False):
    n, h, wd, cin = x.shape
    cout = w.shape[-1]
    cd = x.dtype
    th = _tile_h(h, wd, max(cin, 128), max(cout, 128), x.dtype.itemsize,
                 tile_h, im2col)
    # Mosaic DMA slices along the (tiled, lane) channel axis must be
    # 128-aligned: zero-pad narrow channels (contributes 0 to the conv;
    # padded OUTPUT channels are statistics-garbage and sliced off)
    lane = 128 if not interpret else 8
    cpad_in = (-cin) % lane if cin < lane else 0
    cpad_out = (-cout) % lane if cout < lane else 0
    if cpad_in:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, cpad_in)))
        w = jnp.pad(w, ((0, 0), (0, 0), (0, cpad_in), (0, 0)))
    if cpad_out:
        w = jnp.pad(w, ((0, 0), (0, 0), (0, 0), (0, cpad_out)))
        gamma = jnp.pad(gamma, (0, cpad_out), constant_values=1.0)
        beta = jnp.pad(beta, (0, cpad_out))
    cin += cpad_in
    cout += cpad_out
    xp = reflect_pad(x, 1)  # (N, H+2, W+2, Cin)
    # Mosaic DMA slices along the (tiled, sublane) W axis must be
    # 8-aligned: round the padded width up and stream full-width slabs
    # (the <=6 garbage columns are never read by the taps)
    wp8 = -(-(wd + 2) // 8) * 8
    if wp8 != wd + 2:
        xp = jnp.pad(xp, ((0, 0), (0, 0), (0, wp8 - (wd + 2)), (0, 0)))
    kern = functools.partial(
        _kernel, th=th, h=h, wd=wd, wp8=wp8, cin=cin, cout=cout, eps=eps,
        act=act, alpha=alpha, cd=cd, im2col=im2col)
    wk = w.astype(cd)
    flops = 2 * _K * _K * cin * cout * n * h * wd
    by = x.dtype.itemsize
    scratch = [
        pltpu.VMEM((1, cout), jnp.float32),           # s1
        pltpu.VMEM((1, cout), jnp.float32),           # s2
        pltpu.VMEM((2, th + 2, wp8, cin), cd),        # x slabs
        pltpu.VMEM((2, th, wd, cout), cd),            # y staging (in)
        pltpu.VMEM((2, th, wd, cout), cd),            # y staging (out)
        pltpu.SemaphoreType.DMA((2,)),                # x in
        pltpu.SemaphoreType.DMA((2,)),                # y out
        pltpu.SemaphoreType.DMA((2,)),                # y16 in
    ]
    if im2col:
        scratch.append(pltpu.VMEM((_K, th + 2, wd, cin), cd))  # xsh
    y, y16, mean, rsig = pl.pallas_call(
        kern,
        grid=(n,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # xp (manual DMA)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w
            pl.BlockSpec((1, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),  # gamma
            pl.BlockSpec((1, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),  # beta
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # y (manual DMA)
            pl.BlockSpec(memory_space=pl.ANY),   # y16 (manual DMA)
            pl.BlockSpec((1, 1, cout), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),  # mean
            pl.BlockSpec((1, 1, cout), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),  # rsig
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, h, wd, cout), cd),
            jax.ShapeDtypeStruct((n, h, wd, cout), cd),
            jax.ShapeDtypeStruct((n, 1, cout), jnp.float32),
            jax.ShapeDtypeStruct((n, 1, cout), jnp.float32),
        ],
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=by * n * ((h + 2) * wp8 * cin
                                     + 3 * h * wd * cout),
            transcendentals=0),
        interpret=interpret,
    )(xp, wk, gamma.reshape(1, cout), beta.reshape(1, cout))
    if cpad_out:
        y = y[..., :cout - cpad_out]
        y16 = y16[..., :cout - cpad_out]
        mean = mean[..., :cout - cpad_out]
        rsig = rsig[..., :cout - cpad_out]
    return y, y16, mean[:, None], rsig[:, None]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9))
def conv3_in(x, w, gamma, beta, eps: float = IN_EPS,
             act: Optional[str] = "relu", alpha: float = 0.3,
             interpret: bool = False, tile_h: Optional[int] = None,
             im2col: bool = False):
    """reflect_pad(1) -> conv3x3 VALID -> instance norm -> act, fused.

    x: (N, H, W, Cin) compute-dtype activation; w: (3, 3, Cin, Cout)
    HWIO (TF layout, any float dtype — cast to x.dtype like conv2d);
    gamma/beta: (Cout,).  Same REAL function as
    ``instance_norm(in_params, conv2d_reflect(conv_params, x), act=act)``
    (the resblock body, reference module.py:208-217)."""
    y, _, _, _ = _pallas_forward(x, w, gamma, beta, eps, act, alpha,
                                 interpret, tile_h, im2col)
    return y


def _fwd(x, w, gamma, beta, eps, act, alpha, interpret, tile_h, im2col):
    y, y16, mean, rsig = _pallas_forward(x, w, gamma, beta, eps, act,
                                         alpha, interpret, tile_h, im2col)
    return y, (x, w, gamma, beta, y16, mean, rsig)


def _bwd(eps, act, alpha, interpret, tile_h, im2col, res, dy):
    """Stored-activation backward, no forward recompute (same work as
    XLA's autodiff of the unfused form): relu gate -> one fused pass for
    (dbeta, dgamma, d_y16) -> conv dgrad + wgrad-as-conv -> reflect-pad
    strip adjoint."""
    x, w, gamma, beta, y16, mean, rsig = res
    yf = y16.astype(jnp.float32)
    dyf = dy.astype(jnp.float32)
    gf = gamma.astype(jnp.float32)
    mean_b, rsig_b = mean, rsig  # already (n,1,1,c) from _pallas_forward
    xhat = (yf - mean_b) * rsig_b
    if act is not None:
        pre = xhat * gf + beta.astype(jnp.float32)
        if act == "relu":
            dyf = jnp.where(pre > 0, dyf, 0.0)
        elif act == "leaky_relu":
            dyf = jnp.where(pre >= 0, dyf, alpha * dyf)
    nsp = y16.shape[1] * y16.shape[2]
    s_dy, s_dyx = lax.reduce((dyf, dyf * xhat),
                             (jnp.float32(0), jnp.float32(0)),
                             lambda a, b: (a[0] + b[0], a[1] + b[1]),
                             (1, 2))
    dgamma = jnp.sum(s_dyx, axis=0).astype(gamma.dtype)
    dbeta = jnp.sum(s_dy, axis=0).astype(beta.dtype)
    m_dy = (s_dy / nsp)[:, None, None, :]
    m_dyx = (s_dyx / nsp)[:, None, None, :]
    d_y16 = ((rsig_b * gf) * (dyf - m_dy - xhat * m_dyx)).astype(x.dtype)

    cd = x.dtype
    wc = w.astype(cd)
    # dgrad on the padded input: full correlation with the 180-rotated,
    # IO-swapped kernel
    w_rot = jnp.flip(wc, (0, 1)).swapaxes(2, 3)  # (3,3,Cout,Cin)
    dxp = lax.conv_general_dilated(
        d_y16, w_rot, (1, 1), [(2, 2), (2, 2)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    dx = _unpad_reflect_transpose(dxp, 1, 1, axis=1)
    dx = _unpad_reflect_transpose(dx, 1, 1, axis=2)
    # wgrad as a conv: batch dim <- Cin, feature dim <- N
    xp = reflect_pad(x, 1).astype(cd)
    dw = lax.conv_general_dilated(
        xp, d_y16, (1, 1), "VALID",
        dimension_numbers=("CHWN", "IHWO", "NHWC"))  # (Cin,3,3,Cout)
    dw = jnp.transpose(dw, (1, 2, 0, 3)).astype(w.dtype)
    return dx.astype(x.dtype), dw, dgamma, dbeta


conv3_in.defvjp(_fwd, _bwd)


def conv3_in_xla(conv_params, in_params, x, eps: float = IN_EPS,
                 act: Optional[str] = "relu", alpha: float = 0.3,
                 compute_dtype=None):
    """The default XLA composition the kernel competes with — the exact
    resblock body (generator_resnet._res_block)."""
    from .layers import conv2d_reflect
    from .norm import instance_norm
    y = conv2d_reflect(conv_params, x, compute_dtype or x.dtype,
                       bias=False)
    return instance_norm(in_params, y, eps=eps, act=act, alpha=alpha)
