"""Normalization ops.

``instance_norm`` matches tfa.layers.InstanceNormalization (GroupNorm with
groups=channels): per-sample, per-channel moments over the spatial plane,
epsilon=1e-3, affine gamma=1/beta=0 (the reference instantiates it with
defaults 28 times, e.g. module.py:138).  Moments are always computed in
float32 regardless of the activation dtype.

A fused Pallas TPU kernel (stats + normalize + activation in one
pallas_call) lives in ``pallas_in.py``; ``instance_norm`` dispatches to it
on TPU and falls back to the pure-JAX/XLA path elsewhere.  Both produce
identical numerics (tested in tests/test_pallas.py).

``batch_norm`` matches Keras BatchNormalization (momentum .99, eps 1e-3) as
used by the pix2pix generator/discriminator (reference module.py:23,39).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

IN_EPS = 1e-3  # tfa GroupNormalization default
BN_EPS = 1e-3  # Keras BatchNormalization default


def instance_norm_init(c: int, dtype=jnp.float32):
    return {"gamma": jnp.ones((c,), dtype), "beta": jnp.zeros((c,), dtype)}


def _instance_norm_xla(x, gamma, beta, eps, act, alpha):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 2), keepdims=True)
    y = (xf - mean) * lax.rsqrt(var + eps)
    y = y * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    if act == "relu":
        y = jnp.maximum(y, 0)
    elif act == "leaky_relu":
        y = jnp.where(y >= 0, y, alpha * y)
    return y.astype(x.dtype)


def _moments_1pass(xf):
    """Per-(sample, channel) spatial mean/var in ONE multi-operand
    lax.reduce pass — XLA otherwise emits separate convert_reduce fusions
    for sum and sum-of-squares, each a full HBM read of the activation
    (~15 ms/generator-forward at 256x512 b=16, see PERF.md round 2).

    Numerics note: var = E[x^2] - mean^2 cancels in f32 when |mean| >>
    std; the absolute error is bounded by ~mean^2 * 2^-24, i.e. a
    relative normalization error of mean^2 * 6e-8 / (var + eps) — with
    eps = 1e-3 that is < 1e-4 for |mean| < 40, far inside the bf16
    compute noise of the surrounding convs (tfa itself uses the two-pass
    form; tests/test_tf_parity.py pins the eps semantics)."""
    n = xf.shape[1] * xf.shape[2]
    s1, s2 = lax.reduce((xf, xf * xf),
                        (jnp.float32(0), jnp.float32(0)),
                        lambda a, b: (a[0] + b[0], a[1] + b[1]), (1, 2))
    mean = s1 / n
    var = jnp.maximum(s2 / n - jnp.square(mean), 0.0)
    return mean[:, None, None, :], var[:, None, None, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _in_fused(x, gamma, beta, eps, act, alpha):
    xf = x.astype(jnp.float32)
    mean, var = _moments_1pass(xf)
    y = (xf - mean) * lax.rsqrt(var + eps)
    y = y * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    if act == "relu":
        y = jnp.maximum(y, 0)
    elif act == "leaky_relu":
        y = jnp.where(y >= 0, y, alpha * y)
    return y.astype(x.dtype)


def _in_fused_fwd(x, gamma, beta, eps, act, alpha):
    xf = x.astype(jnp.float32)
    mean, var = _moments_1pass(xf)
    rsig = lax.rsqrt(var + eps)
    xhat = (xf - mean) * rsig
    y = xhat * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    if act == "relu":
        y = jnp.maximum(y, 0)
    elif act == "leaky_relu":
        y = jnp.where(y >= 0, y, alpha * y)
    # save x + tiny per-(n,c) stats; xhat is recomputed in bwd (same HBM
    # traffic as saving it, without holding a second full tensor live)
    return y.astype(x.dtype), (x, gamma, beta, mean, rsig)


def _in_fused_bwd(eps, act, alpha, res, dy):
    x, gamma, beta, mean, rsig = res
    xf = x.astype(jnp.float32)
    dyf = dy.astype(jnp.float32)
    gf = gamma.astype(jnp.float32)
    xhat = (xf - mean) * rsig
    if act is not None:
        pre = xhat * gf + beta.astype(jnp.float32)
        if act == "relu":
            dyf = jnp.where(pre > 0, dyf, 0.0)
        elif act == "leaky_relu":
            dyf = jnp.where(pre >= 0, dyf, alpha * dyf)
    n = x.shape[1] * x.shape[2]
    # one pass over (dy, dy*xhat) for all three reductions
    s_dy, s_dyx = lax.reduce((dyf, dyf * xhat),
                             (jnp.float32(0), jnp.float32(0)),
                             lambda a, b: (a[0] + b[0], a[1] + b[1]),
                             (1, 2))
    dgamma = jnp.sum(s_dyx, axis=0).astype(gamma.dtype)
    dbeta = jnp.sum(s_dy, axis=0).astype(beta.dtype)
    m_dy = (s_dy / n)[:, None, None, :]
    m_dyx = (s_dyx / n)[:, None, None, :]
    dx = (rsig * gf) * (dyf - m_dy - xhat * m_dyx)
    return dx.astype(x.dtype), dgamma, dbeta


_in_fused.defvjp(_in_fused_fwd, _in_fused_bwd)


def instance_norm(params, x, eps: float = IN_EPS, act: Optional[str] = None,
                  alpha: float = 0.3, use_pallas: Optional[bool] = None):
    """Instance norm with optional fused activation.

    act: None | 'relu' | 'leaky_relu' (alpha = Keras default 0.3).
    use_pallas: True opts into the Pallas kernel (TPU, C%128==0 only).
    Default is the XLA path: the standalone kernel is ~34% faster than
    XLA's fusion at C>=128, but inside a full train step the custom call
    acts as a fusion barrier (XLA folds the normalize phase into conv
    epilogues) and measured ~6% slower end-to-end — see step_bench notes
    in bench.py history.
    """
    gamma, beta = params["gamma"], params["beta"]
    if use_pallas is None:
        use_pallas = False
    if use_pallas:
        try:
            from .pallas_in import instance_norm_pallas, supported
            if use_pallas is True and not supported(x):
                # narrow channel counts lose to XLA (see pallas_in.supported)
                return _instance_norm_xla(x, gamma, beta, eps, act, alpha)
            return instance_norm_pallas(x, gamma, beta, eps, act, alpha)
        except ImportError:
            pass
    return _in_fused(x, gamma, beta, eps, act, alpha)


def _on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


# ----------------------------------------------------------------------
# batch norm (pix2pix nets)
# ----------------------------------------------------------------------

def batch_norm_init(c: int, dtype=jnp.float32):
    return {
        "gamma": jnp.ones((c,), dtype), "beta": jnp.zeros((c,), dtype),
        # non-trainable moving stats, updated by the trainer
        "moving_mean": jnp.zeros((c,), dtype),
        "moving_var": jnp.ones((c,), dtype),
    }


def batch_norm(params, x, training: bool, momentum: float = 0.99,
               eps: float = BN_EPS):
    """Returns (y, new_params).  In inference mode uses moving stats — this
    is what the reference actually exercises, since its Keras models are
    never called with training=True (model.py:173,182-188), so the moving
    stats stay at init (mean 0, var 1)."""
    xf = x.astype(jnp.float32)
    if training:
        mean = jnp.mean(xf, axis=(0, 1, 2))
        var = jnp.mean(jnp.square(xf - mean), axis=(0, 1, 2))
        new = dict(params)
        new["moving_mean"] = (momentum * params["moving_mean"]
                              + (1 - momentum) * mean).astype(params["moving_mean"].dtype)
        new["moving_var"] = (momentum * params["moving_var"]
                             + (1 - momentum) * var).astype(params["moving_var"].dtype)
    else:
        mean = params["moving_mean"].astype(jnp.float32)
        var = params["moving_var"].astype(jnp.float32)
        new = params
    y = (xf - mean) * lax.rsqrt(var + eps)
    y = y * params["gamma"].astype(jnp.float32) + params["beta"].astype(jnp.float32)
    return y.astype(x.dtype), new
