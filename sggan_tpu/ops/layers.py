"""Core layer ops with TF/Keras semantics parity, as pure JAX functions.

Every op is a pair (init, apply): ``*_init(key, ...) -> params pytree`` and
a pure apply function.  Weight layouts follow TF so that TF checkpoints map
1:1 and numerics can be compared directly:

* conv kernels are HWIO ``(kh, kw, cin, cout)`` — TF ``Conv2D`` layout;
* transposed-conv kernels are ``(kh, kw, cout, cin)`` — TF
  ``Conv2DTranspose`` layout; the op itself is the *gradient of a forward
  conv*, exactly TF's ``conv2d_backprop_input`` semantics
  (``lax.conv_transpose(..., transpose_kernel=True)``).

Defaults match Keras: ``glorot_uniform`` kernels + zero bias for plain
convs (reference module.py:137 etc. use Keras defaults) and
``RandomNormal(0, 0.02)`` for the pix2pix nets (reference module.py:15,30).
``leaky_relu`` defaults to Keras's alpha=0.3 (NOT the common 0.2) because
the reference instantiates ``tf.keras.layers.LeakyReLU()`` with defaults
(module.py:139 etc.).

Dtype policy: convolutions cast inputs/weights to a compute dtype
(bfloat16 on TPU) and accumulate in float32 on the MXU via
``preferred_element_type``; activations stay in the compute dtype to keep
HBM traffic low.
"""

from __future__ import annotations

import functools
import math
from typing import Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from jax import lax

Stride = Union[int, Tuple[int, int]]

_DIMS = ("NHWC", "HWIO", "NHWC")


def _pair(s: Stride) -> Tuple[int, int]:
    return (s, s) if isinstance(s, int) else tuple(s)


# ----------------------------------------------------------------------
# initializers
# ----------------------------------------------------------------------

def glorot_uniform(key, shape, dtype=jnp.float32):
    """Keras glorot_uniform.  fan_in/out from the last two axes times the
    receptive field, matching keras.initializers._compute_fans."""
    rf = math.prod(shape[:-2]) if len(shape) > 2 else 1
    fan_in, fan_out = rf * shape[-2], rf * shape[-1]
    limit = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -limit, limit)


def normal_init(stddev: float = 0.02):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.normal(key, shape, dtype) * stddev
    return init


# ----------------------------------------------------------------------
# conv2d
# ----------------------------------------------------------------------

def conv2d_init(key, kh: int, kw: int, cin: int, cout: int,
                use_bias: bool = True, kernel_init=glorot_uniform,
                dtype=jnp.float32):
    p = {"w": kernel_init(key, (kh, kw, cin, cout), dtype)}
    if use_bias:
        p["b"] = jnp.zeros((cout,), dtype)
    return p


def conv2d(params, x, stride: Stride = 1, padding: str = "SAME",
           compute_dtype=None, bias: bool = True):
    """NHWC conv with TF 'SAME'/'VALID' padding semantics.  bf16 operands
    still accumulate in fp32 on the MXU (XLA's default for bf16 convs);
    the output stays in the compute dtype to keep HBM traffic low.

    bias=False skips the bias add WITHOUT touching params.  Models pass
    it for convs whose output feeds instance norm directly: IN subtracts
    the per-(sample, channel) spatial mean, so a per-channel constant
    shift is removed EXACTLY (for any bias value, incl. TF-checkpoint
    ones) and d(loss)/d(bias) is exactly 0 — the add is a dead full-HBM
    elementwise pass (~6 ms/step at the bench config; PERF.md round 3).
    The parameter stays in the tree for checkpoint layout parity."""
    cd = compute_dtype or x.dtype
    w = params["w"]
    y = lax.conv_general_dilated(
        x.astype(cd), w.astype(cd), _pair(stride), padding,
        dimension_numbers=_DIMS)
    if bias and "b" in params:
        y = y + params["b"].astype(cd)
    return y


# ----------------------------------------------------------------------
# conv2d_transpose (gradient-of-conv, TF parity)
# ----------------------------------------------------------------------

def conv2d_transpose_init(key, kh: int, kw: int, cin: int, cout: int,
                          use_bias: bool = True, kernel_init=glorot_uniform,
                          dtype=jnp.float32):
    # TF Conv2DTranspose kernel layout: (kh, kw, out_channels, in_channels)
    p = {"w": kernel_init(key, (kh, kw, cout, cin), dtype)}
    if use_bias:
        p["b"] = jnp.zeros((cout,), dtype)
    return p


def conv2d_transpose(params, x, stride: Stride = 1, padding: str = "SAME",
                     compute_dtype=None, bias: bool = True):
    """TF ``Conv2DTranspose`` semantics: the transpose (gradient) of a
    forward conv with the given stride/padding.  With 'SAME' the output
    spatial size is exactly ``in * stride`` (reference relies on this for
    its u128/u64 upsampling, module.py:254-258).

    bias=False: see conv2d — exact elision of the dead bias add when the
    output feeds instance norm directly."""
    cd = compute_dtype or x.dtype
    w = params["w"]  # (kh, kw, cout, cin) == forward-conv HWIO with I=cout
    y = lax.conv_transpose(
        x.astype(cd), w.astype(cd), _pair(stride), padding,
        dimension_numbers=_DIMS, transpose_kernel=True)
    if bias and "b" in params:
        y = y + params["b"].astype(cd)
    return y


# ----------------------------------------------------------------------
# dense (reference ops.py:44-49 'linear' — legacy, kept for completeness)
# ----------------------------------------------------------------------

def dense_init(key, cin: int, cout: int, use_bias: bool = True,
               kernel_init=glorot_uniform, dtype=jnp.float32):
    p = {"w": kernel_init(key, (cin, cout), dtype)}
    if use_bias:
        p["b"] = jnp.zeros((cout,), dtype)
    return p


def dense(params, x, compute_dtype=None):
    cd = compute_dtype or x.dtype
    y = jnp.dot(x.astype(cd), params["w"].astype(cd))
    if "b" in params:
        y = y + params["b"].astype(cd)
    return y


# ----------------------------------------------------------------------
# activations / regularization / padding
# ----------------------------------------------------------------------

def leaky_relu(x, alpha: float = 0.3):
    """Keras LeakyReLU default alpha=0.3 (reference module.py:139 etc.)."""
    return jnp.where(x >= 0, x, (alpha * x).astype(x.dtype))


def relu(x):
    return jnp.maximum(x, 0)


def tanh(x):
    return jnp.tanh(x)


def dropout(key, x, rate: float, deterministic: bool):
    """Inverted dropout (Keras semantics).  The reference's Keras models are
    called without training=True so their Dropout layers never fire
    (model.py:173); we expose `deterministic` and let the trainer decide
    (Config.dropout_mode)."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0).astype(x.dtype)


def _unpad_reflect_transpose(dy, lo: int, hi: int, axis: int):
    """Adjoint of a single-axis REFLECT pad: slice the core and add the
    border cotangents back onto their mirror sources (tiny strips), instead
    of the gather/scatter chain jnp.pad's autodiff emits (3 full-tensor HBM
    passes per pad at (16,256,512,64) — see PERF.md round 2 trace)."""
    n = dy.shape[axis] - lo - hi
    core = jax.lax.slice_in_dim(dy, lo, lo + n, axis=axis)

    def add_at(buf, strip, start):
        idx = [slice(None)] * buf.ndim
        idx[axis] = slice(start, start + strip.shape[axis])
        return buf.at[tuple(idx)].add(strip)

    if lo:
        top = jnp.flip(jax.lax.slice_in_dim(dy, 0, lo, axis=axis), axis)
        core = add_at(core, top, 1)
    if hi:
        bot = jnp.flip(jax.lax.slice_in_dim(dy, lo + n, lo + n + hi,
                                            axis=axis), axis)
        core = add_at(core, bot, n - hi - 1)
    return core


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _reflect_pad_cv(x, cfg: Tuple[Tuple[int, int], ...]):
    return jnp.pad(x, list(cfg), mode="reflect")


def _reflect_pad_fwd(x, cfg):
    return _reflect_pad_cv(x, cfg), None


def _reflect_pad_bwd(cfg, _, dy):
    dx = dy
    # transpose of the axis-sequential forward composition, reverse order
    for axis in reversed(range(dy.ndim)):
        lo, hi = cfg[axis]
        if lo or hi:
            dx = _unpad_reflect_transpose(dx, lo, hi, axis)
    return (dx,)


_reflect_pad_cv.defvjp(_reflect_pad_fwd, _reflect_pad_bwd)


def reflect_pad(x, pad: Union[int, Sequence[Tuple[int, int]]]):
    """tf.pad(..., "REFLECT") on the spatial axes of NHWC
    (reference module.py:210,230,262; model.py:115).

    Carries a custom VJP: the backward is one core slice plus strip adds
    (mathematically the exact adjoint; fp-identical sums in a different
    association order)."""
    if isinstance(pad, int):
        cfg = ((0, 0), (pad, pad), (pad, pad), (0, 0))
    else:
        cfg = tuple((int(a), int(b)) for a, b in pad)
    return _reflect_pad_cv(x, cfg)


def conv2d_reflect(params, x, compute_dtype=None, bias: bool = True):
    """``conv2d(params, reflect_pad(x, k//2), 1, "VALID")`` — the
    reference's reflect-padded conv pattern (module.py:210-213, 229-231) —
    computed WITHOUT materializing the padded activation: a zero-pad SAME
    conv (padding folded into the conv's input read) plus exact
    border-strip recomputes written in place.  Interior outputs are the
    same dot products either way; only the p-pixel frame is recomputed
    with the proper reflect sources (PERF.md round 2: the pad construction
    cost a full HBM pass per call).

    Carries a custom VJP (round 4): autodiff through the border
    machinery emitted, PER CONV, four full-size zero-border copies (the
    transpose of the ``.at[].set`` fix-ups) plus dgrads/wgrads of the
    four strip convs — ~2.5 ms/step of the SOL gap at the bench config
    (PERF.md round-4 trace).  The hand-written backward is the adjoint
    of the TRUE function conv(reflect_pad(x)): one full-correlation
    dgrad on the padded domain folded back through the reflect-pad
    adjoint, one wgrad-as-conv over the (transient) padded input — the
    same stored-activation pattern as pallas_conv_in._bwd, which
    oracle-tests pin against autodiff of the jnp.pad composition.

    Stride-1, odd-kernel only: SAME zero-padding coincides with
    reflect_pad(k//2)+VALID interiors only then (TF SAME pads
    asymmetrically for even k, and stride>1 changes which taps read the
    border)."""
    cd = compute_dtype or x.dtype
    y = _conv_reflect_cv(params["w"], x, jnp.dtype(cd))
    if bias and "b" in params:
        y = y + params["b"].astype(cd)
    return y


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _conv_reflect_cv(w, x, cd):
    return _conv_reflect_fwd_body(w, x, cd)


def _conv_reflect_fwd_body(w, x, cd):
    params = {"w": w}
    k = w.shape[0]
    assert k % 2 == 1, (
        f"conv2d_reflect requires an odd kernel (got k={k}): TF-SAME pads "
        "even kernels asymmetrically, which breaks the interior-equality "
        "this fast path relies on")
    p = k // 2
    y = conv2d(params, x, 1, "SAME", cd, bias=False)
    if p == 0:
        return y
    xcd = x.astype(cd)
    h = x.shape[1]
    flip_h = lambda t: t[:, ::-1]
    flip_w = lambda t: t[:, :, ::-1]
    wpad = lambda t: jnp.concatenate(
        [flip_w(t[:, :, 1:p + 1]), t, flip_w(t[:, :, -p - 1:-1])], axis=2)
    top_in = jnp.concatenate([flip_h(xcd[:, 1:p + 1]), xcd[:, :2 * p]],
                             axis=1)
    bot_in = jnp.concatenate([xcd[:, -2 * p:], flip_h(xcd[:, -p - 1:-1])],
                             axis=1)
    left_in = jnp.concatenate([flip_w(xcd[:, :, 1:p + 1]), xcd[:, :, :2 * p]],
                              axis=2)
    right_in = jnp.concatenate([xcd[:, :, -2 * p:],
                                flip_w(xcd[:, :, -p - 1:-1])], axis=2)
    y = y.at[:, :p].set(conv2d(params, wpad(top_in), 1, "VALID", cd,
                               bias=False))
    y = y.at[:, -p:].set(conv2d(params, wpad(bot_in), 1, "VALID", cd,
                                bias=False))
    y = y.at[:, p:h - p, :p].set(conv2d(params, left_in, 1, "VALID", cd,
                                        bias=False))
    y = y.at[:, p:h - p, -p:].set(conv2d(params, right_in, 1, "VALID", cd,
                                         bias=False))
    return y


def _conv_reflect_cv_fwd(w, x, cd):
    return _conv_reflect_fwd_body(w, x, cd), (w, x)


def _conv_reflect_cv_bwd(cd, res, dy):
    """Adjoint of conv(reflect_pad(x, p), VALID): one full-correlation
    dgrad on the padded domain folded back through the reflect-pad
    adjoint (strip adds), one wgrad-as-conv over the transiently padded
    input.  Replaces autodiff of the border fix-ups — which emitted four
    full-size zero-border copies plus eight strip-conv backward passes
    per call (~2.5 ms/step total at the bench config, PERF.md round 4)."""
    w, x = res
    k = w.shape[0]
    p = k // 2
    wc = w.astype(cd)
    dyc = dy.astype(cd)
    # dgrad: dx = R^T C^T dy with R the reflect pad and C the VALID
    # conv.  Let g = full correlation of dy with the 180-rotated,
    # IO-swapped kernel (spatial extent (H+2p, W+2p)).  g is NEVER
    # materialized (its core slice alone is a full HBM pass — measured
    # perf-neutral vs the zero-border copies it replaced, PERF.md r4):
    # the SAME correlation IS g's interior written straight into dx,
    # and the reflect-pad adjoint's mirror folds only need g's p-wide
    # frame, recomputed from dy's edge strips — the exact dual of the
    # forward's border fix-ups.
    w_rot = jnp.flip(wc, (0, 1)).swapaxes(2, 3)  # (k, k, Cout, Cin)
    dgr = lambda t, pad: lax.conv_general_dilated(
        t, w_rot, (1, 1), pad, dimension_numbers=_DIMS)
    dx = dgr(dyc, "SAME")  # g[p:-p, p:-p]
    if p:
        flip_h = lambda t: t[:, ::-1]
        flip_w = lambda t: t[:, :, ::-1]
        # pad is separable (R = R_h R_w), so the adjoint folds W then H.
        # W-fold onto interior rows: g[p:-p, :p] and g[p:-p, -p:].
        # The four strip adds are sequential DUS updates; expressing
        # them as zero-padded strips + one fused add was MEASURED 9 ms
        # WORSE at the bench config (with or without an
        # optimization_barrier, the pad chain re-shapes the dgrad
        # conv fusions 20% slower) — keep the DUS form.
        gl = dgr(dyc[:, :, :p], [(p, p), (2 * p, 0)])
        gr = dgr(dyc[:, :, -p:], [(p, p), (0, 2 * p)])
        dx = dx.at[:, :, 1:p + 1].add(flip_w(gl))
        dx = dx.at[:, :, -p - 1:-1].add(flip_w(gr))
        # H-fold strips: g rows [0:p] / [H+p:H+2p] over the full W+2p
        # extent, W-folded first so corner cotangents ride along
        def wfold(gs):
            core = gs[:, :, p:-p]
            core = core.at[:, :, 1:p + 1].add(flip_w(gs[:, :, :p]))
            return core.at[:, :, -p - 1:-1].add(flip_w(gs[:, :, -p:]))
        gt = wfold(dgr(dyc[:, :p], [(2 * p, 0), (2 * p, 2 * p)]))
        gb = wfold(dgr(dyc[:, -p:], [(0, 2 * p), (2 * p, 2 * p)]))
        dx = dx.at[:, 1:p + 1].add(flip_h(gt))
        dx = dx.at[:, -p - 1:-1].add(flip_h(gb))
    # wgrad as a conv: batch dim <- Cin, feature dim <- N
    xp = reflect_pad(x.astype(cd), p)
    dw = lax.conv_general_dilated(
        xp, dyc, (1, 1), "VALID",
        dimension_numbers=("CHWN", "IHWO", "NHWC"))  # (Cin, k, k, Cout)
    dw = jnp.transpose(dw, (1, 2, 0, 3)).astype(w.dtype)
    return dw, dx.astype(x.dtype)


_conv_reflect_cv.defvjp(_conv_reflect_cv_fwd, _conv_reflect_cv_bwd)
