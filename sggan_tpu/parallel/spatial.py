"""Spatial sharding: the image H dimension sharded over the ``space`` mesh
axis, with halo exchange for convolution boundaries and psum'd
instance-norm moments.

This is the TPU-native analog of sequence/context parallelism for this
workload (SURVEY §5): the reference's scale axis is image resolution and it
*downscales* to cope (2048x1024 sources -> 128px crops, utils.py:172-196);
spatial sharding instead trains at native resolution by splitting the
activation plane across chips.

Mechanics (all inside shard_map over axis ``space``):
* SAME convs: each shard pulls the needed boundary rows from its
  neighbours via `lax.ppermute`; edge shards receive zeros from the
  non-circular permutation, which is exactly TF-SAME's zero padding;
* transposed convs (k=3): exchange one real boundary row each way, run the
  transpose conv on the extended block, crop `stride` rows per halo row;
* reflect pads: interior boundaries take neighbour rows, global edges
  reflect locally;
* instance norm: the ONE op that genuinely couples shards — per-channel
  sum/sumsq are psum'd over the axis before normalizing.

Supported here: the semantic models' ops (3x3/7x7 convs, 3x3 transpose
convs, reflect pads) and spatially-sharded resnet-generator /
patch-head-discriminator forwards.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from jax import lax

from ..ops.layers import leaky_relu, tanh

_DIMS = ("NHWC", "HWIO", "NHWC")


# ------------------------------------------------------------ halo exchange

def _from_above(rows, axis_name):
    """Each shard receives the argument rows of its upper neighbour
    (shard 0 receives zeros)."""
    n = lax.axis_size(axis_name)
    return lax.ppermute(rows, axis_name, [(i, i + 1) for i in range(n - 1)])


def _from_below(rows, axis_name):
    n = lax.axis_size(axis_name)
    return lax.ppermute(rows, axis_name, [(i + 1, i) for i in range(n - 1)])


def halo_exchange(x, top: int, bot: int, axis_name: str):
    """Extend the local H block with `top` rows from the upper neighbour
    and `bot` rows from the lower one (zeros at the global edges)."""
    parts = []
    if top:
        parts.append(_from_above(x[:, -top:], axis_name))
    parts.append(x)
    if bot:
        parts.append(_from_below(x[:, :bot], axis_name))
    return jnp.concatenate(parts, axis=1) if len(parts) > 1 else x


def _tf_same_pads(size: int, k: int, s: int):
    out = -(-size // s)
    total = max((out - 1) * s + k - size, 0)
    return total // 2, total - total // 2


# ------------------------------------------------------------- sharded ops

def conv2d_sp(params, x, stride: int, axis_name: str, compute_dtype=None):
    """TF-SAME conv on an H-sharded block.  Requires local H % stride == 0
    (true when the global H is a multiple of stride * axis size)."""
    cd = compute_dtype or x.dtype
    w = params["w"]
    k = w.shape[0]
    top, bot = _tf_same_pads(x.shape[1] * lax.axis_size(axis_name), k, stride)
    xh = halo_exchange(x.astype(cd), top, bot, axis_name)
    wlo, whi = _tf_same_pads(x.shape[2], k, stride)
    y = lax.conv_general_dilated(
        xh, w.astype(cd), (stride, stride),
        [(0, 0), (wlo, whi)], dimension_numbers=_DIMS)
    if "b" in params:
        y = y + params["b"].astype(cd)
    return y


def conv2d_valid_after_reflect_sp(params, x_padded, axis_name: str,
                                  compute_dtype=None):
    """VALID conv consuming rows provided by reflect_pad_sp (H already
    extended by (k-1)/2 per side locally)."""
    cd = compute_dtype or x_padded.dtype
    w = params["w"]
    y = lax.conv_general_dilated(
        x_padded.astype(cd), w.astype(cd), (1, 1), "VALID",
        dimension_numbers=_DIMS)
    if "b" in params:
        y = y + params["b"].astype(cd)
    return y


def conv2d_transpose_sp(params, x, stride: int, axis_name: str,
                        compute_dtype=None):
    """TF Conv2DTranspose (k=3, SAME) on an H-sharded block: extend with
    one real row per side, transpose-conv, crop stride rows per halo row."""
    cd = compute_dtype or x.dtype
    w = params["w"]
    assert w.shape[0] == 3, "spatial conv-transpose supports k=3"
    xh = halo_exchange(x.astype(cd), 1, 1, axis_name)
    y = lax.conv_transpose(
        xh, w.astype(cd), (stride, stride), "SAME",
        dimension_numbers=_DIMS, transpose_kernel=True)
    y = y[:, stride:-stride]
    if "b" in params:
        y = y + params["b"].astype(cd)
    return y


def instance_norm_sp(params, x, axis_name: str, eps: float = 1e-3,
                     act: Optional[str] = None, alpha: float = 0.3):
    """Instance norm with spatial moments psum'd over the mesh axis."""
    xf = x.astype(jnp.float32)
    n = x.shape[1] * x.shape[2] * lax.axis_size(axis_name)
    s1 = lax.psum(jnp.sum(xf, axis=(1, 2), keepdims=True), axis_name)
    s2 = lax.psum(jnp.sum(jnp.square(xf), axis=(1, 2), keepdims=True),
                  axis_name)
    mean = s1 / n
    var = jnp.maximum(s2 / n - jnp.square(mean), 0.0)
    y = (xf - mean) * lax.rsqrt(var + eps)
    y = y * params["gamma"].astype(jnp.float32) \
        + params["beta"].astype(jnp.float32)
    if act == "relu":
        y = jnp.maximum(y, 0)
    elif act == "leaky_relu":
        y = jnp.where(y >= 0, y, alpha * y)
    return y.astype(x.dtype)


def reflect_pad_sp(x, p: int, axis_name: str):
    """REFLECT pad on an H-sharded block: neighbour rows at interior
    boundaries, local reflection at the global edges; W reflects locally."""
    idx = lax.axis_index(axis_name)
    n = lax.axis_size(axis_name)
    recv_top = _from_above(x[:, -p:], axis_name)
    recv_bot = _from_below(x[:, :p], axis_name)
    refl_top = x[:, 1:p + 1][:, ::-1]
    refl_bot = x[:, -p - 1:-1][:, ::-1]
    top = jnp.where(idx == 0, refl_top, recv_top)
    bot = jnp.where(idx == n - 1, refl_bot, recv_bot)
    y = jnp.concatenate([top, x, bot], axis=1)
    return jnp.pad(y, [(0, 0), (0, 0), (p, p), (0, 0)], mode="reflect")


def depthwise_conv2d_sp(x, w_tf, axis_name: str, padding: str = "SAME"):
    """tf.nn.depthwise_conv2d on an H-sharded block (k=3).  SAME exchanges
    one halo row per side; VALID expects the rows already provided
    (reflect_pad_sp)."""
    kh, kw, c, mult = w_tf.shape
    w = w_tf.reshape(kh, kw, 1, c * mult)
    xf = x.astype(jnp.float32)
    if padding == "SAME":
        xf = halo_exchange(xf, (kh - 1) // 2, kh // 2, axis_name)
        wpad = _tf_same_pads(x.shape[2], kw, 1)
    else:
        wpad = (0, 0)
    return lax.conv_general_dilated(
        xf, w.astype(jnp.float32), (1, 1), [(0, 0), wpad],
        dimension_numbers=_DIMS, feature_group_count=c)


def tf_deriv_sp(x, axis_name: str):
    """Sobel derivative stack on an H-sharded block (ops.deriv.tf_deriv)."""
    from ..ops.deriv import deriv_kernel_sobel
    return depthwise_conv2d_sp(x, deriv_kernel_sobel(x.shape[-1]), axis_name)


def seg_boundary_weight_sp(seg, axis_name: str):
    """Class-boundary weight map on an H-sharded seg block
    (ops.deriv.seg_boundary_weight)."""
    from ..ops.deriv import deriv_kernel_diff
    segp = reflect_pad_sp(seg.astype(jnp.float32), 1, axis_name)
    conved = jnp.abs(depthwise_conv2d_sp(
        segp, deriv_kernel_diff(seg.shape[-1]), axis_name, padding="VALID"))
    return jnp.abs(jnp.sign(jnp.sum(conved, axis=-1, keepdims=True)))


def gradloss_criterion_sp(in_, target, weight, axis_name: str):
    """losses.gradloss_criterion with spatially-sharded derivatives; the
    mean is local — aggregate grads/losses with pmean over the axis."""
    d = jnp.abs(jnp.abs(tf_deriv_sp(in_, axis_name))
                - jnp.abs(tf_deriv_sp(target, axis_name)))
    d = jnp.mean(d, axis=-1, keepdims=True)
    return jnp.mean(weight * d)


# --------------------------------------------- spatially-sharded forwards

def generator_resnet_sp(params, x, axis_name: str, compute_dtype=None):
    """generator_resnet.apply on an H-sharded input block (same param tree,
    same numerics as the single-device forward)."""
    from ..models.generator_resnet import N_BLOCKS
    cd = compute_dtype or x.dtype
    y = x.astype(cd)
    y = reflect_pad_sp(y, 3, axis_name)
    y = conv2d_valid_after_reflect_sp(params["c1"], y, axis_name, cd)
    y = instance_norm_sp(params["c1_in"], y, axis_name, act="relu")
    y = conv2d_sp(params["c2"], y, 2, axis_name, cd)
    y = instance_norm_sp(params["c2_in"], y, axis_name, act="relu")
    y = conv2d_sp(params["c3"], y, 2, axis_name, cd)
    y = instance_norm_sp(params["c3_in"], y, axis_name, act="relu")
    for i in range(N_BLOCKS):
        b = params[f"r{i + 1}"]
        z = reflect_pad_sp(y, 1, axis_name)
        z = conv2d_valid_after_reflect_sp(b["conv1"], z, axis_name, cd)
        z = instance_norm_sp(b["in1"], z, axis_name, act="relu")
        z = reflect_pad_sp(z, 1, axis_name)
        z = conv2d_valid_after_reflect_sp(b["conv2"], z, axis_name, cd)
        z = instance_norm_sp(b["in2"], z, axis_name)
        y = z + y
    y = conv2d_transpose_sp(params["d1"], y, 2, axis_name, cd)
    y = instance_norm_sp(params["d1_in"], y, axis_name, act="relu")
    y = conv2d_transpose_sp(params["d2"], y, 2, axis_name, cd)
    y = instance_norm_sp(params["d2_in"], y, axis_name, act="relu")
    y = reflect_pad_sp(y, 3, axis_name)
    y = conv2d_valid_after_reflect_sp(params["out"], y, axis_name, cd)
    return tanh(y.astype(jnp.float32))


def generator_unet_sp(params, x, axis_name: str, compute_dtype=None):
    """generator_unet.apply on an H-sharded block — every conv is 3x3
    stride-1 SAME so halos are one row each way.  Dropout is not applied
    (equivalent to deterministic=True; per-shard dropout RNG would be
    valid — masks are per-pixel — but eval/serving paths are the target
    here)."""
    cd = compute_dtype or x.dtype
    y = x.astype(cd)
    enc = []
    for i in range(1, 9):
        y = conv2d_sp(params[f"e{i}"], y, 1, axis_name, cd)
        act = "relu" if i == 8 else "leaky_relu"
        y = instance_norm_sp(params[f"e{i}_in"], y, axis_name, act=act)
        enc.append(y)
    for i in range(1, 8):
        y = conv2d_transpose_sp(params[f"d{i}"], y, 1, axis_name, cd)
        y = instance_norm_sp(params[f"d{i}_in"], y, axis_name)
        y = y + enc[7 - i]
        if i in (3, 7):
            y = jnp.maximum(y, 0)
    y = conv2d_transpose_sp(params["d8"], y, 1, axis_name, cd)
    return tanh(y.astype(jnp.float32))


def discriminator_sp(params, x, mask, axis_name: str, compute_dtype=None):
    """Semantic discriminator with the paper-style stride-8 patch head
    (the reference's global VALID chain does not split spatially; init the
    params with head='patch')."""
    cd = compute_dtype or x.dtype
    y = x.astype(cd)
    y = leaky_relu(conv2d_sp(params["h0"], y, 2, axis_name, cd))
    y = conv2d_sp(params["h1"], y, 2, axis_name, cd)
    y = instance_norm_sp(params["h1_in"], y, axis_name, act="leaky_relu")
    y = conv2d_sp(params["h2"], y, 2, axis_name, cd)
    y = instance_norm_sp(params["h2_in"], y, axis_name, act="leaky_relu")
    y = conv2d_sp(params["h3"], y, 1, axis_name, cd)
    y = instance_norm_sp(params["h3_in"], y, axis_name, act="leaky_relu")
    y = conv2d_sp(params["h4"], y, 1, axis_name, cd).astype(jnp.float32)
    return jnp.sum(y * mask.astype(jnp.float32), axis=-1, keepdims=True)
