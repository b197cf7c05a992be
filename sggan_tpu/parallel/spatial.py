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

2-D shard grid: every semantic-path op takes an optional ``axis_w`` mesh
axis that additionally shards the image W dimension (very wide panoramas).
Halo columns travel by the same ppermute mechanics; corners are handled by
ordering the exchanges H-then-W — the columns a shard sends already carry
the halo rows it received from its H neighbours, which is exactly the
diagonal-shard data the receiving corner needs.  Instance/batch-norm
moments psum over both spatial axes.  The pix2pix forwards support the
2-D grid too: their gather-at-depth fallback gathers both planes when
either local dim would fall below 2 and re-scatters both on decoder
re-entry.
"""

from __future__ import annotations

from typing import Optional

import jax
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


def _take(x, start: int, size: int, dim: int):
    idx = [slice(None)] * x.ndim
    idx[dim] = slice(start, start + size) if start >= 0 else slice(start, None)
    return x[tuple(idx)]


def halo_exchange(x, top: int, bot: int, axis_name: str, dim: int = 1):
    """Extend the local block along `dim` (1=H, 2=W) with `top` slices from
    the previous neighbour and `bot` from the next (zeros at the global
    edges)."""
    parts = []
    if top:
        parts.append(_from_above(_take(x, -top, top, dim), axis_name))
    parts.append(x)
    if bot:
        parts.append(_from_below(_take(x, 0, bot, dim), axis_name))
    return jnp.concatenate(parts, axis=dim) if len(parts) > 1 else x


def _tf_same_pads(size: int, k: int, s: int):
    out = -(-size // s)
    total = max((out - 1) * s + k - size, 0)
    return total // 2, total - total // 2


# ------------------------------------------------------------- sharded ops

def conv2d_sp(params, x, stride: int, axis_name: str, compute_dtype=None,
              axis_w: Optional[str] = None, bias: bool = True):
    """TF-SAME conv on an H-sharded (optionally H x W-sharded) block.
    Requires local H % stride == 0 (true when the global H is a multiple of
    stride * axis size); same for W when axis_w is set."""
    cd = compute_dtype or x.dtype
    w = params["w"]
    k = w.shape[0]
    top, bot = _tf_same_pads(x.shape[1] * lax.axis_size(axis_name), k, stride)
    xh = halo_exchange(x.astype(cd), top, bot, axis_name)
    if axis_w is None:
        wpad = _tf_same_pads(x.shape[2], k, stride)
    else:
        wlo, whi = _tf_same_pads(x.shape[2] * lax.axis_size(axis_w), k,
                                 stride)
        xh = halo_exchange(xh, wlo, whi, axis_w, dim=2)
        wpad = (0, 0)
    y = lax.conv_general_dilated(
        xh, w.astype(cd), (stride, stride),
        [(0, 0), wpad], dimension_numbers=_DIMS)
    if bias and "b" in params:
        y = y + params["b"].astype(cd)
    return y


def conv2d_valid_after_reflect_sp(params, x_padded, axis_name: str,
                                  compute_dtype=None, bias: bool = True):
    """VALID conv consuming rows provided by reflect_pad_sp (H already
    extended by (k-1)/2 per side locally)."""
    cd = compute_dtype or x_padded.dtype
    w = params["w"]
    y = lax.conv_general_dilated(
        x_padded.astype(cd), w.astype(cd), (1, 1), "VALID",
        dimension_numbers=_DIMS)
    if bias and "b" in params:
        y = y + params["b"].astype(cd)
    return y


def conv2d_transpose_sp(params, x, stride: int, axis_name: str,
                        compute_dtype=None, axis_w: Optional[str] = None,
                        bias: bool = True):
    """TF Conv2DTranspose (SAME) on an H-sharded block: extend with one
    real row per side, transpose-conv, crop stride rows per halo row.

    A one-row halo is sufficient when each input row's output footprint
    reaches at most `stride` rows past its own block in each direction:
    with SAME's pad_top = max(k - stride, 0) // 2 that is pad_top <= s and
    k - pad_top - s <= s — true for every (k, s) the models use (3x3 s1/s2
    semantic decoders, 4x4 s2 pix2pix upsamples).  SAME padding totals
    depend only on (k, s), not the block size, so the interior alignment
    of the extended block matches the global computation exactly; halo
    zeros at the global edges contribute nothing, which equals TF's
    discarded out-of-frame scatter.  With axis_w the same one-column halo
    applies along W (H exchanged first, so the columns carry the corners)."""
    cd = compute_dtype or x.dtype
    w = params["w"]
    k = w.shape[0]
    pt = max(k - stride, 0) // 2
    assert pt <= stride and k - pt - stride <= stride, (
        f"one-row halo insufficient for k={k}, stride={stride}")
    xh = halo_exchange(x.astype(cd), 1, 1, axis_name)
    if axis_w is not None:
        xh = halo_exchange(xh, 1, 1, axis_w, dim=2)
    y = lax.conv_transpose(
        xh, w.astype(cd), (stride, stride), "SAME",
        dimension_numbers=_DIMS, transpose_kernel=True)
    y = y[:, stride:-stride]
    if axis_w is not None:
        y = y[:, :, stride:-stride]
    if bias and "b" in params:
        y = y + params["b"].astype(cd)
    return y


def instance_norm_sp(params, x, axis_name: str, eps: float = 1e-3,
                     act: Optional[str] = None, alpha: float = 0.3,
                     axis_w: Optional[str] = None):
    """Instance norm with spatial moments psum'd over the mesh axis (or
    both spatial mesh axes on a 2-D shard grid)."""
    axes = (axis_name,) if axis_w is None else (axis_name, axis_w)
    xf = x.astype(jnp.float32)
    n = x.shape[1] * x.shape[2] * lax.axis_size(axis_name)
    if axis_w is not None:
        n *= lax.axis_size(axis_w)
    s1 = lax.psum(jnp.sum(xf, axis=(1, 2), keepdims=True), axes)
    s2 = lax.psum(jnp.sum(jnp.square(xf), axis=(1, 2), keepdims=True),
                  axes)
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


def batch_norm_sp(params, x, axis_name: str, training: bool,
                  momentum: float = 0.99, eps: float = 1e-3,
                  axis_w: Optional[str] = None):
    """Keras BatchNormalization on an H-sharded block: batch moments are
    (N, H, W) reductions, so the partial sums are psum'd over the space
    axis/axes (ops/norm.py batch_norm semantics otherwise)."""
    axes = (axis_name,) if axis_w is None else (axis_name, axis_w)
    xf = x.astype(jnp.float32)
    if training:
        n = x.shape[0] * x.shape[1] * x.shape[2] * lax.axis_size(axis_name)
        if axis_w is not None:
            n *= lax.axis_size(axis_w)
        s1 = lax.psum(jnp.sum(xf, axis=(0, 1, 2)), axes)
        s2 = lax.psum(jnp.sum(jnp.square(xf), axis=(0, 1, 2)), axes)
        mean = s1 / n
        var = jnp.maximum(s2 / n - jnp.square(mean), 0.0)
        new = dict(params)
        new["moving_mean"] = (momentum * params["moving_mean"]
                              + (1 - momentum) * mean
                              ).astype(params["moving_mean"].dtype)
        new["moving_var"] = (momentum * params["moving_var"]
                             + (1 - momentum) * var
                             ).astype(params["moving_var"].dtype)
    else:
        mean = params["moving_mean"].astype(jnp.float32)
        var = params["moving_var"].astype(jnp.float32)
        new = params
    y = (xf - mean) * lax.rsqrt(var + eps)
    y = y * params["gamma"].astype(jnp.float32) \
        + params["beta"].astype(jnp.float32)
    return y.astype(x.dtype), new


def all_gather_h(x, axis_name: str):
    """Reassemble the full H plane on every shard (tiled all_gather)."""
    return lax.all_gather(x, axis_name, axis=1, tiled=True)


def all_gather_w(x, axis_w: str):
    """Reassemble the full W plane on every shard (tiled all_gather)."""
    return lax.all_gather(x, axis_w, axis=2, tiled=True)


def scatter_w(x, axis_w: str):
    """Take this shard's local W slice of a replicated block."""
    n = lax.axis_size(axis_w)
    local = x.shape[2] // n
    return lax.dynamic_slice_in_dim(x, lax.axis_index(axis_w) * local,
                                    local, 2)


def scatter_h(x, axis_name: str):
    """Take this shard's local H slice of a replicated block."""
    n = lax.axis_size(axis_name)
    local = x.shape[1] // n
    return lax.dynamic_slice_in_dim(x, lax.axis_index(axis_name) * local,
                                    local, 1)


def _reflect_extend(x, p: int, axis_name: str, dim: int):
    """Extend `dim` by p on each side: neighbour slices at interior shard
    boundaries, local reflection at the global edges."""
    idx = lax.axis_index(axis_name)
    n = lax.axis_size(axis_name)
    rev = [slice(None)] * x.ndim
    rev[dim] = slice(None, None, -1)
    rev = tuple(rev)
    recv_lo = _from_above(_take(x, -p, p, dim), axis_name)
    recv_hi = _from_below(_take(x, 0, p, dim), axis_name)
    refl_lo = _take(x, 1, p, dim)[rev]
    refl_hi = _take(x, x.shape[dim] - p - 1, p, dim)[rev]
    lo = jnp.where(idx == 0, refl_lo, recv_lo)
    hi = jnp.where(idx == n - 1, refl_hi, recv_hi)
    return jnp.concatenate([lo, x, hi], axis=dim)


def reflect_pad_sp(x, p: int, axis_name: str, axis_w: Optional[str] = None):
    """REFLECT pad on an H-sharded (optionally H x W-sharded) block:
    neighbour rows/columns at interior boundaries, local reflection at the
    global edges; an unsharded W reflects locally.  H extends first so the
    exchanged columns carry correct corner values."""
    y = _reflect_extend(x, p, axis_name, dim=1)
    if axis_w is not None:
        return _reflect_extend(y, p, axis_w, dim=2)
    return jnp.pad(y, [(0, 0), (0, 0), (p, p), (0, 0)], mode="reflect")


def depthwise_conv2d_sp(x, w_tf, axis_name: str, padding: str = "SAME",
                        axis_w: Optional[str] = None):
    """tf.nn.depthwise_conv2d on an H-sharded (optionally H x W-sharded)
    block (k=3).  SAME exchanges one halo row/column per side; VALID
    expects the rows already provided (reflect_pad_sp)."""
    kh, kw, c, mult = w_tf.shape
    w = w_tf.reshape(kh, kw, 1, c * mult)
    xf = x.astype(jnp.float32)
    if padding == "SAME":
        xf = halo_exchange(xf, (kh - 1) // 2, kh // 2, axis_name)
        if axis_w is not None:
            xf = halo_exchange(xf, (kw - 1) // 2, kw // 2, axis_w, dim=2)
            wpad = (0, 0)
        else:
            wpad = _tf_same_pads(x.shape[2], kw, 1)
    else:
        wpad = (0, 0)
    return lax.conv_general_dilated(
        xf, w.astype(jnp.float32), (1, 1), [(0, 0), wpad],
        dimension_numbers=_DIMS, feature_group_count=c)


def tf_deriv_sp(x, axis_name: str, axis_w: Optional[str] = None):
    """Sobel derivative stack on an H-sharded block (ops.deriv.tf_deriv)."""
    from ..ops.deriv import deriv_kernel_sobel
    return depthwise_conv2d_sp(x, deriv_kernel_sobel(x.shape[-1]), axis_name,
                               axis_w=axis_w)


def seg_boundary_weight_sp(seg, axis_name: str,
                           axis_w: Optional[str] = None):
    """Class-boundary weight map on an H-sharded seg block
    (ops.deriv.seg_boundary_weight)."""
    from ..ops.deriv import deriv_kernel_diff
    segp = reflect_pad_sp(seg.astype(jnp.float32), 1, axis_name,
                          axis_w=axis_w)
    conved = jnp.abs(depthwise_conv2d_sp(
        segp, deriv_kernel_diff(seg.shape[-1]), axis_name, padding="VALID"))
    return jnp.abs(jnp.sign(jnp.sum(conved, axis=-1, keepdims=True)))


def gradloss_criterion_sp(in_, target, weight, axis_name: str,
                          axis_w: Optional[str] = None):
    """losses.gradloss_criterion with spatially-sharded derivatives; the
    mean is local — aggregate grads/losses with pmean over the axes."""
    d = jnp.abs(jnp.abs(tf_deriv_sp(in_, axis_name, axis_w))
                - jnp.abs(tf_deriv_sp(target, axis_name, axis_w)))
    d = jnp.mean(d, axis=-1, keepdims=True)
    return jnp.mean(weight * d)


# --------------------------------------------- spatially-sharded forwards

def generator_resnet_sp(params, x, axis_name: str, compute_dtype=None,
                        axis_w: Optional[str] = None):
    """generator_resnet.apply on an H-sharded (optionally H x W-sharded)
    input block (same param tree, same numerics as the single-device
    forward)."""
    from ..models.generator_resnet import N_BLOCKS
    cd = compute_dtype or x.dtype
    aw = axis_w
    y = x.astype(cd)
    y = reflect_pad_sp(y, 3, axis_name, axis_w=aw)
    # bias=False on IN-followed convs — exact elision, mirroring the
    # single-device nets (see ops/layers.py conv2d docstring)
    y = conv2d_valid_after_reflect_sp(params["c1"], y, axis_name, cd,
                                      bias=False)
    y = instance_norm_sp(params["c1_in"], y, axis_name, act="relu", axis_w=aw)
    y = conv2d_sp(params["c2"], y, 2, axis_name, cd, axis_w=aw, bias=False)
    y = instance_norm_sp(params["c2_in"], y, axis_name, act="relu", axis_w=aw)
    y = conv2d_sp(params["c3"], y, 2, axis_name, cd, axis_w=aw, bias=False)
    y = instance_norm_sp(params["c3_in"], y, axis_name, act="relu", axis_w=aw)
    for i in range(N_BLOCKS):
        b = params[f"r{i + 1}"]
        z = reflect_pad_sp(y, 1, axis_name, axis_w=aw)
        z = conv2d_valid_after_reflect_sp(b["conv1"], z, axis_name, cd,
                                          bias=False)
        z = instance_norm_sp(b["in1"], z, axis_name, act="relu", axis_w=aw)
        z = reflect_pad_sp(z, 1, axis_name, axis_w=aw)
        z = conv2d_valid_after_reflect_sp(b["conv2"], z, axis_name, cd,
                                          bias=False)
        z = instance_norm_sp(b["in2"], z, axis_name, axis_w=aw)
        y = z + y
    y = conv2d_transpose_sp(params["d1"], y, 2, axis_name, cd, axis_w=aw,
                            bias=False)
    y = instance_norm_sp(params["d1_in"], y, axis_name, act="relu", axis_w=aw)
    y = conv2d_transpose_sp(params["d2"], y, 2, axis_name, cd, axis_w=aw,
                            bias=False)
    y = instance_norm_sp(params["d2_in"], y, axis_name, act="relu", axis_w=aw)
    y = reflect_pad_sp(y, 3, axis_name, axis_w=aw)
    y = conv2d_valid_after_reflect_sp(params["out"], y, axis_name, cd)
    return tanh(y.astype(jnp.float32))


def generator_unet_sp(params, x, axis_name: str, compute_dtype=None,
                      rng=None, deterministic: bool = True,
                      axis_w: Optional[str] = None):
    """generator_unet.apply on an H-sharded (optionally H x W-sharded)
    block — every conv is 3x3 stride-1 SAME so halos are one row each way.
    Dropout (d1-d3, between conv-transpose and IN, module.py:170-181) uses
    a per-shard key (fold_in of the axis index/indices): masks are iid per
    pixel, so per-shard keys sample the same distribution the
    single-device forward does."""
    from ..ops.layers import dropout
    cd = compute_dtype or x.dtype
    aw = axis_w
    y = x.astype(cd)
    enc = []
    for i in range(1, 9):
        y = conv2d_sp(params[f"e{i}"], y, 1, axis_name, cd, axis_w=aw,
                      bias=False)
        act = "relu" if i == 8 else "leaky_relu"
        y = instance_norm_sp(params[f"e{i}_in"], y, axis_name, act=act,
                             axis_w=aw)
        enc.append(y)
    use_drop = rng is not None and not deterministic
    if use_drop:
        rng = jax.random.fold_in(rng, lax.axis_index(axis_name))
        if aw is not None:
            rng = jax.random.fold_in(rng, lax.axis_index(aw))
        drop_keys = jax.random.split(rng, 3)
    for i in range(1, 8):
        # d1-d3 keep the bias (dropout between convT and IN, see the
        # single-device net); d4-d7 feed IN directly -> exact elision
        y = conv2d_transpose_sp(params[f"d{i}"], y, 1, axis_name, cd,
                                axis_w=aw, bias=(i <= 3))
        if i <= 3 and use_drop:
            y = dropout(drop_keys[i - 1], y, 0.5, deterministic=False)
        y = instance_norm_sp(params[f"d{i}_in"], y, axis_name, axis_w=aw)
        y = y + enc[7 - i]
        if i in (3, 7):
            y = jnp.maximum(y, 0)
    y = conv2d_transpose_sp(params["d8"], y, 1, axis_name, cd, axis_w=aw)
    return tanh(y.astype(jnp.float32))


def discriminator_sp(params, x, mask, axis_name: str, compute_dtype=None,
                     axis_w: Optional[str] = None):
    """Semantic discriminator with the paper-style stride-8 patch head
    (the reference's global VALID chain does not split spatially; init the
    params with head='patch')."""
    cd = compute_dtype or x.dtype
    aw = axis_w
    y = x.astype(cd)
    y = leaky_relu(conv2d_sp(params["h0"], y, 2, axis_name, cd, axis_w=aw))
    y = conv2d_sp(params["h1"], y, 2, axis_name, cd, axis_w=aw, bias=False)
    y = instance_norm_sp(params["h1_in"], y, axis_name, act="leaky_relu",
                         axis_w=aw)
    y = conv2d_sp(params["h2"], y, 2, axis_name, cd, axis_w=aw, bias=False)
    y = instance_norm_sp(params["h2_in"], y, axis_name, act="leaky_relu",
                         axis_w=aw)
    y = conv2d_sp(params["h3"], y, 1, axis_name, cd, axis_w=aw, bias=False)
    y = instance_norm_sp(params["h3_in"], y, axis_name, act="leaky_relu",
                         axis_w=aw)
    y = conv2d_sp(params["h4"], y, 1, axis_name, cd,
                  axis_w=aw).astype(jnp.float32)
    return jnp.sum(y * mask.astype(jnp.float32), axis=-1, keepdims=True)


def generator_pix2pix_sp(params, state, x, axis_name: str,
                         compute_dtype=None, rng=None,
                         deterministic: bool = True, train: bool = False,
                         ngf: int = 64, axis_w: Optional[str] = None):
    """pix2pix U-Net (models/generator_pix2pix.py) on an H-sharded
    (optionally H x W-sharded) block.

    The encoder halves the plane per block, so once a local dim would
    fall below 2 the plane is all_gather'ed (both axes on a 2-D grid) and
    the deep middle runs replicated — those activations are tiny; the
    memory/compute win of spatial sharding lives in the high-res layers.
    The decoder re-scatters at the level whose skip is sharded.  BN
    moments psum over the space axis/axes in the sharded region;
    replicated-region shards compute identical values.  Returns
    (y, new_bn_state)."""
    from ..models.generator_pix2pix import DROP_RATE, _plan
    from ..ops.layers import conv2d, conv2d_transpose, dropout, relu
    from ..ops.norm import batch_norm

    cd = compute_dtype or x.dtype
    aw = axis_w
    n_sp = lax.axis_size(axis_name)
    down, up = _plan(x.shape[1] * n_sp, ngf)
    new_state = {}

    def bn(name, v, is_sharded):
        merged = {**params[name], **state[name]}
        if is_sharded:
            out, new = batch_norm_sp(merged, v, axis_name, training=train,
                                     axis_w=aw)
        else:
            out, new = batch_norm(merged, v, training=train)
        new_state[name] = {"moving_mean": new["moving_mean"],
                           "moving_var": new["moving_var"]}
        return out

    def too_small(v):
        return v.shape[1] < 2 or (aw is not None and v.shape[2] < 2)

    def gather(v):
        v = all_gather_h(v, axis_name)
        return all_gather_w(v, aw) if aw is not None else v

    def scatter(v):
        v = scatter_h(v, axis_name)
        return scatter_w(v, aw) if aw is not None else v

    y = x.astype(cd)
    sharded = True
    skips = []
    for i in range(len(down)):
        if sharded and too_small(y):
            y = gather(y)
            sharded = False
        y = (conv2d_sp(params[f"down{i}"], y, 2, axis_name, cd, axis_w=aw)
             if sharded else conv2d(params[f"down{i}"], y, 2, "SAME", cd))
        if i > 0:
            y = bn(f"down{i}_bn", y, sharded)
        y = leaky_relu(y)
        skips.append((y, sharded))

    skips = list(reversed(skips[:-1]))
    use_drop = rng is not None and not deterministic
    drop_keys = jax.random.split(rng, min(3, len(up))) if use_drop else None
    for i in range(len(up)):
        skip, skip_sharded = skips[i]
        if sharded:
            y = conv2d_transpose_sp(params[f"up{i}"], y, 2, axis_name, cd,
                                    axis_w=aw)
        else:
            y = conv2d_transpose(params[f"up{i}"], y, 2, "SAME", cd)
            if skip_sharded:  # resolution re-entered the sharded domain
                y = scatter(y)
                sharded = True
        y = bn(f"up{i}_bn", y, sharded)
        if i < 3 and use_drop:
            k = drop_keys[i]
            if sharded:  # per-shard masks (iid per pixel)
                k = jax.random.fold_in(k, lax.axis_index(axis_name))
                if aw is not None:
                    k = jax.random.fold_in(k, lax.axis_index(aw))
            y = dropout(k, y, DROP_RATE, deterministic=False)
        y = relu(y)
        y = jnp.concatenate([y, skip], axis=-1)

    if sharded:
        y = conv2d_transpose_sp(params["last"], y, 2, axis_name, cd,
                                axis_w=aw)
    else:
        y = conv2d_transpose(params["last"], y, 2, "SAME", cd)
        y = scatter(y)
    return tanh(y.astype(jnp.float32)), new_state


def discriminator_pix2pix_sp(params, state, inp, tar, axis_name: str,
                             compute_dtype=None, train: bool = False,
                             axis_w: Optional[str] = None):
    """pix2pix PatchGAN (models/discriminator_pix2pix.py) on H-sharded
    (optionally H x W-sharded) inputs: the 3 stride-2 downsamples run
    sharded (BN psum'd over the space axis/axes), then the small
    zero-pad + VALID tail runs replicated after an all_gather.
    Returns (replicated patch logits, new_bn_state)."""
    from ..ops.layers import conv2d
    from ..ops.norm import batch_norm

    cd = compute_dtype or inp.dtype
    aw = axis_w
    new_state = {}

    def bn(name, v, is_sharded):
        merged = {**params[name], **state[name]}
        if is_sharded:
            out, new = batch_norm_sp(merged, v, axis_name, training=train,
                                     axis_w=aw)
        else:
            out, new = batch_norm(merged, v, training=train)
        new_state[name] = {"moving_mean": new["moving_mean"],
                           "moving_var": new["moving_var"]}
        return out

    def gather(v):
        v = all_gather_h(v, axis_name)
        return all_gather_w(v, aw) if aw is not None else v

    y = jnp.concatenate([inp.astype(cd), tar.astype(cd)], axis=-1)
    sharded = True
    for i in range(3):
        if sharded and (y.shape[1] < 2
                        or (aw is not None and y.shape[2] < 2)):
            y = gather(y)
            sharded = False
        y = (conv2d_sp(params[f"down{i}"], y, 2, axis_name, cd, axis_w=aw)
             if sharded else conv2d(params[f"down{i}"], y, 2, "SAME", cd))
        if i > 0:
            y = bn(f"down{i}_bn", y, sharded)
        y = leaky_relu(y)
    if sharded:
        y = gather(y)
    pad = [(0, 0), (1, 1), (1, 1), (0, 0)]
    y = jnp.pad(y, pad)
    y = conv2d(params["conv"], y, 1, "VALID", cd)
    y = bn("conv_bn", y, False)
    y = leaky_relu(y)
    y = jnp.pad(y, pad)
    y = conv2d(params["last"], y, 1, "VALID", cd)
    return y.astype(jnp.float32), new_state
