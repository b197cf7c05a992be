"""Device-side fused preprocessing — the TPU-native replacement for the
reference's per-item host loader (utils.py:116-233).

The reference path (imread -> skimage square resize -> optional imgaug ->
resize to (H, W) -> one_hot(34) at source resolution -> scipy zoom ->
numpy fliplr) runs serialized with the train step on the host and is the
dominant cost (SURVEY §3.1).  Here the host only decodes PNGs to uint8;
everything else is ONE jitted program on device:

    uint8 -> [0,1] float -> square resize (antialiased, matching skimage's
    default) -> per-sample affine augment (single bilinear gather,
    augment.py) -> final resize -> class-map nearest resize to the stride-8
    mask grid + one-hot -> joint random fliplr.

XLA fuses the elementwise stages into the resize convolutions, and the
whole batch is processed without host round-trips.

Deliberate rationalizations vs the reference (SURVEY §7 "hard parts"):
* the one-hot mask is built at the *target* mask-grid resolution via
  nearest resize of the class map (H/8 per Config.mask_stride), not
  one-hot at source res + scipy zoom to a ~4x4 grid (utils.py:197-199);
* augmentation warps are composed into one gather instead of three
  sequential resamples.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .augment import (AffineParams, affine_warp, conjugate_affine,
                      photometric_augment, random_affine_params)


def _identity_params() -> AffineParams:
    return AffineParams(
        matrix=jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]], jnp.float32),
        flip=jnp.zeros((), bool))


def _resize(x, hw, method="linear"):
    if tuple(x.shape[-3:-1]) == tuple(hw):
        # identity resize (e.g. native-resolution training, where source
        # and target are both 2048x1024): linear/antialias at scale 1 is
        # an exact identity, but XLA still materializes the gather —
        # skip it outright
        return x
    shape = (*x.shape[:-3], *hw, x.shape[-1])
    return jax.image.resize(x, shape, method=method, antialias=True)


def _one_hot_mask(cls_u8, mask_hw, n_class):
    """(B, sh, sw) uint8 class map -> (B, mh, mw, n_class) one-hot via
    nearest-neighbour resize (replaces utils.py:158-165 + scipy zoom)."""
    cls = cls_u8.astype(jnp.float32)
    if tuple(cls_u8.shape[1:3]) != tuple(mask_hw):  # same-shape: exact skip
        cls = jax.image.resize(cls, (cls_u8.shape[0], *mask_hw),
                               method="nearest")
    return jax.nn.one_hot(cls.astype(jnp.int32), n_class, dtype=jnp.float32)


@functools.partial(jax.jit, static_argnames=("out_hw", "mask_hw", "n_class",
                                             "photometric", "global_b",
                                             "aug_layout"))
def preprocess_train(img_u8, seg_u8, cls_u8, key, aug_flags, *,
                     out_hw, mask_hw, n_class, photometric: bool = False,
                     global_b: int = 0, sample_rows=None,
                     aug_layout: str = "dynamic"):
    """img_u8/seg_u8: (B, sh, sw, 3) uint8; cls_u8: (B, sh, sw) uint8;
    aug_flags: (B,) bool — which samples get the imgaug-equivalent warp
    (the reference emits plain+augmented pairs per item, model.py:235-244).
    photometric additionally applies the seq1 analog (augment.py) to the
    photo of aug-flagged samples.

    aug_layout is a STATIC promise about aug_flags that lets the program
    skip the bilinear warp gather for plain samples (the gather is the
    preprocess's dominant device cost, PERF.md round 5):
      * "none": all flags are False — no sample warps;
      * "half": flags are [False*(B/2), True*(B/2)] — the layout every
        iterator and the fused paths emit (loader.py:184-193,
        fused.py:37-43) — only the second half warps;
      * "dynamic": no promise; per-sample select (identity-parameter
        warp for plain rows).
    Equivalence contract (pinned by test_data.py::test_aug_layout_bitexact):
    "none" is BITWISE identical to dynamic (a bilinear gather at identity
    parameters resamples at exact integer coordinates, weights exactly
    {1, 0}); "half" is bitwise on plain rows, the mask, and
    geometry-only warped rows, and within 8 f32 ulp on
    photometric-augmented rows (XLA fuses the photometric chain
    differently around the sliced batch — FMA contraction drift), far
    below every training-path tolerance and invisible after the bf16
    cast in the step.

    Multi-host: per-sample randomness (augment keys, flip draws) is drawn
    for a GLOBAL batch of `global_b` rows and indexed by `sample_rows`
    (the batch's positions in the global batch), so each process
    preprocessing only its local shard produces bit-identical samples to
    a single process preprocessing the whole batch.  Defaults
    (global_b=B, rows=arange) reproduce the single-process derivation
    exactly — same split count, same bernoulli shape.
    Returns {"real_a", "seg_a", "mask_a"} float32, images in [0, 1]."""
    b, sh, sw = img_u8.shape[:3]
    gb = global_b or b
    rows = jnp.arange(b) if sample_rows is None else sample_rows
    img = img_u8.astype(jnp.float32) / 255.0
    seg = seg_u8.astype(jnp.float32) / 255.0

    # The reference chain is: square resize to (sh, sh) -> imgaug warp ->
    # resize to (H, W) (utils.py:172-196).  The net geometry is identical
    # to a single antialiased resize to (H, W) followed by the SAME affine
    # conjugated into output coordinates (augment.conjugate_affine), and
    # the warp is always a zoom-in (crop 20-40%/side) so no aliasing is
    # introduced by warping after the downscale.  This runs the expensive
    # bilinear gather on 4-16x fewer pixels.
    img = _resize(img, out_hw)
    seg = _resize(seg, out_hw)

    k_aug, k_flip = jax.random.split(key)
    aug_keys = jax.random.split(k_aug, gb)[rows]

    def one(im, sg, k, flag):
        k_geo, k_pho = jax.random.split(k)
        p = random_affine_params(k_geo, sh, sh)  # reference square-res frame
        p = conjugate_affine(p, (sh, sh), out_hw)
        ident = _identity_params()
        p = AffineParams(matrix=jnp.where(flag, p.matrix, ident.matrix),
                         flip=jnp.logical_and(flag, p.flip))
        both = affine_warp(jnp.concatenate([im, sg], axis=-1), p)
        im_out, sg_out = both[..., :3], both[..., 3:]
        if photometric:
            im_out = jnp.where(flag, photometric_augment(k_pho, im_out),
                               im_out)
        return im_out, sg_out

    if aug_layout == "none":
        pass  # plain rows pass through bit-exactly (see docstring)
    elif aug_layout == "half":
        if b % 2:
            raise ValueError("aug_layout='half' needs an even batch")
        hb = b // 2
        # the (cheap, 2x3-matrix) flag select stays TRACED: folding it
        # re-fuses the coordinate arithmetic and widens the drift vs the
        # dynamic path well past 1 ulp (see docstring contract)
        im2, sg2 = jax.vmap(one)(img[hb:], seg[hb:], aug_keys[hb:],
                                 aug_flags[hb:])
        img = jnp.concatenate([img[:hb], im2])
        seg = jnp.concatenate([seg[:hb], sg2])
    elif aug_layout == "dynamic":
        img, seg = jax.vmap(one)(img, seg, aug_keys, aug_flags)
    else:
        raise ValueError(f"unknown aug_layout {aug_layout!r}")

    mask = _one_hot_mask(cls_u8, mask_hw, n_class)

    # joint random fliplr — utils.py:201-204
    flip = jax.random.bernoulli(k_flip, 0.5, (gb,))[rows][
        :, None, None, None]
    img = jnp.where(flip, img[:, :, ::-1], img)
    seg = jnp.where(flip, seg[:, :, ::-1], seg)
    mask = jnp.where(flip, mask[:, :, ::-1], mask)
    return {"real_a": img, "seg_a": seg, "mask_a": mask}


@functools.partial(jax.jit, static_argnames=("out_hw", "mask_hw", "n_class",
                                              "with_masks"))
def preprocess_test(img_u8, seg_u8, cls_u8, *, out_hw, mask_hw, n_class,
                    with_masks=True):
    """Parity with load_test_data (utils.py:116-156): direct resize to
    (H, W) (no square step), full-res one-hot mask + mask-grid one-hot.
    Returns (img, seg, mask_full, mask_grid) float32, images in [0, 1].

    with_masks=False skips the one-hot masks (None, None in their slots):
    the generator-only eval/test/sample paths never read them, and the
    full-res (N, H, W, n_class) mask is the most HBM/compute in the
    program at large resolutions."""
    img = _resize(img_u8.astype(jnp.float32) / 255.0, out_hw)
    seg = _resize(seg_u8.astype(jnp.float32) / 255.0, out_hw)
    if not with_masks:
        return img, seg, None, None
    mask_full = _one_hot_mask(cls_u8, out_hw, n_class)
    mask_grid = _one_hot_mask(cls_u8, mask_hw, n_class)
    return img, seg, mask_full, mask_grid


@jax.jit
def seg_labels_u8(seg):
    """Device-side twin of scores_seg_fake's host conversion
    (metrics/scores.py): ``(255 * seg).astype(np.uint8)`` — float32
    multiply then C-style truncating cast, INCLUDING the wrap of
    antialiased-resize overshoot outside [0, 1] (numpy's out-of-range
    float->uint8 cast wraps mod 256; XLA's convert saturates, so the
    wrap is made explicit).  Bit-exact vs the host path, 4x fewer bytes
    pulled through the device relay."""
    v = jnp.trunc(255.0 * seg.astype(jnp.float32)).astype(jnp.int32)
    return jnp.mod(v, 256).astype(jnp.uint8)


@jax.jit
def fake_u8(x):
    """Device-side twin of THIS repo's host ``utils/images.py
    inverse_transform`` — ``(((float64(x) + 1) / 2) * 255).astype(uint8)``
    — computed in PURE float32 via error-free transformations, bit-exact
    over the whole tanh output domain.  Note the reference's
    ``inverse_transform`` (utils.py:300-314) evaluates the same formula in
    float32 (python scalars don't upcast a float32 numpy array); the f64
    host path this twin matches can differ from reference f32 arithmetic
    by 1 at exact-lattice pixels x = 2k/255 - 1 (see utils/images.py).

    Why it is exact: TwoSum yields s + e == x + 1 with no error for any
    float32 x; the halving is a power-of-two scale; two Dekker products
    give the EXACT real value of (x+1)/2*255 as a small sum of floats,
    so the truncation decision is taken on the exact total.  The only
    inexactness is ~2^-39 of summation noise in the decision residual
    ``r``; the nearest an exact total can sit to an integer without
    being one is 2^-32 (the input lattice: totals are multiples of
    255*2^-(24+k) for x in binade 2^-k, and near-integer totals need
    |x| > 0.003 so k <= 8), which the -2^-33 threshold absorbs.  Proven
    empirically too: perf_inv_u8_proof.py enumerates EVERY float32 in
    [-1, 1] (~2.13e9 values) against the float64 host path — zero
    mismatches.  Domain is [-1, 1] (tanh output); out-of-domain values
    are clipped, not wrapped.

    Cuts the eval's fake-image pull through the device->host relay 4x
    (the largest remaining pull after the seg/mask cuts, PERF.md)."""
    one = jnp.float32(1.0)
    half = jnp.float32(0.5)
    cc = jnp.float32(255.0)
    split = jnp.float32(4097.0)  # 2**12 + 1 Dekker split constant
    x = x.astype(jnp.float32)
    # TwoSum(x, 1): s + e == x + 1 exactly
    s = x + one
    bp = s - x
    e = (x - (s - bp)) + (one - bp)
    h_h = s * half
    h_l = e * half
    # Dekker product h_h * 255: P1 + P2 exact
    c = h_h * split
    a_hi = c - (c - h_h)
    a_lo = h_h - a_hi
    p1 = h_h * cc
    p2 = (a_hi * cc - p1) + a_lo * cc
    # Dekker product h_l * 255: q_h + q_l exact
    c2 = h_l * split
    b_hi = c2 - (c2 - h_l)
    b_lo = h_l - b_hi
    q_h = h_l * cc
    q_l = (b_hi * cc - q_h) + b_lo * cc
    # truncation decision on the exact total kk + r
    k = jnp.trunc(p1)
    f = p1 - k
    up = f > half
    g = jnp.where(up, f - one, f)
    kk = jnp.where(up, k + one, k)
    r = ((g + p2) + q_h) + q_l
    out = kk - (r < jnp.float32(-2.0 ** -33)).astype(jnp.float32)
    return jnp.clip(out, 0.0, 255.0).astype(jnp.uint8)


def make_preprocess_train(cfg):
    """Bind the static config once.  The aug layout is static per config:
    every iterator emits [plain, augmented] halves under use_augmentation
    and all-plain otherwise (loader.py:184-193, 281-290), so the warp
    gather compiles only for the rows that need it."""
    return functools.partial(
        preprocess_train, out_hw=(cfg.image_height, cfg.image_width),
        mask_hw=cfg.mask_hw, n_class=cfg.segment_class,
        photometric=cfg.use_photometric,
        aug_layout="half" if cfg.use_augmentation else "none")
