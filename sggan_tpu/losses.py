"""All loss criterions of the reference, active and dormant, as pure
functions (reference: module.py:336-351, model.py:114-166).

Active path (what the reference's train_step actually calls regardless of
flags, model.py:190-191):
    gen_loss_p2p  = BCE(D(fake), 1) + 100 * L1(seg - fake)
    disc_loss_p2p = BCE(D(real), 1) + BCE(D(fake), 0)

Dormant-but-intended SG-GAN objective (realized as Config.loss_mode="sggan"):
    generator_loss     = criterionGAN(D(fake), 1) + L1_lambda * L1(real, fake)
                         [+ Lg_lambda * gradloss with the semantic
                          boundary-weight map — the paper's term]
    discriminator_loss = (criterionGAN(D(real), 1) + criterionGAN(D(pool), 0)) / 2
    criterionGAN       = mae (LSGAN) if use_lsgan else sce

Everything reduces with jnp.mean over all elements, matching the TF ops.
"""

from __future__ import annotations

import jax.numpy as jnp

from .ops.deriv import seg_boundary_weight, sobel_xy, tf_deriv


# ---------------------------------------------------------------- criterions

def abs_criterion(a, b):
    """L1 — module.py:336-337."""
    return jnp.mean(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))


def mae_criterion(logits, target):
    """LSGAN MSE (misnamed 'mae' in the reference) — module.py:340-341."""
    return jnp.mean(jnp.square(logits.astype(jnp.float32)
                               - target.astype(jnp.float32)))


def sigmoid_ce(logits, labels):
    """tf.nn.sigmoid_cross_entropy_with_logits, elementwise."""
    x = logits.astype(jnp.float32)
    z = labels.astype(jnp.float32)
    return jnp.maximum(x, 0) - x * z + jnp.log1p(jnp.exp(-jnp.abs(x)))


def sce_criterion(logits, labels):
    """Mean sigmoid CE — module.py:344-345."""
    return jnp.mean(sigmoid_ce(logits, labels))


def bce_from_logits(labels, logits):
    """tf.keras.losses.BinaryCrossentropy(from_logits=True) — mean sigmoid
    CE (model.py:150,161)."""
    return jnp.mean(sigmoid_ce(logits, labels))


def gradloss_criterion(in_, target, weight):
    """Gradient-sensitive semantic loss — module.py:347-351: mean over the
    boundary-weighted per-pixel mean |(|∇in| - |∇target|)| (Sobel).

    Uses the shift-based Sobel (ops.deriv.sobel_xy) so the whole loss —
    derivatives included — collapses into one XLA reduction fusion
    instead of materializing two (N, H, W, 2C) depthwise-conv outputs;
    numerics identical to the tf_deriv form (tested)."""
    dxi, dyi = sobel_xy(in_)
    dxt, dyt = sobel_xy(target)
    d = jnp.abs(jnp.abs(dxi) - jnp.abs(dxt)) \
        + jnp.abs(jnp.abs(dyi) - jnp.abs(dyt))
    d = jnp.sum(d, axis=-1, keepdims=True) / (2.0 * in_.shape[-1])
    return jnp.mean(weight * d)


def criterion_gan(use_lsgan: bool):
    """model.py:64-67."""
    return mae_criterion if use_lsgan else sce_criterion


# ------------------------------------------------------------- active losses

P2P_LAMBDA = 100.0  # hard-coded in the reference (model.py:151)


def gen_loss_p2p(da_fake, fake_a, seg_a):
    """model.py:149-158."""
    gan = bce_from_logits(jnp.ones_like(da_fake), da_fake)
    l1 = jnp.mean(jnp.abs(seg_a.astype(jnp.float32)
                          - fake_a.astype(jnp.float32)))
    return gan + P2P_LAMBDA * l1


def disc_loss_p2p(da_real, da_fake):
    """model.py:160-166."""
    return (bce_from_logits(jnp.ones_like(da_real), da_real)
            + bce_from_logits(jnp.zeros_like(da_fake), da_fake))


def _masked_entry_mean(x, valid):
    """Mean over valid history entries (x: (K, ...) reduced to per-entry
    means; equals one flat mean over the valid prefix since all entries
    have identical element counts)."""
    per = jnp.mean(x.reshape(x.shape[0], -1).astype(jnp.float32), axis=1)
    v = valid.astype(jnp.float32)
    return jnp.sum(per * v) / jnp.maximum(jnp.sum(v), 1.0)


def gen_loss_p2p_hist(da_hist, hist, seg_hist, valid):
    """gen_loss_p2p over a fixed-shape fake-history buffer with a
    valid-prefix mask — the jittable form of the reference's concat-
    accumulated fake_A (model.py:175-179 feeding model.py:149-158) for
    Config.compat_fake_history."""
    gan = _masked_entry_mean(sigmoid_ce(da_hist, jnp.ones_like(da_hist)),
                             valid)
    l1 = _masked_entry_mean(jnp.abs(seg_hist.astype(jnp.float32)
                                    - hist.astype(jnp.float32)), valid)
    return gan + P2P_LAMBDA * l1


def disc_loss_p2p_hist(da_real, da_hist, valid):
    """disc_loss_p2p with the fake branch over the history buffer."""
    return (bce_from_logits(jnp.ones_like(da_real), da_real)
            + _masked_entry_mean(
                sigmoid_ce(da_hist, jnp.zeros_like(da_hist)), valid))


# ------------------------------------------------ full SG-GAN objective

def gen_loss_sggan(da_fake, real_a, fake_a, seg_a, *, use_lsgan: bool,
                   l1_lambda: float, lg_lambda: float,
                   l1_target: str = "real"):
    """The dormant generator_loss (model.py:114-124) plus the paper's
    gradient-sensitive term actually applied (the reference builds
    weighted_seg_A but never adds the term; BASELINE.json's north star asks
    for it).

    l1_target: "real" reproduces the dormant code exactly — the L1
    anchors the fake to real_A (model.py:122, CycleGAN photo-to-photo
    lineage), which CONFLICTS with the train step's seg_A discriminator
    real-branch and collapses training (QUALITY.md's 256x512 ablations);
    "seg" anchors to seg_A like the active p2p loss (model.py:155),
    making the full objective consistent with the data pairing.  The
    gradient-sensitive term always compares the fake's edges to the
    photo's (the paper's edge-preservation semantics) gated by the
    class-boundary weight map."""
    crit = criterion_gan(use_lsgan)
    g = crit(da_fake, jnp.ones_like(da_fake))
    anchor = seg_a if l1_target == "seg" else real_a
    g = g + l1_lambda * abs_criterion(anchor, fake_a)
    if lg_lambda:
        w = seg_boundary_weight(seg_a)
        g = g + lg_lambda * gradloss_criterion(fake_a, real_a, w)
    return g


def disc_loss_sggan(da_real, da_fake_sample, *, use_lsgan: bool):
    """model.py:126-133."""
    crit = criterion_gan(use_lsgan)
    return (crit(da_real, jnp.ones_like(da_real))
            + crit(da_fake_sample, jnp.zeros_like(da_fake_sample))) / 2.0


# ------------------------------------------------------- simple (dormant)

def gen_loss_simple(da_fake, fake_a, seg_a, alpha_recip: float):
    """model.py:135-140."""
    gan = sce_criterion(da_fake, jnp.ones_like(da_fake))
    seg = sce_criterion(fake_a, seg_a)
    return alpha_recip * gan + seg


def disc_loss_simple(da_real, da_fake_sample):
    """model.py:142-147."""
    return (sce_criterion(da_real, jnp.ones_like(da_real))
            + sce_criterion(da_fake_sample, jnp.zeros_like(da_fake_sample)))
