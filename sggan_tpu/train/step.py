"""Jitted two-optimizer GAN train step.

Reference semantics (model.py:169-200): one generator forward, semantic
discriminator applied to (seg, mask) for the real branch and (fake, mask)
for the fake branch, p2p losses, per-net Adam.  Under jit we express the
two GradientTapes as two `jax.value_and_grad` calls — generator gradients
flow through a *frozen* discriminator, discriminator gradients see a
*stop-gradient* fake, exactly matching the tapes' variable partitions.

Differences from the reference, on purpose:
* the eager shape-dynamic fake-history concat (model.py:175-179) is
  replaced by the fixed-shape functional image pool (pool.py) in
  loss_mode="sggan"; loss_mode="p2p" uses the current fake, which is what
  the reference's losses actually consume;
* Adam learning rate comes from `lr_schedule` — the reference hard-codes
  1e-3 (model.py:205) which `Config.compat_lr_override=True` reproduces,
  otherwise the commented-out linear decay (model.py:223) is honoured;
* everything is compiled: no per-step host sync, donated state buffers.

Adam epsilon is 1e-7 (Keras default) rather than optax's 1e-8.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from .. import losses
from ..models import (discriminator, discriminator_pix2pix,
                      generator_pix2pix, generator_resnet, generator_unet)
from .pool import PoolState, pool_init, pool_update

ADAM_EPS = 1e-7


class TrainState(NamedTuple):
    gen_params: Any
    gen_bn: Any            # {} for IN models
    disc_params: Any
    disc_bn: Any
    g_opt: Any
    d_opt: Any
    pool: PoolState
    step: jnp.ndarray      # scalar int32
    # EMA shadow of gen_params (None when --gen_ema 0): a TPU-cheap GAN
    # stabilizer with no reference counterpart — eval/test/serving read
    # the averaged generator while training updates the raw one.
    ema: Any = None


def _tx(beta1: float):
    return optax.scale_by_adam(b1=beta1, b2=0.999, eps=ADAM_EPS)


def lr_schedule(cfg, epoch: int) -> float:
    """Reference model.py:205 (override) / model.py:223 (commented decay)."""
    if cfg.compat_lr_override:
        return 1e-3
    if epoch < cfg.epoch_step:
        return cfg.lr
    denom = max(cfg.epoch - cfg.epoch_step, 1)
    return cfg.lr * (cfg.epoch - epoch) / denom


def _dtype(cfg):
    return jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32


def _ema_update(cfg, ema, gen_params):
    """One fused elementwise pass: ema <- d*ema + (1-d)*params.  The
    update runs on params AFTER the pmean'd-gradient Adam step, so under
    dp the shadow stays replica-identical."""
    if ema is None or not cfg.gen_ema:
        return ema
    d = jnp.float32(cfg.gen_ema)
    return jax.tree.map(
        lambda e, p: (d * e.astype(jnp.float32)
                      + (1.0 - d) * p.astype(jnp.float32)).astype(e.dtype),
        ema, gen_params)


def _compat_hist(cfg) -> bool:
    """True when the step reproduces the reference's concat-to-10-then-
    reset fake history (model.py:175-179) — p2p mode, semantic nets."""
    return (cfg.loss_mode == "p2p" and cfg.compat_fake_history
            and not cfg.use_pix2pix)


def init_state(cfg, key, n_data: int = 1) -> TrainState:
    """n_data: data-parallel shard count — the image pool keeps max_size
    slots per shard (buffer leading dim max_size * n_data, sharded)."""
    kg, kd = jax.random.split(key)
    h, w = cfg.image_height, cfg.image_width
    if cfg.use_pix2pix:
        gp, gbn = generator_pix2pix.init(kg, ngf=cfg.ngf,
                                         input_nc=cfg.input_nc,
                                         output_nc=cfg.output_nc,
                                         image_size=h)
        dp, dbn = discriminator_pix2pix.init(kd, ndf=cfg.ndf,
                                             input_nc=cfg.input_nc)
    else:
        if cfg.use_resnet:
            gp = generator_resnet.init(kg, ngf=cfg.ngf, input_nc=cfg.input_nc,
                                       output_nc=cfg.output_nc)
        else:
            gp = generator_unet.init(kg, ngf=cfg.ngf, input_nc=cfg.input_nc,
                                     output_nc=cfg.output_nc)
        gbn = {}
        dp = discriminator.init(kd, ndf=cfg.ndf, input_nc=cfg.input_nc,
                                n_class=cfg.segment_class, image_size=(h, w))
        dbn = {}
    tx = _tx(cfg.beta1)
    pool_slots = (cfg.max_size if cfg.loss_mode == "sggan" else 1) * n_data
    # Pool storage dtype = compute dtype: pooled entries are consumed
    # ONLY by discriminator forwards, which cast to the compute dtype —
    # so under bf16 training a bf16 buffer is bit-exact vs f32 storage
    # (bf16(stored bf16 x) == bf16(x)) at half the HBM.  One-hot masks
    # ({0,1}) are exact in bf16 outright.  The compat history is the one
    # exception: its buffer feeds the f32 L1 loss directly
    # (losses.gen_loss_p2p_hist), so it stays f32 for exact reference
    # dynamics.
    cd = _dtype(cfg)
    if _compat_hist(cfg):
        # fixed-shape buffer for the reference's concat-accumulated fake
        # history (model.py:175-179): count grows by the effective batch
        # until >= 10, then resets — max prefix is 9 + batch entries.
        b_eff = cfg.batch_size * (2 if cfg.use_augmentation else 1)
        pool = pool_init(9 + b_eff, (h, w, cfg.output_nc))
    elif cfg.loss_mode == "sggan" and not cfg.use_pix2pix:
        # pool (fake, mask) pairs so a historical fake is judged against
        # the semantic mask it was generated under
        hm, wm = cfg.mask_hw
        pool = pool_init(pool_slots, {"fake": (h, w, cfg.output_nc),
                                      "mask": (hm, wm, cfg.segment_class)},
                         dtype=cd)
    else:
        pool = pool_init(pool_slots, (h, w, cfg.output_nc), dtype=cd)
    # real device copies — aliased buffers would be donated twice
    ema = jax.tree.map(jnp.copy, gp) if cfg.gen_ema > 0 else None
    return TrainState(gp, gbn, dp, dbn, tx.init(gp), tx.init(dp), pool,
                      jnp.zeros((), jnp.int32), ema)


def _gen_fwd(cfg, params, bn, x, rng, deterministic):
    cd = _dtype(cfg)
    if cfg.use_pix2pix:
        y, new_bn = generator_pix2pix.apply(
            params, bn, x, compute_dtype=cd, rng=rng,
            deterministic=deterministic, train=not deterministic, ngf=cfg.ngf)
        return y, new_bn
    if cfg.use_resnet:
        # default: the lower-peak-HBM pre-padded head under --remat (see
        # generator_resnet.apply docstring); cfg.pad_free_head overrides
        pfh = cfg.pad_free_head if cfg.pad_free_head is not None \
            else not cfg.remat
        return generator_resnet.apply(params, x, compute_dtype=cd,
                                      remat=cfg.remat,
                                      pad_free_head=pfh), {}
    return generator_unet.apply(params, x, compute_dtype=cd, rng=rng,
                                deterministic=deterministic,
                                remat=cfg.remat), {}


def _disc_fwd(cfg, params, bn, img, mask_or_tar, train):
    cd = _dtype(cfg)
    if cfg.use_pix2pix:
        return discriminator_pix2pix.apply(params, bn, img, mask_or_tar,
                                           compute_dtype=cd, train=train)
    return discriminator.apply(params, img, mask_or_tar, compute_dtype=cd), bn


def build_step_fn(cfg, axis_name: Optional[str] = None):
    """The un-jitted step body: (state, batch, lr, rng) -> (state, metrics).

    batch: {"real_a": (B,H,W,3) [0,1] float, "seg_a": (B,H,W,3),
            "mask_a": (B,hm,wm,n_class)}  (mask unused in pix2pix mode).

    With `axis_name` set the step runs per data-parallel shard inside
    shard_map: gradients/metrics/BN stats are pmean'd over the axis (the
    allreduce rides ICI), the RNG is decorrelated per shard, and the image
    pool keeps a per-shard slot set (buffer sharded on its leading dim).
    """
    deterministic = cfg.dropout_mode == "keras_quirk"
    bn_train = not deterministic
    tx = _tx(cfg.beta1)
    compat_hist = _compat_hist(cfg)
    if compat_hist and axis_name is not None:
        raise NotImplementedError(
            "compat_fake_history reproduces a single-device training-"
            "dynamics quirk; run it with mesh_data=mesh_space=1")

    def step_fn(state: TrainState, batch, lr, rng):
        if axis_name is not None:
            rng = jax.random.fold_in(rng, jax.lax.axis_index(axis_name))
        rng_g, rng_pool = jax.random.split(rng)
        real_a = batch["real_a"].astype(jnp.float32)
        seg_a = batch["seg_a"].astype(jnp.float32)
        mask_a = batch.get("mask_a")

        # ---------------- generator loss + grads ----------------
        def gen_loss_fn(gp, gbn):
            fake, new_gbn = _gen_fwd(cfg, gp, gbn, real_a, rng_g, deterministic)
            if compat_hist:
                # reference model.py:175-179: the losses see the whole
                # accumulated fake history (prior entries are constants —
                # they came from earlier eager steps / stop_gradient),
                # gated by the CURRENT batch's mask (the reference quirk).
                buf = jax.lax.stop_gradient(state.pool.buffer)
                k, b = buf.shape[0], fake.shape[0]
                reset = state.pool.count >= 10
                offset = jnp.where(reset, 0, state.pool.count)
                hist = jax.lax.dynamic_update_slice(
                    buf, fake.astype(buf.dtype), (offset, 0, 0, 0))
                new_count = offset + b
                valid = jnp.arange(k) < new_count
                reps = -(-k // b)
                mask_h = jnp.tile(mask_a, (reps, 1, 1, 1))[:k]
                seg_h = jnp.tile(seg_a, (reps, 1, 1, 1))[:k]
                da_hist, _ = _disc_fwd(cfg, state.disc_params, state.disc_bn,
                                       hist, mask_h, train=False)
                loss = losses.gen_loss_p2p_hist(da_hist, hist, seg_h, valid)
                return loss, (fake, new_gbn,
                              (hist, new_count, valid, mask_h))
            if cfg.use_pix2pix:
                da_fake, _ = _disc_fwd(cfg, state.disc_params, state.disc_bn,
                                       seg_a, fake, train=False)
            else:
                da_fake, _ = _disc_fwd(cfg, state.disc_params, state.disc_bn,
                                       fake, mask_a, train=False)
            if cfg.loss_mode == "sggan":
                loss = losses.gen_loss_sggan(
                    da_fake, real_a, fake, seg_a, use_lsgan=cfg.use_lsgan,
                    l1_lambda=cfg.L1_lambda, lg_lambda=cfg.Lg_lambda,
                    l1_target=cfg.sggan_l1_target)
            elif cfg.loss_mode == "simple":
                # the reference's dormant sce losses with the
                # 1/ratio_gan2seg weighting (model.py:135-140)
                loss = losses.gen_loss_simple(
                    da_fake, fake, seg_a,
                    alpha_recip=1.0 / cfg.ratio_gan2seg)
            else:
                loss = losses.gen_loss_p2p(da_fake, fake, seg_a)
            return loss, (fake, new_gbn, None)

        (g_loss, (fake, new_gbn, hist_aux)), g_grads = jax.value_and_grad(
            gen_loss_fn, has_aux=True)(state.gen_params, state.gen_bn)

        # ---------------- discriminator loss + grads ----------------
        if compat_hist:
            hist, new_count, valid, mask_h = hist_aux
            hist_sg = jax.lax.stop_gradient(hist)
            new_pool = PoolState(hist_sg, new_count)

            def hist_disc_loss_fn(dp, dbn):
                da_real, dbn1 = _disc_fwd(cfg, dp, dbn, seg_a, mask_a,
                                          train=False)
                da_hist, dbn2 = _disc_fwd(cfg, dp, dbn1, hist_sg, mask_h,
                                          train=False)
                loss = losses.disc_loss_p2p_hist(da_real, da_hist, valid)
                return loss, dbn2

            (d_loss, new_dbn), d_grads = jax.value_and_grad(
                hist_disc_loss_fn, has_aux=True)(state.disc_params,
                                                 state.disc_bn)
            g_upd, g_opt = tx.update(g_grads, state.g_opt, state.gen_params)
            gen_params = optax.apply_updates(
                state.gen_params, jax.tree.map(lambda u: -lr * u, g_upd))
            d_upd, d_opt = tx.update(d_grads, state.d_opt, state.disc_params)
            disc_params = optax.apply_updates(
                state.disc_params, jax.tree.map(lambda u: -lr * u, d_upd))
            new_state = TrainState(gen_params, new_gbn, disc_params, new_dbn,
                                   g_opt, d_opt, new_pool, state.step + 1,
                                   _ema_update(cfg, state.ema, gen_params))
            return new_state, {"gen_loss": g_loss, "disc_loss": d_loss}

        fake_sg = jax.lax.stop_gradient(fake)
        mask_for_d = mask_a
        if cfg.loss_mode == "sggan" and cfg.max_size > 0:
            if cfg.use_pix2pix:
                new_pool, fake_for_d = pool_update(state.pool, rng_pool,
                                                   fake_sg)
            else:
                new_pool, pooled = pool_update(
                    state.pool, rng_pool, {"fake": fake_sg, "mask": mask_a})
                fake_for_d, mask_for_d = pooled["fake"], pooled["mask"]
        else:
            new_pool, fake_for_d = state.pool, fake_sg

        def disc_loss_fn(dp, dbn):
            if cfg.use_pix2pix:
                da_real, dbn1 = _disc_fwd(cfg, dp, dbn, seg_a, seg_a,
                                          train=bn_train)
                da_fake_s, dbn2 = _disc_fwd(cfg, dp, dbn1, seg_a, fake_for_d,
                                            train=bn_train)
            else:
                # one batched D call over [real; fake] — instance norm is
                # per-sample so numerics match two separate calls, and the
                # convs run at double batch (better MXU utilization)
                both, dbn2 = _disc_fwd(
                    cfg, dp, dbn,
                    jnp.concatenate([seg_a, fake_for_d], axis=0),
                    jnp.concatenate([mask_a, mask_for_d], axis=0), False)
                n = seg_a.shape[0]
                da_real, da_fake_s = both[:n], both[n:]
            if cfg.loss_mode == "sggan":
                loss = losses.disc_loss_sggan(da_real, da_fake_s,
                                              use_lsgan=cfg.use_lsgan)
            elif cfg.loss_mode == "simple":
                loss = losses.disc_loss_simple(da_real, da_fake_s)
            else:
                loss = losses.disc_loss_p2p(da_real, da_fake_s)
            return loss, dbn2

        (d_loss, new_dbn), d_grads = jax.value_and_grad(
            disc_loss_fn, has_aux=True)(state.disc_params, state.disc_bn)

        # ---------------- data-parallel allreduce over ICI ----------------
        if axis_name is not None:
            pmean = lambda t: jax.lax.pmean(t, axis_name)
            g_grads, d_grads = pmean(g_grads), pmean(d_grads)
            new_gbn, new_dbn = pmean(new_gbn), pmean(new_dbn)
            g_loss, d_loss = pmean(g_loss), pmean(d_loss)

        # ---------------- Adam updates ----------------
        g_upd, g_opt = tx.update(g_grads, state.g_opt, state.gen_params)
        g_upd = jax.tree.map(lambda u: -lr * u, g_upd)
        gen_params = optax.apply_updates(state.gen_params, g_upd)

        d_upd, d_opt = tx.update(d_grads, state.d_opt, state.disc_params)
        d_upd = jax.tree.map(lambda u: -lr * u, d_upd)
        disc_params = optax.apply_updates(state.disc_params, d_upd)

        new_state = TrainState(gen_params, new_gbn, disc_params, new_dbn,
                               g_opt, d_opt, new_pool, state.step + 1,
                               _ema_update(cfg, state.ema, gen_params))
        metrics = {"gen_loss": g_loss, "disc_loss": d_loss}
        return new_state, metrics

    return step_fn


def make_train_step(cfg, donate: Optional[bool] = None):
    """Jitted single-device step (see build_step_fn)."""
    donate = cfg.donate if donate is None else donate
    return jax.jit(build_step_fn(cfg), donate_argnums=(0,) if donate else ())
