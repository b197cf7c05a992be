"""Cycle-consistency trainer — the full SG-GAN objective
(BASELINE config #3: "cycle + identity + semantic-aware gradient-weighted
losses").

The reference carries this capability only vestigially: cycle-direction
flags (main.py:29), an image pool sized for 4-element A/B entries
(utils.py:27-53), LSGAN criterion selection and the gradient-sensitive
loss machinery are all built but the active train step wires none of them
(SURVEY §1).  Here it is a first-class mode:

    two generators  G: A->B, F: B->A   (resnet or unet, shared arch)
    two semantic discriminators D_A, D_B (mask-gated PatchGAN)
    L = GAN(D_B(G(a))) + GAN(D_A(F(b)))
      + L1_lambda  * (|F(G(a)) - a| + |G(F(b)) - b|)           cycle
      + identity_lambda * (|G(b) - b| + |F(a) - a|)            identity
      + Lg_lambda  * (gradloss(G(a), a, w_a) + gradloss(F(b), b, w_b))
    D losses on pooled fake pairs (the intended utils.py:27 semantics —
    one pool entry holds the stacked (fake_a, fake_b) pair).

A translated image keeps its source's layout, so D_B gates G(a) with the
A-side mask and D_A gates F(b) with the B-side mask.

State reuses TrainState: gen_params = {"a2b", "b2a"} under one Adam,
disc_params = {"da", "db"} under the other — matching the reference's
two-optimizer split (model.py:83-84)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax

from .. import losses
from ..models import discriminator, generator_resnet, generator_unet
from ..ops.deriv import seg_boundary_weight
from .pool import pool_init, pool_update
from .step import TrainState, _dtype, _ema_update, _tx


def _gen(cfg):
    return generator_resnet if cfg.use_resnet else generator_unet


def init_cycle_state(cfg, key, n_data: int = 1) -> TrainState:
    kg1, kg2, kd1, kd2 = jax.random.split(key, 4)
    h, w = cfg.image_height, cfg.image_width
    gen = _gen(cfg)
    gp = {"a2b": gen.init(kg1, ngf=cfg.ngf, input_nc=cfg.input_nc,
                          output_nc=cfg.output_nc),
          "b2a": gen.init(kg2, ngf=cfg.ngf, input_nc=cfg.input_nc,
                          output_nc=cfg.output_nc)}
    dp = {"da": discriminator.init(kd1, ndf=cfg.ndf, input_nc=cfg.input_nc,
                                   n_class=cfg.segment_class,
                                   image_size=(h, w)),
          "db": discriminator.init(kd2, ndf=cfg.ndf, input_nc=cfg.input_nc,
                                   n_class=cfg.segment_class,
                                   image_size=(h, w))}
    tx = _tx(cfg.beta1)
    # one pool entry = the (fake_a, fake_b) pair PLUS the source masks they
    # were generated under, so pooled fakes are gated with their own masks
    hm, wm = cfg.mask_hw
    # compute-dtype storage: pooled pairs feed only D forwards (which
    # cast to the compute dtype) — bit-exact at half the HBM, see
    # pool.pool_update
    pool = pool_init(max(cfg.max_size, 1) * n_data,
                     {"fakes": (2, h, w, cfg.output_nc),
                      "masks": (2, hm, wm, cfg.segment_class)},
                     dtype=_dtype(cfg))
    # --gen_ema shadows BOTH generators (the {"a2b","b2a"} tree maps
    # through _ema_update / Trainer.generate / serve untouched)
    ema = jax.tree.map(jnp.copy, gp) if cfg.gen_ema > 0 else None
    return TrainState(gp, {}, dp, {}, tx.init(gp), tx.init(dp), pool,
                      jnp.zeros((), jnp.int32), ema)


def build_cycle_step_fn(cfg, axis_name: Optional[str] = None):
    """(state, batch, lr, rng) -> (state, metrics).  batch needs both
    domains: real_a/seg_a/mask_a and real_b/seg_b/mask_b."""
    gen = _gen(cfg)
    cd = _dtype(cfg)
    deterministic = cfg.dropout_mode == "keras_quirk"
    tx = _tx(cfg.beta1)
    crit = losses.criterion_gan(cfg.use_lsgan)

    if cfg.use_resnet:
        # same head-form convention as step.py:_gen_fwd: pre-padded head
        # under --remat (lower peak HBM), cfg.pad_free_head overrides
        pfh = cfg.pad_free_head if cfg.pad_free_head is not None \
            else not cfg.remat

        def g_apply(p, x, rng):
            return gen.apply(p, x, compute_dtype=cd, remat=cfg.remat,
                             pad_free_head=pfh)
    else:
        def g_apply(p, x, rng):
            return gen.apply(p, x, compute_dtype=cd, rng=rng,
                             deterministic=deterministic,
                             remat=cfg.remat)

    def d_apply(p, x, mask):
        return discriminator.apply(p, x, mask, compute_dtype=cd)

    def step_fn(state: TrainState, batch, lr, rng):
        if axis_name is not None:
            rng = jax.random.fold_in(rng, jax.lax.axis_index(axis_name))
        r1, r2, r3, r4, rng_pool = jax.random.split(rng, 5)
        real_a = batch["real_a"].astype(jnp.float32)
        real_b = batch["real_b"].astype(jnp.float32)
        seg_a, seg_b = batch["seg_a"], batch["seg_b"]
        mask_a, mask_b = batch["mask_a"], batch["mask_b"]
        w_a = seg_boundary_weight(seg_a)
        w_b = seg_boundary_weight(seg_b)

        def gen_loss_fn(gp):
            fake_b = g_apply(gp["a2b"], real_a, r1)
            fake_a = g_apply(gp["b2a"], real_b, r2)
            cyc_a = g_apply(gp["b2a"], fake_b, r3)
            cyc_b = g_apply(gp["a2b"], fake_a, r4)
            d_fake_b = d_apply(state.disc_params["db"], fake_b, mask_a)
            d_fake_a = d_apply(state.disc_params["da"], fake_a, mask_b)
            g = crit(d_fake_b, jnp.ones_like(d_fake_b)) \
                + crit(d_fake_a, jnp.ones_like(d_fake_a))
            g += cfg.L1_lambda * (losses.abs_criterion(real_a, cyc_a)
                                  + losses.abs_criterion(real_b, cyc_b))
            if cfg.identity_lambda:
                idt_b = g_apply(gp["a2b"], real_b, r3)
                idt_a = g_apply(gp["b2a"], real_a, r4)
                g += cfg.identity_lambda * (
                    losses.abs_criterion(idt_b, real_b)
                    + losses.abs_criterion(idt_a, real_a))
            if cfg.Lg_lambda:
                g += cfg.Lg_lambda * (
                    losses.gradloss_criterion(fake_b, real_a, w_a)
                    + losses.gradloss_criterion(fake_a, real_b, w_b))
            return g, (fake_a, fake_b)

        (g_loss, (fake_a, fake_b)), g_grads = jax.value_and_grad(
            gen_loss_fn, has_aux=True)(state.gen_params)

        entry = {
            "fakes": jax.lax.stop_gradient(
                jnp.stack([fake_a, fake_b], axis=1)),      # (B, 2, H, W, C)
            # fake_a came from real_b (gated by mask_b), fake_b from real_a
            "masks": jnp.stack([mask_b, mask_a], axis=1),
        }
        if cfg.max_size > 0:
            new_pool, pooled = pool_update(state.pool, rng_pool, entry)
        else:
            new_pool, pooled = state.pool, entry
        fake_a_s, fake_b_s = pooled["fakes"][:, 0], pooled["fakes"][:, 1]
        mask_fa, mask_fb = pooled["masks"][:, 0], pooled["masks"][:, 1]

        def disc_loss_fn(dp):
            # batched D calls over [real; fake] per domain (per-sample IN
            # makes this exactly equal to separate calls)
            n = real_a.shape[0]
            both_a = d_apply(dp["da"],
                             jnp.concatenate([real_a, fake_a_s], axis=0),
                             jnp.concatenate([mask_a, mask_fa], axis=0))
            both_b = d_apply(dp["db"],
                             jnp.concatenate([real_b, fake_b_s], axis=0),
                             jnp.concatenate([mask_b, mask_fb], axis=0))
            d_real_a, d_fake_a = both_a[:n], both_a[n:]
            d_real_b, d_fake_b = both_b[:n], both_b[n:]
            da = (crit(d_real_a, jnp.ones_like(d_real_a))
                  + crit(d_fake_a, jnp.zeros_like(d_fake_a))) / 2.0
            db = (crit(d_real_b, jnp.ones_like(d_real_b))
                  + crit(d_fake_b, jnp.zeros_like(d_fake_b))) / 2.0
            return da + db

        d_loss, d_grads = jax.value_and_grad(disc_loss_fn)(state.disc_params)

        if axis_name is not None:
            pmean = lambda t: jax.lax.pmean(t, axis_name)
            g_grads, d_grads = pmean(g_grads), pmean(d_grads)
            g_loss, d_loss = pmean(g_loss), pmean(d_loss)

        g_upd, g_opt = tx.update(g_grads, state.g_opt, state.gen_params)
        gen_params = optax.apply_updates(
            state.gen_params, jax.tree.map(lambda u: -lr * u, g_upd))
        d_upd, d_opt = tx.update(d_grads, state.d_opt, state.disc_params)
        disc_params = optax.apply_updates(
            state.disc_params, jax.tree.map(lambda u: -lr * u, d_upd))

        new_state = TrainState(gen_params, {}, disc_params, {}, g_opt,
                               d_opt, new_pool, state.step + 1,
                               _ema_update(cfg, state.ema, gen_params))
        return new_state, {"gen_loss": g_loss, "disc_loss": d_loss}

    return step_fn


def make_cycle_train_step(cfg, donate: Optional[bool] = None):
    donate = cfg.donate if donate is None else donate
    return jax.jit(build_cycle_step_fn(cfg),
                   donate_argnums=(0,) if donate else ())
