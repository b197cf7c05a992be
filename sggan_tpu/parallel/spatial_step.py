"""Fully sharded (data x space[ x wspace]) SG-GAN train step.

The batch axis is sharded over mesh axis ``data`` AND the image H axis over
mesh axis ``space`` — 2-D SPMD for native-resolution training.  A mesh with
a ``wspace`` axis additionally shards the image W plane (2-D H x W shard
grid for very wide panoramas; semantic and pix2pix nets).  Built on
the spatially-sharded resnet generator and patch-head semantic
discriminator (spatial.py); instance-norm moments psum over ``space``,
halo rows travel by ppermute, and gradients/losses pmean over both axes
(per-shard local-mean losses aggregate exactly because every loss term is
a mean over equal-sized shards; cross-shard dependency gradients flow
through the collective transposes).

Supported configurations:
* loss_mode="sggan" with the resnet or unet generator and the semantic
  discriminator in its paper-style stride-8 patch head (the reference's
  global VALID chain does not split spatially);
* loss_mode="p2p" with the pix2pix generator/discriminator (BN moments
  psum over ``space``; the deep low-res middle runs replicated after an
  all_gather — see spatial.generator_pix2pix_sp);
* loss_mode="cycle" with the resnet or unet generators and two patch-head
  semantic discriminators (train/cycle.py objective, spatially sharded —
  native-resolution UNPAIRED training; pooled (fake_a, fake_b) pairs keep
  their H/W plane sharded like the sggan pool).

The image pool keeps per-(data-shard) slots holding H-sharded fakes; pool
RNG is folded by the data index only so all space shards of one data shard
make identical slot decisions.  unet/pix2pix dropout uses per-space-shard
keys (masks are iid per pixel).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import losses
from ..models import discriminator
from ..train.pool import PoolState, pool_init, pool_update
from ..train.step import TrainState, _dtype, _ema_update, _tx
from .mesh import DATA_AXIS, SPACE_AXIS, WSPACE_AXIS
from . import spatial


def init_sp_state(cfg, key, n_data: int = 1) -> TrainState:
    from ..models import (discriminator_pix2pix, generator_pix2pix,
                          generator_resnet, generator_unet)
    kg, kd = jax.random.split(key)
    h, w = cfg.image_height, cfg.image_width
    tx = _tx(cfg.beta1)
    if cfg.use_pix2pix:
        gp, gbn = generator_pix2pix.init(kg, ngf=cfg.ngf,
                                         input_nc=cfg.input_nc,
                                         output_nc=cfg.output_nc,
                                         image_size=h)
        dpp, dbn = discriminator_pix2pix.init(kd, ndf=cfg.ndf,
                                              input_nc=cfg.input_nc)
        pool = pool_init(1 * n_data, (h, w, cfg.output_nc),
                         dtype=_dtype(cfg))  # p2p: unused
        ema = jax.tree.map(jnp.copy, gp) if cfg.gen_ema > 0 else None
        return TrainState(gp, gbn, dpp, dbn, tx.init(gp), tx.init(dpp),
                          pool, jnp.zeros((), jnp.int32), ema)
    if cfg.use_resnet:
        gp = generator_resnet.init(kg, ngf=cfg.ngf, input_nc=cfg.input_nc,
                                   output_nc=cfg.output_nc)
    else:
        gp = generator_unet.init(kg, ngf=cfg.ngf, input_nc=cfg.input_nc,
                                 output_nc=cfg.output_nc)
    dp = discriminator.init(kd, ndf=cfg.ndf, input_nc=cfg.input_nc,
                            n_class=cfg.segment_class, image_size=(h, w),
                            head="patch")
    # (fake, mask) pooled together (both space-sharded on their H dim) so
    # historical fakes keep the semantic mask they were generated under
    hm, wm = cfg.mask_hw
    # compute-dtype storage — bit-exact for D consumers, half the HBM
    # (see pool.pool_update)
    pool = pool_init(max(cfg.max_size, 1) * n_data,
                     {"fake": (h, w, cfg.output_nc),
                      "mask": (hm, wm, cfg.segment_class)},
                     dtype=_dtype(cfg))
    ema = jax.tree.map(jnp.copy, gp) if cfg.gen_ema > 0 else None
    return TrainState(gp, {}, dp, {}, tx.init(gp), tx.init(dp), pool,
                      jnp.zeros((), jnp.int32), ema)


def init_sp_cycle_state(cfg, key, n_data: int = 1) -> TrainState:
    """Cycle-mode state for spatial meshes — train/cycle.init_cycle_state
    with PATCH-head discriminators (the reference's global VALID chain
    does not split spatially; same substitution init_sp_state makes for
    the sggan objective)."""
    from ..models import generator_resnet, generator_unet
    kg1, kg2, kd1, kd2 = jax.random.split(key, 4)
    h, w = cfg.image_height, cfg.image_width
    gen = generator_resnet if cfg.use_resnet else generator_unet
    gp = {"a2b": gen.init(kg1, ngf=cfg.ngf, input_nc=cfg.input_nc,
                          output_nc=cfg.output_nc),
          "b2a": gen.init(kg2, ngf=cfg.ngf, input_nc=cfg.input_nc,
                          output_nc=cfg.output_nc)}
    dpp = {"da": discriminator.init(kd1, ndf=cfg.ndf,
                                    input_nc=cfg.input_nc,
                                    n_class=cfg.segment_class,
                                    image_size=(h, w), head="patch"),
           "db": discriminator.init(kd2, ndf=cfg.ndf,
                                    input_nc=cfg.input_nc,
                                    n_class=cfg.segment_class,
                                    image_size=(h, w), head="patch")}
    tx = _tx(cfg.beta1)
    hm, wm = cfg.mask_hw
    pool = pool_init(max(cfg.max_size, 1) * n_data,
                     {"fakes": (2, h, w, cfg.output_nc),
                      "masks": (2, hm, wm, cfg.segment_class)},
                     dtype=_dtype(cfg))
    ema = jax.tree.map(jnp.copy, gp) if cfg.gen_ema > 0 else None
    return TrainState(gp, {}, dpp, {}, tx.init(gp), tx.init(dpp), pool,
                      jnp.zeros((), jnp.int32), ema)


def _build_sp_step_cycle(cfg, data_axis: str, space_axis: str,
                         wspace_axis: Optional[str] = None):
    """train/cycle.build_cycle_step_fn's objective, (data x space[
    x wspace]) sharded: all generator/discriminator forwards run on the
    H(/W)-sharded plane with halo exchange + psum'd IN moments
    (spatial.py); every loss term is a mean over equal-sized shards, so
    shard-local means pmean'd over all axes equal the global means; the
    (fake_a, fake_b) pool keeps per-data-shard slots with the pair's
    plane sharded in place (pool RNG folds by the data index only, so
    all space shards of one data shard make identical slot decisions)."""
    cd = _dtype(cfg)
    tx = _tx(cfg.beta1)
    crit = losses.criterion_gan(cfg.use_lsgan)
    aw = wspace_axis
    axes = (data_axis, space_axis) + ((aw,) if aw else ())
    deterministic = cfg.dropout_mode == "keras_quirk"

    def gen_fwd(gp1, x, rng):
        if cfg.use_resnet:
            return spatial.generator_resnet_sp(gp1, x, space_axis, cd,
                                               axis_w=aw)
        return spatial.generator_unet_sp(gp1, x, space_axis, cd, rng=rng,
                                         deterministic=deterministic,
                                         axis_w=aw)

    def d_fwd(dp1, x, mask):
        return spatial.discriminator_sp(dp1, x, mask, space_axis, cd,
                                        axis_w=aw)

    def step_fn(state: TrainState, batch, lr, rng):
        rng = jax.random.fold_in(rng, jax.lax.axis_index(data_axis))
        r1, r2, r3, r4, rng_pool = jax.random.split(rng, 5)
        real_a = batch["real_a"].astype(jnp.float32)
        real_b = batch["real_b"].astype(jnp.float32)
        seg_a, seg_b = batch["seg_a"], batch["seg_b"]
        mask_a, mask_b = batch["mask_a"], batch["mask_b"]
        w_a = spatial.seg_boundary_weight_sp(seg_a, space_axis, axis_w=aw)
        w_b = spatial.seg_boundary_weight_sp(seg_b, space_axis, axis_w=aw)

        def gen_loss_fn(gp):
            fake_b = gen_fwd(gp["a2b"], real_a, r1)
            fake_a = gen_fwd(gp["b2a"], real_b, r2)
            cyc_a = gen_fwd(gp["b2a"], fake_b, r3)
            cyc_b = gen_fwd(gp["a2b"], fake_a, r4)
            d_fake_b = d_fwd(state.disc_params["db"], fake_b, mask_a)
            d_fake_a = d_fwd(state.disc_params["da"], fake_a, mask_b)
            g = crit(d_fake_b, jnp.ones_like(d_fake_b)) \
                + crit(d_fake_a, jnp.ones_like(d_fake_a))
            g += cfg.L1_lambda * (losses.abs_criterion(real_a, cyc_a)
                                  + losses.abs_criterion(real_b, cyc_b))
            if cfg.identity_lambda:
                idt_b = gen_fwd(gp["a2b"], real_b, r3)
                idt_a = gen_fwd(gp["b2a"], real_a, r4)
                g += cfg.identity_lambda * (
                    losses.abs_criterion(idt_b, real_b)
                    + losses.abs_criterion(idt_a, real_a))
            if cfg.Lg_lambda:
                g += cfg.Lg_lambda * (
                    spatial.gradloss_criterion_sp(fake_b, real_a, w_a,
                                                  space_axis, axis_w=aw)
                    + spatial.gradloss_criterion_sp(fake_a, real_b, w_b,
                                                    space_axis, axis_w=aw))
            return g, (fake_a, fake_b)

        (g_loss, (fake_a, fake_b)), g_grads = jax.value_and_grad(
            gen_loss_fn, has_aux=True)(state.gen_params)

        entry = {
            "fakes": jax.lax.stop_gradient(
                jnp.stack([fake_a, fake_b], axis=1)),     # (B, 2, H, W, C)
            "masks": jnp.stack([mask_b, mask_a], axis=1),
        }
        if cfg.max_size > 0:
            new_pool, pooled = pool_update(state.pool, rng_pool, entry)
        else:
            new_pool, pooled = state.pool, entry
        fake_a_s, fake_b_s = pooled["fakes"][:, 0], pooled["fakes"][:, 1]
        mask_fa, mask_fb = pooled["masks"][:, 0], pooled["masks"][:, 1]

        def disc_loss_fn(dpm):
            # batched D calls over [real; fake] per domain (per-sample IN
            # makes this exactly equal to separate calls)
            n = real_a.shape[0]
            both_a = d_fwd(dpm["da"],
                           jnp.concatenate([real_a, fake_a_s], axis=0),
                           jnp.concatenate([mask_a, mask_fa], axis=0))
            both_b = d_fwd(dpm["db"],
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

        pmean = lambda t: jax.lax.pmean(t, axes)
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


def build_sp_step_fn(cfg, data_axis: str = DATA_AXIS,
                     space_axis: str = SPACE_AXIS,
                     wspace_axis: Optional[str] = None):
    if cfg.loss_mode == "cycle":
        assert not cfg.use_pix2pix, \
            "cycle spatial step uses the semantic nets"
        return _build_sp_step_cycle(cfg, data_axis, space_axis,
                                    wspace_axis)
    if cfg.use_pix2pix:
        assert cfg.loss_mode == "p2p", \
            "pix2pix spatial step runs the p2p objective"
        return _build_sp_step_p2p_pix2pix(cfg, data_axis, space_axis,
                                          wspace_axis)
    assert cfg.loss_mode == "sggan", \
        "semantic spatial step runs the sggan objective"
    cd = _dtype(cfg)
    tx = _tx(cfg.beta1)
    crit = losses.criterion_gan(cfg.use_lsgan)
    aw = wspace_axis
    axes = (data_axis, space_axis) + ((aw,) if aw else ())
    deterministic = cfg.dropout_mode == "keras_quirk"

    def step_fn(state: TrainState, batch, lr, rng):
        rng = jax.random.fold_in(rng, jax.lax.axis_index(data_axis))
        rng_pool = rng  # shared across space shards of one data shard
        rng_g = jax.random.fold_in(rng, 1)  # unet dropout only
        real_a = batch["real_a"].astype(jnp.float32)
        seg_a = batch["seg_a"].astype(jnp.float32)
        mask_a = batch["mask_a"]
        w_a = spatial.seg_boundary_weight_sp(seg_a, space_axis, axis_w=aw)

        def gen_fwd_sp(gp, x):
            if cfg.use_resnet:
                return spatial.generator_resnet_sp(gp, x, space_axis, cd,
                                                   axis_w=aw)
            return spatial.generator_unet_sp(gp, x, space_axis, cd,
                                             rng=rng_g,
                                             deterministic=deterministic,
                                             axis_w=aw)

        l1_anchor = seg_a if cfg.sggan_l1_target == "seg" else real_a

        def gen_loss_fn(gp):
            fake = gen_fwd_sp(gp, real_a)
            da_fake = spatial.discriminator_sp(state.disc_params, fake,
                                               mask_a, space_axis, cd,
                                               axis_w=aw)
            g = crit(da_fake, jnp.ones_like(da_fake))
            g = g + cfg.L1_lambda * losses.abs_criterion(l1_anchor, fake)
            if cfg.Lg_lambda:
                g = g + cfg.Lg_lambda * spatial.gradloss_criterion_sp(
                    fake, real_a, w_a, space_axis, axis_w=aw)
            return g, fake

        (g_loss, fake), g_grads = jax.value_and_grad(
            gen_loss_fn, has_aux=True)(state.gen_params)

        fake_sg = jax.lax.stop_gradient(fake)
        if cfg.max_size > 0:
            new_pool, pooled = pool_update(state.pool, rng_pool,
                                           {"fake": fake_sg, "mask": mask_a})
            fake_for_d, mask_for_d = pooled["fake"], pooled["mask"]
        else:
            new_pool, fake_for_d, mask_for_d = state.pool, fake_sg, mask_a

        def disc_loss_fn(dpm):
            da_real = spatial.discriminator_sp(dpm, seg_a, mask_a,
                                               space_axis, cd, axis_w=aw)
            da_fake_s = spatial.discriminator_sp(dpm, fake_for_d, mask_for_d,
                                                 space_axis, cd, axis_w=aw)
            return losses.disc_loss_sggan(da_real, da_fake_s,
                                          use_lsgan=cfg.use_lsgan)

        d_loss, d_grads = jax.value_and_grad(disc_loss_fn)(state.disc_params)

        pmean = lambda t: jax.lax.pmean(t, axes)
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


def _build_sp_step_p2p_pix2pix(cfg, data_axis: str, space_axis: str,
                               wspace_axis: Optional[str] = None):
    """p2p objective with the pix2pix nets, (data x space[ x wspace])
    sharded.  BN statistics in the sharded region psum over the space
    axis/axes (exact global spatial moments per data shard) and the
    updated states pmean over ``data`` — the same aggregation dp.py
    applies."""
    cd = _dtype(cfg)
    tx = _tx(cfg.beta1)
    aw = wspace_axis
    axes = (data_axis, space_axis) + ((aw,) if aw else ())
    deterministic = cfg.dropout_mode == "keras_quirk"
    bn_train = not deterministic

    def step_fn(state: TrainState, batch, lr, rng):
        rng = jax.random.fold_in(rng, jax.lax.axis_index(data_axis))
        rng_g = jax.random.fold_in(rng, 1)
        real_a = batch["real_a"].astype(jnp.float32)
        seg_a = batch["seg_a"].astype(jnp.float32)

        def gen_loss_fn(gp, gbn):
            fake, new_gbn = spatial.generator_pix2pix_sp(
                gp, gbn, real_a, space_axis, cd, rng=rng_g,
                deterministic=deterministic, train=bn_train, ngf=cfg.ngf,
                axis_w=aw)
            da_fake, _ = spatial.discriminator_pix2pix_sp(
                state.disc_params, state.disc_bn, seg_a, fake, space_axis,
                cd, train=False, axis_w=aw)
            return losses.gen_loss_p2p(da_fake, fake, seg_a), (fake, new_gbn)

        (g_loss, (fake, new_gbn)), g_grads = jax.value_and_grad(
            gen_loss_fn, has_aux=True)(state.gen_params, state.gen_bn)

        fake_sg = jax.lax.stop_gradient(fake)

        def disc_loss_fn(dp, dbn):
            da_real, dbn1 = spatial.discriminator_pix2pix_sp(
                dp, dbn, seg_a, seg_a, space_axis, cd, train=bn_train,
                axis_w=aw)
            da_fake_s, dbn2 = spatial.discriminator_pix2pix_sp(
                dp, dbn1, seg_a, fake_sg, space_axis, cd, train=bn_train,
                axis_w=aw)
            return losses.disc_loss_p2p(da_real, da_fake_s), dbn2

        (d_loss, new_dbn), d_grads = jax.value_and_grad(
            disc_loss_fn, has_aux=True)(state.disc_params, state.disc_bn)

        pmean = lambda t: jax.lax.pmean(t, axes)
        g_grads, d_grads = pmean(g_grads), pmean(d_grads)
        g_loss, d_loss = pmean(g_loss), pmean(d_loss)
        # BN states are already space-exact (psum'd moments); average the
        # per-data-shard batches
        dmean = lambda t: jax.lax.pmean(t, data_axis)
        new_gbn, new_dbn = dmean(new_gbn), dmean(new_dbn)

        g_upd, g_opt = tx.update(g_grads, state.g_opt, state.gen_params)
        gen_params = optax.apply_updates(
            state.gen_params, jax.tree.map(lambda u: -lr * u, g_upd))
        d_upd, d_opt = tx.update(d_grads, state.d_opt, state.disc_params)
        disc_params = optax.apply_updates(
            state.disc_params, jax.tree.map(lambda u: -lr * u, d_upd))

        new_state = TrainState(gen_params, new_gbn, disc_params, new_dbn,
                               g_opt, d_opt, state.pool, state.step + 1,
                               _ema_update(cfg, state.ema, gen_params))
        return new_state, {"gen_loss": g_loss, "disc_loss": d_loss}

    return step_fn


def _has_wspace(mesh: Mesh) -> bool:
    return WSPACE_AXIS in mesh.axis_names


def _batch_spec(mesh: Mesh) -> P:
    # (B, H, W, C): B over data, H over space, W over wspace (if present)
    if _has_wspace(mesh):
        return P(DATA_AXIS, SPACE_AXIS, WSPACE_AXIS)
    return P(DATA_AXIS, SPACE_AXIS)


def _sp_state_spec(mesh: Mesh, cycle: bool = False) -> TrainState:
    # pool buffer: (slot, H, W, C) — slots over data, plane over space
    # axes; cycle pools (fake_a, fake_b) PAIRS, (slot, 2, H, W, C) — the
    # pair dim stays unsharded
    pair = (None,) if cycle else ()
    if _has_wspace(mesh):
        buf = P(DATA_AXIS, *pair, SPACE_AXIS, WSPACE_AXIS)
    else:
        buf = P(DATA_AXIS, *pair, SPACE_AXIS)
    return TrainState(
        gen_params=P(), gen_bn=P(), disc_params=P(), disc_bn=P(),
        g_opt=P(), d_opt=P(),
        pool=PoolState(buffer=buf, count=P()),
        step=P(),
        ema=P(),  # replicated shadow (ignored when state.ema is None)
    )


BATCH_SPEC = P(DATA_AXIS, SPACE_AXIS)  # 1-D grid spec (kept for callers)


def make_sp_step_body(cfg, mesh: Mesh):
    """The shard_mapped but UN-jitted spatial step body — composable
    inside a larger jitted program (the trainer's fused
    gather+preprocess+step dispatch; see dp.make_dp_step_body)."""
    fn = build_sp_step_fn(
        cfg, wspace_axis=WSPACE_AXIS if _has_wspace(mesh) else None)
    spec = _sp_state_spec(mesh, cycle=cfg.loss_mode == "cycle")
    return jax.shard_map(
        fn, mesh=mesh,
        in_specs=(spec, _batch_spec(mesh), P(), P()),
        out_specs=(spec, P()),
        check_vma=False,
    )


def make_sp_train_step(cfg, mesh: Mesh, donate: Optional[bool] = None):
    mapped = make_sp_step_body(cfg, mesh)
    donate = cfg.donate if donate is None else donate
    return jax.jit(mapped, donate_argnums=(0,) if donate else ())


def place_sp(state: TrainState, mesh: Mesh) -> TrainState:
    rep = NamedSharding(mesh, P())
    placed = jax.device_put(state, rep)
    # cycle pools (slot, 2, H, W, C) pairs — detect by leaf rank
    cycle = any(a.ndim == 5 for a in jax.tree.leaves(state.pool.buffer))
    buf = jax.device_put(
        state.pool.buffer,
        NamedSharding(mesh, _sp_state_spec(mesh, cycle=cycle).pool.buffer))
    return placed._replace(pool=placed.pool._replace(buffer=buf))


def shard_sp_batch(batch: dict, mesh: Mesh) -> dict:
    """Place a host batch sharded (B over data, H over space, W over
    wspace).  Multi-process: each process holds its full-resolution rows
    of the global batch (the trainer requires the space grid to divide
    the local device count, so every host owns whole data rows) and the
    H/W split happens here, locally, via
    `make_array_from_process_local_data` — no cross-host transfer."""
    sh = NamedSharding(mesh, _batch_spec(mesh))
    if jax.process_count() > 1:
        import numpy as np
        return {k: jax.make_array_from_process_local_data(
            sh, np.asarray(v)) for k, v in batch.items()}
    return {k: jax.device_put(v, sh) for k, v in batch.items()}
