"""Fused-dispatch training paths: device-side batch assembly from the
HBM-resident split, single-dispatch (gather + preprocess + step) programs,
the K-step lax.scan variant, and the epoch driver that runs them with
graceful per-step fallback on scan-compile OOM.

Extracted from trainer.py (VERDICT r3 item 8); every function takes the
Trainer instance (`tr`) — Trainer keeps thin delegating methods so the
public/test surface (`_make_fused_step`, `_make_fused_scan`, subclass
overrides in tests/test_trainer_modes.py) is unchanged.

Reference parity: the fused programs compute exactly what the host
iterator path computes per step (same PRNG split sequence, same flag
layout); they exist because per-step dispatch through this environment's
remote relay costs ~milliseconds each (PERF.md).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def make_batch_fn(cfg):
    """Traced device-side batch assembly for the fused paths: gather from
    the HBM-resident split + augmentation doubling + fused preprocess —
    same keys and flag layout as the host iterator."""
    from ..data.preprocess import preprocess_train
    b = cfg.batch_size

    def make_batch(img_all, seg_all, cls_all, idxs, k_pre):
        take = lambda a: jnp.take(a, idxs, axis=0, mode="clip")
        img, seg, cls = take(img_all), take(seg_all), take(cls_all)
        if cfg.use_augmentation:
            img = jnp.concatenate([img, img])
            seg = jnp.concatenate([seg, seg])
            cls = jnp.concatenate([cls, cls])
            flags = jnp.concatenate([jnp.zeros((b,), bool),
                                     jnp.ones((b,), bool)])
        else:
            flags = jnp.zeros((b,), bool)
        return preprocess_train(
            img, seg, cls, k_pre, flags, out_hw=cfg.image_size,
            mask_hw=cfg.mask_hw, n_class=cfg.segment_class,
            photometric=cfg.use_photometric,
            aug_layout="half" if cfg.use_augmentation else "none")

    return make_batch


def step_body(tr):
    """The (possibly shard_mapped) un-jitted step body + the batch
    sharding constraint for the fused programs.  With no mesh this is
    the plain single-device body; on a dp mesh the shard_mapped dp
    body with the batch sharded over `data`; on a spatial mesh the
    shard_mapped spatial body with the batch sharded over
    (data, space[, wspace]) — so the fused single-dispatch pipeline
    extends to every mesh configuration."""
    cfg = tr.cfg
    if tr.mesh is None:
        if tr.cycle:
            from .cycle import build_cycle_step_fn
            return build_cycle_step_fn(cfg), None
        from .step import build_step_fn
        return build_step_fn(cfg), None
    from jax.sharding import NamedSharding, PartitionSpec as P
    if tr._mesh_kind == "space":
        from ..parallel.spatial_step import _batch_spec, make_sp_step_body
        return (make_sp_step_body(cfg, tr.mesh),
                NamedSharding(tr.mesh, _batch_spec(tr.mesh)))
    from ..parallel.dp import make_dp_step_body
    from ..parallel.mesh import DATA_AXIS
    return (make_dp_step_body(cfg, tr.mesh),
            NamedSharding(tr.mesh, P(DATA_AXIS)))


def make_fused_step(tr, ds):
    """ONE compiled program per step: device-side batch gather from
    the HBM-resident split + fused preprocess + train step.  The
    split gather/preprocess/step dispatches cost ~440 ms/step through
    this environment's remote relay (PERF.md round 2); fused, each
    step is a single dispatch.  Numerically identical to the unfused
    path (same keys, same flag layout)."""
    cfg = tr.cfg
    body, constraint = step_body(tr)
    make_batch = make_batch_fn(cfg)

    if tr.cycle:
        # two-domain gather: idxs is an (ix_a, ix_b) tuple; the PRNG
        # split sequence (k_pre -> k_a, k_b) matches the host-iterator
        # cycle path exactly
        def fn(state, img_a, seg_a, cls_a, img_b, seg_b, cls_b,
               idxs, k_pre, k_step, lr):
            k_a, k_b = jax.random.split(k_pre)
            batch = make_batch(img_a, seg_a, cls_a, idxs[0], k_a)
            bb = make_batch(img_b, seg_b, cls_b, idxs[1], k_b)
            batch = dict(batch, real_b=bb["real_a"],
                         seg_b=bb["seg_a"], mask_b=bb["mask_a"])
            if constraint is not None:
                batch = jax.lax.with_sharding_constraint(batch,
                                                         constraint)
            return body(state, batch, lr, k_step)
    else:
        def fn(state, img_all, seg_all, cls_all, idxs, k_pre, k_step,
               lr):
            batch = make_batch(img_all, seg_all, cls_all, idxs, k_pre)
            if constraint is not None:
                batch = jax.lax.with_sharding_constraint(batch,
                                                         constraint)
            return body(state, batch, lr, k_step)

    return jax.jit(fn, donate_argnums=(0,) if cfg.donate else ())


def make_fused_scan(tr, ds, k: int):
    """`k` full train steps per dispatch: ONE lax.scan program rolling
    gather + fused preprocess + step, amortizing per-step dispatch
    latency (through this environment's remote relay each dispatch
    costs milliseconds even on the fused path).  The PRNG key rides
    the scan carry and derives per-step keys by the same
    split(key, 3) sequence as the per-step path, so training matches
    scan_steps=1 up to XLA scheduling noise (tested).  On a mesh the
    scan body wraps the shard_mapped step (same batch constraint as
    make_fused_step)."""
    cfg = tr.cfg
    body, constraint = step_body(tr)
    make_batch = make_batch_fn(cfg)

    if tr.cycle:
        def fn(state, key, img_a, seg_a, cls_a, img_b, seg_b, cls_b,
               idxs, lr):
            def one(carry, ix):
                st, ky = carry
                ky, k_pre, k_step = jax.random.split(ky, 3)
                k_a, k_b = jax.random.split(k_pre)
                batch = make_batch(img_a, seg_a, cls_a, ix[0], k_a)
                bb = make_batch(img_b, seg_b, cls_b, ix[1], k_b)
                batch = dict(batch, real_b=bb["real_a"],
                             seg_b=bb["seg_a"], mask_b=bb["mask_a"])
                if constraint is not None:
                    batch = jax.lax.with_sharding_constraint(
                        batch, constraint)
                st, m = body(st, batch, lr, k_step)
                return (st, ky), m

            (state, key), ms = jax.lax.scan(one, (state, key), idxs)
            return state, key, ms
    else:
        def fn(state, key, img_all, seg_all, cls_all, idxs, lr):
            def one(carry, ix):
                st, ky = carry
                ky, k_pre, k_step = jax.random.split(ky, 3)
                batch = make_batch(img_all, seg_all, cls_all, ix,
                                   k_pre)
                if constraint is not None:
                    batch = jax.lax.with_sharding_constraint(
                        batch, constraint)
                st, m = body(st, batch, lr, k_step)
                return (st, ky), m

            (state, key), ms = jax.lax.scan(one, (state, key), idxs)
            return state, key, ms

    return jax.jit(fn, donate_argnums=(0,) if cfg.donate else ())


def is_hbm_failure(e: Exception) -> bool:
    """MEMORY-failure signatures: XLA's RESOURCE_EXHAUSTED / OOM
    texts, plus remote-compile-service program-size rejections
    (tpu_compile_helper returns HTTP 500 for both, with the OOM dump
    attached when it is one).  Deliberately NOT a bare "compil"
    match — a generic compile error must re-raise, not be
    misdiagnosed as HBM overflow and silently fall back."""
    s = str(e).lower()
    return any(t in s for t in (
        "out of memory", "resource_exhausted", "resource exhausted",
        "memory space hbm", "exceeds the limit", "hbm oom",
        "tpu_compile_helper"))


def run_epoch_fused(tr, epoch, lr, dev_ds, fused, fused_scan,
                    g_losses, d_losses, global_step, start_time):
    """One epoch over the device-resident split: scan_steps steps per
    dispatch, remainder through the single-step fused program.
    Prints and periodic saves land on chunk boundaries.

    If the K-step scan program fails to COMPILE (HBM overflow — the
    scan's per-iteration temporaries can tip large-resolution programs
    over the chip), training degrades gracefully to the per-step fused
    program (numerically identical, same PRNG sequence) instead of
    dying: scan chunking only amortizes dispatch latency, which is
    negligible at the step sizes where HBM is tight (PERF.md)."""
    cfg = tr.cfg
    b = cfg.batch_size
    if tr.cycle:
        # two independent shuffles, seeded like the host-iterator
        # pair (train_iterator epoch shuffles; B uses seed+7919)
        ds_a, ds_b = dev_ds
        arrays = (ds_a.img, ds_a.seg, ds_a.cls,
                  ds_b.img, ds_b.seg, ds_b.cls)
        order_a = np.arange(len(ds_a))
        np.random.default_rng(cfg.data_seed + epoch).shuffle(order_a)
        order_b = np.arange(len(ds_b))
        np.random.default_rng(
            cfg.data_seed + 7919 + epoch).shuffle(order_b)
        nb = min(len(ds_a), len(ds_b)) // b

        def slice_ix(done, kc):
            cut = lambda o: o[done * b:(done + kc) * b] \
                .astype(np.int32).reshape(kc, b)
            return (jnp.asarray(cut(order_a)),
                    jnp.asarray(cut(order_b)))
    else:
        arrays = (dev_ds.img, dev_ds.seg, dev_ds.cls)
        order = np.arange(len(dev_ds))
        np.random.default_rng(cfg.data_seed + epoch).shuffle(order)
        nb = len(dev_ds) // b

        def slice_ix(done, kc):
            return jnp.asarray(
                order[done * b:(done + kc) * b].astype(np.int32)
                .reshape(kc, b))
    if getattr(tr, "_scan_disabled", False):
        fused_scan = None
    k_max = cfg.scan_steps if fused_scan is not None else 1
    done = 0
    while done < nb:
        kc = min(k_max, nb - done)
        ix = slice_ix(done, kc)
        b_eff = b * (2 if cfg.use_augmentation else 1)
        if kc == k_max and fused_scan is not None:
            try:
                tr.state, tr.key, m = fused_scan(
                    tr.state, tr.key, *arrays, ix, lr)
            except Exception as e:
                scan_ran = getattr(tr, "_scan_ok", False)
                state_live = not any(
                    getattr(a, "is_deleted", lambda: False)()
                    for a in jax.tree.leaves(tr.state))
                if scan_ran or not is_hbm_failure(e) \
                        or not state_live:
                    raise
                print(f" [!] scan_steps={k_max} program failed to "
                      f"compile ({type(e).__name__}); falling back to "
                      "per-step dispatch")
                tr._scan_disabled = True
                fused_scan = None
                k_max = 1
                continue
            tr._scan_ok = True
        else:
            gs, dl = [], []
            for r in range(kc):
                tr.key, k_pre, k_step = jax.random.split(tr.key, 3)
                ix_r = jax.tree.map(lambda a: a[r], ix)
                tr.state, mr = fused(
                    tr.state, *arrays, ix_r, k_pre, k_step, lr)
                gs.append(mr["gen_loss"])
                dl.append(mr["disc_loss"])
            m = {"gen_loss": jnp.stack(gs), "disc_loss": jnp.stack(dl)}
        g_losses.append(m["gen_loss"])
        d_losses.append(m["disc_loss"])
        tr._timer.mark(kc * b_eff)
        if tr._prof is not None:
            tr._prof.tick()
        pf = cfg.print_freq
        if done == 0 or (done - 1) // pf != (done + kc - 1) // pf:
            print("Epoch: [%2d] [%4d] time: %4.4f "
                  "Gen_Loss: %f Disc_Loss: %f" % (
                      epoch, done + kc - 1, time.time() - start_time,
                      float(m["gen_loss"][-1]),
                      float(m["disc_loss"][-1])))
        prev = global_step
        done += kc
        global_step += kc
        if cfg.save_freq and \
                prev // cfg.save_freq != global_step // cfg.save_freq:
            tr._save(epoch)
    return global_step
