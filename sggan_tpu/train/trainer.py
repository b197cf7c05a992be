"""Training/eval orchestration — parity with the reference's `sggan` class
(model.py:39-567) on a compiled, device-resident pipeline.

Per epoch (model.py:219-271): shuffled glob of trainA, host PNG decode on a
prefetch thread, device-side fused preprocessing, jitted train step;
epoch-end full eval over testA with fake-PNG dumps and confusion-matrix
scores; TensorBoard scalars/images under the reference's tag names;
checkpoints on finish and KeyboardInterrupt (model.py:272-275) plus
periodic saves every --save_freq steps (wired for real).
"""

from __future__ import annotations

import datetime
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..data.loader import (Dataset, DeviceDataset, _load_triplet,
                           device_dataset_iterator, load_test_triplet,
                           test_files, train_iterator)
from ..data.preprocess import (fake_u8, make_preprocess_train,
                                preprocess_test, seg_labels_u8)
from ..metrics.scores import scores, scores_seg_fake
from ..models import generator_pix2pix, generator_resnet, generator_unet
from ..utils import checkpoint as ckpt
from ..utils.images import imsave, merge, save_images
from ..utils.profiling import StepTimer, TraceWindow
from ..utils.summary import SummaryWriter
from .step import TrainState, init_state, lr_schedule, make_train_step


def _dataset_root(cfg: Config) -> str:
    if os.path.isdir(cfg.dataset_dir):
        return cfg.dataset_dir
    return os.path.join("./datasets", cfg.dataset_dir)


class Trainer:
    def __init__(self, cfg: Config):
        self.cfg = cfg.validate()
        self.root = _dataset_root(cfg)
        self.key = jax.random.PRNGKey(cfg.data_seed)
        self.cycle = cfg.loss_mode == "cycle"
        self.mesh = None
        self._mesh_kind = None
        self._shard_batch = lambda b: b
        # ---- multi-host (jax.distributed initialized by the caller) ----
        self.n_proc = jax.process_count()
        self.pid = jax.process_index()
        self.is_coord = self.pid == 0
        self.local_bs = cfg.batch_size
        if self.n_proc > 1:
            if cfg.mesh_space > 1:
                # every host must own whole data rows of the
                # (data x space[ x wspace]) grid: the space shards of one
                # sample then live on one host's devices and each process
                # feeds full-resolution rows of the global batch (the
                # H/W split happens at device_put, not in the loader)
                sp_grid = max(cfg.mesh_space, 1) * max(cfg.mesh_space_w, 1)
                if jax.local_device_count() % sp_grid:
                    raise ValueError(
                        f"multi-host spatial sharding needs the space "
                        f"grid ({sp_grid}) to divide the local device "
                        f"count ({jax.local_device_count()}) so every "
                        "host owns whole data rows of the mesh")
            if cfg.mesh_data <= 1:
                raise ValueError(
                    "multi-host training needs --mesh_data > 1 (the data "
                    "axis spans hosts)")
            if cfg.batch_size % self.n_proc:
                raise ValueError(
                    f"batch_size={cfg.batch_size} must divide by "
                    f"process_count={self.n_proc} (each process feeds "
                    "its contiguous slice of the global batch)")
            self.local_bs = cfg.batch_size // self.n_proc
        n_data = max(cfg.mesh_data, 1)
        n_space = max(cfg.mesh_space, 1)
        n_wspace = max(cfg.mesh_space_w, 1)
        if n_space > 1:
            # (data x space[ x wspace]) sharding: batch over `data`, image
            # H over `space` (and W over `wspace` for a 2-D shard grid)
            # with halo exchange (parallel/spatial_step.py).
            from ..parallel import make_mesh
            from ..parallel.spatial_step import (init_sp_cycle_state,
                                                 init_sp_state,
                                                 make_sp_train_step,
                                                 place_sp, shard_sp_batch)
            ok = ((cfg.loss_mode in ("sggan", "cycle")
                   and not cfg.use_pix2pix)
                  or (cfg.loss_mode == "p2p" and cfg.use_pix2pix))
            if not ok:
                raise NotImplementedError(
                    "mesh_space>1 supports --loss_mode sggan/cycle with "
                    "the resnet/unet nets, or --loss_mode p2p with "
                    "--use_pix2pix")
            self.mesh = make_mesh(data=n_data, space=n_space,
                                  wspace=n_wspace)
            self._mesh_kind = "space"
            init_fn = init_sp_cycle_state if self.cycle else init_sp_state
            self.state = place_sp(
                init_fn(cfg, self.key, n_data=n_data), self.mesh)
            self.step_fn = make_sp_train_step(cfg, self.mesh)
            self._shard_batch = lambda b: shard_sp_batch(b, self.mesh)
        elif n_data > 1:
            # data-parallel training over a device mesh (dp.py); the
            # global batch (batch_size, x2 with augmentation) must divide
            # by the data axis.
            from ..parallel import make_dp_train_step, make_mesh, \
                replicate, shard_batch
            self.mesh = make_mesh(data=n_data, space=1)
            self._mesh_kind = "data"
            if self.cycle:
                from .cycle import init_cycle_state
                self.state = replicate(
                    init_cycle_state(cfg, self.key, n_data=n_data),
                    self.mesh)
            else:
                self.state = replicate(
                    init_state(cfg, self.key, n_data=n_data), self.mesh)
            self.step_fn = make_dp_train_step(cfg, self.mesh)
            self._shard_batch = lambda b: shard_batch(b, self.mesh)
        elif self.cycle:
            from .cycle import init_cycle_state, make_cycle_train_step
            self.state: TrainState = init_cycle_state(cfg, self.key)
            self.step_fn = make_cycle_train_step(cfg)
        else:
            self.state = init_state(cfg, self.key)
            self.step_fn = make_train_step(cfg)
        self.preprocess = make_preprocess_train(cfg)
        # host-side source shrink cap before upload (loader._downscale)
        self.max_src_hw = (
            (cfg.image_height * cfg.host_downscale,
             cfg.image_width * cfg.host_downscale)
            if cfg.host_downscale else None)
        self._gen_jit = jax.jit(self._gen_forward)
        # epoch-invariant ground-truth seg labels pulled once per run
        # (keyed by eval chunk paths + size; see test_during_train)
        self._eval_seg_cache: dict = {}

    # ------------------------------------------------------------ forward
    def _gen_forward(self, gen_params, gen_bn, x):
        cfg = self.cfg
        cd = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        if self.cycle:
            # A->B generator, honouring --which_direction (main.py:29)
            key = "a2b" if cfg.which_direction == "AtoB" else "b2a"
            gen_params = gen_params[key]
        if cfg.use_pix2pix:
            y, _ = generator_pix2pix.apply(gen_params, gen_bn, x,
                                           compute_dtype=cd, ngf=cfg.ngf)
            return y
        if cfg.use_resnet:
            pfh = cfg.pad_free_head if cfg.pad_free_head is not None \
                else not cfg.remat
            return generator_resnet.apply(gen_params, x, compute_dtype=cd,
                                          pad_free_head=pfh)
        return generator_unet.apply(gen_params, x, compute_dtype=cd)

    def generate(self, images01: np.ndarray, as_u8: bool = False
                 ) -> np.ndarray:
        """Generator forward on [0,1]-range images, honouring the
        test-time input-scale compat flag (model.py:555-561).

        as_u8=True converts the [-1, 1] output to uint8 ON DEVICE via
        preprocess.fake_u8 — bit-exact to inverse_transform (the
        exhaustively-proven twin), 4x fewer bytes pulled through the
        device->host relay.  Eval/test/sample consume the fakes only
        through inverse_transform, so downstream PNGs/scores are
        byte-identical.

        Accepts a device array directly (the fused preprocess_test
        output) — a jax.Array input skips the pull+re-upload round trip
        the np conversion would force through the relay; the uint8
        rescale twin (jnp.round(x*255)) is the same IEEE f32 multiply +
        round-half-even as numpy's, value-identical."""
        if isinstance(images01, jax.Array) and self.mesh is None \
                and self.n_proc == 1:
            # (mesh runs keep the host pull: params are GSPMD arrays and
            # a committed single-device input would conflict in jit)
            x = images01.astype(jnp.float32)
            if self.cfg.test_uint8_input:
                x = jnp.round(x * 255.0)
        else:
            x = np.asarray(images01, np.float32)
            if self.cfg.test_uint8_input:
                x = np.round(x * 255.0)
        # eval/test/serving read the EMA shadow when --gen_ema is on
        gp = self.state.ema if self.state.ema is not None \
            else self.state.gen_params
        gbn = self.state.gen_bn
        if self.n_proc > 1:
            # params are replicated global arrays spanning hosts; pull
            # the (fully-replicated) values to host so the coordinator
            # can run eval locally without a cross-process program
            gp = jax.tree.map(np.asarray, gp)
            gbn = jax.tree.map(np.asarray, gbn)
        y = self._gen_jit(gp, gbn, jnp.asarray(x))
        if as_u8:
            y = fake_u8(y)
        return np.asarray(y)

    def _maybe_device_dataset(self):
        """Build the HBM-resident training split(s) (loader.DeviceDataset)
        when they fit cfg.device_dataset_mb — zero per-step upload.  Cycle
        mode holds BOTH domains resident (returns a (trainA, trainB)
        tuple; the combined estimate must fit the budget).  Falls back to
        the host iterator for oversized or shape-heterogeneous datasets."""
        cfg = self.cfg
        if not cfg.device_dataset_mb or self.n_proc > 1:
            # multi-host feeds through the per-process host iterator
            # (each process decodes only its slice of the global batch)
            return None
        splits = ("trainA", "trainB") if self.cycle else ("trainA",)
        try:
            est = 0
            for split in splits:
                files = Dataset(self.root, split).files()
                n = min(len(files), int(cfg.train_size))
                if n < cfg.batch_size:
                    return None
                probe = _load_triplet(files[0], split,
                                      cache_bytes=cfg.decode_cache_mb << 20,
                                      max_hw=self.max_src_hw)
                est += sum(a.nbytes for a in probe) * n
            if est > cfg.device_dataset_mb << 20:
                return None
            sharding = None
            if self.mesh is not None:
                # replicate the split over the mesh so the fused
                # gather+preprocess+step program can consume it directly
                from jax.sharding import NamedSharding, PartitionSpec
                sharding = NamedSharding(self.mesh, PartitionSpec())
            dss = tuple(DeviceDataset(self.root, split,
                                      max_hw=self.max_src_hw,
                                      cache_mb=cfg.decode_cache_mb,
                                      train_size=cfg.train_size,
                                      sharding=sharding)
                        for split in splits)
            print(f" [*] training split{'s' if self.cycle else ''} "
                  f"resident on device "
                  f"({sum(d.nbytes for d in dss) >> 20} MB, "
                  f"{'+'.join(str(len(d)) for d in dss)} triplets)")
            return dss if self.cycle else dss[0]
        except Exception as e:  # heterogeneous shapes, OOM, ...
            print(f" [!] device dataset cache disabled: "
                  f"{type(e).__name__}: {e}")
            return None

    def _fused_batch_fn(self):
        """Traced device-side batch assembly for the fused paths: gather
        from the HBM-resident split + augmentation doubling + fused
        preprocess — same keys and flag layout as the host iterator."""
        cfg = self.cfg
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
                photometric=cfg.use_photometric)

        return make_batch

    def _fused_step_body(self):
        """The (possibly shard_mapped) un-jitted step body + the batch
        sharding constraint for the fused programs.  With no mesh this is
        the plain single-device body; on a dp mesh the shard_mapped dp
        body with the batch sharded over `data`; on a spatial mesh the
        shard_mapped spatial body with the batch sharded over
        (data, space[, wspace]) — so the fused single-dispatch pipeline
        extends to every mesh configuration."""
        cfg = self.cfg
        if self.mesh is None:
            if self.cycle:
                from .cycle import build_cycle_step_fn
                return build_cycle_step_fn(cfg), None
            from .step import build_step_fn
            return build_step_fn(cfg), None
        from jax.sharding import NamedSharding, PartitionSpec as P
        if self._mesh_kind == "space":
            from ..parallel.spatial_step import _batch_spec, make_sp_step_body
            return (make_sp_step_body(cfg, self.mesh),
                    NamedSharding(self.mesh, _batch_spec(self.mesh)))
        from ..parallel.dp import make_dp_step_body
        from ..parallel.mesh import DATA_AXIS
        return (make_dp_step_body(cfg, self.mesh),
                NamedSharding(self.mesh, P(DATA_AXIS)))

    def _make_fused_step(self, ds):
        """ONE compiled program per step: device-side batch gather from
        the HBM-resident split + fused preprocess + train step.  The
        split gather/preprocess/step dispatches cost ~440 ms/step through
        this environment's remote relay (PERF.md round 2); fused, each
        step is a single dispatch.  Numerically identical to the unfused
        path (same keys, same flag layout)."""
        cfg = self.cfg
        body, constraint = self._fused_step_body()
        make_batch = self._fused_batch_fn()

        if self.cycle:
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

    def _make_fused_scan(self, ds, k: int):
        """`k` full train steps per dispatch: ONE lax.scan program rolling
        gather + fused preprocess + step, amortizing per-step dispatch
        latency (through this environment's remote relay each dispatch
        costs milliseconds even on the fused path).  The PRNG key rides
        the scan carry and derives per-step keys by the same
        split(key, 3) sequence as the per-step path, so training matches
        scan_steps=1 up to XLA scheduling noise (tested).  On a mesh the
        scan body wraps the shard_mapped step (same batch constraint as
        _make_fused_step)."""
        cfg = self.cfg
        body, constraint = self._fused_step_body()
        make_batch = self._fused_batch_fn()

        if self.cycle:
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

    @staticmethod
    def _is_hbm_failure(e: Exception) -> bool:
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

    def _run_epoch_fused(self, epoch, lr, dev_ds, fused, fused_scan,
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
        cfg = self.cfg
        b = cfg.batch_size
        if self.cycle:
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
        if getattr(self, "_scan_disabled", False):
            fused_scan = None
        k_max = cfg.scan_steps if fused_scan is not None else 1
        done = 0
        while done < nb:
            kc = min(k_max, nb - done)
            ix = slice_ix(done, kc)
            b_eff = b * (2 if cfg.use_augmentation else 1)
            if kc == k_max and fused_scan is not None:
                try:
                    self.state, self.key, m = fused_scan(
                        self.state, self.key, *arrays, ix, lr)
                except Exception as e:
                    scan_ran = getattr(self, "_scan_ok", False)
                    state_live = not any(
                        getattr(a, "is_deleted", lambda: False)()
                        for a in jax.tree.leaves(self.state))
                    if scan_ran or not self._is_hbm_failure(e) \
                            or not state_live:
                        raise
                    print(f" [!] scan_steps={k_max} program failed to "
                          f"compile ({type(e).__name__}); falling back to "
                          "per-step dispatch")
                    self._scan_disabled = True
                    fused_scan = None
                    k_max = 1
                    continue
                self._scan_ok = True
            else:
                gs, dl = [], []
                for r in range(kc):
                    self.key, k_pre, k_step = jax.random.split(self.key, 3)
                    ix_r = jax.tree.map(lambda a: a[r], ix)
                    self.state, mr = fused(
                        self.state, *arrays, ix_r, k_pre, k_step, lr)
                    gs.append(mr["gen_loss"])
                    dl.append(mr["disc_loss"])
                m = {"gen_loss": jnp.stack(gs), "disc_loss": jnp.stack(dl)}
            g_losses.append(m["gen_loss"])
            d_losses.append(m["disc_loss"])
            self._timer.mark(kc * b_eff)
            if self._prof is not None:
                self._prof.tick()
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
                self._save(epoch)
        return global_step

    def _save(self, epoch: int):
        """Checkpoint save; multi-host: every process resherds the pool
        buffer to fully-replicated (one collective) and materializes the
        state on host, then ALL processes enter ckpt.save — orbax's
        multi-process barriers need everyone, and its primary-host
        machinery gates the actual file writes to process 0."""
        cfg = self.cfg
        state = self.state
        if self.n_proc > 1:
            from jax.sharding import NamedSharding, PartitionSpec
            rep = jax.jit(lambda x: x, out_shardings=NamedSharding(
                self.mesh, PartitionSpec()))
            buf = rep(state.pool.buffer)
            state = state._replace(pool=state.pool._replace(buffer=buf))
            state = jax.tree.map(np.asarray, state)
        ckpt.save(state, cfg.checkpoint_dir, cfg.dataset_dir, epoch)

    # -------------------------------------------------------------- train
    def train(self) -> dict:
        cfg = self.cfg
        logdir = os.path.join(
            cfg.log_dir,
            datetime.datetime.now().strftime("%Y%m%d-%H%M%S"), "train")
        writer = SummaryWriter(logdir) if self.is_coord else None
        start_time = time.time()

        if cfg.continue_train:
            if self.n_proc > 1:
                # restore into a fresh HOST-LOCAL template (every process
                # reads the shared checkpoint identically), then re-place
                # on the global mesh — orbax cannot restore directly into
                # non-addressable multi-host arrays from a host-written
                # checkpoint
                k0 = jax.random.PRNGKey(0)
                if self._mesh_kind == "space":
                    from ..parallel.spatial_step import (
                        init_sp_cycle_state, init_sp_state, place_sp)
                    sp_init = init_sp_cycle_state if self.cycle \
                        else init_sp_state
                    template = sp_init(cfg, k0, n_data=cfg.mesh_data)
                elif self.cycle:
                    from .cycle import init_cycle_state
                    template = init_cycle_state(cfg, k0,
                                                n_data=cfg.mesh_data)
                else:
                    template = init_state(cfg, k0, n_data=cfg.mesh_data)
                restored = ckpt.load(template, cfg.checkpoint_dir,
                                     cfg.dataset_dir)
                if restored is not None:
                    # host-materialize first: device_put would otherwise
                    # see committed local-device arrays and attempt a
                    # cross-host transfer instead of placing local shards
                    restored = jax.tree.map(np.asarray, restored)
                    if self._mesh_kind == "space":
                        self.state = place_sp(restored, self.mesh)
                    else:
                        from ..parallel import replicate
                        self.state = replicate(restored, self.mesh)
            else:
                restored = ckpt.load(self.state, cfg.checkpoint_dir,
                                     cfg.dataset_dir)
                if restored is not None:
                    self.state = restored
            if restored is not None:
                if self.is_coord:
                    print(" [*] Load SUCCESS")
            else:
                print(" [!] Load failed...")
        else:
            print(" [*] New training STARTED")

        epoch = 0
        last = {}
        # host-side step counter (one device read at start, e.g. on resume)
        # -- int(self.state.step) every step would block async dispatch
        global_step = int(np.asarray(jax.device_get(self.state.step)))
        self._prof = TraceWindow(cfg.profile_dir) if cfg.profile_dir \
            else None
        self._timer = StepTimer()
        dev_ds = self._maybe_device_dataset()
        fused = fused_scan = None
        if dev_ds is not None:
            fused = self._make_fused_step(dev_ds)
            if cfg.scan_steps > 1:
                fused_scan = self._make_fused_scan(dev_ds, cfg.scan_steps)
        try:
            for epoch in range(cfg.epoch):
                lr = jnp.float32(lr_schedule(cfg, epoch))
                g_losses, d_losses = [], []
                self._timer.reset()
                self._timer.start()
                if fused is not None:
                    global_step = self._run_epoch_fused(
                        epoch, lr, dev_ds, fused, fused_scan,
                        g_losses, d_losses, global_step, start_time)
                    it = ()
                elif dev_ds is not None:
                    it = device_dataset_iterator(
                        dev_ds, cfg.batch_size, cfg.data_seed,
                        use_augmentation=cfg.use_augmentation, epoch=epoch)
                else:
                    it = train_iterator(
                        self.root, self.local_bs, cfg.data_seed,
                        use_augmentation=cfg.use_augmentation,
                        epoch=epoch, train_size=cfg.train_size,
                        prefetch=cfg.prefetch,
                        cache_mb=cfg.decode_cache_mb,
                        max_src_hw=self.max_src_hw,
                        process_index=self.pid,
                        process_count=self.n_proc)
                if self.cycle and fused is None:
                    it_b = train_iterator(
                        self.root, self.local_bs, cfg.data_seed + 7919,
                        use_augmentation=cfg.use_augmentation, epoch=epoch,
                        train_size=cfg.train_size, prefetch=cfg.prefetch,
                        split="trainB", cache_mb=cfg.decode_cache_mb,
                        max_src_hw=self.max_src_hw,
                        process_index=self.pid,
                        process_count=self.n_proc)
                    it = zip(it, it_b)
                for idx, raw in enumerate(it):
                    self.key, k_pre, k_step = jax.random.split(self.key, 3)
                    if self.cycle:
                        raw_a, raw_b = raw
                        k_a, k_b = jax.random.split(k_pre)
                        kwa = kwb = {}
                        if self.n_proc > 1:
                            # global-consistent per-sample randomness, per
                            # domain (each domain has its own key so the
                            # global row spaces are independent)
                            gb = cfg.batch_size * (
                                2 if cfg.use_augmentation else 1)
                            kwa = dict(global_b=gb,
                                       sample_rows=jnp.asarray(
                                           raw_a["rows"]))
                            kwb = dict(global_b=gb,
                                       sample_rows=jnp.asarray(
                                           raw_b["rows"]))
                        batch = self.preprocess(raw_a["img"], raw_a["seg"],
                                                raw_a["cls"], k_a,
                                                raw_a["aug"], **kwa)
                        bb = self.preprocess(raw_b["img"], raw_b["seg"],
                                             raw_b["cls"], k_b, raw_b["aug"],
                                             **kwb)
                        batch = dict(batch, real_b=bb["real_a"],
                                     seg_b=bb["seg_a"], mask_b=bb["mask_a"])
                    else:
                        kw = {}
                        if self.n_proc > 1:
                            # global-consistent per-sample randomness:
                            # this process's rows of the global batch
                            kw = dict(
                                global_b=cfg.batch_size
                                * (2 if cfg.use_augmentation else 1),
                                sample_rows=jnp.asarray(raw["rows"]))
                        batch = self.preprocess(raw["img"], raw["seg"],
                                                raw["cls"], k_pre,
                                                raw["aug"], **kw)
                    batch = self._shard_batch(batch)
                    self.state, m = self.step_fn(self.state, batch, lr,
                                                 k_step)
                    g_losses.append(m["gen_loss"])
                    d_losses.append(m["disc_loss"])
                    self._timer.mark(int(batch["real_a"].shape[0]))
                    if self._prof is not None:
                        self._prof.tick()
                    if idx % cfg.print_freq == 0 and self.is_coord:
                        print("Epoch: [%2d] [%4d] time: %4.4f "
                              "Gen_Loss: %f Disc_Loss: %f" % (
                                  epoch, idx, time.time() - start_time,
                                  float(m["gen_loss"]),
                                  float(m["disc_loss"])))
                    global_step += 1
                    if cfg.save_freq and global_step % cfg.save_freq == 0:
                        self._save(epoch)

                # throughput before eval; sync on the last loss so the
                # interval covers real execution
                rate = self._timer.read(d_losses[-1]) if d_losses else None

                # --eval_freq N: eval every Nth epoch (and always the
                # last); default 1 = the reference's every-epoch eval
                do_eval = (epoch % cfg.eval_freq == 0
                           or epoch == cfg.epoch - 1)
                fake_concat, score = (self.test_during_train(epoch, writer)
                                      if do_eval else (None, None))
                if fake_concat is not None and writer is not None:
                    writer.image(f"Segmentation Epoch {epoch}", fake_concat,
                                 step=epoch)
                g_mean = None
                if g_losses:
                    # fused-scan chunks append (k,) metric vectors, the
                    # per-step paths scalars — concat covers both
                    cat = lambda xs: jnp.concatenate(
                        [jnp.atleast_1d(x) for x in xs])
                    g_mean = float(jnp.mean(cat(g_losses)))
                    if writer is not None:
                        writer.scalar("Generator Loss", g_mean, epoch)
                        writer.scalar("Discriminator Loss",
                                      float(jnp.mean(cat(d_losses))), epoch)
                        if rate is not None:
                            writer.scalar("Images/sec",
                                          rate["images_per_sec"], epoch)
                last = {"epoch": epoch, "score": score,
                        "gen_loss": g_mean}
        except KeyboardInterrupt:
            self._save(epoch)
            raise
        finally:
            if self._prof is not None:
                self._prof.close()
            self._save(epoch)
            if writer is not None:
                writer.close()
        return last

    # --------------------------------------------------------------- eval
    def test_during_train(self, epoch: int, writer: Optional[SummaryWriter]
                          = None):
        """Epoch-end eval — parity with model.py:307-378: per test image,
        generator forward, fake PNG dump, seg-vs-fake argmax labels,
        aggregate confusion-matrix scores, TB scalars."""
        cfg = self.cfg
        if not self.is_coord:
            # eval/PNG/TB writes are coordinator-only; params are
            # replicated so no other process needs to participate
            return None, None
        files = test_files(self.root)
        if not files:
            return None, None
        os.makedirs(cfg.test_dir, exist_ok=True)
        gts, preds, outputs = [], [], []
        # batch the eval (the reference runs one generator forward per
        # file, model.py:323-347); ragged tails are padded by repeating
        # the last triplet so ONE shape is compiled per run (remote
        # compiles cost 40-850 s here; padded outputs are sliced off)
        chunk = min(8, len(files))
        for c0 in range(0, len(files), chunk):
            paths = files[c0:c0 + chunk]
            trips = [load_test_triplet(p, cache_mb=cfg.decode_cache_mb,
                                       max_hw=self.max_src_hw)
                     for p in paths]
            trips += [trips[-1]] * (chunk - len(paths))
            img_u8 = np.stack([t[0] for t in trips])
            seg_u8 = np.stack([t[1] for t in trips])
            cls_u8 = np.stack([t[2] for t in trips])
            img, seg, _, _ = preprocess_test(
                img_u8, seg_u8, cls_u8, out_hw=cfg.image_size,
                mask_hw=cfg.mask_hw, n_class=cfg.segment_class,
                with_masks=False)
            # pull fakes and seg pre-converted to uint8 (4x fewer relay
            # bytes each, bit-exact vs the host inverse_transform /
            # scores_seg_fake conversions); the input photo is only
            # read back when the CRF refines against it.  Ground-truth
            # seg labels are constant across epochs, so the pulled
            # array is cached per (paths, size) — epoch >= 2 evals skip
            # the seg pull entirely.
            fakes = self.generate(img, as_u8=True)
            seg_key = (tuple(paths), cfg.image_size)
            seg_np = self._eval_seg_cache.get(seg_key)
            if seg_np is None:
                seg_np = np.asarray(seg_labels_u8(seg))
                self._eval_seg_cache[seg_key] = seg_np
            seg = seg_np
            if cfg.eval_crf:
                img = np.asarray(img)
            for i, path in enumerate(paths):
                fake = fakes[i:i + 1]
                imsave(fake, [1, 1], os.path.join(
                    cfg.test_dir, os.path.basename(path)))
                fake_img = merge(fake, [1, 1])
                fake_img = fake_img.reshape(1, *fake_img.shape)
                outputs.append(fake_img[0])
                if cfg.eval_crf:
                    # refine the fake's per-channel scores with the dense
                    # CRF against the input photo (realizes the dormant
                    # get_labels(crf=True) path, model.py:278-305)
                    from ..metrics.crf import dense_crf
                    sample_u8 = (img[i] * 255).astype(np.uint8)
                    probs = np.ascontiguousarray(
                        fake_img[0].astype(np.float32).transpose(2, 0, 1)
                        / 255.0)
                    q = dense_crf(sample_u8, probs)
                    fake_img = (np.ascontiguousarray(
                        q.transpose(1, 2, 0))[None] * 255).astype(np.uint8)
                lt, lp = scores_seg_fake(
                    seg[i:i + 1], fake_img,
                    compat_eval_overflow=cfg.compat_eval_overflow)
                gts += list(lt)
                preds += list(lp)
        score = scores(gts, preds, n_class=cfg.segment_class)
        if writer is not None:
            writer.scalar("Overall Accuracy", score["Overall Acc"], epoch)
            writer.scalar("Mean Accuracy", score["Mean Acc"], epoch)
            writer.scalar("Frequency Weighted Accuracy", score["FreqW Acc"],
                          epoch)
            writer.scalar("Mean IoU", score["Mean IoU"], epoch)
        return np.stack(outputs), score

    # --------------------------------------------------------------- test
    def test(self):
        """Inference CLI — parity with model.py:535-567: load latest
        checkpoint, translate every testA image, save fake as <name>.png
        and the input as real_<name>.png in --test_dir."""
        cfg = self.cfg
        restored = ckpt.load(self.state, cfg.checkpoint_dir, cfg.dataset_dir)
        if restored is not None:
            self.state = restored
            print(" [*] Load SUCCESS")
        else:
            print(" [!] Load failed...")
        os.makedirs(cfg.test_dir, exist_ok=True)
        for path in test_files(self.root):
            print("Processing image: " + path)
            img_u8, seg_u8, cls_u8 = (a[None] for a in
                                      load_test_triplet(path))
            img, _, _, _ = preprocess_test(
                img_u8, seg_u8, cls_u8, out_hw=cfg.image_size,
                mask_hw=cfg.mask_hw, n_class=cfg.segment_class,
                with_masks=False)
            fake = self.generate(img, as_u8=True)
            img = np.asarray(img)
            base = os.path.basename(path)
            # reference saves the real copy through inverse_transform of
            # [0,1]-range data (model.py:566): reproduce exactly
            save_images(img * 2.0 - 1.0, [1, 1],
                        os.path.join(cfg.test_dir, "real_" + base))
            imsave(fake, [1, 1], os.path.join(cfg.test_dir, base))

    def sample_model(self, epoch: int, idx: int):
        """Periodic sample dump — parity with model.py:506-525."""
        cfg = self.cfg
        files = test_files(self.root)
        if not files:
            return
        rng = np.random.default_rng(cfg.data_seed + epoch * 10000 + idx)
        rng.shuffle(files)
        paths = files[: cfg.batch_size]  # model.py:509: batch of samples
        trips = [load_test_triplet(p, cache_mb=cfg.decode_cache_mb,
                                   max_hw=self.max_src_hw)
                 for p in paths]
        img_u8 = np.stack([t[0] for t in trips])
        seg_u8 = np.stack([t[1] for t in trips])
        cls_u8 = np.stack([t[2] for t in trips])
        img, _, _, _ = preprocess_test(
            img_u8, seg_u8, cls_u8, out_hw=cfg.image_size,
            mask_hw=cfg.mask_hw, n_class=cfg.segment_class,
            with_masks=False)
        fake = self.generate(img, as_u8=True)
        os.makedirs(cfg.sample_dir, exist_ok=True)
        name = os.path.basename(paths[0]).split(".")[0]
        imsave(fake, [fake.shape[0], 1],
               f"{cfg.sample_dir}/A_{epoch:02d}_{idx:04d}_{name}.jpg")
