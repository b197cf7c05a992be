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
                           device_dataset_iterator, train_iterator)
from ..data.preprocess import make_preprocess_train
from ..utils import checkpoint as ckpt
from ..utils.profiling import StepTimer, TraceWindow
from ..utils.summary import SummaryWriter
from . import evaluate, fused
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
        return evaluate.gen_forward(self, gen_params, gen_bn, x)

    def generate(self, images01: np.ndarray, as_u8: bool = False
                 ) -> np.ndarray:
        """See evaluate.generate — device-array fast path, optional
        on-device uint8 conversion (bit-exact inverse_transform twin)."""
        return evaluate.generate(self, images01, as_u8=as_u8)

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

    def _make_fused_step(self, ds):
        """One compiled gather+preprocess+step program (fused.py)."""
        return fused.make_fused_step(self, ds)

    def _make_fused_scan(self, ds, k: int):
        """K steps per dispatch via lax.scan (fused.py)."""
        return fused.make_fused_scan(self, ds, k)

    _is_hbm_failure = staticmethod(fused.is_hbm_failure)

    def _run_epoch_fused(self, *args, **kw):
        return fused.run_epoch_fused(self, *args, **kw)

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
    def test_during_train(self, epoch: int,
                          writer: Optional[SummaryWriter] = None):
        """Epoch-end eval (evaluate.py) — parity with model.py:307-378."""
        return evaluate.test_during_train(self, epoch, writer)

    def test(self):
        """Inference CLI (evaluate.py) — parity with model.py:535-567."""
        return evaluate.run_test(self)

    def sample_model(self, epoch: int, idx: int):
        """Periodic sample dump (evaluate.py) — model.py:506-525."""
        return evaluate.sample_model(self, epoch, idx)
