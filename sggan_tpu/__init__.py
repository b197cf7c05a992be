"""sggan_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework with the
capabilities of fhfonsecaa/SG-GAN-TF2.

Semantic-aware GAN for virtual-to-real urban-scene adaptation
(GTA5 <-> Cityscapes).  The compute path is pure JAX compiled by XLA with
Pallas kernels for fused hot ops; parallelism is expressed as shardings over
a `jax.sharding.Mesh` (data parallelism with gradient allreduce over ICI,
plus optional spatial sharding of the image plane with halo exchange).

Layout:
    config    — typed config + CLI mirroring the reference's 30 flags
                (reference: main.py:13-44)
    ops       — conv / conv-transpose / instance-norm / derivative kernels
                with TF-semantics parity (reference: module.py, ops.py)
    models    — generator_resnet / generator_unet / generator_pix2pix,
                semantic mask-gated PatchGAN discriminator,
                pix2pix discriminator (reference: module.py:48-318)
    losses    — all criterions incl. the gradient-sensitive semantic loss
                (reference: module.py:336-351, model.py:114-166)
    data      — host PNG IO + device-side fused preprocessing + JAX
                augmentation (reference: utils.py, segment_class.py,
                prepare_data.py)
    train     — jitted two-optimizer train step, functional image pool,
                trainer loop (reference: model.py:169-275)
    metrics   — confusion-matrix scores + dense-CRF refinement
                (reference: metric.py)
    parallel  — mesh construction, data-parallel step, spatial sharding
                with halo exchange (no reference counterpart; new)
    utils     — image save/convert, checkpointing, TensorBoard-format
                event writer, profiling (reference: utils.py:239-327,
                model.py:23-34, 450-503)
"""

__version__ = "0.1.0"
