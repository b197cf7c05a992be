"""Import a reference TF2 checkpoint into this framework's checkpoint
layout — the migration path for users bringing trained SG-GAN-TF2 models.

The reference saves ``Model.save_weights`` TensorBundle checkpoints under
``checkpoint/<dataset>/{gen,disc}/cp-NNNN.ckpt`` (model.py:450-467).
This tool reads those directly (first-party TensorBundle codec,
utils/tf_bundle.py — no TensorFlow needed), or a ``.npz`` of the flat
``keras_model.get_weights()`` list (export recipe in utils/tf_weights.py),
maps the weights onto our param trees (layer-order maps validated against
module.py:125-318), and writes a standard orbax checkpoint that
``--phase test``, ``--continue_train`` and ``serve`` consume as-is
(optimizer state freshly initialized, step 0).

    python -m sggan_tpu.utils.import_tf \
        --gen_src  /path/checkpoint/city/gen/cp-0021.ckpt  \
        [--disc_src /path/checkpoint/city/disc/cp-0021.ckpt] \
        [--epoch_tag 21] <main.py flags, e.g. --dataset_dir city>

All five nets are supported: resnet / unet generators + the semantic
discriminator (single param tree), and the pix2pix generator /
discriminator, whose Keras BatchNorm layers interleave running stats in
the flat order — those route into the functional BN-state tree
(tf_weights.pix2pix_*_layout).
"""

from __future__ import annotations

import json
import os
import re


def import_checkpoint(cfg, gen_src: str, disc_src: str = None,
                      epoch_tag: int = 0):
    """Build a fresh TrainState, overwrite generator (and optionally
    discriminator) params with the TF weights, save under
    cfg.checkpoint_dir/<dataset>/.  Returns the state."""
    import jax

    from ..train.step import init_state
    from . import checkpoint as ckpt
    from . import tf_weights

    if cfg.loss_mode == "cycle":
        raise NotImplementedError(
            "the reference trains single-direction models only — there is "
            "no two-generator TF checkpoint to import; train cycle mode "
            "from scratch or import into a single-direction config")
    state = init_state(cfg, jax.random.PRNGKey(cfg.data_seed))

    def load(src, which, params, **kw):
        if src.endswith(".npz"):
            return tf_weights.load_npz_weights(src, which, params, **kw)
        return tf_weights.load_bundle_weights(src, which, params, **kw)

    if cfg.use_pix2pix:
        gp, gbn = tf_weights.load_pix2pix_weights(
            gen_src, "gen", state.gen_params, state.gen_bn,
            image_size=cfg.image_height)
        state = state._replace(gen_params=gp, gen_bn=gbn)
        if disc_src:
            dp, dbn = tf_weights.load_pix2pix_weights(
                disc_src, "disc", state.disc_params, state.disc_bn)
            state = state._replace(disc_params=dp, disc_bn=dbn)
    else:
        net = "resnet" if cfg.use_resnet else "unet"
        gp = load(gen_src, net, state.gen_params)
        state = state._replace(gen_params=gp)
        if disc_src:
            n_valid = len([k for k in state.disc_params
                           if re.fullmatch(r"v\d+", k)])
            dp = load(disc_src, "discriminator", state.disc_params,
                      n_valid=n_valid)
            state = state._replace(disc_params=dp)
    if state.ema is not None:
        # the imported weights are the best estimate — restart the shadow
        state = state._replace(
            ema=jax.tree.map(lambda a: a.copy(), state.gen_params))
    ckpt.save(state, cfg.checkpoint_dir, cfg.dataset_dir, epoch_tag)
    return state


def selftest(workdir: str = None) -> dict:
    """De-circularized round trip of the whole TF import path: for every
    net, randomize a real param tree, EXPORT it through the library
    TensorBundle writer under Keras save_weights names
    (tf_bundle.write_keras_weights), then pull it back through the exact
    import machinery users hit (keras_weights ordering ->
    assign_flat_weights mapping) into a FRESH zero tree and require exact
    equality.  Covers raw + snappy tables, multi-block indexes (tiny
    block_size), and the BN-stat interleave of the pix2pix nets.

    What this does and does not prove: the reader is exercised against
    bundles from a first-class writer with independent fidelity anchors
    (crc32c test vector, literal-only snappy against the independently
    written decoder, checksums verified end to end) — but both codec
    halves share one reading of the tensor_bundle spec, so a bundle
    written by REAL TensorFlow remains the residual risk (tf_bundle.py
    module docstring lists the two places it could hide)."""
    import tempfile

    import jax
    import numpy as np

    from ..models import (discriminator, discriminator_pix2pix,
                          generator_pix2pix, generator_resnet,
                          generator_unet)
    from . import tf_bundle, tf_weights

    workdir = workdir or tempfile.mkdtemp(prefix="tfimport_selftest_")
    rng = np.random.default_rng(7)

    def randomize(tree):
        if isinstance(tree, dict):
            return {k: randomize(v) for k, v in tree.items()}
        return rng.normal(size=np.shape(tree)).astype(np.float32)

    def zeros(tree):
        if isinstance(tree, dict):
            return {k: zeros(v) for k, v in tree.items()}
        return np.zeros(np.shape(tree), np.float32)

    def check(tree, got, where):
        if isinstance(tree, dict):
            for k in tree:
                check(tree[k], got[k], f"{where}/{k}")
        else:
            np.testing.assert_array_equal(np.asarray(got), tree, where)

    results = {}
    key = jax.random.PRNGKey(0)
    cases = [
        ("resnet", generator_resnet.init(key), {}),
        ("unet", generator_unet.init(key), {}),
        ("discriminator",
         discriminator.init(key, image_size=(128, 128)), {"n_valid": 3}),
    ]
    for i, (net, init_params, kw) in enumerate(cases):
        params = randomize(init_params)
        flat, attrs = tf_weights.extract_flat_weights(net, params, **kw)
        prefix = f"{workdir}/{net}/cp-0000.ckpt"
        os.makedirs(os.path.dirname(prefix), exist_ok=True)
        tf_bundle.write_keras_weights(prefix, flat, attrs,
                                      compress=bool(i % 2),
                                      block_size=512 if i else 4096)
        got = tf_weights.load_bundle_weights(prefix, net, zeros(params),
                                             **kw)
        check(params, got, net)
        results[net] = len(flat)

    for which, init in (("gen", generator_pix2pix.init),
                        ("disc", discriminator_pix2pix.init)):
        p0, bn0 = init(key)
        params, bn = randomize(p0), randomize(bn0)
        flat, attrs = tf_weights.extract_pix2pix_weights(which, params, bn)
        prefix = f"{workdir}/p2p_{which}/cp-0000.ckpt"
        os.makedirs(os.path.dirname(prefix), exist_ok=True)
        tf_bundle.write_keras_weights(prefix, flat, attrs, compress=True,
                                      block_size=256)
        gp, gbn = tf_weights.load_pix2pix_weights(
            prefix, which, zeros(params), zeros(bn))
        check(params, gp, f"p2p_{which}/params")
        check(bn, gbn, f"p2p_{which}/bn")
        results[f"pix2pix_{which}"] = len(flat)
    return results


def main(argv=None):
    from ..config import build_parser, config_from_namespace

    if argv is None:
        import sys
        argv = sys.argv[1:]
    if "--selftest" in argv:
        print(json.dumps({"ok": True, "selftest": selftest()}))
        return

    p = build_parser()
    p.add_argument("--gen_src", required=True,
                   help="generator TF checkpoint: TensorBundle prefix "
                        "(…/gen/cp-NNNN.ckpt) or get_weights() .npz")
    p.add_argument("--disc_src", default=None,
                   help="optional discriminator TF checkpoint")
    p.add_argument("--epoch_tag", type=int, default=0,
                   help="epoch number for the written cp-NNNN")
    ns = p.parse_args(argv)
    cfg = config_from_namespace(ns).validate()
    import_checkpoint(cfg, ns.gen_src, ns.disc_src, ns.epoch_tag)
    print(json.dumps({"ok": True, "checkpoint_dir": cfg.checkpoint_dir,
                      "dataset": cfg.dataset_dir,
                      "epoch": ns.epoch_tag,
                      "net": ("pix2pix" if cfg.use_pix2pix else
                              "resnet" if cfg.use_resnet else "unet"),
                      "disc": bool(ns.disc_src)}))


if __name__ == "__main__":
    main()
