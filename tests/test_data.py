"""Data subsystem tests: IO utils, vectorized seg-class conversion, the
fused device preprocess, augmentation warp, and the epoch iterator over a
synthetic on-disk fixture matching the reference's dataset contract."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from sggan_tpu.data import augment, loader, preprocess, segment_class
from sggan_tpu.utils import images as img_utils


# ---------------------------------------------------------------- fixtures

@pytest.fixture(scope="module")
def fixture_ds(tmp_path_factory):
    """datasets/<name>/{trainA,trainA_seg,trainA_seg_class,testA,...} with
    synthetic 64x96 PNGs (identical basenames, RGBA segs like Cityscapes)."""
    root = tmp_path_factory.mktemp("datasets") / "synth"
    rng = np.random.default_rng(0)
    colors = [c for c, _ in segment_class.CITYSCAPE_MAP]
    for split, n in [("trainA", 6), ("testA", 2)]:
        for sub in ["", "_seg", "_seg_class"]:
            os.makedirs(root / f"{split}{sub}", exist_ok=True)
        for i in range(n):
            name = f"img_{i:03d}.png"
            img = rng.integers(0, 255, (64, 96, 3), np.uint8)
            Image.fromarray(img).save(root / split / name)
            # seg: blocks of known cityscape colors, saved as RGBA
            cls_ids = rng.integers(0, len(colors), (4, 6))
            seg = np.zeros((64, 96, 4), np.uint8)
            seg[..., 3] = 255
            cls = np.zeros((64, 96), np.uint8)
            for bi in range(4):
                for bj in range(6):
                    col = colors[cls_ids[bi, bj]]
                    seg[bi * 16:(bi + 1) * 16, bj * 16:(bj + 1) * 16, :3] = col
                    cls[bi * 16:(bi + 1) * 16, bj * 16:(bj + 1) * 16] = \
                        dict(segment_class.CITYSCAPE_MAP)[col]
            Image.fromarray(seg).save(root / f"{split}_seg" / name)
            Image.fromarray(cls, mode="L").save(
                root / f"{split}_seg_class" / name)
    return str(root)


# ------------------------------------------------------------------ images

def test_inverse_transform_and_merge():
    x = np.array([[[[-1.0, 0.0, 1.0]]]])  # (1,1,1,3)
    out = img_utils.inverse_transform(x)
    np.testing.assert_array_equal(out, [[[[0, 127, 255]]]])
    four = np.tile(np.arange(4)[:, None, None, None], (1, 2, 2, 3)).astype(float)
    grid = img_utils.merge(four, [2, 2])
    assert grid.shape == (4, 4, 3)
    assert grid[0, 0, 0] == 0 and grid[0, 3, 0] == 1
    assert grid[3, 0, 0] == 2 and grid[3, 3, 0] == 3


def test_save_and_get_img(tmp_path):
    x = np.random.default_rng(1).uniform(-1, 1, (1, 8, 8, 3))
    p = tmp_path / "out.png"
    img_utils.save_images(x, [1, 1], str(p))
    back = np.asarray(Image.open(p))
    np.testing.assert_array_equal(back, img_utils.inverse_transform(x)[0])
    g = img_utils.get_img(x, [1, 1])
    assert g.shape == (1, 8, 8, 3)


def test_one_hot_parity():
    m = np.array([[0, 1], [2, 1]])
    hot = img_utils.one_hot(m, 3)
    assert hot.shape == (2, 2, 3)
    np.testing.assert_array_equal(hot.argmax(-1), m)
    np.testing.assert_array_equal(hot.sum(-1), 1)


# ----------------------------------------------------------- segment_class

def test_rgb_to_class_vectorized():
    lut = segment_class.build_lut()
    img = np.zeros((2, 3, 3), np.uint8)
    img[0, 0] = (128, 64, 128)   # road -> 4
    img[0, 1] = (70, 130, 180)   # sky -> 6
    img[1, 2] = (1, 2, 3)        # unmapped -> 0
    cls = segment_class.rgb_to_class(img, lut)
    np.testing.assert_array_equal(cls, [[4, 6, 0], [0, 0, 0]])


def test_preprocess_dir(fixture_ds):
    src = os.path.join(fixture_ds, "trainA_seg")
    n = segment_class.preprocess_dir(src)
    assert n == 6
    # output must match the fixture's ground-truth class maps
    cls = np.asarray(Image.open(
        os.path.join(fixture_ds, "trainA_seg_class", "img_000.png")))
    seg = np.asarray(Image.open(
        os.path.join(fixture_ds, "trainA_seg", "img_000.png")))
    expect = segment_class.rgb_to_class(seg, segment_class.build_lut())
    np.testing.assert_array_equal(cls, expect)


# ----------------------------------------------------------------- augment

def test_affine_identity_roundtrip():
    img = jnp.asarray(np.random.default_rng(2).uniform(size=(16, 16, 3))
                      .astype(np.float32))
    p = preprocess._identity_params()
    out = augment.affine_warp(img, p)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)


def test_affine_flip_only():
    img = jnp.asarray(np.arange(16, dtype=np.float32).reshape(4, 4, 1))
    p = preprocess._identity_params()._replace(flip=jnp.ones((), bool))
    out = augment.affine_warp(img, p)
    np.testing.assert_allclose(np.asarray(out[:, :, 0]),
                               np.asarray(img[:, ::-1, 0]), atol=1e-5)


def test_augment_pair_changes_geometry_identically():
    key = jax.random.PRNGKey(3)
    rngn = np.random.default_rng(4)
    img = jnp.asarray(rngn.uniform(size=(32, 32, 3)).astype(np.float32))
    seg = img + 0.0  # identical content
    ai, as_ = augment.augment_pair(key, img, seg)
    np.testing.assert_allclose(np.asarray(ai), np.asarray(as_), atol=1e-6)
    assert not np.allclose(np.asarray(ai), np.asarray(img), atol=1e-3)


# -------------------------------------------------------------- preprocess

def test_preprocess_train_shapes_and_ranges():
    rngn = np.random.default_rng(5)
    img = rngn.integers(0, 255, (4, 48, 64, 3), np.uint8)
    seg = rngn.integers(0, 255, (4, 48, 64, 3), np.uint8)
    cls = rngn.integers(0, 8, (4, 48, 64), np.uint8)
    aug = np.array([False, True, False, True])
    out = preprocess.preprocess_train(
        img, seg, cls, jax.random.PRNGKey(0), aug,
        out_hw=(32, 32), mask_hw=(4, 4), n_class=8)
    assert out["real_a"].shape == (4, 32, 32, 3)
    assert out["seg_a"].shape == (4, 32, 32, 3)
    assert out["mask_a"].shape == (4, 4, 4, 8)
    r = np.asarray(out["real_a"])
    assert r.min() >= -1e-5 and r.max() <= 1 + 1e-5
    m = np.asarray(out["mask_a"])
    np.testing.assert_allclose(m.sum(-1), 1.0)  # valid one-hot everywhere


def test_preprocess_mask_content():
    """With a uniform class map the mask must be that class everywhere,
    regardless of resize/flip."""
    img = np.zeros((1, 16, 16, 3), np.uint8)
    cls = np.full((1, 16, 16), 5, np.uint8)
    out = preprocess.preprocess_train(
        img, img, cls, jax.random.PRNGKey(1), np.array([False]),
        out_hw=(8, 8), mask_hw=(2, 2), n_class=8)
    np.testing.assert_allclose(np.asarray(out["mask_a"][..., 5]), 1.0)


def test_preprocess_test_shapes():
    rngn = np.random.default_rng(6)
    img = rngn.integers(0, 255, (1, 48, 64, 3), np.uint8)
    cls = rngn.integers(0, 8, (1, 48, 64), np.uint8)
    i, s, mf, mg = preprocess.preprocess_test(
        img, img, cls, out_hw=(32, 48), mask_hw=(4, 6), n_class=8)
    assert i.shape == (1, 32, 48, 3)
    assert mf.shape == (1, 32, 48, 8)
    assert mg.shape == (1, 4, 6, 8)


# ------------------------------------------------------------------ loader

def test_train_iterator_epoch(fixture_ds):
    batches = list(loader.train_iterator(fixture_ds, batch_size=2, seed=0,
                                         use_augmentation=True))
    assert len(batches) == 3  # 6 files / batch 2
    b = batches[0]
    assert b["img"].shape == (4, 64, 96, 3)  # doubled by augmentation
    assert b["cls"].shape == (4, 64, 96)
    assert b["aug"].tolist() == [False, False, True, True]
    # epoch shuffling differs by epoch
    e0 = list(loader.train_iterator(fixture_ds, 2, seed=0, epoch=0,
                                    use_augmentation=False))
    e1 = list(loader.train_iterator(fixture_ds, 2, seed=0, epoch=1,
                                    use_augmentation=False))
    assert not all(np.array_equal(a["img"], b["img"])
                   for a, b in zip(e0, e1))


def test_loader_seg_rgba_sliced(fixture_ds):
    files = loader.Dataset(fixture_ds, "trainA").files()
    img, seg, cls = loader._load_triplet(files[0], "trainA")
    assert seg.shape[-1] == 3  # RGBA sliced to RGB
    assert cls.ndim == 2


def test_conjugated_warp_matches_square_res_warp():
    """Warping at output resolution with the conjugated affine must give
    (approximately, up to interpolation ordering) the same image as the
    reference chain: warp at square res, then resize."""
    key = jax.random.PRNGKey(11)
    rngn = np.random.default_rng(12)
    sh = 64
    out_hw = (32, 48)
    img_sq = jnp.asarray(rngn.uniform(size=(sh, sh, 3)).astype(np.float32))
    # smooth the image so bilinear-interp order differences stay small
    img_sq = jax.image.resize(
        jax.image.resize(img_sq, (8, 8, 3), "linear", antialias=True),
        (sh, sh, 3), "linear")

    p = augment.random_affine_params(key, sh, sh)
    # reference order: warp at square res -> resize down
    ref = jax.image.resize(augment.affine_warp(img_sq, p),
                           (*out_hw, 3), "linear", antialias=True)
    # ours: resize down -> conjugated warp
    small = jax.image.resize(img_sq, (*out_hw, 3), "linear", antialias=True)
    got = augment.affine_warp(small, augment.conjugate_affine(
        p, (sh, sh), out_hw))
    err = float(jnp.mean(jnp.abs(ref - got)))
    assert err < 0.02, err


def test_train_iterator_train_size_limit(fixture_ds):
    batches = list(loader.train_iterator(fixture_ds, batch_size=1, seed=0,
                                         use_augmentation=False,
                                         train_size=3))
    assert len(batches) == 3


def test_preprocess_nonsquare_source_and_odd_batch():
    rngn = np.random.default_rng(9)
    img = rngn.integers(0, 255, (3, 40, 72, 3), np.uint8)
    cls = rngn.integers(0, 8, (3, 40, 72), np.uint8)
    out = preprocess.preprocess_train(
        img, img, cls, jax.random.PRNGKey(0), np.array([True, False, True]),
        out_hw=(24, 48), mask_hw=(3, 6), n_class=8)
    assert out["real_a"].shape == (3, 24, 48, 3)
    assert np.isfinite(np.asarray(out["real_a"])).all()


def test_photometric_augment_stats():
    """seq1 analog (utils.py:57-73): outputs stay in [0,1]; noise,
    contrast and brightness vary across draws with the expected spread."""
    img = jnp.full((16, 16, 3), 0.5, jnp.float32)
    outs = np.stack([np.asarray(augment.photometric_augment(
        jax.random.PRNGKey(i), img)) for i in range(60)])
    assert outs.min() >= 0.0 and outs.max() <= 1.0
    # additive gaussian noise: some draws must show clear per-pixel spread
    stds = outs.std(axis=(1, 2, 3))
    assert stds.max() > 0.01
    # contrast/multiply move the image mean around the 0.5 input
    means = outs.mean(axis=(1, 2, 3))
    assert means.std() > 0.01
    assert 0.3 < means.mean() < 0.7


def test_photometric_blur_reduces_high_freq():
    # checkerboard: blur-on draws must lose variance vs the input
    yy, xx = np.meshgrid(np.arange(16), np.arange(16), indexing="ij")
    img = jnp.asarray(((yy + xx) % 2).astype(np.float32))[..., None]
    img = jnp.tile(img, (1, 1, 3)) * 0.5 + 0.25
    v_in = float(jnp.var(img))
    vs = [float(jnp.var(augment.photometric_augment(jax.random.PRNGKey(i),
                                                    img)))
          for i in range(40)]
    assert min(vs) < v_in * 0.9  # strong-blur draws exist


def test_photometric_gated_by_aug_flag():
    """photometric=True must be a no-op for samples with aug flag off."""
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (2, 32, 32, 3), np.uint8)
    cls = rng.integers(0, 8, (2, 32, 32), np.uint8)
    kw = dict(out_hw=(16, 16), mask_hw=(2, 2), n_class=8)
    flags = jnp.zeros((2,), bool)
    a = preprocess.preprocess_train(img, img, cls, jax.random.PRNGKey(0),
                                    flags, photometric=True, **kw)
    b = preprocess.preprocess_train(img, img, cls, jax.random.PRNGKey(0),
                                    flags, photometric=False, **kw)
    np.testing.assert_allclose(np.asarray(a["real_a"]),
                               np.asarray(b["real_a"]), atol=1e-6)


def test_loader_host_downscale(fixture_ds):
    """max_src_hw shrinks decoded sources on the host (box filter; class
    map nearest so ids never mix) before upload."""
    files = loader.Dataset(fixture_ds, "trainA").files()
    img, seg, cls = loader.load_batch(files[:2], "trainA",
                                      max_hw=(16, 24))
    assert img.shape[1:] == (16, 24, 3)
    assert seg.shape[1:3] == (16, 24)
    assert cls.shape[1:] == (16, 24)
    full_img, _, full_cls = loader.load_batch(files[:2], "trainA")
    assert set(np.unique(cls)) <= set(np.unique(full_cls))
    # no-op when the source is already small enough
    same, _, _ = loader.load_batch(files[:2], "trainA",
                                   max_hw=(4096, 4096))
    np.testing.assert_array_equal(same, full_img)


def test_device_dataset_matches_host_iterator(fixture_ds):
    """The HBM-resident dataset must yield byte-identical batches in the
    same per-epoch shuffle order as the host iterator."""
    ds = loader.DeviceDataset(fixture_ds, "trainA")
    it_dev = loader.device_dataset_iterator(ds, 2, seed=3,
                                            use_augmentation=True, epoch=1)
    it_host = loader.train_iterator(fixture_ds, 2, 3,
                                    use_augmentation=True, epoch=1,
                                    prefetch=1)
    n = 0
    for a, b in zip(it_dev, it_host):
        for k in ("img", "seg", "cls"):
            np.testing.assert_array_equal(np.asarray(a[k]), b[k])
        np.testing.assert_array_equal(np.asarray(a["aug"]), b["aug"])
        n += 1
    assert n >= 1


def test_seg_labels_u8_bit_exact():
    """Device-side uint8 conversion of eval seg images must be BIT-EXACT
    vs scores_seg_fake's host conversion ((255*x).astype(np.uint8)),
    including the mod-256 wrap of antialiased-resize overshoot outside
    [0, 1] (numpy's out-of-range float->uint8 cast wraps; XLA's convert
    saturates — preprocess.seg_labels_u8 makes the wrap explicit)."""
    import jax.numpy as jnp
    r = np.random.default_rng(0).uniform(-0.1, 1.1, 100000) \
        .astype(np.float32)
    host = (255 * r).astype(np.uint8)
    dev = np.asarray(preprocess.seg_labels_u8(jnp.asarray(r)))
    np.testing.assert_array_equal(host, dev)


def test_fake_u8_bit_exact():
    """Device-side uint8 conversion of [-1, 1] generator outputs must be
    BIT-EXACT vs utils/images.inverse_transform's float64 host path
    (reference utils.py:300-314).  preprocess.fake_u8 computes the
    truncation decision on the EXACT real value via error-free f32
    transformations (TwoSum + Dekker products); perf_inv_u8_proof.py
    enumerates the ENTIRE f32 [-1, 1] domain (zero mismatches) — this
    test pins the jnp implementation (and that XLA does not simplify
    the EFT op sequence away) on edges, dense integer-boundary
    neighbourhoods, and a large random sample."""
    import jax.numpy as jnp
    from sggan_tpu.utils.images import inverse_transform
    # integer-total lattice points x = 2k/255 - 1 and their f32
    # neighbours: the only places a naive f32 formula flips
    k = np.arange(256, dtype=np.float64)
    xb = (2.0 * k / 255.0 - 1.0).astype(np.float32)
    nbrs = [xb]
    lo, hi = np.float32(-2), np.float32(2)
    stepdn, stepup = xb.copy(), xb.copy()
    for _ in range(4):
        stepdn = np.nextafter(stepdn, lo)
        stepup = np.nextafter(stepup, hi)
        nbrs += [stepdn.copy(), stepup.copy()]
    edges = np.array([-1.0, 1.0, 0.0, -0.0, 0.5, -0.5,
                      np.nextafter(np.float32(1), np.float32(0)),
                      np.nextafter(np.float32(-1), np.float32(0))],
                     np.float32)
    rnd = (np.random.default_rng(7).random(1_000_000, np.float32) * 2
           - 1).astype(np.float32)
    x = np.clip(np.concatenate(nbrs + [edges, rnd]), -1, 1)
    host = inverse_transform(x)
    dev = np.asarray(preprocess.fake_u8(jnp.asarray(x)))
    np.testing.assert_array_equal(host, dev)


def test_eval_u8_pull_byte_identity(fixture_ds):
    """The eval loop's uint8 fake pull must leave PNGs and scores
    byte-identical to the f32-pull + host inverse_transform path."""
    import jax.numpy as jnp
    from sggan_tpu.utils.images import get_img, inverse_transform, merge
    rng = np.random.default_rng(3)
    # tanh-range fake batch incl. exact boundary-lattice pixels
    fake = (rng.random((2, 16, 24, 3), np.float32) * 2 - 1).astype(
        np.float32)
    fake[0, :256 // 24 + 1].flat[:256] = (
        2.0 * np.arange(256) / 255.0 - 1.0)
    u8 = np.asarray(preprocess.fake_u8(jnp.asarray(fake)))
    np.testing.assert_array_equal(u8, inverse_transform(fake))
    one = u8[0:1]
    via_u8 = merge(one, [1, 1]).reshape(1, 16, 24, 3)
    np.testing.assert_array_equal(via_u8, get_img(fake[0:1], [1, 1]))


def test_preprocess_test_with_masks_false():
    """with_masks=False returns identical img/seg and skips the one-hot
    masks (the generator-only eval/test paths never read them)."""
    rng = np.random.default_rng(5)
    img = rng.integers(0, 255, (2, 40, 48, 3), np.uint8)
    seg = rng.integers(0, 255, (2, 40, 48, 3), np.uint8)
    cls = rng.integers(0, 8, (2, 40, 48), np.uint8)
    full = preprocess.preprocess_test(img, seg, cls, out_hw=(32, 32),
                                      mask_hw=(4, 4), n_class=8)
    lean = preprocess.preprocess_test(img, seg, cls, out_hw=(32, 32),
                                      mask_hw=(4, 4), n_class=8,
                                      with_masks=False)
    np.testing.assert_array_equal(np.asarray(full[0]), np.asarray(lean[0]))
    np.testing.assert_array_equal(np.asarray(full[1]), np.asarray(lean[1]))
    assert lean[2] is None and lean[3] is None


def test_aug_layout_bitexact():
    """The static aug_layout promises vs the generic dynamic path
    (preprocess.py docstring contract): "none" is BITWISE identical
    (skipping the identity-parameter warp is exact — bilinear weights at
    integer coordinates are exactly {1, 0}); "half" is bitwise on plain
    rows, the mask, and geometry-only warped rows, and within 8 f32 ulp
    on photometric-augmented rows (XLA re-fuses the photometric chain
    around the sliced batch)."""
    rngn = np.random.default_rng(11)
    img = rngn.integers(0, 255, (6, 48, 64, 3), np.uint8)
    seg = rngn.integers(0, 255, (6, 48, 64, 3), np.uint8)
    cls = rngn.integers(0, 8, (6, 48, 64), np.uint8)
    key = jax.random.PRNGKey(3)
    kw = dict(out_hw=(32, 32), mask_hw=(4, 4), n_class=8)

    # all-plain vs "none"
    plain = np.zeros(6, bool)
    dyn = preprocess.preprocess_train(img, seg, cls, key, plain, **kw)
    none = preprocess.preprocess_train(img, seg, cls, key, plain,
                                       aug_layout="none", **kw)
    for k in dyn:
        np.testing.assert_array_equal(np.asarray(dyn[k]),
                                      np.asarray(none[k]), err_msg=k)

    # [plain, augmented] halves vs "half", photometric both off and on
    half_flags = np.concatenate([np.zeros(3, bool), np.ones(3, bool)])
    tol = 1e-6  # ~8 ulp at magnitude ~1 (measured 7.5e-7)
    for pho in (False, True):
        dyn = preprocess.preprocess_train(img, seg, cls, key, half_flags,
                                          photometric=pho, **kw)
        half = preprocess.preprocess_train(img, seg, cls, key, half_flags,
                                           photometric=pho,
                                           aug_layout="half", **kw)
        np.testing.assert_array_equal(np.asarray(dyn["mask_a"]),
                                      np.asarray(half["mask_a"]))
        for k in ("real_a", "seg_a"):
            d, h = np.asarray(dyn[k]), np.asarray(half[k])
            np.testing.assert_array_equal(d[:3], h[:3],
                                          err_msg=f"plain {k} pho={pho}")
            if pho and k == "real_a":
                assert np.abs(d[3:] - h[3:]).max() <= tol, \
                    f"photometric {k} drift > 1e-6"
            else:
                np.testing.assert_array_equal(
                    d[3:], h[3:], err_msg=f"warped {k} pho={pho}")

    # odd batch rejected for "half"
    with pytest.raises(ValueError):
        preprocess.preprocess_train(img[:3], seg[:3], cls[:3], key,
                                    half_flags[:3], aug_layout="half", **kw)
