"""Dense-CRF tests: native permutohedral lattice against an exact
brute-force Gaussian oracle, and mean-field behaviour properties."""

import numpy as np
import pytest

from sggan_tpu.metrics import crf


native = pytest.mark.skipif(crf._load_native() is None,
                            reason="native CRF library unavailable")


@native
def test_permutohedral_approximates_gaussian():
    """Lattice filtering ~ exact Gaussian filtering (the lattice is an
    approximation; correlation should be very high)."""
    rng = np.random.default_rng(0)
    n, d = 400, 2
    feats = rng.uniform(0, 6, (n, d)).astype(np.float32)
    vals = rng.normal(size=(n, 3)).astype(np.float32)
    got = crf.permutohedral_filter(feats, vals)

    # exact: sum_j exp(-|fi-fj|^2/2) v_j
    d2 = ((feats[:, None, :] - feats[None, :, :]) ** 2).sum(-1)
    k = np.exp(-d2 / 2)
    expect = k @ vals

    # compare after symmetric normalization (cancels lattice gain)
    ones = np.ones((n, 1), np.float32)
    norm_got = crf.permutohedral_filter(feats, ones)
    g = got / norm_got
    e = expect / k.sum(1, keepdims=True)
    corr = np.corrcoef(g.ravel(), e.ravel())[0, 1]
    assert corr > 0.99, corr


@native
def test_dense_crf_confident_unary_survives():
    """With near-one-hot unaries the CRF must keep the labels."""
    rng = np.random.default_rng(1)
    h, w, c = 24, 24, 5
    labels = rng.integers(0, c, (h, w))
    probs = np.full((c, h, w), 0.02 / (c - 1), np.float32)
    for j in range(c):
        probs[j][labels == j] = 0.98
    img = (labels * 40).astype(np.uint8)[..., None].repeat(3, -1)
    q = crf.dense_crf(img, probs)
    assert q.shape == (c, h, w)
    np.testing.assert_allclose(q.sum(0), 1.0, atol=1e-4)
    agree = (q.argmax(0) == labels).mean()
    assert agree > 0.95, agree


@native
def test_dense_crf_smooths_salt_noise():
    """A lone mislabeled pixel inside a uniform region with uniform
    appearance must flip to the region's label."""
    h, w, c = 20, 20, 2
    probs = np.zeros((c, h, w), np.float32)
    probs[0] = 0.9
    probs[1] = 0.1
    probs[0, 10, 10], probs[1, 10, 10] = 0.25, 0.75  # noisy pixel
    img = np.full((h, w, 3), 128, np.uint8)
    q = crf.dense_crf(img, probs)
    assert q.argmax(0)[10, 10] == 0


@native
def test_dense_crf_matches_bruteforce_oracle():
    """Native lattice mean field vs exact O(N^2) numpy mean field on a
    tiny image: argmax maps should agree almost everywhere."""
    rng = np.random.default_rng(2)
    h, w, c = 12, 12, 3
    probs = rng.dirichlet(np.ones(c) * 2.0, (h, w)).astype(np.float32)
    probs = np.ascontiguousarray(probs.transpose(2, 0, 1))
    img = rng.integers(0, 255, (h, w, 3), np.uint8)

    q_native = crf.dense_crf(img, probs)

    unary = crf.unary_from_softmax(probs)
    q_np = crf._mean_field_numpy(
        np.ascontiguousarray(unary.transpose(1, 2, 0)), img, crf.MAX_ITER)
    q_np = q_np.transpose(2, 0, 1)

    agree = (q_native.argmax(0) == q_np.argmax(0)).mean()
    assert agree > 0.9, agree


def test_scores_adapters_shapes():
    rng = np.random.default_rng(3)
    seg = rng.uniform(size=(1, 16, 16, 3)).astype(np.float32)
    da = rng.uniform(size=(1, 2, 2, 1)).astype(np.float32)
    gts, preds = crf.scores_seg_da_fake(seg, da, stride=8)
    assert gts.shape == (1, 16, 16)
    assert preds.shape == (1, 16, 16)  # reference keeps the channel axis
    #                                    (metric.py:109 indexes [0,:,:,:])
