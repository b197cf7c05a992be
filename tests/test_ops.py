"""Unit tests for the core ops: TF-semantics parity of conv / conv-transpose
padding, instance norm numerics, depthwise derivative kernels."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sggan_tpu import ops


def test_conv_same_shape():
    key = jax.random.PRNGKey(0)
    p = ops.conv2d_init(key, 3, 3, 3, 8)
    x = jnp.ones((2, 17, 23, 3))
    assert ops.conv2d(p, x, stride=1, padding="SAME").shape == (2, 17, 23, 8)
    # TF SAME with stride 2: out = ceil(in / 2)
    assert ops.conv2d(p, x, stride=2, padding="SAME").shape == (2, 9, 12, 8)
    # VALID stride 2 with k=3: out = floor((in - k) / s) + 1
    assert ops.conv2d(p, x, stride=2, padding="VALID").shape == (2, 8, 11, 8)


def test_conv_valid_matches_manual():
    # 1x1 input patch dot kernel
    key = jax.random.PRNGKey(1)
    w = jax.random.normal(key, (3, 3, 2, 4))
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 3, 3, 2))
    y = ops.conv2d({"w": w}, x, stride=1, padding="VALID")
    expect = jnp.einsum("nhwc,hwco->no", x, w)[:, None, None, :]
    np.testing.assert_allclose(np.asarray(y), np.asarray(expect), rtol=1e-5, atol=1e-5)


def test_conv_transpose_is_gradient_of_conv():
    """TF Conv2DTranspose == gradient of a forward conv wrt its input.
    Our op must match the vjp of our own conv exactly, for every
    stride/padding combo the reference uses (module.py:169-202,254-258)."""
    key = jax.random.PRNGKey(3)
    for stride, padding, hw in [(2, "SAME", 8), (1, "SAME", 8), (2, "SAME", 7)]:
        cin, cout = 5, 7
        # transpose op: cin -> cout; forward conv: cout -> cin
        w = jax.random.normal(key, (3, 3, cout, cin))  # TF ConvT layout
        x = jax.random.normal(jax.random.PRNGKey(4), (2, hw, hw, cin))
        y = ops.conv2d_transpose({"w": w}, x, stride=stride, padding=padding)
        out_h = hw * stride if padding == "SAME" else None
        assert y.shape == (2, out_h, out_h, cout)

        # forward conv with the same kernel read as HWIO (I=cout, O=cin)
        def fwd(a):
            return jax.lax.conv_general_dilated(
                a, w, (stride, stride), padding,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        a0 = jnp.zeros((2, out_h, out_h, cout))
        _, vjp = jax.vjp(fwd, a0)
        (expect,) = vjp(x)
        np.testing.assert_allclose(np.asarray(y), np.asarray(expect),
                                   rtol=1e-4, atol=1e-4)


def test_instance_norm_numerics():
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 6, 7, 3)) * 3 + 1
    p = ops.instance_norm_init(3)
    y = ops.instance_norm(p, x, use_pallas=False)
    xn = np.asarray(x)
    mean = xn.mean(axis=(1, 2), keepdims=True)
    var = xn.var(axis=(1, 2), keepdims=True)
    expect = (xn - mean) / np.sqrt(var + 1e-3)
    np.testing.assert_allclose(np.asarray(y), expect, rtol=1e-4, atol=1e-4)
    # affine + fused activation
    p2 = {"gamma": jnp.full((3,), 2.0), "beta": jnp.full((3,), -0.5)}
    y2 = ops.instance_norm(p2, x, act="leaky_relu", alpha=0.3, use_pallas=False)
    e2 = expect * 2.0 - 0.5
    e2 = np.where(e2 >= 0, e2, 0.3 * e2)
    np.testing.assert_allclose(np.asarray(y2), e2, rtol=1e-4, atol=1e-4)


def test_leaky_relu_keras_default():
    x = jnp.array([-1.0, 2.0])
    np.testing.assert_allclose(np.asarray(ops.leaky_relu(x)), [-0.3, 2.0])


def test_reflect_pad():
    x = jnp.arange(16.0).reshape(1, 4, 4, 1)
    y = ops.reflect_pad(x, 1)
    assert y.shape == (1, 6, 6, 1)
    # reflect: row -1 mirrors row 1
    np.testing.assert_allclose(np.asarray(y[0, 0, 1:5, 0]),
                               np.asarray(x[0, 1, :, 0]))


def test_reflect_pad_custom_vjp_matches_autodiff():
    """The strip-add backward must equal jnp.pad's autodiff adjoint
    exactly (same sums, different association order)."""
    for pad in (1, 3):
        x = jax.random.normal(jax.random.PRNGKey(7 + pad), (2, 9, 11, 3))
        w = jax.random.normal(jax.random.PRNGKey(17 + pad),
                              (2, 9 + 2 * pad, 11 + 2 * pad, 3))
        cfg = [(0, 0), (pad, pad), (pad, pad), (0, 0)]
        ref_fn = lambda v: jnp.sum(w * jnp.pad(v, cfg, mode="reflect"))
        got_fn = lambda v: jnp.sum(w * ops.reflect_pad(v, pad))
        np.testing.assert_allclose(float(got_fn(x)), float(ref_fn(x)),
                                   rtol=1e-6)
        g_ref = jax.grad(ref_fn)(x)
        g_got = jax.grad(got_fn)(x)
        np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                                   rtol=1e-6, atol=1e-6)


def test_conv2d_reflect_matches_pad_then_valid():
    """SAME conv + border fix-up == reflect_pad + VALID conv, forward and
    gradients, k=3 and k=7."""
    for k in (3, 7):
        key = jax.random.PRNGKey(k)
        p = ops.conv2d_init(key, k, k, 3, 5)
        x = jax.random.normal(jax.random.fold_in(key, 1), (2, 12, 18, 3))
        ref = ops.conv2d(p, ops.reflect_pad(x, k // 2), 1, "VALID")
        got = ops.conv2d_reflect(p, x)
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6)
        tgt = jax.random.normal(jax.random.fold_in(key, 2), ref.shape)
        ref_g = jax.grad(lambda v: jnp.sum(tgt * ops.conv2d(
            p, ops.reflect_pad(v, k // 2), 1, "VALID")))(x)
        got_g = jax.grad(lambda v: jnp.sum(
            tgt * ops.conv2d_reflect(p, v)))(x)
        np.testing.assert_allclose(np.asarray(got_g), np.asarray(ref_g),
                                   rtol=1e-4, atol=1e-5)
        ref_gw = jax.grad(lambda w: jnp.sum(tgt * ops.conv2d(
            {"w": w, "b": p["b"]}, ops.reflect_pad(x, k // 2), 1,
            "VALID")))(p["w"])
        got_gw = jax.grad(lambda w: jnp.sum(tgt * ops.conv2d_reflect(
            {"w": w, "b": p["b"]}, x)))(p["w"])
        np.testing.assert_allclose(np.asarray(got_gw), np.asarray(ref_gw),
                                   rtol=1e-4, atol=1e-5)


def test_depthwise_deriv():
    """Central-difference depthwise conv against a manual stencil."""
    x = jax.random.normal(jax.random.PRNGKey(6), (1, 8, 8, 2))
    w = ops.deriv_kernel_diff(2)  # (3,3,2,2)
    y = ops.depthwise_conv2d(x, w, padding="VALID")
    assert y.shape == (1, 6, 6, 4)
    xn = np.asarray(x)
    # channel 0 of output = dx of input channel 0: x[h, w+1] - x[h, w-1]
    expect_dx0 = xn[0, 1:7, 2:8, 0] - xn[0, 1:7, 0:6, 0]
    np.testing.assert_allclose(np.asarray(y[0, :, :, 0]), expect_dx0,
                               rtol=1e-5, atol=1e-5)
    # channel 1 = dy of input channel 0: x[h+1, w] - x[h-1, w]
    expect_dy0 = xn[0, 2:8, 1:7, 0] - xn[0, 0:6, 1:7, 0]
    np.testing.assert_allclose(np.asarray(y[0, :, :, 1]), expect_dy0,
                               rtol=1e-5, atol=1e-5)


def test_seg_boundary_weight():
    """Boundary map is 1 exactly at class-color boundaries, 0 in the
    interior (model.py:115-119 semantics)."""
    seg = np.zeros((1, 8, 8, 3), np.float32)
    seg[:, :, 4:, :] = 1.0  # vertical boundary between col 3 and 4
    w = ops.seg_boundary_weight(jnp.asarray(seg))
    assert w.shape == (1, 8, 8, 1)
    wn = np.asarray(w[0, :, :, 0])
    assert (wn[:, 3] == 1).all() and (wn[:, 4] == 1).all()
    assert (wn[:, :3] == 0).all() and (wn[:, 5:] == 0).all()


def test_dropout():
    key = jax.random.PRNGKey(7)
    x = jnp.ones((4, 100))
    y = ops.dropout(key, x, 0.5, deterministic=False)
    frac = float((np.asarray(y) == 0).mean())
    assert 0.3 < frac < 0.7
    kept = np.asarray(y)[np.asarray(y) != 0]
    np.testing.assert_allclose(kept, 2.0)
    np.testing.assert_allclose(
        np.asarray(ops.dropout(key, x, 0.5, deterministic=True)), 1.0)


def test_sobel_shifts_match_depthwise_conv():
    """sobel_xy (fusable shifted adds) must equal tf_deriv's depthwise
    conv exactly (channel-major (dx, dy) interleave)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from sggan_tpu.ops.deriv import sobel_xy, tf_deriv
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 9, 11, 3))
    conv = np.asarray(tf_deriv(x))
    dx, dy = sobel_xy(x)
    np.testing.assert_allclose(np.asarray(dx), conv[..., 0::2], atol=1e-5)
    np.testing.assert_allclose(np.asarray(dy), conv[..., 1::2], atol=1e-5)


def test_gradloss_matches_conv_form():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from sggan_tpu import losses
    from sggan_tpu.ops.deriv import tf_deriv
    k = jax.random.PRNGKey(1)
    a = jax.random.uniform(k, (2, 8, 8, 3))
    b = jax.random.uniform(jax.random.fold_in(k, 1), (2, 8, 8, 3))
    w = jnp.ones((2, 8, 8, 1))
    ref = jnp.mean(w * jnp.mean(
        jnp.abs(jnp.abs(tf_deriv(a)) - jnp.abs(tf_deriv(b))),
        axis=-1, keepdims=True))
    got = losses.gradloss_criterion(a, b, w)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-6)


def test_in_fused_matches_autodiff():
    """The custom-VJP one-pass instance norm must match the plain two-pass
    XLA form in value AND gradients (x, gamma, beta), for every fused
    activation."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from sggan_tpu.ops.norm import _in_fused, _instance_norm_xla
    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (2, 6, 5, 4)) * 2 + 1
    g = jax.random.normal(jax.random.fold_in(k, 1), (4,))
    b = jax.random.normal(jax.random.fold_in(k, 2), (4,))
    ct = jax.random.normal(jax.random.fold_in(k, 3), (2, 6, 5, 4))
    for act in (None, "relu", "leaky_relu"):
        ref = _instance_norm_xla(x, g, b, 1e-3, act, 0.3)
        got = _in_fused(x, g, b, 1e-3, act, 0.3)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)
        ref_g = jax.grad(lambda *a: jnp.sum(
            _instance_norm_xla(*a, 1e-3, act, 0.3) * ct),
            argnums=(0, 1, 2))(x, g, b)
        got_g = jax.grad(lambda *a: jnp.sum(
            _in_fused(*a, 1e-3, act, 0.3) * ct), argnums=(0, 1, 2))(x, g, b)
        for r, o in zip(ref_g, got_g):
            np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                       rtol=2e-4, atol=2e-5)


def test_conv2d_valid_s2d_matches_direct():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from sggan_tpu.ops import conv2d, conv2d_init
    from sggan_tpu.ops import s2d
    k = jax.random.PRNGKey(0)
    p = conv2d_init(k, 7, 7, 8, 3)
    x = jax.random.uniform(jax.random.fold_in(k, 1), (2, 22, 38, 8))
    assert s2d.applicable(x, p["w"])
    ref = conv2d(p, x, 1, "VALID")
    got = s2d.conv2d_valid_s2d(p, x)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)
    # gradient path (the head trains)
    g1 = jax.grad(lambda w: jnp.sum(jnp.square(
        conv2d({"w": w, "b": p["b"]}, x, 1, "VALID"))))(p["w"])
    g2 = jax.grad(lambda w: jnp.sum(jnp.square(
        s2d.conv2d_valid_s2d({"w": w, "b": p["b"]}, x))))(p["w"])
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1),
                               rtol=1e-3, atol=1e-4)


def test_conv2d_reflect_s2d_matches_padded_form():
    """conv2d_reflect_s2d (pad folded into the strided conv + border
    strips) must equal reflect_pad + direct VALID conv, values AND
    gradients — the generator head's pad-free fast path."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from sggan_tpu.ops import conv2d, conv2d_init, reflect_pad
    from sggan_tpu.ops import s2d
    k = jax.random.PRNGKey(3)
    p = conv2d_init(k, 7, 7, 8, 3)
    x = jax.random.uniform(jax.random.fold_in(k, 1), (2, 24, 40, 8))
    assert s2d.applicable_reflect(x, p["w"])
    ref = conv2d(p, reflect_pad(x, 3), 1, "VALID")
    got = s2d.conv2d_reflect_s2d(p, x)
    assert got.shape == ref.shape == x.shape[:3] + (3,)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)
    # grads w.r.t. BOTH kernel and input (the border strips contribute)
    f_ref = lambda w, xx: jnp.sum(jnp.square(
        conv2d({"w": w, "b": p["b"]}, reflect_pad(xx, 3), 1, "VALID")))
    f_got = lambda w, xx: jnp.sum(jnp.square(
        s2d.conv2d_reflect_s2d({"w": w, "b": p["b"]}, xx)))
    for i in (0, 1):
        g1 = jax.grad(f_ref, argnums=i)(p["w"], x)
        g2 = jax.grad(f_got, argnums=i)(p["w"], x)
        np.testing.assert_allclose(np.asarray(g2), np.asarray(g1),
                                   rtol=1e-3, atol=1e-4)


def test_s2d_rectangular_blocks_match_direct():
    """Rectangular block shapes (rh != rw): same math as the direct conv
    for both the valid and pad-free-reflect forms, values and grads.
    4x8 doubles the head's MXU lane utilization (96 vs 48 of 128) at
    1.4x the taps — net ~30% less MXU time by the s2d.py cost model."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from sggan_tpu.ops import conv2d, conv2d_init, reflect_pad
    from sggan_tpu.ops import s2d

    k = jax.random.PRNGKey(5)
    p = conv2d_init(k, 7, 7, 8, 3)
    for r in ((4, 8), (2, 4), (8, 4)):
        xp = jax.random.uniform(jax.random.fold_in(k, 1), (2, 22, 38, 8))
        assert s2d.applicable(xp, p["w"], r=r)
        ref = conv2d(p, xp, 1, "VALID")
        got = s2d.conv2d_valid_s2d(p, xp, r=r)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)
        x = jax.random.uniform(jax.random.fold_in(k, 2), (2, 24, 40, 8))
        assert s2d.applicable_reflect(x, p["w"], r=r)
        ref = conv2d(p, reflect_pad(x, 3), 1, "VALID")
        got = s2d.conv2d_reflect_s2d(p, x, r=r)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)
        g1 = jax.grad(lambda xx: jnp.sum(jnp.square(
            conv2d(p, reflect_pad(xx, 3), 1, "VALID"))))(x)
        g2 = jax.grad(lambda xx: jnp.sum(jnp.square(
            s2d.conv2d_reflect_s2d(p, xx, r=r))))(x)
        np.testing.assert_allclose(np.asarray(g2), np.asarray(g1),
                                   rtol=1e-3, atol=1e-4)


def test_s2d_best_block():
    from sggan_tpu.ops import s2d
    # k=7, cout=3 at 256x512: 8x4/4x8 beat 4x4 (186 vs 266 relative
    # cost); the tie breaks to the taller block, the on-chip winner
    # (perf_head_block.py: 8.02 vs 8.20 ms fwd+bwd)
    assert s2d.best_block(7, 3, 256, 512) == (8, 4)
    # lane cap: cout=34 allows at most rh*rw <= 3 -> 1x2 or 2x1
    rh, rw = s2d.best_block(7, 34, 256, 512)
    assert rh * rw * 34 <= 128
    # divisibility respected
    assert s2d.best_block(7, 3, 30, 30)[0] in (1, 2)
