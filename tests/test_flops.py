"""Pin the analytic FLOP model's layer dims against the real nets.

VERDICT r4 weak #1: the discriminator FLOP model counted every conv at
k=4 with k=4 VALID-chain arithmetic, but the semantic discriminator is
3x3 everywhere (reference module.py:284-311; models/discriminator.py),
inflating D fwd ~76% and sggan step totals ~8%.  These tests pin
utils/flops.py's per-layer output grids against the shapes the actual
net produces (conv outputs recorded through a monkeypatched conv2d),
so the audit model cannot drift from the model code again.
"""

import jax
import jax.numpy as jnp
import pytest

from sggan_tpu.models import discriminator
from sggan_tpu.utils import flops as F


def _traced_conv_dims(h, w, n_class=8):
    """Record every conv2d output grid inside a real discriminator apply."""
    recorded = []
    orig = discriminator.conv2d

    def spy(params, x, stride, padding, cd, bias=True):
        y = orig(params, x, stride, padding, cd, bias=bias)
        recorded.append((y.shape[1], y.shape[2]))
        return y

    params = discriminator.init(jax.random.PRNGKey(0), ndf=4,
                                n_class=n_class, image_size=(h, w))
    x = jnp.zeros((1, h, w, 3))
    mask = jnp.zeros((1, h // 8, w // 8, n_class))
    discriminator.conv2d = spy
    try:
        jax.eval_shape(lambda p, x, m: discriminator.apply(p, x, m),
                       params, x, mask)
    finally:
        discriminator.conv2d = orig
    return recorded


@pytest.mark.parametrize("h,w", [(128, 128), (256, 512), (64, 128)])
def test_discriminator_dims_match_model(h, w):
    model_dims = _traced_conv_dims(h, w)
    audit_dims = [(oh, ow) for _, oh, ow in F.discriminator_dims(h, w)]
    assert audit_dims == model_dims


def test_discriminator_reference_chain_128():
    """At 128x128 the audit reproduces the reference's h31/h32/h33 chain
    (module.py:299-309): 16 -> 7 -> 3 -> 1."""
    dims = dict((n, (oh, ow)) for n, oh, ow in F.discriminator_dims(128, 128))
    assert dims["h3"] == (16, 16)
    assert dims["v0"] == (7, 7)
    assert dims["v1"] == (3, 3)
    assert dims["v2"] == (1, 1)
    assert dims["h4"] == (1, 1)


def test_discriminator_fwd_gf_256x512():
    """The corrected D fwd at 256x512 is ~10.2 GF (VERDICT r4's recompute),
    not the k=4 model's 18.0 GF."""
    d = sum(f for _, f in F.discriminator_fwd(256, 512))
    assert 9.5e9 < d < 11.0e9, d / 1e9


def test_flops_within_xla_cost_analysis():
    """Analytic step count stays an over-approximation of XLA's own count
    (XLA prunes first-layer dgrads etc.) but within 35% of it — the same
    sanity band perf_audit.py checks on CPU."""
    from sggan_tpu.config import Config
    from sggan_tpu.train import init_state
    from sggan_tpu.train.step import build_step_fn

    h, w, b = 64, 128, 1
    cfg = Config(image_height=h, image_width=w, batch_size=b,
                 loss_mode="sggan", use_resnet=True, segment_class=8,
                 compute_dtype="float32", max_size=2, donate=False)
    key = jax.random.PRNGKey(0)
    state = init_state(cfg, key)
    step = build_step_fn(cfg)
    batch = {
        "real_a": jnp.zeros((b, h, w, 3)),
        "seg_a": jnp.zeros((b, h, w, 3)),
        "mask_a": jnp.zeros((b, *cfg.mask_hw, 8)),
    }
    lowered = jax.jit(step).lower(state, batch, jnp.float32(1e-3), key)
    xla = lowered.compile().cost_analysis()["flops"]
    analytic = F.sggan_train_step(h, w, b)["step_flops"]
    assert 0.65 < xla / analytic <= 1.05, (xla / 1e9, analytic / 1e9)


def test_cycle_flops_within_xla_cost_analysis():
    """Same XLA-vs-analytic sanity band for the cycle step model
    (utils/flops.py::cycle_train_step — PERF.md round 5's structural
    6x account rests on it)."""
    from sggan_tpu.config import Config
    from sggan_tpu.train.cycle import build_cycle_step_fn, init_cycle_state

    h, w, b = 64, 128, 1
    cfg = Config(image_height=h, image_width=w, batch_size=b,
                 loss_mode="cycle", use_resnet=True, segment_class=8,
                 compute_dtype="float32", max_size=2, donate=False)
    key = jax.random.PRNGKey(0)
    state = init_cycle_state(cfg, key)
    step = build_cycle_step_fn(cfg)
    z = jnp.zeros((b, h, w, 3))
    mask = jnp.zeros((b, *cfg.mask_hw, 8))
    batch = {"real_a": z, "seg_a": z, "mask_a": mask,
             "real_b": z, "seg_b": z, "mask_b": mask}
    lowered = jax.jit(step).lower(state, batch, jnp.float32(1e-3), key)
    xla = lowered.compile().cost_analysis()["flops"]
    analytic = F.cycle_train_step(h, w, b)["step_flops"]
    assert 0.65 < xla / analytic <= 1.05, (xla / 1e9, analytic / 1e9)

    # the structural cycle-vs-sggan ratio at the flagship resolution —
    # the number PERF.md cites against the measured 6.06x throughput gap
    ratio = F.cycle_train_step(256, 512, 1)["vs_sggan_per_image"]
    assert 5.0 < ratio < 6.5, ratio
