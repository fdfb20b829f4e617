"""Model forward smoke tests across all registry versions + loss/grad checks.

Mirrors the reference's shape-contract characterization (SURVEY.md §4.4,
architecture_change.md:37-64) on a tiny config.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rgbdseg_tpu.config import ModelConfig
from rgbdseg_tpu import versions as V
from rgbdseg_tpu.models.mask2former import Mask2FormerRGBD
from rgbdseg_tpu.ops.losses import mask2former_loss

HW = 64


def _make(version):
    cfg = ModelConfig.tiny(num_labels=2, version=version)
    model = Mask2FormerRGBD(cfg)
    ch = V.get(version).channels.total
    x = jnp.asarray(np.random.RandomState(0).rand(2, HW, HW, ch), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x)
    return cfg, model, x, variables


# compile-per-version is the expensive part; keep the two headline versions in
# the fast suite (stock RGB + the final paper model), the rest run under -m slow
_FAST_VERSIONS = {"0.0.0", "0.4.0"}


@pytest.mark.parametrize(
    "version",
    [
        v if v in _FAST_VERSIONS else pytest.param(v, marks=pytest.mark.slow)
        for v in sorted(V.REGISTRY)
    ],
)
def test_forward_shapes_all_versions(version):
    cfg, model, x, variables = _make(version)
    out = model.apply(variables, x)
    q, l = cfg.num_queries, cfg.num_labels
    assert out.class_queries_logits.shape == (2, q, l + 1)
    assert out.masks_queries_logits.shape == (2, q, HW // 4, HW // 4)
    assert len(out.aux_class_logits) == cfg.decoder_layers - 1
    assert np.isfinite(np.asarray(out.class_queries_logits)).all()
    assert np.isfinite(np.asarray(out.masks_queries_logits)).all()


def _targets(b=2, t=5, hw=HW):
    rng = np.random.RandomState(1)
    masks = (rng.rand(b, t, hw, hw) > 0.7).astype(np.float32)
    classes = rng.randint(0, 2, size=(b, t)).astype(np.int32)
    valid = np.zeros((b, t), bool)
    valid[0, :3] = True
    valid[1, :1] = True
    return jnp.asarray(masks), jnp.asarray(classes), jnp.asarray(valid)


@pytest.mark.slow  # compile-heavy: demoted from the fast default suite (VERDICT r2 #9)
def test_loss_and_gradients():
    cfg, model, x, variables = _make("0.0.0")
    masks, classes, valid = _targets()

    def loss_fn(params):
        out = model.apply({"params": params}, x)
        total, ld = mask2former_loss(cfg, out, masks, classes, valid, jax.random.PRNGKey(7))
        return total, ld

    (total, ld), grads = jax.value_and_grad(loss_fn, has_aux=True)(variables["params"])
    assert np.isfinite(float(total))
    # 3 loss kinds, each stacked over final + (decoder_layers - 1) aux layers
    assert set(ld) == {"loss_cross_entropy", "loss_mask", "loss_dice"}
    assert all(v.shape == (cfg.decoder_layers,) for v in ld.values())
    gnorm = sum(float(jnp.sum(g**2)) for g in jax.tree.leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0


@pytest.mark.slow  # extra per-version fwd+bwd compile
def test_normals_version_gradients_finite_and_detached():
    """Training version 0.0.7 (in-forward intrinsics → surface normals →
    DGGM): every gradient must be finite, and the intrinsics predictor must
    receive ZERO gradient — the reference computes normals in host numpy from
    the predicted intrinsics (custom_model.py:169-196), detaching them from
    autodiff. Without the matching stop_gradient, the normals' invalid-depth
    NaN intermediates leak NaN into the intrinsics gradients (the where-trap),
    which NaNs the global-norm clip and the whole training step."""
    cfg, model, x, variables = _make("0.0.7")
    # invalid-depth patch in the gray channel exercises the NaN band
    xn = np.array(x)
    xn[..., 3] = np.random.RandomState(2).uniform(0.5, 8.0, xn.shape[:3])
    xn[:, 10:20, 10:20, 3] = 0.0
    x = jnp.asarray(xn)
    masks, classes, valid = _targets()

    def loss_fn(params):
        out = model.apply({"params": params}, x)
        total, _ = mask2former_loss(cfg, out, masks, classes, valid, jax.random.PRNGKey(7))
        return total

    total, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(total))
    flat = jax.tree_util.tree_leaves_with_path(grads)
    nonfinite = [
        jax.tree_util.keystr(k) for k, v in flat if not bool(jnp.isfinite(v).all())
    ]
    assert not nonfinite, nonfinite
    intr = [
        (jax.tree_util.keystr(k), float(jnp.abs(v).max()))
        for k, v in flat
        if "intrinsics" in jax.tree_util.keystr(k)
    ]
    assert intr  # the predictor exists in this version
    assert all(m == 0.0 for _, m in intr), intr


@pytest.mark.slow  # whichever variant runs first pays the ~120 s default
# fwd+bwd baseline compile (demoting a single variant just moves it) — the
# whole A/B parity group lives in the slow tier per the fast-suite budget
@pytest.mark.parametrize(
    "env",
    [{"RGBDSEG_TENT_SEPARABLE": "0"}, {"RGBDSEG_REMAT": "dots"}, {"RGBDSEG_REMAT": "0"}],
)
def test_perf_ab_variants_match_default(env, monkeypatch):
    """The env-gated A/B formulations (fused-P tent sampling — the non-default
    twin of the separable default — and the remat policy knob,
    models/pixel_decoder.py) must not change the math: forward and gradients
    match the default path to f32 tolerance."""
    cfg, model, x, variables = _make("0.0.0")
    masks, classes, valid = _targets()

    def loss_fn(params):
        out = model.apply({"params": params}, x)
        total, _ = mask2former_loss(cfg, out, masks, classes, valid, jax.random.PRNGKey(7))
        return total

    base_loss, base_grads = jax.value_and_grad(loss_fn)(variables["params"])
    for k, v in env.items():
        monkeypatch.setenv(k, v)
    ab_loss, ab_grads = jax.value_and_grad(loss_fn)(variables["params"])
    np.testing.assert_allclose(float(ab_loss), float(base_loss), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(ab_grads), jax.tree.leaves(base_grads)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)


def test_loss_deterministic_given_key():
    cfg, model, x, variables = _make("0.0.0")
    masks, classes, valid = _targets()
    out = model.apply(variables, x)
    t1, _ = mask2former_loss(cfg, out, masks, classes, valid, jax.random.PRNGKey(3))
    t2, _ = mask2former_loss(cfg, out, masks, classes, valid, jax.random.PRNGKey(3))
    assert float(t1) == float(t2)


@pytest.mark.parametrize(
    "env",
    [{"RGBDSEG_FOLD_BN": "0"}, {"RGBDSEG_EDSAM_CONV": "conv"}, {"RGBDSEG_EDSAM_FLAT": "1"}],
)
def test_bn_fold_and_conv_twin_match_default(env, monkeypatch):
    """Eval-mode BatchNorm folding (models/fusion.py::_conv_bn_relu, default
    on) and the native-conv twin of the E-DSAM merged front conv must match
    the unfolded/im2col eval forward to f32 reassociation tolerance on the
    full 0.4.0 model (randomized running stats so the affine is non-trivial)."""
    cfg, model, x, variables = _make("0.4.0")
    rng = np.random.RandomState(3)
    bs = jax.tree.map(
        lambda t: jnp.asarray(rng.rand(*t.shape) * 0.5 + 0.75, t.dtype),
        variables.get("batch_stats", {}),
    )
    vs = {"params": variables["params"], "batch_stats": bs}
    base = model.apply(vs, x, deterministic=True)
    for k, v in env.items():
        monkeypatch.setenv(k, v)
    other = model.apply(vs, x, deterministic=True)
    np.testing.assert_allclose(
        np.asarray(other.class_queries_logits),
        np.asarray(base.class_queries_logits),
        atol=5e-5,
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(other.masks_queries_logits),
        np.asarray(base.masks_queries_logits),
        atol=5e-5,
        rtol=1e-5,
    )


@pytest.mark.slow  # second full-model compile (~60 s) — fast-suite budget
def test_bf16_forward_tracks_f32(monkeypatch):
    """Mixed-precision policy bound (ADVICE r3): the bf16 forward (params +
    activations cast to bfloat16, exactly what bench.py and the Trainer's
    bf16 mode run) must track the f32 forward within a stated model-level
    bound, so future changes can't silently widen the bf16 path's deviation.
    Random tiny weights are the WORST case for this ratio (near-zero logits:
    weak signal under fixed bf16 noise, plus E-DSAM/masked-attention
    thresholds flip pixels discretely, so max-abs is not a usable metric);
    measured relative-RMS on this config: class 0.072, masks 0.166 — bounds
    carry ~50% headroom over that floor."""
    cfg, model, x, variables = _make("0.4.0")
    f32 = model.apply(variables, x, deterministic=True)
    bf16_vars = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, variables
    )
    bf16 = model.apply(bf16_vars, x.astype(jnp.bfloat16), deterministic=True)

    def rel_rms(a, b):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        return float(np.sqrt(((a - b) ** 2).mean()) / np.sqrt((a**2).mean()))

    cls = rel_rms(f32.class_queries_logits, bf16.class_queries_logits)
    msk = rel_rms(f32.masks_queries_logits, bf16.masks_queries_logits)
    assert cls < 0.12, cls
    assert msk < 0.25, msk
    # and the bf16 path must not silently promote: outputs stay bf16
    assert bf16.class_queries_logits.dtype == jnp.bfloat16
