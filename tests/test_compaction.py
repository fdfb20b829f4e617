"""Target compaction (data/pipeline.compact_targets): slicing padded instance
slots to the per-batch real bucket must not change the criterion.

The criterion's point-sampling cost is linear in the padded slot count T
(PERF.md max_instances sweep), and the reference pays only for REAL instances
(ragged target lists, reference dataloader.py:772-780). compact_targets
restores that scaling for the static-shape TPU criterion by slicing each host
batch to a power-of-two bucket covering its real max count.

Invariance argument being pinned here: padding rows enter the Hungarian with a
uniform cost (cannot change real-row assignments — ops/matcher.py), contribute
zero to num_masks and the point losses (valid-masked), and their class-loss
scatter writes the no-object label the fill already carries. The only
RNG-stream dependence on T is the point-coordinate draw shape, so the tests
inject slot-stable coordinates (the same per-slot values at any T) through
the `losses._uniform` indirection and require EXACT loss equality.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rgbdseg_tpu.config import ModelConfig
from rgbdseg_tpu.data.pipeline import compact_targets
from rgbdseg_tpu.ops import losses


# ---------------------------------------------------------------------------
# compact_targets host-side semantics
# ---------------------------------------------------------------------------


def test_compact_packs_and_buckets():
    rs = np.random.RandomState(0)
    b, t, h, w = 3, 40, 8, 8
    masks = rs.rand(b, t, h, w).astype(np.float32)
    classes = rs.randint(0, 5, (b, t)).astype(np.int32)
    valid = np.zeros((b, t), bool)
    valid[0, [0, 3, 5]] = True  # scattered slots (not pre-packed)
    valid[1, [2, 7, 11, 30, 35, 36, 37, 38, 39]] = True  # max real count 9
    valid[2, [39]] = True
    mk, cl, vd = compact_targets(masks, classes, valid)
    # bucket: floor 8, doubled to cover 9 -> 16
    assert mk.shape == (b, 16, h, w) and cl.shape == (b, 16) and vd.shape == (b, 16)
    for i in range(b):
        got = {(int(cl[i, j]), mk[i, j].tobytes()) for j in range(16) if vd[i, j]}
        want = {(int(classes[i, j]), masks[i, j].tobytes()) for j in range(t) if valid[i, j]}
        assert got == want
        nv = int(valid[i].sum())
        assert vd[i, :nv].all() and not vd[i, nv:].any()  # packed valid-first


def test_compact_preserves_packed_order():
    """Pre-packed batches (the pipeline's normal output) keep slot order —
    compaction is then a pure slice, no permutation."""
    rs = np.random.RandomState(1)
    b, t = 2, 32
    masks = rs.rand(b, t, 4, 4).astype(np.float32)
    classes = rs.randint(0, 5, (b, t)).astype(np.int32)
    valid = np.zeros((b, t), bool)
    valid[0, :3] = True
    valid[1, :7] = True
    mk, cl, vd = compact_targets(masks, classes, valid)
    assert mk.shape[1] == 8
    np.testing.assert_array_equal(mk, masks[:, :8])
    np.testing.assert_array_equal(cl, classes[:, :8])
    np.testing.assert_array_equal(vd, valid[:, :8])


def test_compact_noop_when_bucket_covers_t():
    rs = np.random.RandomState(2)
    masks = rs.rand(2, 6, 4, 4).astype(np.float32)
    classes = rs.randint(0, 5, (2, 6)).astype(np.int32)
    valid = np.ones((2, 6), bool)
    mk, cl, vd = compact_targets(masks, classes, valid)  # floor 8 >= t=6
    assert mk is masks and cl is classes
    # all slots real at t: bucket == t, unchanged
    mk, cl, vd = compact_targets(masks, classes, valid, min_bucket=2)
    assert mk.shape[1] == 6


def test_compact_empty_batch():
    masks = np.zeros((2, 12, 4, 4), np.float32)
    classes = np.zeros((2, 12), np.int32)
    valid = np.zeros((2, 12), bool)
    mk, cl, vd = compact_targets(masks, classes, valid, min_bucket=2)
    assert mk.shape[1] == 2 and not vd.any()


# ---------------------------------------------------------------------------
# criterion invariance with slot-stable injected coordinates
# ---------------------------------------------------------------------------

_MASTER = np.random.RandomState(7).rand(2, 8, 256, 2).astype(np.float32)


def _slot_stable_uniform(rng, shape):
    """Deterministic coords depending only on (slot, point) index: the first
    n slots of a (b, n, s, 2) draw coincide for every n, so a compacted and a
    full-T criterion sample the identical points per real instance."""
    if len(shape) == 3:  # match(): (B, P, 2), T-independent
        return jnp.asarray(_MASTER[: shape[0], 0, : shape[1], :])
    b, n, s, _ = shape
    return jnp.asarray(_MASTER[:b, :n, :s, :])


@pytest.fixture
def crit_data():
    cfg = ModelConfig.tiny(num_labels=5)  # Q=10, P=64 -> S=192 <= 256
    rs = np.random.RandomState(3)
    b, q, t, h, w = 2, cfg.num_queries, 8, 12, 16
    cls_logits = rs.randn(b, q, cfg.num_labels + 1).astype(np.float32)
    msk_logits = rs.randn(b, q, h, w).astype(np.float32)
    tgt_masks = np.zeros((b, t, h, w), np.float32)
    tgt_classes = np.zeros((b, t), np.int32)
    valid = np.zeros((b, t), bool)
    for i, n in enumerate((2, 1)):
        valid[i, :n] = True
        tgt_classes[i, :n] = rs.randint(0, cfg.num_labels, n)
        for j in range(n):
            y0, x0 = rs.randint(0, h - 4), rs.randint(0, w - 6)
            tgt_masks[i, j, y0 : y0 + 4, x0 : x0 + 6] = 1.0
    return cfg, cls_logits, msk_logits, tgt_masks, tgt_classes, valid


def test_match_invariant_under_compaction(crit_data, monkeypatch):
    cfg, cls_logits, msk_logits, tgt_masks, tgt_classes, valid = crit_data
    monkeypatch.setattr(losses, "_uniform", _slot_stable_uniform)
    rng = jax.random.PRNGKey(0)
    full = losses.match(
        cfg,
        jnp.asarray(cls_logits),
        jnp.asarray(msk_logits),
        jnp.asarray(tgt_masks),
        jnp.asarray(tgt_classes),
        jnp.asarray(valid),
        rng,
    )
    mk, cl, vd = compact_targets(tgt_masks, tgt_classes, valid, min_bucket=2)
    assert mk.shape[1] == 2
    comp = losses.match(
        cfg,
        jnp.asarray(cls_logits),
        jnp.asarray(msk_logits),
        jnp.asarray(mk),
        jnp.asarray(cl),
        jnp.asarray(vd),
        rng,
    )
    full, comp = np.asarray(full), np.asarray(comp)
    for i in range(valid.shape[0]):
        nv = int(valid[i].sum())
        np.testing.assert_array_equal(full[i, :nv], comp[i, :nv])


def test_criterion_loss_invariant_under_compaction(crit_data, monkeypatch):
    cfg, cls_logits, msk_logits, tgt_masks, tgt_classes, valid = crit_data
    monkeypatch.setattr(losses, "_uniform", _slot_stable_uniform)

    class Out:
        aux_class_logits = [jnp.asarray(cls_logits) * 0.5]
        aux_mask_logits = [jnp.asarray(msk_logits) * 0.5]
        class_queries_logits = jnp.asarray(cls_logits)
        masks_queries_logits = jnp.asarray(msk_logits)

    def run(mk, cl, vd):
        total, per_layer = losses.mask2former_loss(
            cfg,
            Out(),
            jnp.asarray(mk),
            jnp.asarray(cl),
            jnp.asarray(vd),
            jax.random.PRNGKey(5),
        )
        return float(total), {k: np.asarray(v) for k, v in per_layer.items()}

    t_full = run(tgt_masks, tgt_classes, valid)
    mk, cl, vd = compact_targets(tgt_masks, tgt_classes, valid, min_bucket=2)
    t_comp = run(mk, cl, vd)
    assert abs(t_full[0] - t_comp[0]) < 1e-5 * max(1.0, abs(t_full[0]))
    for k in t_full[1]:
        np.testing.assert_allclose(t_full[1][k], t_comp[1][k], rtol=1e-5, atol=1e-6)


def test_criterion_scales_with_bucket_not_padding(crit_data, monkeypatch):
    """The point-sampling work after compaction is sized by the bucket: the
    compacted coordinate draws must have the bucket's slot count (this is the
    cost model — the T-linear (B, T, S) sampling shrinks to (B, bucket, S))."""
    cfg, cls_logits, msk_logits, tgt_masks, tgt_classes, valid = crit_data
    seen = []

    def spy(rng, shape):
        seen.append(tuple(shape))
        return _slot_stable_uniform(rng, shape)

    monkeypatch.setattr(losses, "_uniform", spy)
    mk, cl, vd = compact_targets(tgt_masks, tgt_classes, valid, min_bucket=2)
    losses.layer_losses(
        cfg,
        jnp.asarray(cls_logits),
        jnp.asarray(msk_logits),
        jnp.asarray(mk),
        jnp.asarray(cl),
        jnp.asarray(vd),
        jax.random.PRNGKey(1),
        num_masks=jnp.float32(3.0),
    )
    slot_draws = [s for s in seen if len(s) == 4]
    assert slot_draws and all(s[1] == 2 for s in slot_draws)
