"""End-to-end TRAINING-LOOP differential vs the reference's actual torch
trainer (VERDICT r3 #2 — the last accuracy proof available offline).

Both sides run the REAL training stack, not isolated pieces:
- torch side: the reference's `CustomMask2FormerForUniversalSegmentation`
  (custom_model.py:45-54, version 0.4.0 = flagship E-DSAM + DSAM + DGGM)
  trained by the actual HF `transformers.Trainer` — the exact object
  finetuning.py:98-117 uses (AdamW + linear-warmup schedule + global-norm
  clipping + decay-parameter exclusion + BN running-stat updates).
- jax side: `rgbdseg_tpu.train.Trainer` from identical initial weights
  (converted via utils/hf_convert.convert_custom_mask2former) on the same
  batches in the same order (captured from the HF dataloader's collate).

The criterion is stochastic (point sampling) on both sides, so both are fed
the same deterministic coordinates, keyed by the sampled point count:
torch.rand and rgbdseg_tpu.ops.losses._uniform both return a fixed base array
broadcast over leading dims. Per-box (torch) vs per-slot (jax) layouts then
agree without needing the Hungarian indices, because every box/slot gets the
SAME coordinate set; the per-call scripted-queue differential in
test_criterion_hf.py already pins the layouts against each other with
distinct coordinates.

What this pins that nothing else does: the optimizer-step semantics end to
end — AdamW bias correction, HF's warmup-step rounding (math.ceil — caught
an int() truncation in our schedule), the weight-decay mask (biases +
LayerNorm excluded, BN/GroupNorm scales INCLUDED, Swin's
relative_position_bias_table excluded by HF's r"bias" regex), global-norm
clipping, torch's UNBIASED BatchNorm running-var update (caught flax's
biased update; see models.fusion.TorchBatchNorm), and the loss layer
weighting across 20 coupled steps (flagship 0.4.0) / 12 steps each for
0.1.1 (dual-backbone + FeatureFuser + DSAM), 0.3.0 (backbone-driven
RatioPredictor + DGGM residual) and 0.2.0 (9-channel CSF, DSAM driven by
fused depth — the reference forward's default else branch), covering every
fusion family the version registry trains through; plus the
eval protocol — both stacks' final predictions post-processed by their own
stacks and scored by the same in-repo mAP metric.

Marked slow: 20 torch CPU train steps + jax CPU compiles of the train step
at embed_dim 96, twice (one per version).
"""

from __future__ import annotations

import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

if "/root/reference" not in sys.path:
    sys.path.insert(0, "/root/reference")

refcm = pytest.importorskip("mask2former.utils.custom_model")

from rgbdseg_tpu.config import ModelConfig, SwinConfig
from rgbdseg_tpu.data.pipeline import Batch
from rgbdseg_tpu.ops import losses
from rgbdseg_tpu.train.arguments import TrainingArguments
from rgbdseg_tpu.train.trainer import Trainer
from rgbdseg_tpu.utils import hf_convert

B, T, L, Q = 2, 4, 5, 10  # batch, padded target slots, classes, queries
H = W = 64
P = 16  # train_num_points
S = int(P * 3.0)  # oversampled (48)
R = P - int(0.75 * P)  # random remainder (4)
N_STEPS = 20  # coupled optimizer steps for the flagship differential (r4 #4)
LR, WD = 1e-3, 0.05  # WD > 0 so the decay mask is actually exercised
WARMUP_RATIO = 0.34  # ceil-rounding sensitive: ceil(20*0.34)=7 (int() gives 6)
VERSION = "0.4.0"
# input channel count per exercised version (0.1.1 = RGB+depth dual-backbone
# + FeatureFuser + DSAM — covers dual-Swin and fuser gradients the flagship
# path never touches; reference custom_model.py:88-93)
CHANNELS = {"0.4.0": 10, "0.1.1": 6, "0.3.0": 10, "0.2.0": 9, "0.0.7": 4}


def _my_cfg(version: str = VERSION) -> ModelConfig:
    # embed_dim must be 96: the reference's fusion modules hardcode the
    # Swin-T channel ladder (custom_model.py:127-137 DSAModule(96,192)...).
    return ModelConfig(
        backbone=SwinConfig(
            embed_dim=96, depths=(1, 1, 1, 1), num_heads=(2, 2, 4, 4), drop_path_rate=0.0
        ),
        num_labels=L,
        feature_size=64,
        mask_feature_size=64,
        encoder_layers=1,
        encoder_feedforward_dim=64,
        hidden_dim=64,
        num_queries=Q,
        decoder_layers=4,
        num_attention_heads=4,
        dim_feedforward=64,
        train_num_points=P,
        version=version,
    )


def _hf_cfg():
    from transformers import Mask2FormerConfig, SwinConfig as HFSwin

    backbone = HFSwin(
        image_size=64,
        patch_size=4,
        embed_dim=96,
        depths=[1, 1, 1, 1],
        num_heads=[2, 2, 4, 4],
        window_size=7,
        drop_path_rate=0.0,
        out_features=["stage1", "stage2", "stage3", "stage4"],
    )
    return Mask2FormerConfig(
        backbone_config=backbone,
        feature_size=64,
        mask_feature_size=64,
        hidden_dim=64,
        encoder_layers=1,
        encoder_feedforward_dim=64,
        decoder_layers=4,
        num_attention_heads=4,
        dim_feedforward=64,
        num_queries=Q,
        num_labels=L,
        dropout=0.0,
        train_num_points=P,
        oversample_ratio=3.0,
        importance_sample_ratio=0.75,
        class_weight=2.0,
        mask_weight=5.0,
        dice_weight=5.0,
        no_object_weight=0.1,
    )


# --------------------------------------------------------------------------
# Shared deterministic point coordinates, keyed by point count (P/S/R are
# pairwise distinct so the key is unambiguous).
# --------------------------------------------------------------------------
_rs = np.random.RandomState(123)
_BASE = {
    P: _rs.rand(P, 2).astype(np.float32),
    S: _rs.rand(S, 2).astype(np.float32),
    R: _rs.rand(R, 2).astype(np.float32),
}


def _coords(shape):
    if len(shape) < 2 or shape[-1] != 2:
        return None
    base = _BASE.get(shape[-2])
    if base is None:
        return None
    return np.broadcast_to(base, tuple(shape)).copy()


class _PatchedTorchRand:
    def __init__(self):
        self.orig = torch.rand
        self.unmatched = []

    def __call__(self, *raw, **kw):
        shape = tuple(raw[0]) if len(raw) == 1 and isinstance(raw[0], (tuple, list)) else raw
        c = _coords(shape)
        if c is None:
            # e.g. the decoder's layerdrop draw, torch.rand([]) at
            # modeling_mask2former.py:1873 — layerdrop is 0.0 here so the
            # value is never acted on; pass the ORIGINAL args through.
            self.unmatched.append(shape)
            return self.orig(*raw, **kw)
        t = torch.from_numpy(c)
        if kw.get("device") is not None:
            t = t.to(kw["device"])
        if kw.get("dtype") is not None:
            t = t.to(kw["dtype"])
        return t


def _make_items(n_steps: int = N_STEPS, channels: int = 10):
    rs = np.random.RandomState(0)
    items = []
    for i in range(n_steps * B):
        px = rs.rand(channels, H, W).astype(np.float32)  # CHW channel stack
        n = int(rs.randint(2, T))
        masks = np.zeros((n, H, W), np.float32)
        classes = rs.randint(0, L, (n,)).astype(np.int64)
        for j in range(n):
            y0, x0 = rs.randint(0, H - 24), rs.randint(0, W - 24)
            hh, ww = 12 + rs.randint(12), 12 + rs.randint(12)
            masks[j, y0 : y0 + hh, x0 : x0 + ww] = 1.0
        items.append(
            {"idx": i, "pixel_values": px, "mask_labels": masks, "class_labels": classes}
        )
    return items


class _TorchDS(torch.utils.data.Dataset):
    def __init__(self, items):
        self.items = items

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        it = self.items[i]
        return {
            "_idx": it["idx"],
            "pixel_values": torch.from_numpy(it["pixel_values"]),
            "mask_labels": torch.from_numpy(it["mask_labels"]),
            "class_labels": torch.from_numpy(it["class_labels"]),
        }


def _run_torch(items, tmp_path, version: str = VERSION):
    """Reference model + the actual HF Trainer; returns (initial state_dict,
    final state_dict, per-step losses, captured batch order, model)."""
    torch.manual_seed(0)
    model = refcm.CustomMask2FormerForUniversalSegmentation(_hf_cfg(), version=version)
    # The custom model replaces `self.model` AFTER super().__init__'s
    # post_init() ran (custom_model.py:49-53), so HF's _init_weights never
    # touches the replacement — in particular the pixel decoder's raw
    # `nn.Parameter(torch.Tensor(...))` level_embed stays UNINITIALIZED
    # MEMORY (observed 5e31; it saturates the deformable-attention path to
    # zero gradient). The reference never sees this because from_pretrained
    # overwrites every weight; replicate the documented init here
    # (modeling_mask2former.py:2143: nn.init.normal_(level_embed, std=0)).
    with torch.no_grad():
        model.model.pixel_level_module.decoder.level_embed.zero_()
    init_sd = {k: v.detach().clone() for k, v in model.state_dict().items()}

    order = []

    def collate(examples):
        order.append([int(e.pop("_idx")) for e in examples])
        return {
            "pixel_values": torch.stack([e["pixel_values"] for e in examples]),
            "class_labels": [e["class_labels"] for e in examples],
            "mask_labels": [e["mask_labels"] for e in examples],
        }

    step_losses = []

    class Rec(transformers.Trainer):
        def compute_loss(self, model, inputs, return_outputs=False, **kw):
            out = super().compute_loss(model, inputs, return_outputs=return_outputs, **kw)
            loss = out[0] if return_outputs else out
            step_losses.append(float(loss.detach()))
            return out

    targs = transformers.TrainingArguments(
        output_dir=str(tmp_path / "hf"),
        num_train_epochs=1,
        per_device_train_batch_size=B,
        learning_rate=LR,
        weight_decay=WD,
        warmup_ratio=WARMUP_RATIO,
        max_grad_norm=1.0,
        seed=0,
        report_to=[],
        logging_strategy="no",
        save_strategy="no",
        optim="adamw_torch",
        use_cpu=True,
        dataloader_num_workers=0,
        remove_unused_columns=False,
    )
    trainer = Rec(
        model=model, args=targs, train_dataset=_TorchDS(items), data_collator=collate
    )
    patched = _PatchedTorchRand()
    torch.rand = patched
    try:
        trainer.train()
    finally:
        torch.rand = patched.orig
    # Any unmatched NON-scalar torch.rand call inside the model would break
    # determinism; the only expected unmatched draws are the decoder's
    # scalar layerdrop probes (never acted on at layerdrop=0.0).
    assert all(s == () for s in patched.unmatched), patched.unmatched
    final_sd = {k: v.detach().clone() for k, v in model.state_dict().items()}
    return init_sd, final_sd, step_losses, order, model


def _capture_batch(items, idxs) -> Batch:
    px = np.stack([items[i]["pixel_values"].transpose(1, 2, 0) for i in idxs])
    masks = np.zeros((B, T, H, W), np.float32)
    classes = np.zeros((B, T), np.int32)
    valid = np.zeros((B, T), bool)
    for r, i in enumerate(idxs):
        n = items[i]["mask_labels"].shape[0]
        masks[r, :n] = items[i]["mask_labels"]
        classes[r, :n] = items[i]["class_labels"]
        valid[r, :n] = True
    return Batch(
        pixel_values=px, mask_labels=masks, class_labels=classes, valid=valid, orig_sizes=None
    )


def _run_ours(items, order, init_sd, tmp_path, monkeypatch, version: str = VERSION):
    """Our Trainer from the converted init weights on the captured batches."""
    cfg = _my_cfg(version)
    sd_np = {k: v.numpy() for k, v in init_sd.items()}
    params, _ = hf_convert.convert_custom_mask2former(sd_np, cfg)

    step_batches = [_capture_batch(items, idxs) for idxs in order]

    class _ListDS:
        """One captured global batch per 'epoch': num_train_epochs=N_STEPS
        then yields exactly the HF dataloader's sequence, and the schedule's
        total_steps (steps_per_epoch * epochs = 1 * N_STEPS) matches the HF
        scheduler's num_training_steps."""

        def __len__(self):
            return B

        def batches(self, global_b, shuffle=False, seed=None, epoch=0, num_workers=0, local_rows=None):
            yield step_batches[epoch]

    def fake_uniform(rng, shape):
        c = _coords(shape)
        assert c is not None, shape
        return jnp.asarray(c)

    monkeypatch.setattr(losses, "_uniform", fake_uniform)

    args = TrainingArguments(
        output_dir=str(tmp_path / "ours"),
        num_train_epochs=float(len(order)),
        per_device_train_batch_size=B,
        learning_rate=LR,
        weight_decay=WD,
        warmup_ratio=WARMUP_RATIO,
        max_grad_norm=1.0,
        seed=0,
        do_eval=False,
        save_strategy="no",
        num_devices=1,
        dataloader_num_workers=0,
        bf16=False,
    )
    tr = Trainer(cfg, args, _ListDS(), None, {i: str(i) for i in range(L)}, pretrained_params=params)
    tr.train()
    j_losses = [e["loss"] for e in tr.log_history if "loss" in e]
    return tr, j_losses


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def _schedule_sum_lr(n_steps: int) -> float:
    """Sum of the HF linear-warmup/linear-decay schedule over the run — the
    Adam per-coordinate walk ceiling used by the final-param bound."""
    import math

    warm = math.ceil(WARMUP_RATIO * n_steps)
    return LR * sum(
        (s / warm) if s < warm else (n_steps - s) / max(n_steps - warm, 1)
        for s in range(n_steps)
    )


def _map_score_ours(tr, batch, cfg):
    """Score OUR model's predictions on `batch` with the in-repo metric."""
    import jax
    import jax.numpy as jnp_

    from rgbdseg_tpu.inference.postprocess import post_process_instance_segmentation
    from rgbdseg_tpu.models.mask2former import Mask2FormerRGBD

    m = Mask2FormerRGBD(cfg)
    variables = {"params": tr.params}
    bs = jax.device_get(tr.batch_stats)
    if jax.tree_util.tree_leaves(bs):
        variables["batch_stats"] = bs
    out = jax.jit(lambda v, x: m.apply(v, x, deterministic=True))(
        variables, jnp_.asarray(batch.pixel_values)
    )
    results = post_process_instance_segmentation(
        np.asarray(out.class_queries_logits),
        np.asarray(out.masks_queries_logits),
        threshold=0.0,
        target_sizes=[(H, W)] * B,
        return_binary_maps=True,
    )
    return _score_results(results, batch)


def _score_results(results, batch):
    from rgbdseg_tpu.train.map_metric import MeanAveragePrecision

    metric = MeanAveragePrecision(class_metrics=False)
    preds, targets = [], []
    for i, res in enumerate(results):
        info = res["segments_info"]
        preds.append(
            {
                "scores": np.asarray([s["score"] for s in info], np.float32),
                "labels": np.asarray([s["label_id"] for s in info], np.int64),
                "masks": np.asarray(res["segmentation"]).astype(bool),
            }
        )
        valid = batch.valid[i]
        targets.append(
            {
                "labels": batch.class_labels[i][valid].astype(np.int64),
                "masks": batch.mask_labels[i][valid].astype(bool),
            }
        )
    metric.update(preds, targets)
    return float(metric.compute()["map"])


def _map_score_torch(model, batch):
    """Score the TORCH model's predictions (post-processed by the reference's
    own HF image processor, model_essential_part.py:113-157 protocol) with
    the same in-repo metric."""
    from transformers import Mask2FormerImageProcessor

    model.eval()
    with torch.no_grad():
        out = model(torch.from_numpy(batch.pixel_values.transpose(0, 3, 1, 2)))
    proc = Mask2FormerImageProcessor()
    results = proc.post_process_instance_segmentation(
        out, threshold=0.0, target_sizes=[(H, W)] * B, return_binary_maps=True
    )
    conv = [
        {
            "segments_info": r["segments_info"],
            "segmentation": r["segmentation"].numpy(),
        }
        for r in results
    ]
    return _score_results(conv, batch)


@pytest.mark.parametrize(
    "version,n_steps",
    [
        ("0.4.0", N_STEPS),  # flagship, 20 coupled steps
        ("0.1.1", 12),  # dual-backbone + FeatureFuser + DSAM training paths
        ("0.3.0", 12),  # backbone-driven RatioPredictor + DGGM-residual paths
        ("0.2.0", 12),  # CSF 9-channel: DSAM driven by fused depth (ref else branch)
        ("0.0.7", 12),  # in-forward intrinsics→normals: detached + AdamW-skipped params
    ],
)
def test_training_loop_matches_reference(tmp_path, monkeypatch, version, n_steps):
    items = _make_items(n_steps, CHANNELS[version])
    init_sd, final_sd, t_losses, order, t_model = _run_torch(items, tmp_path, version)
    assert len(t_losses) == n_steps and len(order) == n_steps

    tr, j_losses = _run_ours(items, order, init_sd, tmp_path, monkeypatch, version)
    assert len(j_losses) == n_steps

    # Per-step losses: fwd parity at this scale is O(1e-4) relative at step 0
    # and drifts as Adam's sign-like steps amplify f32 gradient noise on
    # near-zero-gradient coordinates — the per-coordinate walk-apart ceiling
    # is 2*sum(lr_t) (see below), and its effect on the LOSS compounds over
    # the horizon. Measured profile (2026-08-21, this box): tight (<2e-3 rel)
    # through step 5, then growing to a worst of ~4.3e-2 by step 15 of the
    # 20-step 0.4.0 run — consistent with ANY two Adam runs separated by one
    # ulp, not a semantics gap. The envelope below (5e-3 early, 6e-2 late)
    # still catches semantics bugs: a wrong decay mask / schedule / clipping
    # moves the loss far beyond it within a few steps (removing the decay-
    # mask fix was measured to trip the 6-step bound in r4).
    # The sharp late-horizon checks are the final-PARAM Adam ceiling and the
    # scored-mAP comparison, not the loss trajectory.
    for step, (ours, ref) in enumerate(zip(j_losses, t_losses)):
        bound = 5e-3 if step < 6 else 6e-2
        assert abs(ours - ref) < bound * max(1.0, abs(ref)), (
            step,
            ours,
            ref,
            t_losses,
            j_losses,
        )

    # Final parameters: convert the torch side's trained weights and compare
    # leaf by leaf against our trained masters. The bound is the Adam
    # step-size ceiling, not float noise: Adam's update is ~sign(g)*lr_t per
    # coordinate once moments warm up, so a coordinate whose tiny gradient
    # flips sign between the two implementations (f32 reduction-order noise
    # around zero) walks apart by up to 2*sum_t(lr_t) — a property of ANY
    # two Adam runs differing by one ulp, not a semantics gap. Semantics bugs
    # this still catches: a wrong decay mask / schedule / clipping moves
    # every coordinate of the affected tensors beyond the ceiling within a
    # few steps (removing the decay-mask fix trips it). Measured profile at
    # 6 steps: max 3.8e-3, median 1.5e-4 against sum_lr = 3e-3.
    sum_lr = _schedule_sum_lr(n_steps)
    cfg = _my_cfg(version)
    ref_params, ref_bs = hf_convert.convert_custom_mask2former(
        {k: v.numpy() for k, v in final_sd.items()}, cfg
    )
    import jax

    ours_flat = _flatten(jax.device_get(jax.tree.map(np.asarray, dict(tr.params))))
    ref_flat = _flatten(ref_params)
    assert set(ours_flat) == set(ref_flat)
    diffs = np.array(
        [float(np.max(np.abs(ours_flat[k] - ref_flat[k]))) for k in sorted(ref_flat)]
    )
    assert diffs.max() < 2.0 * sum_lr, (diffs.max(), sum_lr)
    # the typical (median) coordinate walks apart far slower than the
    # ceiling — measured 5% of sum_lr at 6 steps, 11% at 20 steps
    assert np.median(diffs) < 0.2 * sum_lr, (float(np.median(diffs)), sum_lr)

    if version == "0.0.7":
        # The intrinsics predictor is reference-FROZEN: its grads are always
        # None in torch (numpy normals boundary), so torch AdamW skips it —
        # no Adam step, no weight decay. Our side must freeze it identically
        # (optax.masked set_to_zero in the Trainer), i.e. the trained values
        # equal torch's final values EXACTLY, not just within the Adam
        # ceiling — this catches both a missing stop_gradient and a
        # decay-despite-zero-grad divergence, which the generic bound above
        # is too loose to see.
        intr = [k for k in ref_flat if "intrinsics_predictor" in k]
        assert intr
        for k in intr:
            np.testing.assert_array_equal(ours_flat[k], ref_flat[k], err_msg=k)

    # BatchNorm running stats followed torch's (unbiased-var) update chain.
    if ref_bs:
        ours_bs = _flatten(jax.device_get(jax.tree.map(np.asarray, dict(tr.batch_stats))))
        ref_bs_flat = _flatten(ref_bs)
        assert set(ours_bs) == set(ref_bs_flat)
        worst_bs = max(
            (float(np.max(np.abs(ours_bs[k] - ref_bs_flat[k]))), k) for k in ref_bs_flat
        )
        assert worst_bs[0] < 5e-3, worst_bs

    # Eval-protocol comparison (r4 #4): post-process BOTH stacks' final
    # predictions (ours: inference/postprocess; torch: the reference's own HF
    # image processor) on the same batch and score them with the SAME
    # in-repo metric (itself differentially pinned against the COCOeval
    # oracle in test_map_differential.py). The two trained models are
    # 2*sum_lr-close, so their scored mAP must agree tightly — this closes
    # the train -> predict -> score loop end to end.
    eval_batch = _capture_batch(items, list(range(B)))
    map_ours = _map_score_ours(tr, eval_batch, cfg)
    map_torch = _map_score_torch(t_model, eval_batch)
    assert abs(map_ours - map_torch) < 0.02, (map_ours, map_torch)


@pytest.mark.parametrize("version", ["0.4.0", "0.1.1", "0.3.0", "0.2.0", "0.0.7"])
def test_step0_gradients_match_reference(tmp_path, monkeypatch, version):
    """Amplification-free backward differential: one forward+backward from
    identical init on an identical batch, comparing the FULL gradient trees
    (every conversion is an index permutation / reshape / concat, so torch
    grads convert through the same weight mapping). This pins the backward
    pass itself; the loop test above then attributes any trajectory gap to
    optimizer semantics rather than gradients. 0.1.1 adds the dual-Swin
    depth encoder + FeatureFuser gradients (reference custom_model.py:88-93)."""
    items = _make_items(1, CHANNELS[version])
    torch.manual_seed(0)
    model = refcm.CustomMask2FormerForUniversalSegmentation(_hf_cfg(), version=version)
    with torch.no_grad():
        model.model.pixel_level_module.decoder.level_embed.zero_()
    model.train()
    idxs = [0, 1]
    px = torch.stack([torch.from_numpy(items[i]["pixel_values"]) for i in idxs])
    ml = [torch.from_numpy(items[i]["mask_labels"]) for i in idxs]
    cl = [torch.from_numpy(items[i]["class_labels"]) for i in idxs]
    patched = _PatchedTorchRand()
    torch.rand = patched
    try:
        out = model(pixel_values=px, mask_labels=ml, class_labels=cl)
        out.loss.backward()
    finally:
        torch.rand = patched.orig
    t_loss = float(out.loss.detach())
    pgrads = {
        k: p.grad.detach().numpy() if p.grad is not None else np.zeros(tuple(p.shape), np.float32)
        for k, p in model.named_parameters()
    }
    # buffers (BN running stats) fill the non-param slots so the converter
    # sees a complete state-dict-shaped tree; only params are compared.
    gsd = {k: pgrads.get(k, v.detach().numpy()) for k, v in model.state_dict().items()}

    import jax
    import jax.numpy as jnp

    from rgbdseg_tpu.models.mask2former import Mask2FormerRGBD
    from rgbdseg_tpu.ops.losses import mask2former_loss

    cfg = _my_cfg(version)
    g_ref, _ = hf_convert.convert_custom_mask2former(gsd, cfg)
    init_params, _ = hf_convert.convert_custom_mask2former(
        {k: v.detach().numpy() for k, v in model.state_dict().items()}, cfg
    )
    monkeypatch.setattr(losses, "_uniform", lambda rng, shape: jnp.asarray(_coords(shape)))
    m = Mask2FormerRGBD(cfg)
    variables = jax.jit(m.init)(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, H, W, CHANNELS[version]), jnp.float32)
    )
    bs0 = variables.get("batch_stats", {})
    pxj = jnp.asarray(np.stack([items[i]["pixel_values"].transpose(1, 2, 0) for i in idxs]))
    masks = np.zeros((B, T, H, W), np.float32)
    classes = np.zeros((B, T), np.int32)
    valid = np.zeros((B, T), bool)
    for r, i in enumerate(idxs):
        n = items[i]["mask_labels"].shape[0]
        masks[r, :n] = items[i]["mask_labels"]
        classes[r, :n] = items[i]["class_labels"]
        valid[r, :n] = True

    def loss_fn(p):
        o, _ = m.apply(
            {"params": p, "batch_stats": bs0},
            pxj,
            deterministic=False,
            mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(1), "droppath": jax.random.PRNGKey(2)},
        )
        total, _ = mask2former_loss(
            cfg, o, jnp.asarray(masks), jnp.asarray(classes), jnp.asarray(valid), jax.random.PRNGKey(3)
        )
        return total

    j_loss, grads = jax.jit(jax.value_and_grad(loss_fn))(init_params)
    # measured 1.4e-3 rel: train-mode BN + the masked-attention threshold
    # flips at random init (see the gradient-bound comment below)
    assert abs(float(j_loss) - t_loss) < 4e-3 * max(1.0, abs(t_loss)), (float(j_loss), t_loss)

    gj = _flatten(jax.device_get(grads))
    gr = _flatten(g_ref)
    assert set(gj) == set(gr)
    # global gradient norm (what clipping sees): measured rel diff 3.0e-4
    nt = np.sqrt(sum(float((v.astype(np.float64) ** 2).sum()) for v in gr.values()))
    nj = np.sqrt(sum(float((v.astype(np.float64) ** 2).sum()) for v in gj.values()))
    assert abs(nt - nj) < 2e-3 * nt, (nt, nj)
    # Per-leaf: max abs diff relative to the leaf's own gradient scale. The
    # bound is NOT float noise: the masked-attention decoder binarizes the
    # previous layer's mask probabilities at 0.5, and at random init every
    # sigmoid input is ~0 so probs hover AT the threshold — boolean
    # attention-mask pixels legitimately flip between implementations under
    # one-ulp forward differences, discretely changing later layers' q/k
    # gradients (measured worst: 9.2e-2 on a decoder q_proj; diagnosed by
    # verifying all four layers' Hungarian assignments agree exactly while
    # q/k grads still differed — trained networks polarize away from the
    # threshold, random init is the worst case). Semantics bugs (wrong loss
    # weighting, wrong layer wiring) blow far past 0.25; the tree-wide
    # median pins the noise floor.
    rels = sorted(
        float(np.max(np.abs(gj[k] - gr[k]))) / (1e-4 + float(np.max(np.abs(gr[k]))))
        for k in gr
    )
    assert rels[-1] < 0.25, rels[-5:]
    assert rels[len(rels) // 2] < 1e-2, rels[len(rels) // 2]
