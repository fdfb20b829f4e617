"""End-to-end training harness test: overfit the synthetic fixture.

Mirrors the reference's experimental methodology (SURVEY.md §4): fixed seed,
tiny dataset, assert the loss drops and the full save/resume/eval/export cycle
works. Uses the tiny model config to keep CPU compile time bounded.
"""

import json
import os

import numpy as np
import pytest

from rgbdseg_tpu.config import ModelConfig, PreprocessConfig
from rgbdseg_tpu.data import synthetic
from rgbdseg_tpu.data.pipeline import SegmentationDataset, load_meta
from rgbdseg_tpu.train.arguments import TrainingArguments
from rgbdseg_tpu.train.trainer import Trainer, save_metrics


@pytest.fixture(scope="module")
def fixture(tmp_path_factory):
    root = tmp_path_factory.mktemp("train_set")
    return synthetic.generate(str(root), num_train=4, num_valid=2, size=(64, 64))


@pytest.fixture(scope="module")
def datasets(fixture):
    pp = PreprocessConfig(height=64, width=64)
    train = SegmentationDataset(load_meta(fixture["train"], fixture["root"]), "0.0.0", pp, max_instances=8)
    valid = SegmentationDataset(load_meta(fixture["valid"], fixture["root"]), "0.0.0", pp, max_instances=8)
    return train, valid


def test_train_eval_save_resume(datasets, tmp_path):
    train_ds, valid_ds = datasets
    out_dir = str(tmp_path / "run")
    cfg = ModelConfig.tiny(num_labels=3, version="0.0.0")
    args = TrainingArguments(
        output_dir=out_dir,
        num_train_epochs=2,
        per_device_train_batch_size=2,
        per_device_eval_batch_size=2,
        learning_rate=5e-4,
        seed=42,
        num_devices=1,
    )
    trainer = Trainer(cfg, args, train_ds, valid_ds, {0: "background", 1: "box", 2: "ball"})
    metrics = trainer.train()
    assert np.isfinite(metrics["train_loss"])
    save_metrics(out_dir, "train", metrics)

    # total_flos recorded like the reference's all_results.json (HF schema):
    # 2 epochs x 2 steps of the same micro step -> 4x the per-step flop count
    assert metrics["total_flos"] > 0
    assert metrics["total_flos"] == trainer._flos_per_micro_step * 4

    # log_history written and parseable by the plot tooling
    assert os.path.exists(os.path.join(out_dir, "trainer_state.json"))
    with open(os.path.join(out_dir, "trainer_state.json")) as f:
        state = json.load(f)
    assert state["total_flos"] == metrics["total_flos"]
    losses = [e["loss"] for e in state["log_history"] if "loss" in e]
    assert len(losses) == 2
    assert losses[-1] < losses[0] * 1.5  # training is not diverging

    eval_entries = [e for e in state["log_history"] if "eval_map" in e]
    assert eval_entries and np.isfinite(eval_entries[-1]["eval_map"])

    # checkpoints exist; resume restores the step counter
    from rgbdseg_tpu.train.checkpoints import find_last_checkpoint

    last = find_last_checkpoint(out_dir)
    assert last is not None

    trainer2 = Trainer(cfg, args, train_ds, valid_ds, {0: "background"})
    first = next(train_ds.batches(2))
    trainer2._init_state(first)
    import jax

    state2 = {
        "params": trainer2.params,
        "opt_state": trainer2.opt_state,
        "batch_stats": trainer2.batch_stats,
        "step": 0,
        "rng": trainer2.rng,
    }
    from rgbdseg_tpu.train.checkpoints import load_checkpoint

    restored = load_checkpoint(last, state2)
    assert int(restored["step"]) == trainer.global_step
    # restored params equal trained params
    t1 = jax.tree.leaves(trainer.params)[0]
    t2 = jax.tree.leaves(restored["params"])[0]
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t2))


def test_bf16_training_step(datasets, tmp_path):
    """args.bf16 mixed precision: f32 masters, bf16 forward, finite f32 loss."""
    train_ds, _ = datasets
    cfg = ModelConfig.tiny(num_labels=3, version="0.0.0")
    args = TrainingArguments(
        output_dir=str(tmp_path / "runbf16"),
        num_train_epochs=1,
        per_device_train_batch_size=2,
        do_eval=False,
        save_strategy="no",
        bf16=True,
        num_devices=1,
    )
    trainer = Trainer(cfg, args, train_ds, None, {})
    first = next(train_ds.batches(2))
    trainer._init_state(first)
    step = trainer._train_step_fn()
    (px, mk, cl, vd), _ = trainer._put(first)
    import jax

    params, opt_state, bs, rng, loss, gnorm = step(
        trainer.params, trainer.opt_state, trainer.batch_stats, trainer.rng, px, mk, cl, vd
    )
    assert np.isfinite(float(loss)) and np.isfinite(float(gnorm))
    # master params stay f32
    assert all(l.dtype == np.float32 for l in jax.tree.leaves(params) if hasattr(l, "dtype"))


def test_multi_device_step_matches_single_device(datasets, tmp_path):
    """Data-parallel parity: one train step on a 4-device mesh produces the
    same loss and updated params as the same global batch on 1 device (XLA
    all-reduces the per-shard grads; conftest provides 8 virtual CPU devices)."""
    train_ds, _ = datasets
    cfg = ModelConfig.tiny(num_labels=3, version="0.0.0")
    first = next(train_ds.batches(4))

    results = {}
    for n in (1, 4):
        args = TrainingArguments(
            output_dir=str(tmp_path / f"run_dp{n}"),
            num_train_epochs=1,
            per_device_train_batch_size=4 // n,
            do_eval=False,
            save_strategy="no",
            seed=42,
            num_devices=n,
        )
        trainer = Trainer(cfg, args, train_ds, None, {})
        trainer._init_state(first)
        step = trainer._train_step_fn()
        (px, mk, cl, vd), _ = trainer._put(first)
        params, _, _, _, loss, _ = step(
            trainer.params, trainer.opt_state, trainer.batch_stats, trainer.rng, px, mk, cl, vd
        )
        results[n] = (float(loss), params)

    assert np.isfinite(results[4][0])
    np.testing.assert_allclose(results[1][0], results[4][0], rtol=2e-4)
    import jax

    l1 = jax.tree.leaves(results[1][1])
    l4 = jax.tree.leaves(results[4][1])
    for a, b in zip(l1, l4):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


@pytest.mark.slow  # compile-heavy: demoted from the fast default suite (VERDICT r2 #9)
def test_tensor_parallel_step_matches_single_device(datasets, tmp_path):
    """dp x mp parity: one train step on a (2, 2) ('data', 'model') mesh with
    Megatron-sharded transformer params (parallel/sharding.py) produces the
    same loss and updated params as 1 device — GSPMD inserts the collectives,
    the math must not change."""
    import jax

    train_ds, _ = datasets
    cfg = ModelConfig.tiny(num_labels=3, version="0.0.0")
    first = next(train_ds.batches(4))

    results = {}
    for n, mp in ((1, 1), (4, 2)):
        args = TrainingArguments(
            output_dir=str(tmp_path / f"run_tp{n}"),
            num_train_epochs=1,
            per_device_train_batch_size=4 // n,
            do_eval=False,
            save_strategy="no",
            seed=42,
            num_devices=n,
            model_parallel_size=mp,
        )
        trainer = Trainer(cfg, args, train_ds, None, {})
        trainer._init_state(first)
        if mp > 1:
            # some transformer kernels actually shard over the model axis
            from jax.sharding import PartitionSpec as P

            specs = jax.tree.leaves(
                jax.tree.map(lambda a: a.sharding.spec, trainer.params),
                is_leaf=lambda x: isinstance(x, P),
            )
            assert any("model" in str(s) for s in specs)
        step = trainer._train_step_fn()
        (px, mk, cl, vd), _ = trainer._put(first)
        params, _, _, _, loss, _ = step(
            trainer.params, trainer.opt_state, trainer.batch_stats, trainer.rng, px, mk, cl, vd
        )
        results[(n, mp)] = (float(loss), params)

    assert np.isfinite(results[(4, 2)][0])
    np.testing.assert_allclose(results[(1, 1)][0], results[(4, 2)][0], rtol=2e-4)
    l1 = jax.tree.leaves(results[(1, 1)][1])
    l2 = jax.tree.leaves(results[(4, 2)][1])
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


@pytest.mark.slow  # compile-heavy: demoted from the fast default suite (VERDICT r2 #9)
def test_gradient_accumulation_matches_mean_gradient(datasets, tmp_path):
    """ga plumbing is exact: two accumulated micro-steps + apply equals one
    AdamW update on the hand-computed mean of the two micro-batch gradients
    (same _loss_grads function, same RNG split chain)."""
    import jax
    import jax.numpy as jnp
    import optax

    train_ds, _ = datasets
    cfg = ModelConfig.tiny(num_labels=3, version="0.0.0")
    args = TrainingArguments(
        output_dir=str(tmp_path / "runga"),
        num_train_epochs=1,
        per_device_train_batch_size=2,
        gradient_accumulation_steps=2,
        do_eval=False,
        save_strategy="no",
        seed=42,
        num_devices=1,
    )
    trainer = Trainer(cfg, args, train_ds, None, {})
    it = train_ds.batches(2)
    b1, _ = trainer._put(next(it))
    trainer._init_state(next(train_ds.batches(2)))
    b2, _ = trainer._put(next(it))

    # ---- manual expectation first (the step fns donate their buffers) ----
    compute = jax.jit(trainer._loss_grads())
    d1, l1rng, r1 = jax.random.split(trainer.rng, 3)
    d2, l2rng, _ = jax.random.split(r1, 3)
    (el1, _), g1 = compute(trainer.params, trainer.batch_stats, d1, l1rng, *b1)
    (el2, _), g2 = compute(trainer.params, trainer.batch_stats, d2, l2rng, *b2)
    mean_g = jax.tree.map(lambda a, b: (a + b) / 2.0, g1, g2)
    updates, _ = trainer.tx.update(mean_g, trainer.opt_state, trainer.params)
    expected = optax.apply_updates(trainer.params, updates)

    # ---- the trainer's ga path ----
    gstep = trainer._accum_step_fn()
    astep = trainer._apply_step_fn()
    accum = trainer._zero_accum()
    accum, bs, rng, loss1 = gstep(trainer.params, accum, trainer.batch_stats, trainer.rng, *b1)
    accum, bs, rng, loss2 = gstep(trainer.params, accum, bs, rng, *b2)
    new_params, _, gnorm, _ = astep(trainer.params, trainer.opt_state, accum, jnp.float32(2))

    np.testing.assert_allclose(float(loss1), float(el1), rtol=1e-6)
    np.testing.assert_allclose(float(loss2), float(el2), rtol=1e-6)
    assert np.isfinite(float(gnorm))
    for a, b in zip(jax.tree.leaves(new_params), jax.tree.leaves(expected)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_gradient_accumulation_training_loop(datasets, tmp_path):
    """Loop-level ga: 2 micro-batches/epoch with ga=3 forces the epoch-end
    remainder flush; global_step counts optimizer steps (1 per epoch here)."""
    train_ds, _ = datasets
    cfg = ModelConfig.tiny(num_labels=3, version="0.0.0")
    args = TrainingArguments(
        output_dir=str(tmp_path / "runga_loop"),
        num_train_epochs=2,
        per_device_train_batch_size=2,
        gradient_accumulation_steps=3,
        do_eval=False,
        save_strategy="no",
        seed=42,
        num_devices=1,
    )
    trainer = Trainer(cfg, args, train_ds, None, {})
    metrics = trainer.train()
    assert np.isfinite(metrics["train_loss"])
    assert trainer.global_step == 2  # one remainder-flushed optimizer step per epoch
    assert trainer._steps_per_epoch() == 1


def test_model_card(tmp_path):
    """create_model_card writes an HF-Trainer-format card (YAML front matter,
    eval bullets, hyperparameters, per-epoch results table) like the cards
    shipped with the reference checkpoints."""
    from rgbdseg_tpu.train.model_card import create_model_card

    args = TrainingArguments(output_dir=str(tmp_path), num_train_epochs=2, seed=42)
    log_history = [
        {"loss": 10.5, "epoch": 1.0, "step": 3, "grad_norm": 1.0, "learning_rate": 1e-4},
        {"eval_loss": 9.1, "eval_map": 0.12, "eval_map_50": 0.3, "epoch": 1.0, "step": 3},
        {"loss": 8.2, "epoch": 2.0, "step": 6, "grad_norm": 0.9, "learning_rate": 5e-5},
        {"eval_loss": 7.7, "eval_map": 0.2, "eval_map_50": 0.4, "epoch": 2.0, "step": 6},
    ]
    metrics = {"test_loss": 7.7, "test_map": 0.2, "test_map_50": 0.4, "test_runtime": 3.0}
    path = create_model_card(
        str(tmp_path), "my_run", args, metrics, log_history, dataset_name="train.json"
    )
    text = open(path).read()
    assert text.startswith("---\nlibrary_name: rgbdseg_tpu")
    assert "# my_run" in text
    assert "- Map: 0.2" in text
    assert "learning_rate" in text and "seed: 42" in text
    assert "### Training results" in text
    # both eval epochs present in the table, paired with their train loss
    assert "| 10.5 | 1 | 3 | 9.1 | 0.12 | 0.3 |" in text
    assert "| 8.2 | 2 | 6 | 7.7 | 0.2 | 0.4 |" in text


def test_same_seed_runs_are_identical(datasets, tmp_path):
    """Experiment-2 parity (SURVEY.md §4.1): the reference's de-facto unit test
    is running the same seeded config twice and asserting identical metrics
    (architecture_change.md:67-96). Same contract here: two fresh Trainers with
    the same seed must produce bit-identical per-epoch losses and final params."""
    import jax

    train_ds, _ = datasets
    cfg = ModelConfig.tiny(num_labels=3, version="0.0.0")
    runs = []
    for i in range(2):
        args = TrainingArguments(
            output_dir=str(tmp_path / f"det{i}"),
            num_train_epochs=1,
            per_device_train_batch_size=2,
            do_eval=False,
            save_strategy="no",
            seed=42,
            num_devices=1,
        )
        trainer = Trainer(cfg, args, train_ds, None, {})
        metrics = trainer.train()
        with open(os.path.join(str(tmp_path / f"det{i}"), "trainer_state.json")) as f:
            losses = [e["loss"] for e in json.load(f)["log_history"] if "loss" in e]
        runs.append((metrics["train_loss"], losses, jax.tree.leaves(trainer.params)))

    assert runs[0][0] == runs[1][0]
    assert runs[0][1] == runs[1][1]
    for a, b in zip(runs[0][2], runs[1][2]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_predict_and_export(datasets, tmp_path):
    train_ds, valid_ds = datasets
    cfg = ModelConfig.tiny(num_labels=3, version="0.0.0")
    args = TrainingArguments(
        output_dir=str(tmp_path / "run2"),
        num_train_epochs=1,
        per_device_train_batch_size=2,
        per_device_eval_batch_size=2,
        do_eval=False,
        save_strategy="no",
        num_devices=1,
    )
    trainer = Trainer(cfg, args, train_ds, valid_ds, {1: "box", 2: "ball"})
    first = next(train_ds.batches(2))
    trainer._init_state(first)
    outputs, metrics = trainer.predict(valid_ds)
    assert "test_map" in metrics

    from rgbdseg_tpu.inference.export import process_prediction

    pred_json = str(tmp_path / "pred.json")
    gt_json = str(tmp_path / "gt.json")
    comp = str(tmp_path / "cmp")
    process_prediction(
        outputs, valid_ds, {1: "box"}, prediction_json_path=pred_json, gt_json_path=gt_json, comparison_output_dir=comp
    )
    with open(gt_json) as f:
        gt = json.load(f)
    assert gt and all("counts" in r["segmentation"] for r in gt)
    assert os.path.exists(os.path.join(comp, "comparison_0.png"))


@pytest.mark.slow  # compile-heavy: demoted from the fast default suite (VERDICT r2 #9)
def test_resume_matches_uninterrupted_run(datasets, tmp_path):
    """Golden resume equivalence (reference methodology §4.1 + HF rng_state
    semantics): 4 epochs straight == 2 epochs + checkpoint + resume + 2 — the
    carried RNG stream is checkpointed, so the resumed run continues the exact
    dropout/point-sampling draws, data order, and optimizer state."""
    import jax

    train_ds, valid_ds = datasets
    cfg = ModelConfig.tiny(num_labels=3, version="0.0.0")
    id2label = {0: "background", 1: "box", 2: "ball"}

    def args_for(out, epochs):
        return TrainingArguments(
            output_dir=out,
            num_train_epochs=epochs,
            per_device_train_batch_size=2,
            learning_rate=5e-4,
            seed=42,
            num_devices=1,
            do_eval=False,
        )

    # run A: 4 epochs uninterrupted
    a = Trainer(cfg, args_for(str(tmp_path / "a"), 4), train_ds, valid_ds, id2label)
    a.train()

    # run B: SAME 4-epoch config (so the LR schedule matches), crashed right
    # after the epoch-2 checkpoint lands, then resumed by a FRESH trainer
    out_b = str(tmp_path / "b")
    b1 = Trainer(cfg, args_for(out_b, 4), train_ds, valid_ds, id2label)
    orig_save = b1._save

    def crashing_save(out_dir):
        orig_save(out_dir)
        if b1.global_step == a.global_step // 2:
            raise KeyboardInterrupt  # simulated preemption

    b1._save = crashing_save
    with pytest.raises(KeyboardInterrupt):
        b1.train()

    from rgbdseg_tpu.train.checkpoints import find_last_checkpoint

    last = find_last_checkpoint(out_b)
    assert last.endswith(f"checkpoint-{a.global_step // 2}")
    b2 = Trainer(cfg, args_for(out_b, 4), train_ds, valid_ds, id2label)
    b2.train(resume_from_checkpoint=last)

    assert b2.global_step == a.global_step
    for pa, pb in zip(jax.tree.leaves(a.params), jax.tree.leaves(b2.params)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb), rtol=0, atol=0)


def test_migrate_checkpoint_scales_bn(tmp_path):
    """Executable migration of pre-round-2 checkpoints: the three per-branch
    64-channel scale{0,1,2}_bn nodes (params, batch_stats, AND Adam moments)
    must concatenate into the current 192-channel scales_bn layout and
    restore cleanly against the current tree (checkpoints.migrate_checkpoint)."""
    import orbax.checkpoint as ocp

    from rgbdseg_tpu.train.checkpoints import load_checkpoint, migrate_checkpoint

    rs = np.random.RandomState(0)

    def bn(n):
        return {"scale": rs.rand(n).astype(np.float32), "bias": rs.rand(n).astype(np.float32)}

    def split_node():
        return {f"scale{i}_bn": bn(64) for i in range(3)}

    old = {
        "params": {
            "ratio_predictor": {**split_node(), "fc0": {"kernel": rs.rand(4, 4).astype(np.float32)}}
        },
        "opt_state": {"mu": {"ratio_predictor": split_node()}},
        "batch_stats": {
            "ratio_predictor": {
                f"scale{i}_bn": {
                    "mean": rs.rand(64).astype(np.float32),
                    "var": rs.rand(64).astype(np.float32),
                }
                for i in range(3)
            }
        },
        "step": 7,
    }
    src = str(tmp_path / "old" / "checkpoint-7")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(src, old, force=True)
    ckptr.wait_until_finished()

    dst = str(tmp_path / "new" / "checkpoint-7")
    migrate_checkpoint(src, dst)

    def merged(node, leaves):
        return {k: np.zeros(192, np.float32) for k in leaves}

    template = {
        "params": {
            "ratio_predictor": {
                "scales_bn": merged(None, ("scale", "bias")),
                "fc0": {"kernel": np.zeros((4, 4), np.float32)},
            }
        },
        "opt_state": {"mu": {"ratio_predictor": {"scales_bn": merged(None, ("scale", "bias"))}}},
        "batch_stats": {"ratio_predictor": {"scales_bn": merged(None, ("mean", "var"))}},
        "step": 0,
    }
    state = load_checkpoint(dst, template)
    assert state["step"] == 7
    for coll, leaves, srcs in (
        ("params", ("scale", "bias"), old["params"]["ratio_predictor"]),
        ("batch_stats", ("mean", "var"), old["batch_stats"]["ratio_predictor"]),
    ):
        node = state[coll]["ratio_predictor"]["scales_bn"]
        for leaf in leaves:
            expect = np.concatenate([srcs[f"scale{i}_bn"][leaf] for i in range(3)])
            np.testing.assert_array_equal(node[leaf], expect)
    np.testing.assert_array_equal(
        state["params"]["ratio_predictor"]["fc0"]["kernel"],
        old["params"]["ratio_predictor"]["fc0"]["kernel"],
    )
    mu = state["opt_state"]["mu"]["ratio_predictor"]["scales_bn"]
    expect = np.concatenate(
        [old["opt_state"]["mu"]["ratio_predictor"][f"scale{i}_bn"]["scale"] for i in range(3)]
    )
    np.testing.assert_array_equal(mu["scale"], expect)


def test_hf_decay_mask_semantics():
    """The AdamW weight-decay mask mirrors HF Trainer's decay set
    (transformers 4.57 get_decay_parameter_names): biases and LayerNorm
    params excluded (incl. Swin's relative_position_bias_table via the
    r"bias" name regex), BatchNorm/GroupNorm scales and everything else
    included."""
    from rgbdseg_tpu.train.trainer import _hf_decay_mask

    params = {
        "encoder": {
            "norm1": {"scale": 1, "bias": 1},
            "patch_norm": {"scale": 1, "bias": 1},
            "attn": {"relative_position_bias_table": 1, "qkv": {"kernel": 1, "bias": 1}},
        },
        "pixel_decoder": {
            "input_proj0_norm": {"scale": 1, "bias": 1},
            "adapter0_norm": {"scale": 1, "bias": 1},
            "fpn0_norm": {"scale": 1, "bias": 1},
            "self_attn_layer_norm": {"scale": 1, "bias": 1},
            "level_embed": 1,
        },
        "ratio_predictor": {"scales_bn": {"scale": 1, "bias": 1}, "fc0": {"kernel": 1, "bias": 1}},
        "decoder_layernorm": {"scale": 1, "bias": 1},
    }
    mask = _hf_decay_mask(params)
    # LayerNorm: fully excluded
    assert mask["encoder"]["norm1"] == {"scale": False, "bias": False}
    assert mask["encoder"]["patch_norm"]["scale"] is False
    assert mask["decoder_layernorm"]["scale"] is False
    assert mask["pixel_decoder"]["self_attn_layer_norm"]["scale"] is False
    # biases + the relative position bias table: excluded
    assert mask["encoder"]["attn"]["qkv"]["bias"] is False
    assert mask["encoder"]["attn"]["relative_position_bias_table"] is False
    assert mask["ratio_predictor"]["fc0"]["bias"] is False
    # GroupNorm + BatchNorm scales and plain weights: DECAYED (HF only
    # forbids nn.LayerNorm instances; torch names carry no "norm" pattern)
    assert mask["pixel_decoder"]["input_proj0_norm"]["scale"] is True
    assert mask["pixel_decoder"]["adapter0_norm"]["scale"] is True
    assert mask["pixel_decoder"]["fpn0_norm"]["scale"] is True
    assert mask["ratio_predictor"]["scales_bn"]["scale"] is True
    assert mask["encoder"]["attn"]["qkv"]["kernel"] is True
    assert mask["pixel_decoder"]["level_embed"] is True


@pytest.mark.slow  # compile-heavy: full eval at two input signatures
def test_evaluate_device_channels_matches_host(tmp_path):
    """SegmentationDataset(device_channels=True) ships packed uint8 frames
    (6 B/px for 0.4.0 instead of the 40 B/px float stack) and the eval step
    builds channels on device — metrics must match the host-built pipeline
    exactly (VERDICT r3 #8: the thin-link H2D win wired into
    Trainer.evaluate, not just Predictor.predict_example)."""
    import jax

    from rgbdseg_tpu.data import synthetic
    from rgbdseg_tpu.data.pipeline import SegmentationDataset, load_meta

    fx = synthetic.generate(str(tmp_path / "set"), num_train=2, num_valid=4, size=(64, 64), seed=5)
    pp = PreprocessConfig(height=64, width=64)
    cfg = ModelConfig.tiny(num_labels=3, version="0.4.0")
    args = TrainingArguments(
        output_dir=str(tmp_path / "o"),
        num_devices=1,
        per_device_eval_batch_size=2,
        seed=1,
        dataloader_num_workers=0,
    )
    meta = load_meta(fx["valid"], fx["root"])
    host_ds = SegmentationDataset(meta, "0.4.0", pp, max_instances=4)
    dev_ds = SegmentationDataset(meta, "0.4.0", pp, max_instances=4, device_channels=True)
    assert dev_ds.device_channels  # probe accepted the fixture
    pix0 = dev_ds[0][0]
    assert pix0.dtype == np.uint8 and pix0.shape[-1] == 6

    tr = Trainer(cfg, args, None, host_ds, {0: "bg", 1: "box", 2: "ball"})
    tr._init_state(next(host_ds.batches(2)))
    m_host = tr.evaluate(host_ds)
    m_dev = tr.evaluate(dev_ds)
    assert set(m_host) == set(m_dev)
    for k in m_host:
        if k.endswith("runtime") or "per_second" in k:
            continue
        assert m_dev[k] == pytest.approx(m_host[k], rel=1e-5, abs=1e-6), k

    # GT labels identical; the uint8 path really is smaller on the wire
    assert pix0.nbytes * 40 // 6 >= host_ds[0][0].nbytes  # 6 vs 40 B/px


def test_train_device_channels_matches_host(tmp_path):
    """r5: the TRAIN step also accepts packed uint8 frames (device-side
    channel building inside the compiled fwd+bwd) — per-epoch losses must
    equal the host-built pipeline's exactly, since the device builder is
    bit-exact (tests/test_data.py::TestDevicePreprocess). This is what lets
    a thin-link host feed training at 3-9 B/px instead of 12-40."""
    from rgbdseg_tpu.data import synthetic
    from rgbdseg_tpu.data.pipeline import SegmentationDataset, load_meta

    fx = synthetic.generate(str(tmp_path / "set"), num_train=4, num_valid=2, size=(64, 64), seed=7)
    pp = PreprocessConfig(height=64, width=64)
    cfg = ModelConfig.tiny(num_labels=3, version="0.4.0")
    meta = load_meta(fx["train"], fx["root"])

    def run(device_channels):
        ds = SegmentationDataset(meta, "0.4.0", pp, max_instances=4, device_channels=device_channels)
        assert ds.device_channels == device_channels
        args = TrainingArguments(
            output_dir=str(tmp_path / f"o{int(device_channels)}"),
            num_train_epochs=2,
            per_device_train_batch_size=2,
            learning_rate=1e-4,
            seed=3,
            num_devices=1,
            dataloader_num_workers=0,
            save_strategy="no",
            eval_strategy="no",
        )
        tr = Trainer(cfg, args, ds, None, {0: "bg", 1: "box", 2: "ball"})
        tr.train()
        return [e["loss"] for e in tr.log_history if "loss" in e]

    host_losses = run(False)
    dev_losses = run(True)
    assert len(host_losses) == len(dev_losses) == 2
    for h, d in zip(host_losses, dev_losses):
        assert d == pytest.approx(h, rel=1e-5, abs=1e-6), (host_losses, dev_losses)


def test_unpack_masks_inverts_packbits():
    from rgbdseg_tpu.data.device_preprocess import unpack_masks

    rs = np.random.RandomState(2)
    masks = (rs.rand(2, 5, 13, 21) > 0.6).astype(np.float32)  # 13*21 not /8
    packed = np.packbits(masks.astype(bool).reshape(2, 5, -1), axis=-1)
    got = np.asarray(unpack_masks(packed, (13, 21)))
    np.testing.assert_array_equal(got, masks)


def test_train_packed_targets_match(tmp_path):
    """r5: bit-packed GT upload (TrainingArguments.pack_targets) — per-epoch
    losses must equal the f32-target run exactly (binary masks, lossless
    pack/unpack). Cuts the dominant target-upload bytes 32x on thin links."""
    from rgbdseg_tpu.data import synthetic
    from rgbdseg_tpu.data.pipeline import SegmentationDataset, load_meta

    fx = synthetic.generate(str(tmp_path / "set"), num_train=4, num_valid=2, size=(64, 64), seed=11)
    pp = PreprocessConfig(height=64, width=64)
    cfg = ModelConfig.tiny(num_labels=3, version="0.4.0")
    meta = load_meta(fx["train"], fx["root"])

    def run(pack):
        ds = SegmentationDataset(meta, "0.4.0", pp, max_instances=4)
        args = TrainingArguments(
            output_dir=str(tmp_path / f"p{int(pack)}"),
            num_train_epochs=1,
            per_device_train_batch_size=2,
            learning_rate=1e-4,
            seed=3,
            num_devices=1,
            dataloader_num_workers=0,
            save_strategy="no",
            eval_strategy="no",
            pack_targets=pack,
        )
        tr = Trainer(cfg, args, ds, None, {0: "bg", 1: "box", 2: "ball"})
        tr.train()
        if pack:
            assert ds.pack_gt  # the packed path actually engaged
        return [e["loss"] for e in tr.log_history if "loss" in e]

    plain = run(False)
    packed = run(True)
    assert len(plain) == len(packed) == 1
    assert packed[0] == pytest.approx(plain[0], rel=1e-6, abs=1e-7), (plain, packed)
