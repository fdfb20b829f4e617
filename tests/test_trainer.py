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
