"""Subprocess smoke tests for the public CLI surface (VERDICT r2 #4/#6).

The reference's public contract is `python finetuning.py config.json` (one
JSON config; reference finetuning.py:43-49) and `predictor.py` for inference +
multi-model comparison (predictor.py:19, :747). These tests drive our
equivalents — finetune.py and predict.py — as real subprocesses on a tiny
fixture dataset with a tiny ModelConfig (via --model_config_json), asserting
exit 0 and that every contract artifact exists.

CPU-forcing recipe per .claude/skills/verify: the interpreter may boot jax at
startup with the TPU-tunnel plugin bound, so the child updates the LIVE jax
config before any computation and runpy-executes the CLI (env vars alone are
not reliable).

Marked slow: one tiny-model training run + one predict compile on CPU.
"""

import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_cli(script: str, argv: list[str], timeout=2400):
    """Run a repo CLI in a fresh interpreter, forced to CPU via live config."""
    stdin_prog = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache')\n"
        "jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)\n"
        f"import sys, runpy\n"
        f"sys.argv = {[script] + argv!r}\n"
        f"runpy.run_path({script!r}, run_name='__main__')\n"
    )
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONUNBUFFERED="1")
    return subprocess.run(
        [sys.executable, "-"],
        input=stdin_prog,
        text=True,
        capture_output=True,
        cwd=REPO,
        env=env,
        timeout=timeout,
    )


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    from rgbdseg_tpu.data import synthetic

    root = tmp_path_factory.mktemp("cli_set")
    synthetic.generate(str(root), num_train=4, num_valid=2, size=(64, 64), seed=3)
    return root


def test_finetune_and_predict_cli(fixture_dir, tmp_path):
    """finetune.py end to end (train -> eval -> prediction export), then
    predict.py single-image and --compare on the run's own exports."""
    from rgbdseg_tpu.config import ModelConfig

    out = tmp_path / "run"
    model_cfg = tmp_path / "model_tiny.json"
    model_cfg.write_text(ModelConfig.tiny().to_json())
    cfg = {
        "root_path": str(fixture_dir),
        "train_json_path": "train.json",
        "valid_json_path": "valid.json",
        "label2id_path": "label2id.json",
        "image_height": 64,
        "image_width": 64,
        "version": "0.0.0",
        "max_instances": 4,
        "model_config_json": str(model_cfg),
        "output_dir": str(out),
        "num_train_epochs": 1,
        "per_device_train_batch_size": 2,
        "per_device_eval_batch_size": 2,
        "learning_rate": 1e-4,
        "seed": 42,
        "dataloader_num_workers": 0,
        "prediction_json_path": str(out / "pred.json"),
        "gt_json_path": str(out / "gt.json"),
        "comparison_output_dir": str(out / "cmp"),
    }
    cfg_path = tmp_path / "config.json"
    cfg_path.write_text(json.dumps(cfg))

    r = _run_cli("finetune.py", [str(cfg_path)])
    assert r.returncode == 0, f"finetune.py failed:\n{r.stdout[-3000:]}\n{r.stderr[-3000:]}"

    # Contract artifacts (reference: trainer_state.json + *_results.json per
    # run in checkpoints/remote/*, pred/GT COCO-RLE JSON via predictor.py).
    assert (out / "trainer_state.json").exists()
    assert (out / "train_results.json").exists()
    assert (out / "test_results.json").exists()
    assert (out / "all_results.json").exists()
    state = json.loads((out / "trainer_state.json").read_text())
    assert any("loss" in e for e in state["log_history"])
    results = json.loads((out / "all_results.json").read_text())
    assert "train_samples_per_second" in results and "test_samples_per_second" in results
    ckpts = [p for p in os.listdir(out) if p.startswith("checkpoint-")]
    assert ckpts, "no checkpoint-* directory saved"
    for j in ("pred.json", "gt.json"):
        data = json.loads((out / j).read_text())
        assert isinstance(data, list)
    pngs = list((out / "cmp").glob("*.png"))
    assert pngs, "no comparison PNGs exported"

    # Single-image prediction from the saved checkpoint.
    overlay = tmp_path / "overlay.png"
    img = next((fixture_dir / "images").glob("*.png"))
    r2 = _run_cli(
        "predict.py",
        [
            "--checkpoint", str(out / sorted(ckpts)[-1]),
            "--model_config_json", str(model_cfg),
            "--num_labels", "3",
            "--version", "0.0.0",
            "--image", str(img),
            "--image_height", "64",
            "--image_width", "64",
            "--save", str(overlay),
        ],
    )
    assert r2.returncode == 0, f"predict.py failed:\n{r2.stdout[-3000:]}\n{r2.stderr[-3000:]}"
    assert overlay.exists() and overlay.stat().st_size > 0

    # Multi-model comparison from the exported JSONs (reference
    # predictor.py:747 visualize_multi_model_json_results).
    viz = tmp_path / "viz"
    r3 = _run_cli(
        "predict.py",
        [
            "--compare",
            "--gt_json", str(out / "gt.json"),
            "--model_json", f"tiny={out / 'pred.json'}",
            "--output_dir", str(viz),
        ],
        timeout=600,
    )
    assert r3.returncode == 0, f"predict.py --compare failed:\n{r3.stderr[-3000:]}"
    assert list(viz.glob("*.png")), "no comparison grids written"
