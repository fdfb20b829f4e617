#!/usr/bin/env python
"""Inference CLI — reference `predictor.py` equivalent.

Single image:
    python predict.py --checkpoint out/checkpoint-N --version 0.0.0 \
        --image img.png --save overlay.png
Multi-model comparison from exported JSONs:
    python predict.py --compare --gt_json gt.json --model_json name=pred.json \
        --output_dir viz/
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint")
    ap.add_argument(
        "--hf_checkpoint",
        help="HF Mask2Former checkpoint dir (config.json + model.safetensors) — "
        "loads reference-trained weights directly",
    )
    ap.add_argument("--version", default="0.0.0")
    ap.add_argument("--num_labels", type=int, default=2)
    ap.add_argument("--image")
    ap.add_argument("--depth")
    ap.add_argument("--save")
    ap.add_argument("--threshold", type=float, default=0.5)
    ap.add_argument("--image_height", type=int, default=256)
    ap.add_argument("--image_width", type=int, default=256)
    ap.add_argument("--compare", action="store_true")
    ap.add_argument("--gt_json")
    ap.add_argument("--model_json", action="append", default=[])
    ap.add_argument("--output_dir", default="viz")
    ap.add_argument(
        "--model_config_json",
        help="ModelConfig JSON overriding the default full-size architecture "
        "(num_labels/version still come from their flags)",
    )
    args = ap.parse_args()

    if args.compare:
        from rgbdseg_tpu.inference.visualize import visualize_multi_model_json_results

        models = dict(kv.split("=", 1) for kv in args.model_json)
        visualize_multi_model_json_results(args.gt_json, models, args.output_dir)
        print(f"comparison grids written to {args.output_dir}")
        return

    import numpy as np
    from PIL import Image

    from rgbdseg_tpu.config import ModelConfig, PreprocessConfig
    from rgbdseg_tpu.inference.predictor import Predictor
    from rgbdseg_tpu.models.mask2former import Mask2FormerRGBD
    from rgbdseg_tpu.train.checkpoints import load_checkpoint_partial

    cfg = ModelConfig(num_labels=args.num_labels, version=args.version)
    if args.model_config_json:
        with open(args.model_config_json) as f:
            cfg = ModelConfig.from_json(f.read()).replace(
                num_labels=args.num_labels, version=args.version
            )
    pp = PreprocessConfig(height=args.image_height, width=args.image_width)

    import jax

    hf_params, hf_bs = None, {}
    if args.hf_checkpoint:
        from rgbdseg_tpu.utils.hf_convert import load_hf_checkpoint

        # custom exports (finetune.py writes one at output_dir) carry their
        # fusion weights + BN stats and their own version tag
        cfg, hf_params, hf_bs = load_hf_checkpoint(
            args.hf_checkpoint, version=args.version, with_batch_stats=True
        )

    model = Mask2FormerRGBD(cfg)
    dummy_ch = __import__("rgbdseg_tpu.versions", fromlist=["get"]).get(cfg.version).channels.total
    import jax.numpy as jnp

    variables = jax.jit(model.init)({"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 64, 64, dummy_ch)))
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    if hf_params is not None:
        # graft the converted HF trunk onto the freshly-initialized tree (any
        # version-specific fusion modules keep their fresh init)
        import flax

        from rgbdseg_tpu.utils.hf_convert import graft

        params, skipped = graft(flax.core.unfreeze(params), hf_params)
        for s in skipped:
            print(f"skipped pretrained weight (shape mismatch): {s}")
        if hf_bs:
            batch_stats, _ = graft(flax.core.unfreeze(batch_stats), hf_bs)
    if args.checkpoint:
        # partial restore: training checkpoints also hold opt_state + the
        # carried RNG stream, which inference neither needs nor knows the
        # structure of
        state = load_checkpoint_partial(
            args.checkpoint, {"params": params, "batch_stats": batch_stats}
        )
        params, batch_stats = state["params"], state["batch_stats"]

    predictor = Predictor(cfg, params, batch_stats, pp)
    if args.depth:
        # RGB-D versions: build the version's channel stack from files via the
        # registry map fn (same code path as training data)
        res, _ = predictor.predict_and_overlay_files(
            [args.image, args.depth], threshold=args.threshold, save=args.save
        )
    else:
        image = np.asarray(Image.open(args.image).convert("RGB"))
        res, _ = predictor.predict_and_overlay(image, threshold=args.threshold, save=args.save)
    for seg in res["segments_info"]:
        print(seg)
    if args.save:
        print(f"overlay saved to {args.save}")


if __name__ == "__main__":
    main()
