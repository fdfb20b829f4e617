#!/usr/bin/env python
"""Training/eval CLI — reference `finetuning.py` equivalent.

Usage:  python finetune.py config.json
        python finetune.py --root_path ... --train_json_path ... [flags]

Flow mirrors reference finetuning.py:39-153: parse args -> find last checkpoint
-> build datasets -> build model (version-dispatched) -> train -> save metrics/
state -> final prediction pass with optional COCO-RLE JSON export.
"""

import json
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from rgbdseg_tpu.config import ModelConfig
from rgbdseg_tpu.data.pipeline import build_datasets
from rgbdseg_tpu.train.arguments import parse_args
from rgbdseg_tpu.train.checkpoints import find_last_checkpoint
from rgbdseg_tpu.train.trainer import Trainer, save_metrics
from rgbdseg_tpu.utils.log import setup_logging

logger = logging.getLogger(__name__)


def main(argv=None):
    # Multi-host: no-op single-process; TPU pods auto-detect the cluster.
    from rgbdseg_tpu.parallel.multihost import initialize

    initialize()
    args, training_args = parse_args(argv)
    setup_logging()
    logger.info("Training/evaluation parameters %s", training_args)

    last_checkpoint = None
    if training_args.do_train and not training_args.overwrite_output_dir:
        last_checkpoint = find_last_checkpoint(training_args.output_dir, training_args.overwrite_output_dir)
        if last_checkpoint:
            logger.info("Resuming from checkpoint %s", last_checkpoint)

    # Resolve the fusion version BEFORE the datasets are built: a custom HF
    # export carries its own rgbdseg_version tag (utils/hf_convert), and the
    # data pipeline's channel layout must match the model's — building the
    # datasets with a stale --version flag would feed a different map
    # function than the model expects.
    if args.model_name_or_path and os.path.isdir(args.model_name_or_path) and os.path.exists(
        os.path.join(args.model_name_or_path, "config.json")
    ):
        with open(os.path.join(args.model_name_or_path, "config.json")) as f:
            tagged = json.load(f).get("rgbdseg_version")
        if tagged and tagged != args.version:
            logger.info(
                "checkpoint carries version %s (overriding --version %s)", tagged, args.version
            )
            args.version = tagged

    train_ds, valid_ds, label2id, id2label = build_datasets(args)
    cfg = ModelConfig(num_labels=len(label2id), version=args.version)
    if args.model_config_json:
        with open(args.model_config_json) as f:
            cfg = ModelConfig.from_json(f.read()).replace(
                num_labels=len(label2id), version=args.version
            )

    # model_name_or_path pointing at an HF Mask2Former checkpoint dir loads the
    # pretrained trunk (reference workflow: finetune from
    # facebook/mask2former-swin-tiny-coco-instance, finetuning.py:86-92); the
    # class head is re-initialized when num_labels differs.
    pretrained = None
    if args.model_name_or_path and os.path.isdir(args.model_name_or_path) and os.path.exists(
        os.path.join(args.model_name_or_path, "config.json")
    ):
        from rgbdseg_tpu.utils.hf_convert import load_hf_checkpoint

        hf_cfg, pretrained, pretrained_bs = load_hf_checkpoint(
            args.model_name_or_path, version=args.version, with_batch_stats=True
        )
        # load_hf_checkpoint resolved the version: a custom export's own
        # rgbdseg_version tag wins over the CLI flag, a stock trunk keeps it
        cfg = hf_cfg.replace(num_labels=len(label2id))
        logger.info(
            "loaded pretrained HF checkpoint from %s (version %s)", args.model_name_or_path, cfg.version
        )
    else:
        pretrained_bs = None

    trainer = Trainer(
        cfg,
        training_args,
        train_ds,
        valid_ds,
        id2label,
        pretrained_params=pretrained,
        pretrained_batch_stats=pretrained_bs,
    )

    if training_args.do_train:
        metrics = trainer.train(resume_from_checkpoint=training_args.resume_from_checkpoint or last_checkpoint)
        metrics["train_samples"] = len(train_ds)
        save_metrics(training_args.output_dir, "train", metrics)
        trainer.save_state()
        import jax as _jax

        if _jax.process_count() > 1 and training_args.model_parallel_size > 1:
            # model-sharded params span hosts (non-addressable from process
            # 0), so device_get would raise; the orbax checkpoint (which
            # coordinates processes) remains the multi-host-TP artifact
            logger.warning(
                "HF export skipped: multi-host model-parallel params are not "
                "host-gatherable here (use the orbax checkpoint)"
            )
        elif _jax.process_index() == 0:
            # The reference's training artifact is an HF checkpoint directory
            # at output_dir (finetuning.py:114-117 Trainer.save_model) that
            # its torch stack reloads via from_pretrained
            # (custom_model.py:45-53). Write the same artifact next to the
            # orbax checkpoints: config.json + model.safetensors in the
            # reference's key layout (round-trip pinned in
            # tests/test_hf_export.py).
            from rgbdseg_tpu.utils.hf_convert import export_hf_checkpoint

            export_hf_checkpoint(
                _jax.device_get(trainer.params),
                _jax.device_get(trainer.batch_stats),
                cfg,
                training_args.output_dir,
                id2label=id2label,
            )
            logger.info("HF checkpoint exported to %s", training_args.output_dir)

    if training_args.do_eval:
        outputs, metrics = trainer.predict(valid_ds)
        metrics["test_samples"] = len(valid_ds)
        save_metrics(training_args.output_dir, "test", metrics)
        logger.info("test metrics: %s", json.dumps(metrics, indent=2))

        # model card + hub push: process-0 only, like every host-side file
        # artifact (reference: trainer.create_model_card, finetuning.py:141-149)
        import jax as _jax

        if _jax.process_index() == 0:
            from rgbdseg_tpu.train.model_card import create_model_card

            create_model_card(
                training_args.output_dir,
                model_name=os.path.basename(os.path.normpath(training_args.output_dir)),
                training_args=training_args,
                eval_metrics=metrics,
                log_history=trainer.log_history,
                base_model=args.model_name_or_path or None,
                dataset_name=args.train_json_path,
            )

            # hub push (reference: finetuning.py:141-149 trainer.push_to_hub)
            if training_args.push_to_hub:
                from rgbdseg_tpu.train.hub import push_to_hub

                push_to_hub(training_args.output_dir, repo_id=training_args.hub_model_id)

        if args.prediction_json_path or args.gt_json_path or args.comparison_output_dir:
            from rgbdseg_tpu.inference.export import process_prediction

            process_prediction(
                outputs,
                valid_ds,
                id2label,
                prediction_json_path=args.prediction_json_path,
                gt_json_path=args.gt_json_path,
                comparison_output_dir=args.comparison_output_dir,
            )


if __name__ == "__main__":
    main()
