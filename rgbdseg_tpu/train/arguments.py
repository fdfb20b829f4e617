"""Argument schema + config parsing.

Mirrors the reference's CLI surface (reference: arguments.py:5-115 dataclass +
finetuning.py:43-49 single-JSON-or-flags parsing via HfArgumentParser): a data/
model `Arguments` block plus a `TrainingArguments` block, parseable from one
JSON file or command-line flags.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
from typing import Optional


@dataclasses.dataclass
class Arguments:
    # data
    root_path: str = "."
    train_json_path: str = "train.json"
    valid_json_path: str = "valid.json"
    label2id_path: str = "label2id.json"
    image_height: int = 256
    image_width: int = 256
    do_reduce_labels: bool = False
    ignore_index: Optional[int] = None
    max_instances: int = 20
    # Ship PACKED RAW uint8 frames (3-9 B/px) and build the float channel
    # stack on device inside the compiled train/eval steps, instead of
    # host-building and uploading 12-40 B/px float stacks. Bit-exact with the
    # host builders (data/device_preprocess.py + ops/resize_exact.py);
    # SegmentationDataset auto-disables it for unsupported layouts,
    # augmentation transforms, or non-uniform frame sizes.
    device_channels: bool = True
    # model
    model_name_or_path: Optional[str] = None  # optional checkpoint to load
    version: str = "0.0.0"
    # optional ModelConfig JSON (ModelConfig.to_json) overriding the default
    # full-size architecture — num_labels/version still come from the dataset
    # and --version flag. Used e.g. for small-model smoke runs on CPU.
    model_config_json: Optional[str] = None
    # export (reference: arguments.py pred/gt JSON export paths)
    prediction_json_path: Optional[str] = None
    gt_json_path: Optional[str] = None
    comparison_output_dir: Optional[str] = None


@dataclasses.dataclass
class TrainingArguments:
    output_dir: str = "output"
    num_train_epochs: float = 1.0
    per_device_train_batch_size: int = 1
    per_device_eval_batch_size: int = 1
    learning_rate: float = 1e-5
    weight_decay: float = 0.0
    adam_beta1: float = 0.9
    adam_beta2: float = 0.999
    adam_epsilon: float = 1e-8
    max_grad_norm: float = 1.0  # HF Trainer default clip
    warmup_ratio: float = 0.0
    seed: int = 42
    logging_strategy: str = "epoch"
    eval_strategy: str = "epoch"
    save_strategy: str = "epoch"
    save_total_limit: Optional[int] = 2
    do_train: bool = True
    do_eval: bool = True
    bf16: bool = False  # bf16 activations policy
    matmul_precision: str = "float32"  # float32 | bfloat16_3x | bfloat16
    # optimizer steps happen every N micro-batches; gradients are the exact
    # mean over the accumulated micro-batches (HF Trainer surface parity).
    gradient_accumulation_steps: int = 1
    # Compact each batch's padded instance targets to the smallest
    # power-of-two bucket (>= instance_bucket_floor) covering the batch's
    # real max instance count before upload (data/pipeline.compact_targets):
    # criterion cost is linear in the padded slot count, so a generous
    # max_instances otherwise runs the matcher/point losses mostly on
    # padding. One step retrace/compile per distinct bucket (persistent
    # cache amortizes). Single-process only (multi-host keeps the static
    # max_instances shape so every host dispatches the same program).
    compact_instances: bool = True
    instance_bucket_floor: int = 8
    # Ship GT instance masks BIT-PACKED (32x fewer bytes; they are binary)
    # and unpack on device inside the compiled step — a (B, T, H, W) f32
    # target block otherwise outweighs even the packed input frames on thin
    # host->device links. Single-process path; requires pipeline-produced
    # batches (Batch.mask_labels_packed).
    pack_targets: bool = True
    dataloader_num_workers: int = 4
    resume_from_checkpoint: Optional[str] = None
    overwrite_output_dir: bool = False
    num_devices: Optional[int] = None  # total mesh devices (default: all)
    # tensor-parallel width: mesh is (num_devices/mp, mp) = ('data', 'model');
    # transformer params shard Megatron-style (parallel/sharding.py), XLA
    # inserts the collectives. 1 = pure data parallelism.
    model_parallel_size: int = 1
    # jax.profiler trace of training steps [profile_start_step, profile_stop_step)
    # written to <output_dir>/profile (TensorBoard/xprof format).
    profile_start_step: Optional[int] = None
    profile_stop_step: Optional[int] = None
    # Upload output_dir (model card, results, checkpoints) to the HF Hub after
    # training (reference: finetuning.py:141-149 trainer.push_to_hub).
    push_to_hub: bool = False
    hub_model_id: Optional[str] = None  # default: basename(output_dir)


def _add_fields(parser: argparse.ArgumentParser, dc) -> None:
    for f in dataclasses.fields(dc):
        name = "--" + f.name
        if f.type in ("bool", bool):
            parser.add_argument(name, type=lambda s: s.lower() in ("1", "true", "yes"), default=f.default)
        else:
            t = {int: int, float: float, str: str}.get(f.type, None)
            if t is None:
                t = str if "str" in str(f.type) else (float if "float" in str(f.type) else (int if "int" in str(f.type) else str))
            parser.add_argument(name, type=t, default=f.default)


def parse_args(argv: Optional[list[str]] = None) -> tuple[Arguments, TrainingArguments]:
    """`prog config.json` or `prog --flag value ...` (finetuning.py:43-49 parity)."""
    import sys

    argv = list(sys.argv[1:] if argv is None else argv)
    if len(argv) == 1 and argv[0].endswith(".json"):
        with open(argv[0]) as f:
            raw = json.load(f)
        a_kwargs = {f.name: raw[f.name] for f in dataclasses.fields(Arguments) if f.name in raw}
        t_kwargs = {f.name: raw[f.name] for f in dataclasses.fields(TrainingArguments) if f.name in raw}
        return Arguments(**a_kwargs), TrainingArguments(**t_kwargs)

    parser = argparse.ArgumentParser()
    _add_fields(parser, Arguments)
    _add_fields(parser, TrainingArguments)
    ns = vars(parser.parse_args(argv))
    a = Arguments(**{f.name: ns[f.name] for f in dataclasses.fields(Arguments)})
    t = TrainingArguments(**{f.name: ns[f.name] for f in dataclasses.fields(TrainingArguments)})
    return a, t
