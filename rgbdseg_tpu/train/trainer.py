"""Training loop: jit-compiled train step over a data-parallel device mesh.

Replaces the reference's HF `Trainer` wiring (reference: finetuning.py:98-117)
with a TPU-native loop:
- one `jit` train step (forward + Hungarian loss + AdamW update) over
  `Mesh(('data',))`; the gradient all-reduce is inserted by XLA from the
  shardings — no explicit collectives
- optax AdamW with HF-Trainer-equivalent schedule (linear decay to 0 over
  total steps, warmup_ratio) and global-norm clipping
- epoch-strategy logging producing HF-compatible `trainer_state.json`
  (log_history) and `*_results.json` files so the reference's plotting/analysis
  tools work unchanged (reference: plot_json_log.py expects log_history)
- orbax checkpoints with find-last-checkpoint resume semantics
"""

from __future__ import annotations

import json
import math
import os
import time
from functools import partial
from typing import Optional

import logging

import jax
import jax.numpy as jnp
import numpy as np
import optax

logger = logging.getLogger(__name__)
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import ModelConfig
from ..models.mask2former import Mask2FormerRGBD
from ..ops.losses import mask2former_loss
from ..parallel import make_mesh
from .arguments import TrainingArguments
from .checkpoints import find_last_checkpoint, load_checkpoint, save_checkpoint
from .evaluator import Evaluator


def _hf_decay_mask(params):
    """HF-Trainer weight-decay set, mirrored onto the flax param tree.

    transformers 4.57 `Trainer.get_decay_parameter_names` decays every
    parameter EXCEPT (a) params of `nn.LayerNorm` instances and (b) names
    matching r"bias" / r"layernorm" / r"(^|.)norm($|.)" / r"_norm($|.)" —
    note GroupNorm and BatchNorm *scales* DO decay (only LayerNorm is a
    forbidden layer type, and torch names them e.g. `input_projections.0.1.
    weight`, no "norm" in the name). Flax-side mapping:
    - any path component containing "bias" -> no decay (this also catches
      Swin's `relative_position_bias_table`, which HF's r"bias" regex
      excludes in the torch model);
    - LayerNorm modules -> no decay. Ours are named norm1/norm2/norm/
      patch_norm/out_norm*/decoder_layernorm/*_layer_norm; the pixel
      decoder's GroupNorms (input_proj*_norm/adapter*_norm/fpn*_norm) and
      the fusion BatchNorms (*bn*) share the "norm"/"_bn" suffixes but DO
      decay, hence the explicit carve-outs.
    Pinned end-to-end by tests/test_train_differential.py (per-step loss +
    final-param agreement vs the reference's torch trainer with
    weight_decay > 0)."""

    def is_decay(path):
        names = [str(getattr(k, "key", k)) for k in path]
        if any("bias" in n for n in names):
            return False
        parent = names[-2] if len(names) > 1 else ""
        if (
            "norm" in parent
            and "bn" not in parent
            and not parent.startswith(("input_proj", "adapter", "fpn"))
        ):
            return False
        return True

    return jax.tree_util.tree_map_with_path(lambda p, _: is_decay(p), params)


def _reference_frozen_mask(params):
    """Params the reference torch stack can NEVER update: the intrinsics
    predictor feeds only the host-numpy normals computation, so its grads are
    always None and torch AdamW skips them (no step, no weight decay)."""

    def frozen(path):
        return any(str(getattr(k, "key", k)) == "intrinsics_predictor" for k in path)

    return jax.tree_util.tree_map_with_path(lambda p, _: frozen(p), params)


class Trainer:
    def __init__(
        self,
        cfg: ModelConfig,
        args: TrainingArguments,
        train_dataset=None,
        eval_dataset=None,
        id2label: Optional[dict] = None,
        pretrained_params: Optional[dict] = None,
        pretrained_batch_stats: Optional[dict] = None,
    ):
        self.cfg = cfg
        self.args = args
        self._pretrained_params = pretrained_params
        self._pretrained_batch_stats = pretrained_batch_stats
        self.train_dataset = train_dataset
        self.eval_dataset = eval_dataset
        self.id2label = id2label or {}
        self.model = Mask2FormerRGBD(cfg)
        jax.config.update("jax_default_matmul_precision", args.matmul_precision)

        self.mesh = make_mesh(args.num_devices, model_axis=args.model_parallel_size)
        self.repl = NamedSharding(self.mesh, P())
        self.data_sharding = NamedSharding(self.mesh, P("data"))
        # Sharding trees filled by _init_state: replicated for pure DP, megatron
        # specs over the 'model' axis when model_parallel_size > 1.
        self.param_sharding = self.repl
        self.opt_sharding = self.repl
        self.log_history: list[dict] = []
        self.global_step = 0
        self.total_flos = 0.0
        self._flos_per_micro_step: Optional[float] = None
        self._compiled = {}
        # (target-bucket T, mask dtype) -> (AOT-compiled micro step,
        # flops/call); one entry per distinct target signature (see
        # compact_instances / pack_targets)
        self._compiled_micro: dict[tuple, tuple] = {}

        self.rng = jax.random.PRNGKey(args.seed)
        self.params = None
        self.batch_stats = None
        self.opt_state = None
        self.tx = None

    # ------------------------------------------------------------------
    def _init_state(self, sample_batch):
        rng, init_rng = jax.random.split(self.rng)
        self.rng = rng
        x = jnp.asarray(sample_batch.pixel_values[:1])
        if x.dtype == jnp.uint8:
            # packed raw frames (device_channels mode): init only needs the
            # BUILT stack's shape — preprocessed spatial size (the GT labels'
            # shape) x the version's channel total
            from ..versions import get as get_version

            h, w = sample_batch.mask_labels.shape[2:4]
            x = jnp.zeros((1, h, w, get_version(self.cfg.version).channels.total), jnp.float32)
        # jit the init: eager init dispatches thousands of tiny ops (slow over
        # a remote-TPU tunnel); one compiled program instead.
        variables = jax.jit(self.model.init)({"params": init_rng}, x)
        params = variables["params"]
        if self._pretrained_params is not None:
            from flax.core import unfreeze
            from ..utils.hf_convert import graft

            params, skipped = graft(unfreeze(params), self._pretrained_params)
            for s in skipped:
                logger.warning("pretrained weight skipped (shape mismatch): %s", s)
            logger.info("loaded pretrained trunk (%d leaves skipped)", len(skipped))
        if self.args.model_parallel_size > 1:
            from ..parallel.sharding import shard_params

            self.params = shard_params(params, self.mesh)
            self.param_sharding = jax.tree.map(lambda a: a.sharding, self.params)
        else:
            self.params = jax.device_put(params, self.repl)
        batch_stats = variables.get("batch_stats", {})
        if self._pretrained_batch_stats:
            from flax.core import unfreeze
            from ..utils.hf_convert import graft

            batch_stats, _ = graft(unfreeze(batch_stats), self._pretrained_batch_stats)
        self.batch_stats = jax.device_put(batch_stats, self.repl)

        steps_per_epoch = self._steps_per_epoch()
        total_steps = max(1, int(steps_per_epoch * self.args.num_train_epochs))
        # HF rounding: TrainingArguments.get_warmup_steps uses math.ceil on
        # ratio*total (int() truncation loses a warmup step whenever the
        # product is fractional — caught designing the training differential).
        warmup = math.ceil(self.args.warmup_ratio * total_steps)
        schedule = optax.join_schedules(
            [
                optax.linear_schedule(0.0, self.args.learning_rate, max(warmup, 1)),
                optax.linear_schedule(self.args.learning_rate, 0.0, max(total_steps - warmup, 1)),
            ],
            [max(warmup, 1)] if warmup > 0 else [0],
        )
        self.schedule = schedule
        stages = [
            optax.clip_by_global_norm(self.args.max_grad_norm),
            optax.adamw(
                schedule,
                b1=self.args.adam_beta1,
                b2=self.args.adam_beta2,
                eps=self.args.adam_epsilon,
                weight_decay=self.args.weight_decay,
                mask=_hf_decay_mask,
            ),
        ]
        from ..versions import get as _get_version

        if _get_version(self.cfg.version).fusion.intrinsics_normals:
            # Reference-frozen params: the intrinsics predictor's ONLY
            # consumer is the host-numpy normals (custom_model.py:169-196),
            # so in the torch stack its p.grad is always None and torch
            # AdamW SKIPS those params entirely — no Adam step AND no
            # decoupled weight decay. Our grads are exact zeros (the model
            # stop_gradients the normals), but adamw-with-decay would still
            # shrink the kernels; zero the updates to match. Appended only
            # for intrinsics versions so other versions' opt_state trees
            # (and their checkpoints) are unchanged.
            stages.append(optax.masked(optax.set_to_zero(), _reference_frozen_mask))
        self.tx = optax.chain(*stages)
        # tx.init's zeros_like inherits each master param's sharding, so the
        # optimizer moments are model-sharded exactly like their params. Leaves
        # tx.init creates fresh (e.g. Adam's step count) land on one device —
        # normalize those to replicated so every input lives on the mesh.
        opt_state = self.tx.init(self.params)
        self.opt_sharding = jax.tree.map(
            lambda a: a.sharding
            if isinstance(getattr(a, "sharding", None), NamedSharding) and a.sharding.mesh == self.mesh
            else self.repl,
            opt_state,
        )
        self.opt_state = jax.tree.map(jax.device_put, opt_state, self.opt_sharding)
        self.total_steps = total_steps

    @property
    def _global_train_batch(self) -> int:
        """HF semantics: per_device_train_batch_size × data-parallel width."""
        return self.args.per_device_train_batch_size * self.mesh.shape["data"]

    @property
    def _global_eval_batch(self) -> int:
        return self.args.per_device_eval_batch_size * self.mesh.shape["data"]

    def _steps_per_epoch(self) -> int:
        """Optimizer steps per epoch (micro-batches / gradient_accumulation)."""
        n = len(self.train_dataset) if self.train_dataset is not None else 1
        micro = max(1, math.ceil(n / self._global_train_batch))
        return max(1, math.ceil(micro / max(1, self.args.gradient_accumulation_steps)))

    # ------------------------------------------------------------------
    def _cast_bf16(self, tree):
        """Mixed-precision policy (args.bf16): f32 master params/optimizer, bf16
        activations+weights in the forward (native MXU dtype), f32 losses.
        Gradients flow through the cast back to the f32 masters (reference
        analogue: HF Trainer AMP, finetuning.py:64)."""
        if not self.args.bf16:
            return tree
        return jax.tree.map(
            lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, tree
        )

    def _loss_grads(self):
        """Shared forward+backward: (params, batch_stats, drop_rng, loss_rng,
        batch arrays) -> ((loss, (loss_dict, new_batch_stats)), grads)."""
        model, cfg = self.model, self.cfg
        has_bn = bool(jax.tree_util.tree_leaves(self.batch_stats))
        from ..versions import get as get_version

        map_fn_name = get_version(cfg.version).map_fn
        pp = getattr(self.train_dataset, "preprocess", None) or getattr(
            self.eval_dataset, "preprocess", None
        )

        def compute(params, batch_stats, drop_rng, loss_rng, pixel_values, masks, classes, valid):
            if pixel_values.dtype == jnp.uint8:
                # packed raw frames (SegmentationDataset device_channels
                # mode): the float channel stack is built on device inside
                # the compiled step — bit-exact with the host builders
                # (data/device_preprocess.py), and the host->device transfer
                # shrinks from 12-40 B/px to 3-9. Same path the eval step
                # takes; exactness means training math is unchanged.
                from ..data.device_preprocess import build_from_packed

                pixel_values = build_from_packed(map_fn_name, pixel_values, pp)
            if masks.dtype == jnp.uint8:
                # bit-packed binary GT (TrainingArguments.pack_targets):
                # lossless 32x-smaller upload, unpacked here on device
                from ..data.device_preprocess import unpack_masks
                from ..data.preprocess import output_size

                masks = unpack_masks(masks, output_size(pp))
            pixel_values = self._cast_bf16(pixel_values)

            def loss_fn(p):
                p = self._cast_bf16(p)
                variables = {"params": p}
                if has_bn:
                    variables["batch_stats"] = batch_stats
                    out, mut = model.apply(
                        variables,
                        pixel_values,
                        deterministic=False,
                        mutable=["batch_stats"],
                        rngs={"dropout": drop_rng, "droppath": drop_rng},
                    )
                    new_bs = mut["batch_stats"]
                else:
                    out = model.apply(
                        variables,
                        pixel_values,
                        deterministic=False,
                        rngs={"dropout": drop_rng, "droppath": drop_rng},
                    )
                    new_bs = batch_stats
                # losses always in f32 (point-sampled BCE/dice are unstable in bf16)
                out = jax.tree.map(lambda a: a.astype(jnp.float32), out)
                total, ld = mask2former_loss(cfg, out, masks, classes, valid, loss_rng)
                return total, (ld, new_bs)

            return jax.value_and_grad(loss_fn, has_aux=True)(params)

        return compute

    def _train_step_fn(self):
        compute = self._loss_grads()

        def step(params, opt_state, batch_stats, rng, pixel_values, masks, classes, valid):
            drop_rng, loss_rng, new_rng = jax.random.split(rng, 3)
            (loss, (ld, new_bs)), grads = compute(
                params, batch_stats, drop_rng, loss_rng, pixel_values, masks, classes, valid
            )
            updates, new_opt = self.tx.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            gnorm = optax.global_norm(grads)
            return new_params, new_opt, new_bs, new_rng, loss, gnorm

        return jax.jit(
            step,
            in_shardings=(
                self.param_sharding,
                self.opt_sharding,
                self.repl,
                self.repl,
                self.data_sharding,
                self.data_sharding,
                self.data_sharding,
                self.data_sharding,
            ),
            out_shardings=(
                self.param_sharding,
                self.opt_sharding,
                self.repl,
                self.repl,
                self.repl,
                self.repl,
            ),
            donate_argnums=(0, 1, 2),
        )

    def _accum_step_fn(self):
        """Gradient-accumulation micro-step: forward+backward, add the grads
        into a donated accumulator tree (sharded like the params). The RNG
        split is identical to the fused step's, so a ga=1 run and the first
        micro-batch of a ga>1 run see the same dropout/point-sampling streams."""
        compute = self._loss_grads()

        def step(params, accum, batch_stats, rng, pixel_values, masks, classes, valid):
            drop_rng, loss_rng, new_rng = jax.random.split(rng, 3)
            (loss, (ld, new_bs)), grads = compute(
                params, batch_stats, drop_rng, loss_rng, pixel_values, masks, classes, valid
            )
            new_accum = jax.tree.map(jnp.add, accum, grads)
            return new_accum, new_bs, new_rng, loss

        return jax.jit(
            step,
            in_shardings=(
                self.param_sharding,
                self.param_sharding,
                self.repl,
                self.repl,
                self.data_sharding,
                self.data_sharding,
                self.data_sharding,
                self.data_sharding,
            ),
            out_shardings=(self.param_sharding, self.repl, self.repl, self.repl),
            donate_argnums=(1, 2),
        )

    def _apply_step_fn(self):
        """Optimizer step on accumulated grads: exact mean over the `count`
        micro-batches actually accumulated (epoch-end remainders divide by the
        real count, not gradient_accumulation_steps), then the usual
        clip-by-global-norm + AdamW. Returns a zeroed accumulator (the input
        accumulator buffer is donated)."""

        def step(params, opt_state, accum, count):
            grads = jax.tree.map(lambda g: g / count, accum)
            updates, new_opt = self.tx.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            gnorm = optax.global_norm(grads)
            zero = jax.tree.map(jnp.zeros_like, accum)
            return new_params, new_opt, gnorm, zero

        return jax.jit(
            step,
            in_shardings=(self.param_sharding, self.opt_sharding, self.param_sharding, self.repl),
            out_shardings=(self.param_sharding, self.opt_sharding, self.repl, self.param_sharding),
            donate_argnums=(0, 1, 2),
        )

    def _zero_accum(self):
        """Fresh gradient accumulator, sharded exactly like the params
        (param_sharding is a single replicated sharding for pure DP, a
        per-leaf tree under tensor parallelism)."""
        sh = self.param_sharding
        if isinstance(sh, NamedSharding):
            return jax.tree.map(lambda p: jax.device_put(jnp.zeros(p.shape, jnp.float32), sh), self.params)
        return jax.tree.map(
            lambda p, s: jax.device_put(jnp.zeros(p.shape, jnp.float32), s), self.params, sh
        )

    def _eval_step_fn(self):
        model, cfg = self.model, self.cfg
        has_bn = bool(jax.tree_util.tree_leaves(self.batch_stats))
        from ..versions import get as get_version

        map_fn_name = get_version(cfg.version).map_fn
        pp = getattr(self.eval_dataset, "preprocess", None) or getattr(
            self.train_dataset, "preprocess", None
        )

        def step(params, batch_stats, rng, pixel_values, masks, classes, valid):
            if pixel_values.dtype == jnp.uint8:
                # packed raw frames (SegmentationDataset device_channels
                # mode): the dataset shipped 6-9 uint8 bytes/pixel and the
                # float channel stack is built HERE, on device, inside the
                # compiled step (data/device_preprocess.py — VERDICT r3 #8).
                from ..data.device_preprocess import build_from_packed

                pixel_values = build_from_packed(map_fn_name, pixel_values, pp)
            if masks.dtype == jnp.uint8:
                # bit-packed binary GT (pack_targets) — unpack for the loss
                from ..data.device_preprocess import unpack_masks
                from ..data.preprocess import output_size

                masks = unpack_masks(masks, output_size(pp))
            variables = {"params": self._cast_bf16(params)}
            if has_bn:
                variables["batch_stats"] = batch_stats
            out = model.apply(variables, self._cast_bf16(pixel_values), deterministic=True)
            out = jax.tree.map(lambda a: a.astype(jnp.float32), out)
            total, _ = mask2former_loss(cfg, out, masks, classes, valid, rng)
            return out.class_queries_logits, out.masks_queries_logits, total

        return jax.jit(
            step,
            in_shardings=(
                self.param_sharding,
                self.repl,
                self.repl,
                self.data_sharding,
                self.data_sharding,
                self.data_sharding,
                self.data_sharding,
            ),
        )

    def _put(self, batch, global_b: Optional[int] = None):
        """Host batch -> sharded device arrays. Single-process: device_put over
        the data axis (padding uneven batches). Multi-process: `batch` holds
        only this host's `host_row_range` rows of the `global_b`-row batch and
        the global array is assembled with make_array_from_process_local_data.
        Returns ((pixel_values, masks, classes, valid), real_rows)."""
        n = self.mesh.shape["data"]  # batch shards over the data axis only
        if jax.process_count() > 1:
            from ..parallel.multihost import global_batch_array

            if global_b is None or global_b % n:
                raise ValueError("multi-host _put needs a data-axis-divisible global_b")
            put = lambda x: global_batch_array(self.data_sharding, np.asarray(x), global_b)
            return (
                put(batch.pixel_values),
                put(batch.mask_labels),
                put(batch.class_labels),
                put(batch.valid),
            ), global_b
        b = batch.pixel_values.shape[0]
        if b % n != 0:
            # replicate-pad the batch so it shards evenly; padded rows carry
            # valid=False targets so they contribute no masks to the loss
            # normalizer, and the metric/eval slices them off via real_b
            # (training batches are sized divisibly).
            pad = n - (b % n)
            import numpy as _np

            def padrep(x):
                return _np.concatenate([x, _np.repeat(x[:1], pad, 0)], 0)

            from ..data.pipeline import Batch

            padded_valid = padrep(batch.valid)
            padded_valid[b:] = False
            batch = Batch(
                pixel_values=padrep(batch.pixel_values),
                mask_labels=padrep(batch.mask_labels),
                class_labels=padrep(batch.class_labels),
                valid=padded_valid,
                orig_sizes=None if batch.orig_sizes is None else padrep(batch.orig_sizes),
            )
        mk, cl, vd = batch.mask_labels, batch.class_labels, batch.valid
        packed = batch.mask_labels_packed if self.args.pack_targets else None
        if self.args.compact_instances:
            # Criterion cost is linear in the padded slot count: slice the
            # targets to the per-batch real need (power-of-two buckets bound
            # the retrace count). Single-process only — gated above by the
            # process_count()>1 early return.
            from ..data.pipeline import compact_targets

            if packed is not None:
                mk, cl, vd, packed = compact_targets(
                    mk, cl, vd, self.args.instance_bucket_floor, packed=packed
                )
            else:
                mk, cl, vd = compact_targets(mk, cl, vd, self.args.instance_bucket_floor)
        if packed is not None:
            # ship the 32x-smaller bit-packed GT; the compiled step unpacks
            # (data/device_preprocess.unpack_masks — binary masks, lossless)
            mk = packed
        put = lambda x: jax.device_put(jnp.asarray(x), self.data_sharding)
        return (
            put(batch.pixel_values),
            put(mk),
            put(cl),
            put(vd),
        ), b

    # ------------------------------------------------------------------
    def train(self, resume_from_checkpoint: Optional[str] = None) -> dict:
        args = self.args
        os.makedirs(args.output_dir, exist_ok=True)
        if args.pack_targets and jax.process_count() == 1 and hasattr(self.train_dataset, "pack_gt"):
            # batches carry bit-packed GT twins; _put ships those (32x fewer
            # bytes) and the compiled step unpacks on device
            self.train_dataset.pack_gt = True
        first = next(self.train_dataset.batches(min(self._global_train_batch, len(self.train_dataset))))
        if self.params is None:
            self._init_state(first)
        if resume_from_checkpoint:
            state = {
                "params": self.params,
                "opt_state": self.opt_state,
                "batch_stats": self.batch_stats,
                "step": self.global_step,
                "rng": self.rng,
            }
            try:
                state = load_checkpoint(resume_from_checkpoint, state)
            except Exception:
                # older checkpoints predate the saved RNG stream: restore the
                # rest and keep the seed-derived rng (resume still works, the
                # stream just replays from the seed)
                state.pop("rng")
                state = load_checkpoint(resume_from_checkpoint, state)
                state["rng"] = self.rng
                logger.warning("checkpoint has no rng state; resumed stream restarts from the seed")
            # Re-place the restored host trees onto THIS trainer's mesh
            # shardings. The checkpoint is topology-agnostic (host-gathered
            # full arrays), but the AOT-compiled step executables require
            # exact sharding matches — without this, restoring a dp x mp
            # checkpoint into a pure-DP (or any multi-device) trainer fails
            # with a passed-vs-required sharding mismatch (found by
            # dryrun_multichip's cross-topology leg, VERDICT r3 #7).
            if isinstance(self.param_sharding, NamedSharding):
                self.params = jax.tree.map(
                    lambda a: jax.device_put(a, self.param_sharding), state["params"]
                )
            else:
                self.params = jax.tree.map(jax.device_put, state["params"], self.param_sharding)
            self.opt_state = jax.tree.map(jax.device_put, state["opt_state"], self.opt_sharding)
            self.batch_stats = jax.tree.map(
                lambda a: jax.device_put(a, self.repl), state["batch_stats"]
            )
            self.global_step = int(state["step"])
            self.rng = jax.device_put(jnp.asarray(state["rng"]), self.repl)
            ts_path = os.path.join(args.output_dir, "trainer_state.json")
            if os.path.exists(ts_path):
                with open(ts_path) as f:
                    self.total_flos = float(json.load(f).get("total_flos", 0.0))

        ga = max(1, args.gradient_accumulation_steps)
        if ga == 1:
            train_step = self._train_step_fn()
            grad_step = apply_step = accum = None
        else:
            train_step = None
            grad_step = self._accum_step_fn()
            apply_step = self._apply_step_fn()
            accum = self._zero_accum()
        steps_per_epoch = self._steps_per_epoch()
        start_epoch = self.global_step // steps_per_epoch
        t0 = time.time()
        rng = self.rng
        total_loss, loss_count = 0.0, 0
        first_step_logged = False

        num_epochs = int(self.args.num_train_epochs)
        logger.info(
            "***** Running training ***** epochs=%s steps/epoch=%s devices=%s",
            num_epochs,
            steps_per_epoch,
            self.mesh.devices.size,
        )
        # Multi-host: every process iterates the same deterministic order but
        # decodes only its host_row_range rows of each global batch.
        local_rows = None
        if jax.process_count() > 1:
            from ..parallel.multihost import host_row_range

            local_rows = host_row_range(self._global_train_batch, self.mesh)

        for epoch in range(start_epoch, num_epochs):
            epoch_losses, epoch_gnorm = [], []
            micro_in_step = 0
            for batch in self.train_dataset.batches(
                self._global_train_batch,
                shuffle=True,
                seed=args.seed,
                epoch=epoch,
                num_workers=args.dataloader_num_workers,
                local_rows=local_rows,
            ):
                (px, mk, cl, vd), _ = self._put(batch, global_b=self._global_train_batch)
                # cache key: target bucket + mask dtype (a batch that lost its
                # packed GT twin, e.g. the uneven-batch padrep path, must not
                # hit a bit-packed executable)
                tkey = (int(mk.shape[1]), str(mk.dtype))
                if tkey not in self._compiled_micro:
                    # AOT-compile the micro step per target-bucket shape (fwd +
                    # criterion + bwd [+ AdamW when ga==1]) and read the
                    # executable's flop count; accumulated into `total_flos`
                    # like the reference's all_results.json / trainer_state.json
                    # (HF Trainer `total_flos`). With compact_instances the
                    # targets arrive at power-of-two bucket sizes, so this
                    # caches a handful of executables (the compiled object is
                    # used directly — the jit __call__ path is never taken).
                    micro_args = (
                        (self.params, self.opt_state, self.batch_stats, rng, px, mk, cl, vd)
                        if ga == 1
                        else (self.params, accum, self.batch_stats, rng, px, mk, cl, vd)
                    )
                    jitted = train_step if ga == 1 else grad_step
                    compiled, flos = _aot_step(jitted, micro_args)
                    self._compiled_micro[tkey] = (compiled if compiled is not None else jitted, flos)
                micro_step, self._flos_per_micro_step = self._compiled_micro[tkey]
                if args.profile_start_step is not None and self.global_step == args.profile_start_step:
                    jax.profiler.start_trace(os.path.join(args.output_dir, "profile"))
                if ga == 1:
                    self.params, self.opt_state, self.batch_stats, rng, loss, gnorm = micro_step(
                        self.params, self.opt_state, self.batch_stats, rng, px, mk, cl, vd
                    )
                    self.global_step += 1
                    self.total_flos += self._flos_per_micro_step
                    epoch_gnorm.append(gnorm)
                else:
                    accum, self.batch_stats, rng, loss = micro_step(
                        self.params, accum, self.batch_stats, rng, px, mk, cl, vd
                    )
                    micro_in_step += 1
                    self.total_flos += self._flos_per_micro_step
                    if micro_in_step == ga:
                        self.params, self.opt_state, gnorm, accum = apply_step(
                            self.params, self.opt_state, accum, jnp.float32(micro_in_step)
                        )
                        micro_in_step = 0
                        self.global_step += 1
                        epoch_gnorm.append(gnorm)
                if args.profile_stop_step is not None and self.global_step == args.profile_stop_step:
                    jax.block_until_ready(loss)
                    jax.profiler.stop_trace()
                    logger.info("profiler trace written to %s/profile", args.output_dir)
                epoch_losses.append(loss)
                if not first_step_logged:
                    first_step_logged = True
                    logger.info(
                        "first train step done (compile included) in %.1fs, loss=%.4f",
                        time.time() - t0,
                        float(loss),
                    )
            if micro_in_step:
                # epoch-end remainder: step on the exact mean of what was accumulated
                self.params, self.opt_state, gnorm, accum = apply_step(
                    self.params, self.opt_state, accum, jnp.float32(micro_in_step)
                )
                micro_in_step = 0
                self.global_step += 1
                epoch_gnorm.append(gnorm)

            mean_loss = float(jnp.mean(jnp.stack(epoch_losses)))
            total_loss += sum(float(l) for l in epoch_losses)
            loss_count += len(epoch_losses)
            entry = {
                "loss": round(mean_loss, 4),
                "grad_norm": float(jnp.mean(jnp.stack(epoch_gnorm))),
                "learning_rate": float(self.schedule(self.global_step)),
                "epoch": float(epoch + 1),
                "step": self.global_step,
            }
            self.log_history.append(entry)
            logger.info("epoch %d: %s", epoch + 1, entry)

            if args.do_eval and args.eval_strategy == "epoch" and self.eval_dataset is not None:
                metrics = self.evaluate()
                metrics["epoch"] = float(epoch + 1)
                metrics["step"] = self.global_step
                self.log_history.append(metrics)

            if args.save_strategy == "epoch":
                # persist the carried RNG position so a resumed run continues
                # the exact stream (HF Trainer saves rng_state the same way);
                # without it, resumed epochs replay the stream from the seed
                self.rng = rng
                self._save(args.output_dir)

        runtime = time.time() - t0
        n_samples = len(self.train_dataset) * max(num_epochs - start_epoch, 0)
        metrics = {
            "train_runtime": round(runtime, 4),
            "train_samples_per_second": round(n_samples / max(runtime, 1e-9), 3),
            "train_steps_per_second": round((self.global_step - start_epoch * steps_per_epoch) / max(runtime, 1e-9), 3),
            "train_loss": total_loss / max(loss_count, 1),
            "epoch": float(num_epochs),
            "total_flos": self.total_flos,
        }
        self.rng = rng
        self.save_state()
        return metrics

    def _save(self, output_dir):
        state = {
            "params": jax.device_get(self.params),
            "opt_state": jax.device_get(self.opt_state),
            "batch_stats": jax.device_get(self.batch_stats),
            "step": self.global_step,
            "rng": jax.device_get(self.rng),
        }
        save_checkpoint(output_dir, self.global_step, state, self.args.save_total_limit)

    def save_state(self):
        if jax.process_index() != 0:
            # HF Trainer semantics: only the world-zero process writes the
            # host-side JSON artifacts. Every process computes identical
            # metrics (eval stats are allgathered), and concurrent writers
            # raced on the same file (caught by test_multihost_exec: a
            # process read all_results.json mid-truncate).
            return
        path = os.path.join(self.args.output_dir, "trainer_state.json")
        with open(path, "w") as f:
            json.dump(
                {
                    "global_step": self.global_step,
                    "log_history": self.log_history,
                    "best_metric": None,
                    "total_flos": self.total_flos,
                },
                f,
                indent=2,
            )

    def _host_np(self, x) -> np.ndarray:
        """Global (possibly data-sharded) array -> full numpy on THIS host.
        Single-process: plain np.asarray. Multi-process: shards on other hosts
        are non-addressable, so all-gather them (every host gets the full
        value and runs the identical host-side eval — no cross-host metric
        reduction needed)."""
        if jax.process_count() == 1:
            return np.asarray(x)
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(x, tiled=True))

    def _put_eval(self, batch, global_b: int):
        """Eval-path _put: in multi-process runs each host decodes the FULL
        global batch (the evaluator needs every row's GT on every host), so
        slice this host's row block before feeding the device."""
        if jax.process_count() > 1:
            from ..data.pipeline import Batch
            from ..parallel.multihost import host_row_range

            s, e = host_row_range(global_b, self.mesh)
            batch = Batch(
                pixel_values=batch.pixel_values[s:e],
                mask_labels=batch.mask_labels[s:e],
                class_labels=batch.class_labels[s:e],
                valid=batch.valid[s:e],
                orig_sizes=None if batch.orig_sizes is None else batch.orig_sizes[s:e],
                mask_labels_packed=None
                if batch.mask_labels_packed is None
                else batch.mask_labels_packed[s:e],
            )
        return self._put(batch, global_b=global_b)

    def _eval_update_multihost(self, evaluator, cls_logits, mask_logits, batch, real_b) -> bool:
        """Multi-host device-stats eval (VERDICT r3 #6): each host computes
        the O(Q·T) IoU/area scalars for ITS OWN rows on its own device shards
        (the same `_eval_stats_device` program the single-process fast path
        uses), then only those scalars are allgathered — the (B, Q, h, w)
        mask logits never cross the host boundary. The previous path
        allgathered the full logits to every host and took the slow
        host-mask route, forfeiting the 53.9x device-stats eval win
        (PERF.md) exactly when the batch spans hosts.

        `batch` is the UNPADDED-GT global batch every host decodes
        (evaluate() keeps full-batch GT on all hosts); rows >= real_b are the
        static-shape padding and are dropped after the gather. Returns False
        when the device-stats preconditions don't hold (mixed per-image
        target sizes, or RGBDSEG_EVAL_DEVICE_STATS=0) so the caller can fall
        back to the host-mask path."""
        if os.environ.get("RGBDSEG_EVAL_DEVICE_STATS", "1") != "1":
            return False
        if evaluator.eval_at_original_size and batch.orig_sizes is not None:
            sizes = {tuple(int(v) for v in s) for s in np.asarray(batch.orig_sizes)}
            if len(sizes) != 1:
                return False
            target_hw = sizes.pop()
        else:
            # GT mask shape, not pixel_values: raw-frame (device_channels)
            # batches carry source-size uint8 pixels, the preprocessed size
            # lives in the labels (reference: target sizes are the GT shapes,
            # model_essential_part.py:77-81)
            target_hw = tuple(batch.mask_labels.shape[2:4])

        from jax.experimental import multihost_utils

        gb, t, gh, gw = np.shape(batch.mask_labels)
        gt_packed = batch.mask_labels_packed
        if gt_packed is None:
            gt_bool = np.asarray(batch.mask_labels).astype(bool)
            gt_packed = np.packbits(gt_bool.reshape(gb, t, -1), axis=-1)
        valid_all = np.asarray(batch.valid, bool)

        mask_by_dev = {s.device: s for s in mask_logits.addressable_shards}
        parts = []  # (global row indices, *stat arrays) per local shard
        for s in sorted(cls_logits.addressable_shards, key=lambda s: s.index[0].start or 0):
            sl = s.index[0]
            r0 = sl.start or 0
            r1 = sl.stop if sl.stop is not None else gb
            stats = evaluator.device_stats_arrays(
                s.data,
                mask_by_dev[s.device].data,
                gt_packed[r0:r1],
                valid_all[r0:r1],
                target_hw,
                (gh, gw),
            )
            parts.append((np.arange(r0, r1), *stats))

        # Equal-sized shards per process (the data axis divides the global
        # batch evenly), so tiled allgather concatenates cleanly; the row
        # indices ride along so ordering never depends on process layout.
        local = [np.concatenate([p[k] for p in parts]) for k in range(6)]
        gidx, *gstats = (
            np.asarray(multihost_utils.process_allgather(x, tiled=True)) for x in local
        )
        order = np.argsort(gidx, kind="stable")[:real_b]
        evaluator.update_from_stats(
            tuple(g[order] for g in gstats),
            np.asarray(batch.class_labels)[gidx[order]],
            valid_all[gidx[order]],
        )
        logger.info("multihost eval: device-stats path (rows=%d)", real_b)
        return True

    # ------------------------------------------------------------------
    def evaluate(self, dataset=None, prefix: str = "eval_") -> dict:
        dataset = dataset or self.eval_dataset
        if self.params is None:
            first = next(dataset.batches(min(self._global_eval_batch, len(dataset))))
            self._init_state(first)
        eval_step = self._compiled.setdefault("eval", self._eval_step_fn())
        if hasattr(dataset, "pack_gt"):
            # batches arrive with pre-packed GT (built in the pipeline's
            # worker threads, memoized per example) so the device-stats
            # dispatch below never runs np.packbits on the critical path
            dataset.pack_gt = True
        evaluator = Evaluator(self.id2label, threshold=0.0)
        losses = []
        t0 = time.time()
        n = 0
        rng = jax.random.PRNGKey(self.args.seed)
        from ..data.pipeline import Batch

        def flush(pending):
            cls_logits, mask_logits, loss, sub, full, real_b = pending
            # Defer the scalar loss fetch (materialized after the loop): a
            # float() here costs one tunnel RTT per batch AND waits for the
            # already-dispatched next forward to clear the device queue. The
            # D2H copy starts NOW (async), so by drain time every scalar has
            # landed and the final float() conversions return immediately
            # instead of paying one sequential RTT per batch.
            if hasattr(loss, "copy_to_host_async"):
                loss.copy_to_host_async()
            losses.append(loss)
            if jax.process_count() == 1:
                # keep the logits ON DEVICE: post-processing jits over them
                # and ships only bit-packed binary maps to the host — pulling
                # the (B, Q, h, w) logits down just to re-upload them costs a
                # 2x tunnel round trip per batch
                evaluator.update(cls_logits[:real_b], mask_logits[:real_b], sub)
            elif not self._eval_update_multihost(evaluator, cls_logits, mask_logits, full, real_b):
                evaluator.update(self._host_np(cls_logits)[:real_b], self._host_np(mask_logits)[:real_b], sub)
            return real_b

        # One-batch pipeline: dispatch batch i+1's eval_step (async on the
        # device) BEFORE the host-side post-processing/metric work of batch i,
        # so numpy crunches while the device computes the next forward.
        pending = None
        for bi, batch in enumerate(dataset.batches(self._global_eval_batch)):
            # The pipeline pads the final partial chunk by repeating leading
            # examples (static shapes); recover the real row count from the
            # dataset length so the metric never sees duplicates.
            real_b = min(self._global_eval_batch, len(dataset) - bi * self._global_eval_batch)
            (px, mk, cl, vd), _ = self._put_eval(batch, self._global_eval_batch)
            cls_logits, mask_logits, loss = eval_step(self.params, self.batch_stats, rng, px, mk, cl, vd)
            sub = Batch(
                pixel_values=np.asarray(batch.pixel_values[:real_b]),
                mask_labels=np.asarray(batch.mask_labels[:real_b]),
                class_labels=np.asarray(batch.class_labels[:real_b]),
                valid=np.asarray(batch.valid[:real_b]),
                orig_sizes=None
                if batch.orig_sizes is None
                else np.asarray(batch.orig_sizes[:real_b]),
                mask_labels_packed=None
                if batch.mask_labels_packed is None
                else np.asarray(batch.mask_labels_packed[:real_b]),
            )
            if pending is not None:
                n += flush(pending)
            pending = (cls_logits, mask_logits, loss, sub, batch, real_b)
        if pending is not None:
            n += flush(pending)
        # Materialize the deferred work inside the timed region so
        # eval_samples_per_second stays honest: drain the evaluator's
        # device-stats queue and the per-batch loss scalars (whose async D2H
        # copies were started at flush-append time — long since landed).
        evaluator.flush()
        losses = [float(l) for l in jax.device_get(losses)]
        runtime = time.time() - t0
        metrics = {prefix + "loss": float(np.mean(losses))}
        metrics.update(evaluator.compute(prefix=prefix))
        metrics[prefix + "runtime"] = round(runtime, 4)
        metrics[prefix + "samples_per_second"] = round(n / max(runtime, 1e-9), 3)
        return metrics

    def predict(self, dataset, prefix: str = "test_") -> tuple[list, dict]:
        """Returns (list of (class_logits, mask_logits) per batch, metrics)."""
        eval_step = self._compiled.setdefault("eval", self._eval_step_fn())
        outputs = []
        rng = jax.random.PRNGKey(self.args.seed)
        for bi, batch in enumerate(dataset.batches(self._global_eval_batch)):
            real_b = min(self._global_eval_batch, len(dataset) - bi * self._global_eval_batch)
            (px, mk, cl, vd), _ = self._put_eval(batch, self._global_eval_batch)
            cls_logits, mask_logits, _ = eval_step(self.params, self.batch_stats, rng, px, mk, cl, vd)
            outputs.append((self._host_np(cls_logits)[:real_b], self._host_np(mask_logits)[:real_b]))
        metrics = self.evaluate(dataset, prefix=prefix)
        return outputs, metrics


def save_metrics(output_dir: str, split: str, metrics: dict) -> None:
    """HF-compatible metrics JSON files (train/eval/test/all_results.json).
    Multi-process: process 0 writes (all processes hold identical metrics);
    concurrent writers raced on the read-modify-write of all_results.json."""
    if jax.process_index() != 0:
        return
    os.makedirs(output_dir, exist_ok=True)
    path = os.path.join(output_dir, f"{split}_results.json")
    with open(path, "w") as f:
        json.dump(metrics, f, indent=2, sort_keys=True)
    all_path = os.path.join(output_dir, "all_results.json")
    allm = {}
    if os.path.exists(all_path):
        with open(all_path) as f:
            allm = json.load(f)
    allm.update(metrics)
    with open(all_path, "w") as f:
        json.dump(allm, f, indent=2, sort_keys=True)


def _aot_step(jitted, example_args):
    """AOT-compile `jitted` for the concrete `example_args` and return
    (compiled_callable, flops_per_call). The compiled executable's cost
    analysis feeds `total_flos`, matching the schema of the reference's
    all_results.json / trainer_state.json (HF Trainer records `total_flos`
    per run, e.g. reference
    mask2former/checkpoints/remote/coco82v2_multi_640/all_results.json).
    Unlike HF's analytic per-forward estimate, this counts the full micro step
    (forward + criterion + backward [+ optimizer]).

    Lowering with the concrete arrays captures their exact shardings/layouts,
    so the compiled object accepts the training loop's real arguments; it IS
    the step's only compile (the jit __call__ path is never taken). On any
    backend gap, falls back to (None, 0.0) and the caller keeps the jitted fn.
    Note `lowered.cost_analysis()` (pre-compile) returns None on the TPU
    plugin backend — only the executable's analysis is reliable there."""
    try:
        lowered = jitted.lower(*example_args)
        compiled = lowered.compile()
        analysis = compiled.cost_analysis()
        if isinstance(analysis, (list, tuple)):
            analysis = analysis[0] if analysis else {}
        flops = float(analysis.get("flops", 0.0)) if analysis else 0.0
        return compiled, flops
    except Exception:  # pragma: no cover - backend-specific analysis gaps
        logger.warning("AOT step compile/flop analysis failed; total_flos will be 0", exc_info=True)
        return None, 0.0
