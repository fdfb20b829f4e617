"""Streaming evaluator: instance post-processing + per-class mask mAP.

Parity target: the reference Evaluator (model_essential_part.py:31-157):
- predictions post-processed with threshold=0.0, return_binary_maps=True at the
  original target sizes
- ground truth taken from the batch's padded (mask_labels, class_labels)
- per-class map/mar flattened into `map_<classname>` keys
- metric resets after each compute
"""

from __future__ import annotations

import collections
import os

import numpy as np

from ..inference.postprocess import post_process_instance_segmentation
from .map_metric import MeanAveragePrecision


class Evaluator:
    def __init__(
        self,
        id2label: dict[int, str],
        threshold: float = 0.0,
        eval_at_original_size: bool = False,
    ):
        """`eval_at_original_size=False` (default) evaluates at the
        preprocessed pixel size — exactly what the reference's in-training
        evaluator does (model_essential_part.py:77-81: target_sizes are the GT
        mask_labels shapes, i.e. the image-processor output size). Setting it
        True post-processes predictions AND nearest-resizes GT to each
        example's original pre-resize size (Batch.orig_sizes), matching the
        reference's prediction-export path (predictor.py:692-703)."""
        self.id2label = id2label
        self.threshold = threshold
        self.eval_at_original_size = eval_at_original_size
        self.metric = MeanAveragePrecision(class_metrics=True)
        # Deferred-drain queue for the device-stats path. Fetching batch i's
        # stats inside the eval pipeline blocks the host until everything
        # ALREADY in the device queue finishes (the caller dispatched batch
        # i+1's forward first), so a synchronous fetch serializes
        # forward + stats + tunnel RTT + host metric work per batch. Holding
        # `depth` batches of in-flight stat arrays (tiny: O(B·Q·T) scalars,
        # copy_to_host_async'd at dispatch) means by drain time the copy has
        # landed and np.asarray returns immediately — the RTT and the host
        # metric update overlap the device's next forwards instead of
        # extending the critical path. compute()/flush() drain the tail.
        # The depth is read ONCE here and fixed for the Evaluator's lifetime
        # (clamped at 0: depth 0 = fully synchronous drain).
        self._pending: collections.deque = collections.deque()
        self._pending_depth = max(0, int(os.environ.get("RGBDSEG_EVAL_PIPELINE_DEPTH", "2")))

    def update(self, class_logits, mask_logits, batch, target_sizes=None):
        b = batch.pixel_values.shape[0]
        if target_sizes is None:
            if self.eval_at_original_size and batch.orig_sizes is not None:
                target_sizes = [tuple(int(v) for v in s) for s in batch.orig_sizes]
            else:
                # the GT mask shape IS the reference's target size
                # (model_essential_part.py:77-81) — and unlike pixel_values
                # it stays the preprocessed size even when the batch carries
                # raw source-size uint8 frames (device_channels mode)
                target_sizes = [batch.mask_labels.shape[2:4]] * b
        # Device fast path: when every image in the batch evaluates at the
        # same size (always true for fixed-size datasets like NYUv2), compute
        # IoU/area stats ON DEVICE and ship only O(Q*T) scalars — the binary
        # maps never cross the tunnel. Exactly equal to the mask path (f32
        # integer counts + identical nearest-resize indices); pinned by
        # tests/test_evaluator_device.py. RGBDSEG_EVAL_DEVICE_STATS=0 forces
        # the host/mask path (also used for per-image target sizes).
        if (
            len(set(map(tuple, target_sizes))) == 1
            and os.environ.get("RGBDSEG_EVAL_DEVICE_STATS", "1") == "1"
        ):
            return self._update_device_stats(class_logits, mask_logits, batch, tuple(target_sizes[0]))
        # Falling back to the synchronous host/mask path: drain any deferred
        # device-stats updates first so metric updates stay in batch order
        # (mAP is order-independent except for score-tie breaking, which is
        # insertion-order mergesort — keep it identical to a pure-sync run).
        self.flush()
        results = post_process_instance_segmentation(
            class_logits,
            mask_logits,
            threshold=self.threshold,
            target_sizes=target_sizes,
            return_binary_maps=True,
        )
        preds, targets = [], []
        for i, res in enumerate(results):
            seg = res["segmentation"]
            info = res["segments_info"]
            preds.append(
                {
                    "scores": np.asarray([s["score"] for s in info], np.float32),
                    "labels": np.asarray([s["label_id"] for s in info], np.int64),
                    "masks": seg.astype(bool),
                }
            )
            valid = batch.valid[i]
            th, tw = target_sizes[i]
            gt_masks = batch.mask_labels[i][valid].astype(bool)
            if gt_masks.shape[1:] != (th, tw):
                from ..inference.postprocess import _resize_nearest_np

                gt_masks = _resize_nearest_np(gt_masks.astype(np.float32), (th, tw)).astype(bool)
            targets.append(
                {"labels": batch.class_labels[i][valid].astype(np.int64), "masks": gt_masks}
            )
        self.metric.update(preds, targets)

    def _dispatch_stats(self, class_logits, mask_logits, gt_packed, valid, target_hw, gt_hw):
        """Dispatch the on-device IoU/area stats program and start the D2H
        copies; returns the (still device-resident) output arrays."""
        import jax.numpy as jnp

        from ..inference.postprocess import _eval_stats_device

        outs = _eval_stats_device(
            jnp.asarray(class_logits),
            jnp.asarray(mask_logits),
            jnp.asarray(gt_packed),
            jnp.asarray(valid),
            target_hw,
            gt_hw,
        )
        for x in outs:  # overlap the device->host copies (one tunnel RTT)
            if hasattr(x, "copy_to_host_async"):
                x.copy_to_host_async()
        return outs

    @staticmethod
    def _materialize_stats(outs):
        scores, labels, darea, garea, inter = (np.asarray(x) for x in outs)
        # The host path reads scores from segments_info, which rounds to 6
        # decimals (postprocess parity with the reference) — match it here so
        # both paths produce bit-identical metric inputs.
        scores = np.round(scores.astype(np.float64), 6)
        return scores, labels, darea, garea, inter

    def device_stats_arrays(self, class_logits, mask_logits, gt_packed, valid, target_hw, gt_hw):
        """Run the on-device IoU/area stats program over (possibly local-shard)
        logits + bit-packed GT and pull the O(Q·T) scalars to the host.
        Factored out of `_update_device_stats` so the multi-host eval path
        (train/trainer.py:_eval_update_multihost) can run it per host shard
        and allgather only the returned scalars (synchronous — the allgather
        needs the values now)."""
        return self._materialize_stats(
            self._dispatch_stats(class_logits, mask_logits, gt_packed, valid, target_hw, gt_hw)
        )

    def update_from_stats(self, stats, gt_labels, gt_valid):
        """Per-image metric updates from device-computed stats arrays."""
        scores, labels, darea, garea, inter = stats
        gt_labels = np.asarray(gt_labels)
        gt_valid = np.asarray(gt_valid, bool)
        for i in range(len(scores)):
            cand = (scores[i] >= self.threshold) & (darea[i] > 0)
            gv = gt_valid[i]
            self.metric.update_precomputed(
                scores[i][cand],
                labels[i][cand],
                darea[i][cand],
                inter[i][cand][:, gv],
                gt_labels[i][gv],
                garea[i][gv],
            )

    def _update_device_stats(self, class_logits, mask_logits, batch, target_hw):
        b, t, gh, gw = np.shape(batch.mask_labels)
        # Prefer GT the pipeline pre-packed in its worker threads
        # (Batch.mask_labels_packed); packing here sits in the eval dispatch
        # path and serializes with the device's next forward.
        gt_packed = getattr(batch, "mask_labels_packed", None)
        if gt_packed is None:
            gt_bool = np.asarray(batch.mask_labels).astype(bool)
            gt_packed = np.packbits(gt_bool.reshape(b, t, -1), axis=-1)
        outs = self._dispatch_stats(
            class_logits,
            mask_logits,
            gt_packed,
            np.asarray(batch.valid, bool),
            target_hw,
            (gh, gw),
        )
        self._pending.append(
            (outs, np.asarray(batch.class_labels), np.asarray(batch.valid, bool))
        )
        while len(self._pending) > self._pending_depth:
            self._drain_one()

    def _drain_one(self):
        outs, gt_labels, gt_valid = self._pending.popleft()
        self.update_from_stats(self._materialize_stats(outs), gt_labels, gt_valid)

    def flush(self):
        """Drain every deferred device-stats update into the metric."""
        while self._pending:
            self._drain_one()

    def reset(self):
        """Discard deferred updates and accumulated metric state."""
        self._pending.clear()
        self.metric.reset()

    def compute(self, prefix: str = "") -> dict[str, float]:
        self.flush()
        out = self.metric.compute()
        metrics: dict[str, float] = {}
        classes = out.pop("classes", [])
        map_pc = out.pop("map_per_class", [])
        mar_pc = out.pop("mar_100_per_class", [])
        for k, v in out.items():
            metrics[prefix + k] = float(v)
        for c, m, r in zip(classes, map_pc, mar_pc):
            name = self.id2label.get(int(c), str(int(c)))
            metrics[f"{prefix}map_{name}"] = float(m)
            metrics[f"{prefix}mar_100_{name}"] = float(r)
        self.metric.reset()
        return metrics
