"""Dataset + fixed-shape padded batching.

Replaces the reference's HF `datasets.map` + ragged collate (reference:
dataloader.py:540-565, 762-780) with a TPU-friendly pipeline:
- meta-JSON records are processed by the version's channel builder (registry.py)
- variable-count instance masks are padded to `max_instances` with a validity
  mask (static shapes through matcher/losses/eval)
- batches are assembled by a thread-pool prefetcher (decode + cv2 run on host
  while the device computes)

Meta JSON schema (reference: dataset/local/experiment_tiny_set/train.json,
architecture_change.md:185-200):
  [{"image": path or [rgb, depth, ...], "annotation": mask.png,
    "semantic_class_to_id": {...}}, ...]
"""

from __future__ import annotations

import concurrent.futures as futures
import json
import os
from dataclasses import dataclass
from typing import Iterator, Optional

import numpy as np

from ..config import PreprocessConfig
from ..versions import get as get_version
from .registry import MAP_FUNCTIONS


@dataclass
class Batch:
    pixel_values: np.ndarray  # (B, H, W, C) float32
    mask_labels: np.ndarray  # (B, T, H, W) float32
    class_labels: np.ndarray  # (B, T) int32
    valid: np.ndarray  # (B, T) bool
    # per-example original (pre-resize) image sizes (B, 2) int32 — the
    # reference post-processes/exports at these sizes (predictor.py:692-703,
    # resize_masks_to_original_size :1068-1125)
    orig_sizes: Optional[np.ndarray] = None
    # bit-packed GT masks (B, T, ceil(H*W/8)) uint8 — packbits over the
    # flattened (H, W); precomputed in the pipeline's worker threads (and
    # memoized per example) when `SegmentationDataset.pack_gt` is set, so the
    # device-stats eval path ships GT without an np.packbits in its dispatch
    # path (the packing otherwise sat between dispatching batch i+1's forward
    # and queueing batch i's stats — host time the one-batch eval pipeline
    # could not overlap).
    mask_labels_packed: Optional[np.ndarray] = None


def compact_targets(
    mask_labels: np.ndarray,
    class_labels: np.ndarray,
    valid: np.ndarray,
    min_bucket: int = 8,
    packed: Optional[np.ndarray] = None,
) -> tuple:
    """Slice padded instance targets to the smallest power-of-two bucket
    covering the batch's real max instance count.

    The criterion's point-sampling cost is LINEAR in the padded slot count T
    (PERF.md: T=20 61.7 ms -> T=100 265.7 ms criterion fwd+bwd) and every
    padded slot pays full price, so a dataset configured with a generous
    `max_instances` (the reference keeps ragged lists and pays only for real
    instances, dataloader.py:772-780) would run the criterion mostly on
    padding. This compacts each host batch down to the per-batch real need
    before upload: valid slots are packed first (stable sort — only when a
    valid slot actually sits past the slice point; the pipeline already packs
    valid-first so this is a no-op for its batches), then all target arrays
    are sliced to the bucket.

    Bucketing to powers of two (floored at `min_bucket`) bounds the number of
    distinct T shapes the jitted step sees — one retrace/compile per bucket,
    amortized by the persistent compile cache.

    Semantics: the Hungarian assignment of real rows is invariant (padding
    rows carry a uniform cost — ops/matcher.py docstring), num_masks counts
    only valid slots, and padding rows write only no-object labels, so the
    loss is unchanged except that the point-coordinate PRNG draw has shape
    (B, T_bucket, S, 2) instead of (B, T_max, S, 2) — same distribution,
    different stream, exactly as the reference's ragged draw depends on its
    real instance count. Pinned exact (injected slot-stable coords) by
    tests/test_compaction.py.

    When `packed` (the bit-packed (B, T, N) GT twin, Batch.mask_labels_packed)
    is given, it is permuted/sliced identically and returned as a 4th element.
    """
    valid = np.asarray(valid, bool)
    t = valid.shape[1]
    tmax = int(valid.sum(1).max(initial=0))
    tb = max(1, int(min_bucket))
    while tb < tmax:
        tb *= 2
    tb = min(tb, t)
    if tb >= t:
        out = (mask_labels, class_labels, valid)
        return out + (packed,) if packed is not None else out
    if valid[:, tb:].any():  # valid slots past the slice point: pack them first
        order = np.argsort(~valid, axis=1, kind="stable")
        mask_labels = np.take_along_axis(mask_labels, order[:, :, None, None], axis=1)
        class_labels = np.take_along_axis(class_labels, order, axis=1)
        if packed is not None:
            packed = np.take_along_axis(packed, order[:, :, None], axis=1)
        valid = np.take_along_axis(valid, order, axis=1)
    out = (mask_labels[:, :tb], class_labels[:, :tb], valid[:, :tb])
    return out + (packed[:, :tb],) if packed is not None else out


def load_meta(path: str, root: Optional[str] = None) -> list[dict]:
    with open(path) as f:
        records = json.load(f)
    if root:
        for r in records:
            img = r["image"]
            r["image"] = (
                [os.path.join(root, p) for p in img] if isinstance(img, list) else os.path.join(root, img)
            )
            r["annotation"] = os.path.join(root, r["annotation"])
    return records


def get_label2id(path: str) -> dict[str, int]:
    with open(path) as f:
        return json.load(f)


class SegmentationDataset:
    """Deterministic, indexable dataset producing fixed-shape examples."""

    def __init__(
        self,
        records: list[dict],
        version: str,
        preprocess: PreprocessConfig,
        max_instances: int = 20,
        cache: bool = True,
        cache_bytes_limit: int = 4 << 30,
        device_channels: bool = False,
    ):
        """`device_channels=True` makes examples carry PACKED RAW uint8
        frames (rgb | depth [| gradient], 6-9 bytes/pixel) instead of the
        built float32 channel stack (16-40 B/px); the Trainer's eval step
        then builds the channels ON DEVICE inside the compiled program
        (data/device_preprocess.py). Exact only when the source frames are
        already at the target size (the host builders derive features at
        source resolution then cv2-resize, which doesn't commute) — the mode
        silently disables itself dataset-wide the first time an example is
        ineligible (wrong size, unsupported layout, or an augmentation
        transform installed) so mixed datasets stay correct."""
        self.records = records
        self.version = version
        self.preprocess = preprocess
        self.max_instances = max_instances
        # Eligibility decided UP FRONT (header-only size reads) so the item
        # layout never flips mid-iteration — a flip would mix uint8 packed
        # and float32 built items inside one batch.
        self.device_channels = device_channels and self._probe_device_channels()
        self.map_fn = MAP_FUNCTIONS[get_version(version).map_fn]
        # In-memory cache of processed examples: the channel builders run
        # cv2/PIL work per example; the reference materializes this once via
        # datasets.map (dataloader.py:559-560), we cache on first access.
        # Disabled automatically past `cache_bytes_limit`.
        self._cache: Optional[dict[int, tuple]] = {} if cache else None
        self._cache_bytes = 0
        self._cache_bytes_limit = cache_bytes_limit
        self._warned_truncation = False
        # Opt-in (the Trainer's eval/predict loops set it): batches carry
        # bit-packed GT masks, built here in the worker threads instead of in
        # the evaluator's dispatch path. Memoized per example.
        self.pack_gt = False
        self._packed_cache: dict[int, np.ndarray] = {}

    def __len__(self) -> int:
        return len(self.records)

    def original_size(self, idx: int) -> tuple[int, int]:
        """(height, width) of the raw (pre-resize) RGB image — a header-only
        read, cached. Reference: get_original_image_sizes_from_image_list
        (predictor.py:692)."""
        if not hasattr(self, "_orig_sizes"):
            self._orig_sizes: dict[int, tuple[int, int]] = {}
        if idx not in self._orig_sizes:
            img = self.records[idx]["image"]
            img = img[0] if isinstance(img, (list, tuple)) else img
            if isinstance(img, str):
                from PIL import Image

                with Image.open(img) as im:
                    w, h = im.size
            else:
                h, w = np.asarray(img).shape[:2]
            self._orig_sizes[idx] = (int(h), int(w))
        return self._orig_sizes[idx]

    def original_rgb(self, idx: int) -> np.ndarray:
        """Raw RGB image at its original size (for original-size overlays)."""
        img = self.records[idx]["image"]
        img = img[0] if isinstance(img, (list, tuple)) else img
        if isinstance(img, str):
            from PIL import Image

            return np.asarray(Image.open(img).convert("RGB"))
        return np.asarray(img)

    def _probe_device_channels(self) -> bool:
        """True iff every example can ship packed raw frames: supported
        layout, no augmentation transform, and ONE uniform frame size across
        the whole dataset (header-only PIL reads — no pixel decode). The
        size need not be the target size: the device builder resizes with
        bit-exact host-resampler twins (device_preprocess, ops/resize_exact)
        — uniformity is only required so the packed batches keep one static
        shape (one compiled program)."""
        from . import device_preprocess as DP
        from . import registry as R

        spec = get_version(self.version)
        if not DP.supported(spec.map_fn) or R.TRANSFORM is not None:
            return False
        n_frames = DP.packed_width(spec.map_fn) // 3
        from PIL import Image

        sizes = set()
        for rec in self.records:
            imgs = rec["image"] if isinstance(rec["image"], (list, tuple)) else [rec["image"]]
            if len(imgs) < n_frames:
                return False
            for p in imgs[:n_frames]:
                if isinstance(p, str):
                    with Image.open(p) as im:
                        w, h = im.size
                else:
                    h, w = np.asarray(p).shape[:2]
                sizes.add((h, w))
                if len(sizes) > 1:
                    return False
        return True

    def _raw_item(self, idx: int):
        """Packed raw uint8 frames + host-built labels (eligibility already
        established by _probe_device_channels)."""
        from . import device_preprocess as DP
        from . import registry as R

        spec = get_version(self.version)
        example = self.records[idx]
        color, mask = R._color_and_mask(example)
        frames = [color]
        width = DP.packed_width(spec.map_fn)
        if width > 3:
            frames.append(R._depth_rgb(example["image"]))
        if width > 6:
            frames.append(R._depth_rgb(example["image"], 2))
        instance_map, mapping = R._mask_and_mapping(mask)
        masks, labels = R._labels(instance_map, mapping, self.preprocess)
        return np.concatenate(frames, axis=-1), masks, labels

    def __getitem__(self, idx: int):
        if self._cache is not None and idx in self._cache:
            return self._cache[idx]
        raw = None
        if self.device_channels:
            from . import registry as R

            if R.TRANSFORM is not None:
                # a transform was installed after construction: raw frames
                # would skip it — rebuild on the host from here on (and drop
                # cached raw items so batches stay layout-consistent)
                import logging

                logging.getLogger(__name__).warning(
                    "device_channels disabled: an augmentation transform was "
                    "installed; host channel building takes over"
                )
                self.device_channels = False
                self._cache = {} if self._cache is not None else None
                self._cache_bytes = 0
            else:
                raw = self._raw_item(idx)
        if raw is not None:
            pix, masks, labels = raw
        else:
            pix, masks, labels = self.map_fn(self.records[idx], self.preprocess)
        t = self.max_instances
        n = min(masks.shape[0], t)
        if masks.shape[0] > t and not self._warned_truncation:
            # The reference keeps ragged instance lists and never drops GT
            # (dataloader.py:772-780); our static padding must not do so
            # silently. Raise --max_instances to cover the dataset.
            self._warned_truncation = True
            import logging

            logging.getLogger(__name__).warning(
                "example %d has %d instances but max_instances=%d — %d GT "
                "instance(s) TRUNCATED (raise max_instances; this warning "
                "prints once per dataset)",
                idx,
                masks.shape[0],
                t,
                masks.shape[0] - t,
            )
        # Label geometry comes from the masks (always built at the
        # preprocessed target size by _labels), NOT from pix: in
        # device_channels mode pix is the RAW frame at its source size,
        # which may legitimately differ (the device builder resizes).
        h, w = masks.shape[-2:] if masks.ndim == 3 else pix.shape[:2]
        pm = np.zeros((t, h, w), np.float32)
        pc = np.zeros((t,), np.int32)
        pv = np.zeros((t,), bool)
        pm[:n] = masks[:n]
        pc[:n] = labels[:n]
        pv[:n] = True
        item = (pix if raw is not None else pix.astype(np.float32), pm, pc, pv)
        if self._cache is not None and self._cache_bytes < self._cache_bytes_limit:
            self._cache[idx] = item
            self._cache_bytes += sum(a.nbytes for a in item)
        return item

    def batches(
        self,
        batch_size: int,
        shuffle: bool = False,
        seed: int = 0,
        drop_last: bool = False,
        num_workers: int = 4,
        epoch: int = 0,
        local_rows: Optional[tuple[int, int]] = None,
    ) -> Iterator[Batch]:
        """Yield fixed-shape batches. `local_rows=(start, stop)` restricts
        assembly to that row block of every batch — the multi-host path
        (parallel.multihost.host_row_range): every process iterates the same
        deterministic global order but only decodes its own rows."""
        order = np.arange(len(self))
        if shuffle:
            order = np.random.RandomState(seed + epoch).permutation(order)
        # Pad the final partial batch by repeating the first examples so shapes
        # stay static; callers can ignore padded rows via Batch sizes.
        idx_batches = []
        for s in range(0, len(order), batch_size):
            chunk = order[s : s + batch_size]
            if len(chunk) < batch_size:
                if drop_last:
                    continue
                pad = order[: batch_size - len(chunk)]
                chunk = np.concatenate([chunk, pad])
            if local_rows is not None:
                chunk = chunk[local_rows[0] : local_rows[1]]
            idx_batches.append(chunk)

        # num_workers=0 (HF semantics: load in the main process) degrades to a
        # single worker thread — same deterministic batch order either way,
        # the double-buffering below already preserves yield order.
        with futures.ThreadPoolExecutor(max_workers=max(1, num_workers)) as pool:
            pending = []
            it = iter(idx_batches)

            def submit_next():
                try:
                    chunk = next(it)
                except StopIteration:
                    return None
                return pool.submit(self._assemble, chunk)

            for _ in range(2):  # double-buffer
                f = submit_next()
                if f:
                    pending.append(f)
            while pending:
                f = pending.pop(0)
                nxt = submit_next()
                if nxt:
                    pending.append(nxt)
                yield f.result()

    def _packed_masks(self, idx: int, pm: np.ndarray) -> np.ndarray:
        """Bit-packed (T, ceil(H*W/8)) GT for example `idx` — identical to
        np.packbits(batch.mask_labels.reshape(B, T, -1), axis=-1) row-wise,
        which is what the device-stats eval consumes.

        Memoized ONLY when the item itself sits in the (bounded) item cache:
        an uncached item is rebuilt per epoch — possibly through a random
        augmentation transform — and a forever-memoized packed twin would go
        stale against it (and grow unbounded). Tying the two caches together
        keeps them consistent and inside the same memory budget."""
        if self._cache is not None and idx in self._cache:
            if idx not in self._packed_cache:
                self._packed_cache[idx] = np.packbits(
                    pm.astype(bool).reshape(pm.shape[0], -1), axis=-1
                )
            return self._packed_cache[idx]
        return np.packbits(pm.astype(bool).reshape(pm.shape[0], -1), axis=-1)

    def _assemble(self, indices) -> Batch:
        items = [self[int(i)] for i in indices]
        return Batch(
            pixel_values=np.stack([i[0] for i in items]),
            mask_labels=np.stack([i[1] for i in items]),
            class_labels=np.stack([i[2] for i in items]),
            valid=np.stack([i[3] for i in items]),
            orig_sizes=np.array(
                [self.original_size(int(i)) for i in indices], np.int32
            ),
            mask_labels_packed=(
                np.stack([self._packed_masks(int(i), it[1]) for i, it in zip(indices, items)])
                if self.pack_gt
                else None
            ),
        )


def build_datasets(args) -> tuple["SegmentationDataset", "SegmentationDataset", dict, dict]:
    """Reference `dataloader(args, ...)` equivalent (dataloader.py:540-565):
    returns (train, valid, label2id, id2label) honoring do_reduce_labels."""
    label2id = get_label2id(os.path.join(args.root_path, args.label2id_path))
    if args.do_reduce_labels:
        label2id = {k: v - 1 for k, v in label2id.items() if v != 0}
    id2label = {v: k for k, v in label2id.items()}

    pp = PreprocessConfig(
        height=args.image_height,
        width=args.image_width,
        do_reduce_labels=args.do_reduce_labels,
        ignore_index=args.ignore_index,
    )
    device_channels = bool(getattr(args, "device_channels", False))
    train = SegmentationDataset(
        load_meta(os.path.join(args.root_path, args.train_json_path), args.root_path),
        args.version,
        pp,
        max_instances=args.max_instances,
        device_channels=device_channels,
    )
    valid = SegmentationDataset(
        load_meta(os.path.join(args.root_path, args.valid_json_path), args.root_path),
        args.version,
        pp,
        max_instances=args.max_instances,
        device_channels=device_channels,
    )
    return train, valid, label2id, id2label
