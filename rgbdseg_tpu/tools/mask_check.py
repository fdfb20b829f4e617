"""Mask QA viewer: overlay instance/semantic masks for visual validation.

Capability parity with custom_mask_check.visualize_masks (reference:
custom_mask_check.py:80-236) and label_check (data_process.py:169-222):
deterministic per-id colors, instance + semantic overlays, saved to disk
(headless) instead of plt.show().
"""

from __future__ import annotations

import json
import os

import cv2
import numpy as np


def _id_color(idx: int) -> np.ndarray:
    rng = np.random.RandomState(int(idx) * 7919 + 13)
    return rng.randint(50, 255, size=3).astype(np.uint8)


def colorize_ids(id_map: np.ndarray) -> np.ndarray:
    out = np.zeros((*id_map.shape, 3), np.uint8)
    for i in np.unique(id_map):
        if i == 0:
            continue
        out[id_map == i] = _id_color(int(i))
    return out


def visualize_masks(
    image_path: str,
    mask_path: str,
    save_path: str | None = None,
    alpha: float = 0.5,
) -> np.ndarray:
    """Side-by-side: image | instance overlay | semantic overlay."""
    img = cv2.cvtColor(cv2.imread(image_path), cv2.COLOR_BGR2RGB)
    mask = cv2.imread(mask_path, cv2.IMREAD_UNCHANGED)
    inst, sem = mask[..., 1], mask[..., 2]
    if img.shape[:2] != inst.shape:
        img = cv2.resize(img, (inst.shape[1], inst.shape[0]))
    inst_vis = ((1 - alpha) * img + alpha * colorize_ids(inst)).astype(np.uint8)
    sem_vis = ((1 - alpha) * img + alpha * colorize_ids(sem)).astype(np.uint8)
    grid = np.concatenate([img, inst_vis, sem_vis], axis=1)
    if save_path:
        os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
        cv2.imwrite(save_path, cv2.cvtColor(grid, cv2.COLOR_RGB2BGR))
    return grid


def label_check(meta_json: str, root: str, out_dir: str, limit: int | None = None) -> int:
    """Run visualize_masks over a meta file; returns number of checked images."""
    with open(meta_json) as f:
        records = json.load(f)
    n = 0
    for i, rec in enumerate(records[: limit or len(records)]):
        img = rec["image"][0] if isinstance(rec["image"], list) else rec["image"]
        visualize_masks(
            os.path.join(root, img),
            os.path.join(root, rec["annotation"]),
            os.path.join(out_dir, f"check_{i}.png"),
        )
        n += 1
    return n
