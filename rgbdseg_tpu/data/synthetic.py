"""Synthetic RGB-D fixture dataset generator.

Produces a tiny on-disk dataset in the reference's meta-JSON format (the
reference ships `dataset/local/experiment_tiny_set` — images absent from the
public tree — so tests generate an equivalent fixture deterministically):
RGB images with colored shapes, aligned depth (shapes at distinct depths),
3-channel instance+semantic masks, train/valid meta JSON, label2id.json.
"""

from __future__ import annotations

import json
import os

import cv2
import numpy as np


def _draw_scene(rng: np.random.RandomState, h: int, w: int, num_objects: int):
    rgb = np.full((h, w, 3), 30, np.uint8)
    rgb[:] = rng.randint(20, 60, size=(1, 1, 3), dtype=np.uint8)
    depth = np.full((h, w), 200, np.uint8)  # background far
    mask = np.zeros((h, w, 3), np.uint8)  # ch1 = instance id, ch2 = semantic id

    for i in range(num_objects):
        inst_id = i + 1
        sem_id = rng.randint(1, 3)  # classes 1..2 (0 = background)
        color = rng.randint(80, 255, size=3).tolist()
        # clamp below the 200 background so dense scenes (10+ objects) stay
        # valid uint8 and every object remains nearer than the background
        obj_depth = int(min(40 + 40 * i + rng.randint(0, 10), 195))
        cx, cy = rng.randint(w // 6, 5 * w // 6), rng.randint(h // 6, 5 * h // 6)
        r = rng.randint(min(h, w) // 10, min(h, w) // 5)
        shape = rng.randint(0, 2)
        canvas = np.zeros((h, w), np.uint8)
        if shape == 0:
            cv2.circle(canvas, (cx, cy), r, 1, -1)
        else:
            cv2.rectangle(canvas, (cx - r, cy - r), (cx + r, cy + r), 1, -1)
        sel = canvas.astype(bool)
        rgb[sel] = color
        depth[sel] = obj_depth
        mask[sel, 1] = inst_id
        mask[sel, 2] = sem_id

    # mild texture so gradients are non-trivial
    noise = rng.randint(0, 12, size=(h, w, 3), dtype=np.uint8)
    rgb = cv2.add(rgb, noise)
    return rgb, depth, mask


def generate(
    root: str,
    num_train: int = 6,
    num_valid: int = 3,
    size: tuple[int, int] = (96, 128),
    seed: int = 0,
    num_modalities: int = 0,
    num_objects: tuple[int, int] = (1, 4),
) -> dict:
    """Write the fixture dataset; returns paths dict.

    num_modalities > 0 additionally writes that many augmentation-modality
    images per example (for the 30-channel/CSF path). num_objects is the
    [lo, hi) range of instances per image (NYUv2-like density needs ~10+).
    """
    h, w = size
    rng = np.random.RandomState(seed)
    os.makedirs(root, exist_ok=True)
    for sub in ("images", "depth", "mask"):
        os.makedirs(os.path.join(root, sub), exist_ok=True)

    def make_split(name, n, offset):
        records = []
        for i in range(n):
            idx = offset + i
            rgb, depth, mask = _draw_scene(rng, h, w, num_objects=rng.randint(*num_objects))
            ip = f"images/{idx}.png"
            dp = f"depth/{idx}.png"
            mp = f"mask/{idx}.png"
            cv2.imwrite(os.path.join(root, ip), cv2.cvtColor(rgb, cv2.COLOR_RGB2BGR))
            cv2.imwrite(os.path.join(root, dp), depth)
            cv2.imwrite(os.path.join(root, mp), mask)
            images = [ip, dp]
            for m in range(num_modalities):
                mod = cv2.convertScaleAbs(depth, alpha=1.0 + 0.1 * m, beta=5 * m)
                mpth = f"depth/{idx}_mod{m}.png"
                cv2.imwrite(os.path.join(root, mpth), mod)
                images.append(mpth)
            records.append(
                {
                    "image": images,
                    "annotation": mp,
                    "semantic_class_to_id": {"background": 0, "box": 1, "ball": 2},
                }
            )
        meta_path = os.path.join(root, f"{name}.json")
        with open(meta_path, "w") as f:
            json.dump(records, f)
        return meta_path

    train = make_split("train", num_train, 0)
    valid = make_split("valid", num_valid, num_train)
    label2id = {"background": 0, "box": 1, "ball": 2}
    with open(os.path.join(root, "label2id.json"), "w") as f:
        json.dump(label2id, f)
    return {"root": root, "train": train, "valid": valid, "label2id": os.path.join(root, "label2id.json")}
