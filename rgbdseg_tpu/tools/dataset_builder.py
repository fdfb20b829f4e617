"""Dataset construction: CVAT/COCO annotations -> 3-channel masks + meta JSON.

Capability parity with the reference's dataset_constructor pipeline
(reference: data_process.py:100-121 combine_sematic_instance_mask,
:512-572 generate_combined_masks, :370-397 split2train_and_valid,
:400-487 generate_meta_file, :575-625 dataset_constructor).

Mask format (reference: data_process.py:111-117): 3-channel PNG where, as read
by cv2 (BGR), channel 1 carries instance ids and channel 2 semantic ids;
channel 0 is unused.
"""

from __future__ import annotations

import json
import os
from collections import defaultdict

import cv2
import numpy as np


def combine_semantic_instance_mask(semantic: np.ndarray, instance: np.ndarray) -> np.ndarray:
    """Two grayscale masks -> 3-channel combined mask (ch1=instance, ch2=semantic)."""
    h, w = semantic.shape[:2]
    out = np.zeros((h, w, 3), np.uint8 if semantic.max() < 256 and instance.max() < 256 else np.uint16)
    out[..., 1] = instance
    out[..., 2] = semantic
    return out


def polygon_to_mask(polygon, h: int, w: int) -> np.ndarray:
    """COCO polygon(s) -> binary mask (cv2.fillPoly rasterization)."""
    mask = np.zeros((h, w), np.uint8)
    polys = polygon if isinstance(polygon[0], (list, np.ndarray)) else [polygon]
    pts = [np.asarray(p, np.float64).reshape(-1, 2).round().astype(np.int32) for p in polys]
    cv2.fillPoly(mask, pts, 1)
    return mask


def rasterize_coco(coco_json: str, images_dir: str, masks_dir: str) -> list[dict]:
    """COCO instance annotations -> combined 3-channel masks on disk.

    Returns records [{"image", "annotation", "semantic_class_to_id"}].
    """
    with open(coco_json) as f:
        coco = json.load(f)
    os.makedirs(masks_dir, exist_ok=True)
    cats = {c["id"]: c["name"] for c in coco["categories"]}
    label2id = {"background": 0}
    for cid in sorted(cats):
        label2id[cats[cid]] = len(label2id)

    anns_by_img = defaultdict(list)
    for a in coco["annotations"]:
        anns_by_img[a["image_id"]].append(a)

    records = []
    for img in coco["images"]:
        h, w = img["height"], img["width"]
        combined = np.zeros((h, w, 3), np.uint16)
        inst_counter = 0
        for a in anns_by_img.get(img["id"], []):
            inst_counter += 1
            seg = a["segmentation"]
            if isinstance(seg, dict):
                from ..inference import rle as rle_codec

                m = rle_codec.decode(seg).astype(bool)
            else:
                m = polygon_to_mask(seg, h, w).astype(bool)
            combined[m, 1] = inst_counter
            combined[m, 2] = label2id[cats[a["category_id"]]]
        mask_path = os.path.join(masks_dir, os.path.splitext(img["file_name"])[0] + ".png")
        os.makedirs(os.path.dirname(mask_path), exist_ok=True)
        cv2.imwrite(mask_path, combined)
        records.append(
            {
                "image": os.path.join(images_dir, img["file_name"]),
                "annotation": mask_path,
                "semantic_class_to_id": label2id,
            }
        )
    return records


def split_train_valid(records: list, train_ratio: float = 0.7, seed: int = 0) -> tuple[list, list]:
    """70/30 split (reference: data_process.py:370-397)."""
    rng = np.random.RandomState(seed)
    order = rng.permutation(len(records))
    n_train = int(len(records) * train_ratio)
    train = [records[i] for i in order[:n_train]]
    valid = [records[i] for i in order[n_train:]]
    return train, valid


def write_meta(records: list, path: str) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump(records, f, indent=2)


def dataset_constructor(
    coco_json: str,
    images_dir: str,
    output_dir: str,
    train_ratio: float = 0.7,
    seed: int = 0,
) -> dict:
    """End-to-end build: rasterize -> split -> meta files + label2id.json."""
    records = rasterize_coco(coco_json, images_dir, os.path.join(output_dir, "mask"))
    train, valid = split_train_valid(records, train_ratio, seed)
    write_meta(train, os.path.join(output_dir, "train.json"))
    write_meta(valid, os.path.join(output_dir, "valid.json"))
    label2id = records[0]["semantic_class_to_id"] if records else {"background": 0}
    with open(os.path.join(output_dir, "label2id.json"), "w") as f:
        json.dump(label2id, f, indent=2)
    return {
        "train": os.path.join(output_dir, "train.json"),
        "valid": os.path.join(output_dir, "valid.json"),
        "label2id": os.path.join(output_dir, "label2id.json"),
    }
