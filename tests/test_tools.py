"""Tests for dataset-construction / QA / plotting tools."""

import json
import os

import cv2
import numpy as np
import pytest

from rgbdseg_tpu.tools import dataset_builder as DB
from rgbdseg_tpu.tools.annotation_converter import AnnotationConverter, mask_to_polygons
from rgbdseg_tpu.tools import labelme_coco as LC
from rgbdseg_tpu.tools.mask_check import visualize_masks, label_check
from rgbdseg_tpu.tools.plot_logs import plot_multiple_training_metrics
from rgbdseg_tpu.tools.realsense.depth_enhance import enhance_all


def _toy_coco(tmp_path):
    img = np.zeros((32, 48, 3), np.uint8)
    os.makedirs(tmp_path / "images", exist_ok=True)
    cv2.imwrite(str(tmp_path / "images" / "a.png"), img)
    coco = {
        "images": [{"id": 1, "file_name": "a.png", "height": 32, "width": 48}],
        "annotations": [
            {
                "id": 1,
                "image_id": 1,
                "category_id": 5,
                "segmentation": [[4, 4, 20, 4, 20, 16, 4, 16]],
                "area": 192,
                "bbox": [4, 4, 16, 12],
                "iscrowd": 0,
            },
            {
                "id": 2,
                "image_id": 1,
                "category_id": 7,
                "segmentation": [[30, 20, 44, 20, 44, 30, 30, 30]],
                "area": 140,
                "bbox": [30, 20, 14, 10],
                "iscrowd": 0,
            },
        ],
        "categories": [{"id": 5, "name": "box"}, {"id": 7, "name": "ball"}],
    }
    p = tmp_path / "coco.json"
    with open(p, "w") as f:
        json.dump(coco, f)
    return str(p)


def test_dataset_constructor_roundtrip(tmp_path):
    coco_path = _toy_coco(tmp_path)
    out = DB.dataset_constructor(coco_path, str(tmp_path / "images"), str(tmp_path / "out"), train_ratio=0.7)
    assert os.path.exists(out["train"]) and os.path.exists(out["valid"]) and os.path.exists(out["label2id"])
    # the single image lands in train (70% of 1)
    with open(out["train"]) as f:
        train = json.load(f)
    with open(out["valid"]) as f:
        valid = json.load(f)
    records = train + valid
    assert len(records) == 1
    mask = cv2.imread(records[0]["annotation"], cv2.IMREAD_UNCHANGED)
    assert set(np.unique(mask[..., 1])) == {0, 1, 2}  # two instances
    assert set(np.unique(mask[..., 2])) <= {0, 1, 2}


def test_annotation_converter_coco_and_back(tmp_path):
    coco_path = _toy_coco(tmp_path)
    conv = AnnotationConverter(str(tmp_path / "masks"))
    records = conv.convert("coco", coco_path)
    assert len(records) == 1 and conv.instance_counter == 2
    coco = conv.convert_to_coco_json(records, str(tmp_path / "back.json"))
    assert len(coco["annotations"]) == 2
    # polygon of a rectangle should rasterize back to roughly the same mask
    polys = coco["annotations"][0]["segmentation"]
    m = DB.polygon_to_mask(polys, 32, 48)
    assert m.sum() > 50


def test_mask_to_polygons_handles_holes():
    m = np.zeros((30, 30), np.uint8)
    m[5:25, 5:25] = 1
    m[12:18, 12:18] = 0  # hole
    polys, has_holes = mask_to_polygons(m)
    assert len(polys) == 1  # outer contour only
    assert has_holes


def test_donut_round_trip(tmp_path):
    """A donut instance must survive masks -> COCO -> masks exactly
    (VERDICT #8; reference: custom_mask_generator.py:86-138 keeps hole
    hierarchy — we fall back to RLE for holed instances)."""
    import cv2

    donut = np.zeros((40, 50), np.uint8)
    cv2.circle(donut, (25, 20), 15, 1, -1)
    cv2.circle(donut, (25, 20), 6, 0, -1)
    combined = np.zeros((40, 50, 3), np.uint16)
    combined[donut.astype(bool), 1] = 1
    combined[donut.astype(bool), 2] = 1
    mask_path = str(tmp_path / "donut.png")
    cv2.imwrite(mask_path, combined)
    rec = {
        "image": "donut_rgb.png",
        "annotation": mask_path,
        "semantic_class_to_id": {"background": 0, "donut": 1},
    }
    conv = AnnotationConverter(str(tmp_path / "out"))
    coco = conv.convert_to_coco_json([rec], str(tmp_path / "coco.json"))
    seg = coco["annotations"][0]["segmentation"]
    assert isinstance(seg, dict)  # holed instance exported as RLE
    import json as _json

    _json.dumps(seg)  # must be JSON-serializable
    from rgbdseg_tpu.inference import rle as rle_codec

    assert np.array_equal(rle_codec.decode(seg).astype(bool), donut.astype(bool))
    # and it parses back through the COCO parser to the identical mask
    coco["images"][0]["file_name"] = "donut_rgb.png"
    items = list(conv._parse_coco(str(tmp_path / "coco.json")))
    m2, _ = items[0]["instances"][0]
    assert np.array_equal(m2, donut.astype(bool))


def test_labelme_converter(tmp_path):
    lm = {
        "imagePath": "x.png",
        "imageHeight": 20,
        "imageWidth": 20,
        "shapes": [
            {"label": "cup", "points": [[2, 2], [10, 2], [10, 10], [2, 10]]},
        ],
    }
    with open(tmp_path / "x.json", "w") as f:
        json.dump(lm, f)
    coco = LC.convert_labelme_to_coco(str(tmp_path), str(tmp_path / "coco.json"))
    assert coco["annotations"][0]["area"] == 64.0
    assert coco["categories"][0]["name"] == "cup"


def test_mask_check(tmp_path):
    img = np.random.RandomState(0).randint(0, 255, (16, 16, 3), np.uint8)
    mask = np.zeros((16, 16, 3), np.uint8)
    mask[4:8, 4:8, 1] = 1
    mask[4:8, 4:8, 2] = 2
    cv2.imwrite(str(tmp_path / "i.png"), img)
    cv2.imwrite(str(tmp_path / "m.png"), mask)
    grid = visualize_masks(str(tmp_path / "i.png"), str(tmp_path / "m.png"), str(tmp_path / "o.png"))
    assert grid.shape == (16, 48, 3)
    meta = [{"image": "i.png", "annotation": "m.png", "semantic_class_to_id": {}}]
    with open(tmp_path / "meta.json", "w") as f:
        json.dump(meta, f)
    assert label_check(str(tmp_path / "meta.json"), str(tmp_path), str(tmp_path / "chk")) == 1


def test_plot_logs(tmp_path):
    hist = [
        {"loss": 2.0, "learning_rate": 1e-5, "grad_norm": 3.0, "epoch": 1.0, "step": 5},
        {"eval_loss": 1.8, "eval_map": 0.1, "eval_map_50": 0.2, "eval_map_box": 0.15, "epoch": 1.0, "step": 5},
        {"loss": 1.5, "learning_rate": 8e-6, "grad_norm": 2.0, "epoch": 2.0, "step": 10},
        {"eval_loss": 1.4, "eval_map": 0.2, "eval_map_50": 0.3, "eval_map_box": 0.25, "epoch": 2.0, "step": 10},
    ]
    p = tmp_path / "trainer_state.json"
    with open(p, "w") as f:
        json.dump({"log_history": hist, "global_step": 10}, f)
    written = plot_multiple_training_metrics({"run1": str(p)}, str(tmp_path / "plots"))
    assert all(os.path.exists(w) for w in written)
    assert len(written) >= 2  # main page + category page


def test_depth_enhancements():
    gray = np.random.RandomState(0).randint(0, 255, (24, 24), np.uint8)
    out = enhance_all(gray)
    assert set(out) == {"eq", "ahe", "lt", "gamma", "laplace", "gaussian"}
    for v in out.values():
        assert v.shape == gray.shape and v.dtype == np.uint8


def test_visualize_multi_model_json(tmp_path):
    from rgbdseg_tpu.inference import rle
    from rgbdseg_tpu.inference.visualize import visualize_multi_model_json_results

    m1 = np.zeros((16, 16), bool)
    m1[2:8, 2:8] = True
    m2 = np.zeros((16, 16), bool)
    m2[9:14, 9:14] = True
    gt = [
        {"image_id": 0, "category_id": 1, "score": 1.0, "segmentation": rle.encode(m1)},
        {"image_id": 0, "category_id": 2, "score": 1.0, "segmentation": rle.encode(m2)},
    ]
    pred = [{"image_id": 0, "category_id": 1, "score": 0.9, "segmentation": rle.encode(m1)}]
    with open(tmp_path / "gt.json", "w") as f:
        json.dump(gt, f)
    with open(tmp_path / "m.json", "w") as f:
        json.dump(pred, f)
    visualize_multi_model_json_results(
        str(tmp_path / "gt.json"), {"mymodel": str(tmp_path / "m.json")}, str(tmp_path / "viz")
    )
    assert os.path.exists(tmp_path / "viz" / "compare_0.png")


def test_qa_viewers_smoke(tmp_path):
    """CSF + DSAM visual QA hooks (reference data_process.py:922-1016,
    custom_model.py:800-820) render from the on-device ops."""
    matplotlib = pytest.importorskip("matplotlib")
    matplotlib.use("Agg")
    from rgbdseg_tpu.tools import qa_viewers

    rs = np.random.RandomState(0)
    imgs = rs.rand(3, 24, 32, 1).astype(np.float32)
    out = qa_viewers.csf_viewer(imgs, save=str(tmp_path / "csf.png"))
    assert out and (tmp_path / "csf.png").stat().st_size > 0

    depth = np.concatenate(
        [np.full((16, 32), 40.0), np.full((16, 32), 120.0)], axis=0
    ) + rs.rand(32, 32)
    qa_viewers.dsam_histogram_viewer(depth, save=str(tmp_path / "hist.png"))
    qa_viewers.dsam_region_viewer(depth, save=str(tmp_path / "regions.png"))
    assert (tmp_path / "hist.png").stat().st_size > 0
    assert (tmp_path / "regions.png").stat().st_size > 0


def test_push_to_hub_paths(monkeypatch, tmp_path):
    """Hub push (reference finetuning.py:141-149): uploads the run dir when a
    client is available; degrades to a no-op (False) offline."""
    huggingface_hub = pytest.importorskip("huggingface_hub")
    from rgbdseg_tpu.train.hub import push_to_hub

    calls = []

    class Fake:
        def __init__(self, **kw):
            pass

        def create_repo(self, repo_id, **kw):
            calls.append(("create", repo_id))

        def upload_folder(self, repo_id, folder_path):
            calls.append(("upload", repo_id, folder_path))

    monkeypatch.setattr(huggingface_hub, "HfApi", Fake)
    assert push_to_hub(str(tmp_path), repo_id="org/run") is True
    assert calls == [("create", "org/run"), ("upload", "org/run", str(tmp_path))]

    class Offline:
        def __init__(self, **kw):
            raise RuntimeError("no network")

    monkeypatch.setattr(huggingface_hub, "HfApi", Offline)
    assert push_to_hub(str(tmp_path)) is False
