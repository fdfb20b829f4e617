"""Input pipeline tests: synthetic fixture + all versioned channel builders +
preprocessing parity with the HF image processor."""

import numpy as np
import pytest

from rgbdseg_tpu.config import PreprocessConfig
from rgbdseg_tpu import versions as V
from rgbdseg_tpu.data import synthetic
from rgbdseg_tpu.data.pipeline import SegmentationDataset, load_meta


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("tiny_set")
    return synthetic.generate(str(root), num_train=4, num_valid=2, num_modalities=8)


PP = PreprocessConfig(height=64, width=64)


@pytest.mark.parametrize("version", sorted(V.REGISTRY))
def test_channel_builders(fixture_dir, version):
    records = load_meta(fixture_dir["train"], fixture_dir["root"])
    ds = SegmentationDataset(records, version, PP, max_instances=8)
    pix, masks, classes, valid = ds[0]
    spec = V.get(version).channels
    assert pix.shape == (64, 64, spec.total), f"{version}: {pix.shape}"
    assert masks.shape == (8, 64, 64)
    assert valid.sum() >= 1  # background instance at minimum
    assert np.isfinite(pix).all()
    # classes of valid instances are within label range
    assert (classes[valid] <= 2).all()


def test_batching(fixture_dir):
    records = load_meta(fixture_dir["train"], fixture_dir["root"])
    ds = SegmentationDataset(records, "0.0.0", PP, max_instances=8)
    batches = list(ds.batches(batch_size=3, shuffle=True, seed=1))
    assert len(batches) == 2  # 4 examples -> 2 padded batches of 3
    assert batches[0].pixel_values.shape == (3, 64, 64, 3)
    assert batches[0].mask_labels.shape == (3, 8, 64, 64)


def test_preprocess_matches_hf_image_processor(fixture_dir):
    transformers = pytest.importorskip("transformers")
    from transformers import Mask2FormerImageProcessor

    records = load_meta(fixture_dir["train"], fixture_dir["root"])
    import cv2
    from PIL import Image

    rgb = np.asarray(Image.open(records[0]["image"][0]).convert("RGB"))
    mask = cv2.imread(records[0]["annotation"], cv2.IMREAD_UNCHANGED)
    inst = mask[..., 1]
    pairs = np.unique(mask[..., 1:].reshape(-1, 2), axis=0)
    mapping = {int(i): int(s) for i, s in pairs}

    # ignore_index=255 (no fixture pixel uses it): transformers 4.57's pad()
    # rejects constant_values=None even when the pad amount is zero.
    hf = Mask2FormerImageProcessor(
        size={"height": 64, "width": 64}, size_divisor=32, ignore_index=255, do_reduce_labels=False
    )
    out = hf(images=[rgb], segmentation_maps=[inst], instance_id_to_semantic_id=mapping, return_tensors="np")

    from rgbdseg_tpu.data.preprocess import process_example

    pix, masks_m, labels_m = process_example(rgb, inst, mapping, PP)
    ref_pix = out["pixel_values"][0].transpose(1, 2, 0)
    np.testing.assert_allclose(pix, ref_pix, rtol=1e-4, atol=1e-4)
    ref_masks = np.asarray(out["mask_labels"][0])
    ref_labels = np.asarray(out["class_labels"][0])
    assert masks_m.shape == ref_masks.shape
    np.testing.assert_array_equal(masks_m, ref_masks)
    np.testing.assert_array_equal(labels_m, ref_labels)
