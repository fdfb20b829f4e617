"""Input pipeline tests: synthetic fixture + all versioned channel builders +
preprocessing parity with the HF image processor."""

import jax.numpy as jnp
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


@pytest.fixture(scope="module")
def dense_fixture(tmp_path_factory):
    """One example with 30 instances (NYUv2 images can exceed 20 — VERDICT #6:
    static padding must not silently drop GT; reference keeps ragged lists,
    dataloader.py:772-780)."""
    import cv2
    import json
    import os

    root = str(tmp_path_factory.mktemp("dense_set"))
    h, w = 96, 128
    rgb = np.random.RandomState(0).randint(0, 255, (h, w, 3), np.uint8)
    depth = np.full((h, w), 120, np.uint8)
    mask = np.zeros((h, w, 3), np.uint8)
    # 30 distinct tiles: 6 cols x 5 rows
    for i in range(30):
        r, c = divmod(i, 6)
        y0, x0 = 4 + r * 18, 4 + c * 20
        mask[y0 : y0 + 14, x0 : x0 + 16, 1] = i + 1  # instance id
        mask[y0 : y0 + 14, x0 : x0 + 16, 2] = 1 + (i % 2)  # semantic id
    cv2.imwrite(os.path.join(root, "rgb.png"), rgb)
    cv2.imwrite(os.path.join(root, "depth.png"), depth)
    cv2.imwrite(os.path.join(root, "mask.png"), mask)
    rec = {
        "image": ["rgb.png", "depth.png"],
        "annotation": "mask.png",
        "semantic_class_to_id": {"background": 0, "box": 1, "ball": 2},
    }
    meta = os.path.join(root, "train.json")
    with open(meta, "w") as f:
        json.dump([rec], f)
    return {"root": root, "train": meta}


def test_30_instances_no_silent_truncation(dense_fixture):
    records = load_meta(dense_fixture["train"], dense_fixture["root"])
    ds = SegmentationDataset(records, "0.0.0", PP, max_instances=40)
    _, masks, classes, valid = ds[0]
    assert valid.sum() >= 30  # all 30 tiles survive (+ background instance)
    # every tile's mask is non-empty post-resize
    assert (masks[valid].sum(axis=(1, 2)) > 0).all()


def test_truncation_warns_loudly(dense_fixture, caplog):
    import logging

    records = load_meta(dense_fixture["train"], dense_fixture["root"])
    ds = SegmentationDataset(records, "0.0.0", PP, max_instances=8, cache=False)
    with caplog.at_level(logging.WARNING):
        _, _, _, valid = ds[0]
        assert valid.sum() == 8
        assert any("TRUNCATED" in r.message for r in caplog.records)
        caplog.clear()
        ds[0]  # second access: warning printed once per dataset
        assert not any("TRUNCATED" in r.message for r in caplog.records)


def test_transform_hook(fixture_dir):
    """Albumentations-style augmentation extension point (reference
    dataloader.py:19): a joint (image, mask) transform flows through the map
    fns and keeps pixels and instance masks aligned."""
    from rgbdseg_tpu.data import registry

    records = load_meta(fixture_dir["train"], fixture_dir["root"])
    ds_plain = SegmentationDataset(records, "0.0.0", PP, max_instances=8, cache=False)
    pix0, masks0, classes0, valid0 = ds_plain[0]

    def hflip(image, mask):
        return {"image": image[:, ::-1], "mask": mask[:, ::-1]}

    registry.set_transform(hflip)
    try:
        ds_aug = SegmentationDataset(records, "0.0.0", PP, max_instances=8, cache=False)
        pix1, masks1, classes1, valid1 = ds_aug[0]
    finally:
        registry.set_transform(None)

    assert np.allclose(pix1, pix0[:, ::-1], atol=1e-5)
    assert valid1.sum() == valid0.sum()
    # flipped geometry: per-instance centroids mirror about the x axis
    # (nearest-resize does not commute with flip bit-exactly at boundaries,
    # so compare centroids, not pixels)
    w = masks0.shape[-1]
    for m0, m1 in zip(masks0[valid0], masks1[valid1]):
        cx0 = np.nonzero(m0)[1].mean()
        cx1 = np.nonzero(m1)[1].mean()
        assert abs(cx1 - ((w - 1) - cx0)) < 1.5, (cx0, cx1)


class TestDevicePreprocess:
    """data/device_preprocess.py must reproduce the host channel builders
    bit-for-bit (same-size inputs; PIL-L grayscale is integer-exact)."""

    def _example(self, rng, hw=(64, 96)):
        import PIL.Image as PILImage

        h, w = hw
        rgb = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
        depth = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
        return rgb, depth

    def test_pil_grayscale_exact(self):
        from PIL import Image
        from rgbdseg_tpu.data.device_preprocess import pil_grayscale_u8

        rng = np.random.RandomState(0)
        rgb = rng.randint(0, 256, (37, 53, 3), dtype=np.uint8)
        expected = np.asarray(Image.fromarray(rgb).convert("L"))
        got = np.asarray(pil_grayscale_u8(jnp.asarray(rgb)))
        np.testing.assert_array_equal(got, expected)

    # every device-supported layout: 0.0.0 (3ch), 0.0.2 (7ch tmp), 0.0.5
    # (7ch gradient features), 0.0.6 (7ch normals), 0.0.7 (4ch gray), 0.1.1
    # (6ch), 0.3.0 (10ch case1, on-disk gradient frame), 0.4.0 (10ch case2)
    # src=None: frames already at the target size (derive-only path).
    # src=(100, 150) / (40, 60): arbitrary camera sizes — the device builder
    # resizes with the bit-exact host-resampler twins (VERDICT r4 #8) in the
    # host's derive/resize order; parity must hold exactly either way.
    @pytest.mark.parametrize("src", [None, (100, 150), (40, 60)])
    @pytest.mark.parametrize(
        "version", ["0.0.0", "0.0.2", "0.0.5", "0.0.6", "0.0.7", "0.1.1", "0.3.0", "0.4.0"]
    )
    def test_matches_host_builder(self, version, src, tmp_path):
        from PIL import Image
        from rgbdseg_tpu import versions as V
        from rgbdseg_tpu.config import PreprocessConfig
        from rgbdseg_tpu.data import registry as R
        from rgbdseg_tpu.data import device_preprocess as DP

        rng = np.random.RandomState(1)
        h, w = 64, 96  # target, already divisible by 32
        sh, sw = src or (h, w)
        cfg = PreprocessConfig(height=h, width=w)
        spec = V.get(version)
        assert DP.supported(spec.map_fn)
        width = DP.packed_width(spec.map_fn)
        frames, paths = [], []
        for i in range(width // 3):
            f = rng.randint(0, 256, (sh, sw, 3), dtype=np.uint8)
            p = str(tmp_path / f"f{i}.png")
            Image.fromarray(f).save(p)
            frames.append(f)
            paths.append(p)
        example = {"image": paths if len(paths) > 1 else paths[0], "annotation": None}
        host_pix, _, _ = R.MAP_FUNCTIONS[spec.map_fn](example, cfg)
        dev_pix = np.asarray(
            DP.build_from_packed(spec.map_fn, jnp.asarray(np.concatenate(frames, -1))[None], cfg)[0]
        )
        assert dev_pix.shape == host_pix.shape
        np.testing.assert_allclose(dev_pix, host_pix, atol=1e-6, rtol=1e-6)


@pytest.mark.slow  # double predictor compile (~74 s); the same wiring incl.
# on-device resize is covered fast by test_predictor_fast_path_handles_source_resize
def test_predictor_device_preprocess_matches_host(tmp_path):
    """Predictor.predict_example's uint8 device-preprocess fast path must give
    the same instances as the host channel-builder fallback (forced via an
    identity transform, which disables the fast path)."""
    from PIL import Image
    import jax
    from rgbdseg_tpu.config import ModelConfig
    from rgbdseg_tpu.data import registry as R
    from rgbdseg_tpu.inference.predictor import Predictor
    from rgbdseg_tpu.models.mask2former import Mask2FormerRGBD

    rng = np.random.RandomState(7)
    h, w = 64, 64
    rgb_p, d_p = str(tmp_path / "r.png"), str(tmp_path / "d.png")
    Image.fromarray(rng.randint(0, 256, (h, w, 3), dtype=np.uint8)).save(rgb_p)
    Image.fromarray(rng.randint(0, 256, (h, w, 3), dtype=np.uint8)).save(d_p)

    cfg = ModelConfig.tiny(num_labels=2, version="0.4.0")
    model = Mask2FormerRGBD(cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, h, w, 10), jnp.float32)
    )
    pre = PreprocessConfig(height=h, width=w)
    p = Predictor(cfg, variables["params"], variables.get("batch_stats"), preprocess=pre)
    example = {"image": [rgb_p, d_p]}
    fast = p.predict_example(example, threshold=0.1)
    assert p._apply_raw is not None  # fast path actually ran
    try:
        R.set_transform(lambda image, mask: {"image": image, "mask": mask})
        host = p.predict_example(example, threshold=0.1)
    finally:
        R.set_transform(None)
    assert len(fast["segments_info"]) == len(host["segments_info"])
    np.testing.assert_allclose(
        np.asarray(fast["segmentation"], np.float32),
        np.asarray(host["segmentation"], np.float32),
        atol=1e-5,
    )


def test_predictor_fast_path_handles_source_resize(tmp_path):
    """VERDICT r4 #8 (supersedes the r3 size gate): an input needing resize
    now TAKES the device fast path — the device builder replicates the
    host's derive/resize ordering with bit-exact resampler twins
    (ops/resize_exact.py) — and must produce the same instances as the host
    channel-builder fallback. Frames with MISMATCHED sizes still fall back."""
    from PIL import Image
    import jax
    from rgbdseg_tpu.config import ModelConfig
    from rgbdseg_tpu.data import registry as R
    from rgbdseg_tpu.inference.predictor import Predictor
    from rgbdseg_tpu.models.mask2former import Mask2FormerRGBD

    rng = np.random.RandomState(9)
    h, w = 64, 64
    # source frames at a non-target (larger, non-integer-ratio) size
    rgb_p, d_p = str(tmp_path / "r.png"), str(tmp_path / "d.png")
    Image.fromarray(rng.randint(0, 256, (100, 150, 3), dtype=np.uint8)).save(rgb_p)
    Image.fromarray(rng.randint(0, 256, (100, 150, 3), dtype=np.uint8)).save(d_p)

    cfg = ModelConfig.tiny(num_labels=2, version="0.4.0")
    model = Mask2FormerRGBD(cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, h, w, 10), jnp.float32)
    )
    pre = PreprocessConfig(height=h, width=w)
    p = Predictor(cfg, variables["params"], variables.get("batch_stats"), preprocess=pre)
    example = {"image": [rgb_p, d_p]}
    fast = p.predict_example(example, threshold=0.1)
    assert p._apply_raw is not None  # packed raw path engaged despite resize
    assert fast["segmentation"].shape[-2:] == (h, w)
    try:
        R.set_transform(lambda image, mask: {"image": image, "mask": mask})
        host = p.predict_example(example, threshold=0.1)
    finally:
        R.set_transform(None)
    assert len(fast["segments_info"]) == len(host["segments_info"])
    np.testing.assert_allclose(
        np.asarray(fast["segmentation"], np.float32),
        np.asarray(host["segmentation"], np.float32),
        atol=1e-5,
    )

    # mismatched frame sizes: the one remaining gate — host fallback
    d2_p = str(tmp_path / "d2.png")
    Image.fromarray(rng.randint(0, 256, (80, 150, 3), dtype=np.uint8)).save(d2_p)
    p2 = Predictor(cfg, variables["params"], variables.get("batch_stats"), preprocess=pre)
    res = p2.predict_example({"image": [rgb_p, d2_p]}, threshold=0.1)
    assert p2._apply_raw is None
    assert res["segmentation"].shape[-2:] == (h, w)


def test_device_channels_non_target_source_size(tmp_path):
    """Code-review r5 regression: device_channels datasets whose (uniform)
    source frames are NOT at the target size must pad the GT buffer at the
    LABEL size (preprocessed target), not the raw frame size — the two
    legitimately differ in this mode (pix ships raw, labels ship built)."""
    from PIL import Image
    from rgbdseg_tpu.data.pipeline import SegmentationDataset

    rng = np.random.RandomState(4)
    sh, sw, h, w = 100, 150, 64, 96
    records = []
    for i in range(2):
        rgb_p, d_p, m_p = (str(tmp_path / f"{n}{i}.png") for n in ("r", "d", "m"))
        Image.fromarray(rng.randint(0, 256, (sh, sw, 3), dtype=np.uint8)).save(rgb_p)
        Image.fromarray(rng.randint(0, 256, (sh, sw, 3), dtype=np.uint8)).save(d_p)
        mask = np.zeros((sh, sw, 3), np.uint8)
        mask[20:60, 30:90, 1] = 1  # instance id
        mask[20:60, 30:90, 2] = 1  # semantic id
        Image.fromarray(mask).save(m_p)
        records.append(
            {"image": [rgb_p, d_p], "annotation": m_p, "semantic_class_to_id": {"bg": 0, "a": 1}}
        )
    pp = PreprocessConfig(height=h, width=w)
    ds = SegmentationDataset(records, "0.4.0", pp, max_instances=4, device_channels=True)
    assert ds.device_channels  # uniform non-target size is now eligible
    pix, pm, pc, pv = ds[0]
    assert pix.dtype == np.uint8 and pix.shape == (sh, sw, 6)  # raw frames
    assert pm.shape == (4, h, w)  # labels at the preprocessed target size
    assert pv[:1].all()
    b = next(ds.batches(2, num_workers=0))
    assert b.pixel_values.shape == (2, sh, sw, 6)
    assert b.mask_labels.shape == (2, 4, h, w)
    # the packed path stays consistent with the label geometry
    ds.pack_gt = True
    b2 = next(ds.batches(2, num_workers=0))
    assert b2.mask_labels_packed.shape == (2, 4, (h * w + 7) // 8)


def test_resize_exact_explicit_channel_axis():
    """Code-review r5 regression: 3-D arrays are ambiguous ((B, H, W) stacks
    vs (H, W, C) images) — the explicit has_channels flag must control the
    spatial axes, and the narrow-image heuristic trap ((B, H, W<=4)) must be
    avoidable."""
    from PIL import Image
    import cv2 as _cv2
    from rgbdseg_tpu.ops.resize_exact import cv2_resize_linear_u8, pil_resize_u8

    rng = np.random.RandomState(5)
    stack = rng.randint(0, 256, (3, 40, 4), np.uint8)  # B=3 grayscale, W=4!
    want_cv = np.stack(
        [_cv2.resize(stack[i], (8, 16), interpolation=_cv2.INTER_LINEAR) for i in range(3)]
    )
    got_cv = np.asarray(cv2_resize_linear_u8(stack, (16, 8), has_channels=False))
    np.testing.assert_array_equal(got_cv, want_cv)
    want_pil = np.stack(
        [np.asarray(Image.fromarray(stack[i]).resize((8, 16), Image.BILINEAR)) for i in range(3)]
    )
    got_pil = np.asarray(pil_resize_u8(stack, (16, 8), has_channels=False))
    np.testing.assert_array_equal(got_pil, want_pil)
