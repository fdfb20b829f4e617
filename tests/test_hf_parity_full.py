"""Full-architecture-size parity vs the reference runtime (HF Mask2Former).

Builds the HF model at the EXACT configuration of the reference's standard
checkpoint (/root/reference/mask2former/checkpoints/standard/config.json:
Swin-T embed 96 / depths [2,2,6,2], 6 deformable encoder layers, 10 decoder
layers, 100 queries, 80 COCO classes) and requires logit + post-processing
parity after weight conversion.

Why seeded random weights instead of the trained checkpoint: the reference
repo ships model.safetensors / pytorch_model.bin as git-LFS *pointer files*
(134 bytes each) and this environment has no network egress, so the trained
tensor values are unavailable. At full architectural scale, structural bugs
(relative-position-bias indexing, FPN level order, attention-mask semantics)
still produce O(1e-1) differences; the observed agreement here is O(1e-4).
Measured diffs are recorded in PARITY.md.

Marked slow: two full-size CPU compiles (~1 min each cold).
"""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from rgbdseg_tpu.models.mask2former import Mask2FormerRGBD
from rgbdseg_tpu.utils import hf_convert

pytestmark = pytest.mark.slow

STANDARD = "/root/reference/mask2former/checkpoints/standard"


@pytest.fixture(scope="module")
def standard_pair():
    """(hf_model, my_config, my_params) at the standard checkpoint's config."""
    from transformers import Mask2FormerConfig, Mask2FormerForUniversalSegmentation

    hf_config = Mask2FormerConfig.from_pretrained(STANDARD)
    hf_config.backbone_config.drop_path_rate = 0.0  # eval-only: no stochastic depth
    torch.manual_seed(42)
    hf = Mask2FormerForUniversalSegmentation(hf_config)
    hf.eval()

    with open(f"{STANDARD}/config.json") as f:
        cfg = hf_convert.config_from_hf(json.load(f))
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = hf_convert.convert_mask2former(sd, cfg)
    return hf, cfg, params


def _forward_both(hf, cfg, params, x):
    with torch.no_grad():
        ref = hf(torch.from_numpy(x).permute(0, 3, 1, 2))
    out = Mask2FormerRGBD(cfg).apply({"params": params}, jnp.asarray(x))
    return ref, out


def test_standard_size_forward_parity_384(standard_pair):
    hf, cfg, params = standard_pair
    x = np.random.RandomState(0).rand(1, 384, 384, 3).astype(np.float32)
    ref, out = _forward_both(hf, cfg, params, x)
    # measured on this box: class 1.9e-4, mask 4.1e-5 (PARITY.md)
    np.testing.assert_allclose(
        np.asarray(out.class_queries_logits), ref.class_queries_logits.numpy(), atol=1e-3, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(out.masks_queries_logits), ref.masks_queries_logits.numpy(), atol=5e-4, rtol=1e-3
    )


def test_standard_size_postprocess_parity_nonsquare(standard_pair):
    """640x480 input (non-square: catches H/W transposition) post-processed at
    the original pre-resize size, exactly as the reference evaluator does
    (model_essential_part.py:87-92: threshold=0.0, return_binary_maps=True)."""
    from rgbdseg_tpu.inference.postprocess import post_process_instance_segmentation

    hf, cfg, params = standard_pair
    x = np.random.RandomState(1).rand(1, 480, 640, 3).astype(np.float32)
    ref, out = _forward_both(hf, cfg, params, x)

    np.testing.assert_allclose(
        np.asarray(out.class_queries_logits), ref.class_queries_logits.numpy(), atol=1e-3, rtol=1e-3
    )

    from transformers import Mask2FormerImageProcessor

    processor = Mask2FormerImageProcessor.from_pretrained(STANDARD)
    orig_size = (481, 641)  # deliberately != pixel size
    ref_post = processor.post_process_instance_segmentation(
        ref, threshold=0.0, target_sizes=[orig_size], return_binary_maps=True
    )[0]
    my_post = post_process_instance_segmentation(
        out.class_queries_logits,
        out.masks_queries_logits,
        threshold=0.0,
        target_sizes=[orig_size],
        return_binary_maps=True,
    )[0]

    ref_info, my_info = ref_post["segments_info"], my_post["segments_info"]
    assert len(ref_info) == len(my_info)
    assert [s["label_id"] for s in ref_info] == [s["label_id"] for s in my_info]
    np.testing.assert_allclose(
        [s["score"] for s in ref_info], [s["score"] for s in my_info], atol=1e-3
    )
    ref_seg = ref_post["segmentation"].numpy()
    my_seg = my_post["segmentation"]
    assert ref_seg.shape == my_seg.shape == (len(ref_info), *orig_size)
    # binarization (>0) can flip where |logit| ~ fp-noise; with random weights
    # the mask logits hover near zero so a small flip fraction is expected —
    # require high per-instance pixel agreement instead of exact equality
    # (measured min on this box: 0.9981)
    agree = (ref_seg == my_seg).mean(axis=(1, 2))
    assert agree.min() >= 0.995, f"min per-instance mask agreement {agree.min()}"
