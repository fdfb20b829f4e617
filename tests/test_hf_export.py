"""Flax -> HF checkpoint export (utils/hf_convert.export_hf_checkpoint).

The reference's training artifact is an HF checkpoint directory that any torch
stack can `from_pretrained` (reference finetuning.py:114-117 saves through the
HF Trainer; custom_model.py:45-53 reloads it with
CustomMask2FormerForUniversalSegmentation). These tests pin the inverse
converters:

- HF -> flax -> HF state_dict round-trip is BIT-EXACT for the stock model and
  for reference custom versions (dual backbone, DSAM cascade, ratio
  predictors, DGGM), with the only unexported keys being torch's derived
  buffers (Swin relative_position_index — recomputed at construction).
- An exported checkpoint directory actually loads in torch via
  `Mask2FormerForUniversalSegmentation.from_pretrained` with forward parity.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from rgbdseg_tpu.config import ModelConfig, SwinConfig
from rgbdseg_tpu.utils import hf_convert


def _hf_small_config():
    from transformers import Mask2FormerConfig, SwinConfig as HFSwin

    backbone = HFSwin(
        image_size=64,
        patch_size=4,
        embed_dim=32,
        depths=[1, 1, 2, 1],
        num_heads=[2, 2, 4, 4],
        window_size=7,
        drop_path_rate=0.0,
        out_features=["stage1", "stage2", "stage3", "stage4"],
    )
    return Mask2FormerConfig(
        backbone_config=backbone,
        feature_size=64,
        mask_feature_size=64,
        hidden_dim=64,
        encoder_layers=2,
        encoder_feedforward_dim=64,
        decoder_layers=4,
        num_attention_heads=4,
        dim_feedforward=64,
        num_queries=10,
        num_labels=3,
        dropout=0.0,
    )


def _my_config():
    return ModelConfig(
        backbone=SwinConfig(embed_dim=32, depths=(1, 1, 2, 1), num_heads=(2, 2, 4, 4), drop_path_rate=0.0),
        num_labels=3,
        feature_size=64,
        mask_feature_size=64,
        hidden_dim=64,
        encoder_layers=2,
        encoder_feedforward_dim=64,
        decoder_layers=4,
        num_attention_heads=4,
        dim_feedforward=64,
        num_queries=10,
        version="0.0.0",
    )


def _assert_roundtrip(sd: dict, out: dict):
    extra = set(out) - set(sd)
    assert not extra, f"exported keys unknown to torch: {sorted(extra)[:5]}"
    missing = set(sd) - set(out)
    assert all("relative_position_index" in k for k in missing), sorted(missing)[:5]
    for k in out:
        np.testing.assert_array_equal(np.asarray(out[k]), sd[k], err_msg=k)


@pytest.fixture(scope="module")
def hf_small():
    from transformers import Mask2FormerForUniversalSegmentation

    torch.manual_seed(0)
    model = Mask2FormerForUniversalSegmentation(_hf_small_config())
    model.eval()
    return model


def test_export_roundtrip_stock(hf_small):
    sd = {k: v.detach().numpy() for k, v in hf_small.state_dict().items()}
    cfg = _my_config()
    params = hf_convert.convert_mask2former(sd, cfg)
    out = hf_convert.export_state_dict({"transformer_module": params["transformer_module"],
                                        "pixel_level_module": params["pixel_level_module"]}, {}, cfg)
    _assert_roundtrip(sd, out)


def test_exported_checkpoint_from_pretrained(hf_small, tmp_path):
    """export_hf_checkpoint -> torch from_pretrained -> identical forward."""
    from transformers import Mask2FormerForUniversalSegmentation

    cfg = _my_config()
    sd = {k: v.detach().numpy() for k, v in hf_small.state_dict().items()}
    params = hf_convert.convert_mask2former(sd, cfg)
    d = str(tmp_path / "export")
    hf_convert.export_hf_checkpoint(params, {}, cfg, d, id2label={0: "bg", 1: "a", 2: "b"})

    reloaded = Mask2FormerForUniversalSegmentation.from_pretrained(d)
    reloaded.eval()
    assert reloaded.config.num_labels == 3
    x = torch.from_numpy(np.random.RandomState(0).rand(1, 3, 64, 64).astype(np.float32))
    with torch.no_grad():
        a = hf_small(x)
        b = reloaded(x)
    np.testing.assert_allclose(
        a.class_queries_logits.numpy(), b.class_queries_logits.numpy(), atol=1e-6
    )
    np.testing.assert_allclose(
        a.masks_queries_logits.numpy(), b.masks_queries_logits.numpy(), atol=1e-6
    )


def test_export_then_load_custom_roundtrip(tmp_path):
    """A model trained HERE, exported, reloads through load_hf_checkpoint with
    every leaf (params AND BatchNorm running stats) bit-exact and the version
    + DSAM runtime fields reconstructed — the finetune.py artifact path
    (export at output_dir, reload via --model_name_or_path/--hf_checkpoint)."""
    import flax
    import jax
    import jax.numpy as jnp

    from rgbdseg_tpu.models.mask2former import Mask2FormerRGBD

    cfg = ModelConfig.tiny(num_labels=3, version="0.4.0")
    model = Mask2FormerRGBD(cfg)
    variables = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 64, 64, 10), jnp.float32)
    )
    params = flax.core.unfreeze(variables["params"])
    bs = flax.core.unfreeze(variables.get("batch_stats", {}))
    d = str(tmp_path / "exp040")
    hf_convert.export_hf_checkpoint(params, bs, cfg, d, id2label={0: "bg", 1: "a", 2: "b"})

    cfg2, params2, bs2 = hf_convert.load_hf_checkpoint(d, with_batch_stats=True)
    assert cfg2.version == "0.4.0"
    assert cfg2.dsam_hist_bins == cfg.dsam_hist_bins  # rgbdseg_extras round-trip
    import numpy as _np

    a = dict(jax.tree_util.tree_leaves_with_path(params))
    b = dict(jax.tree_util.tree_leaves_with_path(params2))
    assert set(a) == set(b)
    for path in a:
        _np.testing.assert_array_equal(_np.asarray(a[path]), _np.asarray(b[path]), err_msg=str(path))
    sa = dict(jax.tree_util.tree_leaves_with_path(bs))
    sb = dict(jax.tree_util.tree_leaves_with_path(bs2))
    assert set(sa) == set(sb) and sa  # BN stats present and matching
    for path in sa:
        _np.testing.assert_array_equal(_np.asarray(sa[path]), _np.asarray(sb[path]), err_msg=str(path))


# ---------------------------------------------------------------------------
# Reference custom versions: the fusion channel counts are hardcoded to
# embed_dim=96 in the reference (custom_model.py:66-141), so the round-trip
# uses a 96-wide single-block-per-stage Swin. slow: full-width torch model
# construction.
# ---------------------------------------------------------------------------


def _custom_pair(version: str):
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from mask2former.utils.custom_model import (
        CustomConfig,
        CustomMask2FormerForUniversalSegmentation,
    )
    from transformers import SwinConfig as HFSwin

    bb = HFSwin(
        image_size=64,
        patch_size=4,
        embed_dim=96,
        depths=[1, 1, 1, 1],
        num_heads=[3, 6, 12, 24],
        window_size=7,
        drop_path_rate=0.0,
        out_features=["stage1", "stage2", "stage3", "stage4"],
    )
    conf = CustomConfig(
        backbone_config=bb,
        feature_size=64,
        mask_feature_size=64,
        hidden_dim=64,
        encoder_layers=1,
        encoder_feedforward_dim=64,
        decoder_layers=3,
        num_attention_heads=4,
        dim_feedforward=64,
        num_queries=10,
        num_labels=3,
        dropout=0.0,
    )
    torch.manual_seed(0)
    model = CustomMask2FormerForUniversalSegmentation(conf, version=version)
    model.eval()
    cfg = ModelConfig(
        backbone=SwinConfig(embed_dim=96, depths=(1, 1, 1, 1), num_heads=(3, 6, 12, 24), drop_path_rate=0.0),
        num_labels=3,
        feature_size=64,
        mask_feature_size=64,
        hidden_dim=64,
        encoder_layers=1,
        encoder_feedforward_dim=64,
        decoder_layers=3,
        num_attention_heads=4,
        dim_feedforward=64,
        num_queries=10,
        version=version,
    )
    return model, cfg


@pytest.mark.slow
@pytest.mark.parametrize("version", ["0.1.1", "0.1.3", "0.4.0"])
def test_export_roundtrip_custom(version):
    model, cfg = _custom_pair(version)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params, bs = hf_convert.convert_custom_mask2former(sd, cfg)
    out = hf_convert.export_state_dict(params, bs, cfg)
    _assert_roundtrip(sd, out)
    # and the reference model accepts the exported weights directly
    tsd = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in out.items()}
    res = model.load_state_dict(tsd, strict=False)
    assert not res.unexpected_keys, res.unexpected_keys[:5]
    assert all("relative_position_index" in k for k in res.missing_keys), res.missing_keys[:5]
