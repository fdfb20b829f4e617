"""Convert HF-Transformers Mask2Former weights (the reference's runtime,
custom_model.py:10-13) into this framework's parameter pytree.

Used for (a) numerical-parity tests against the reference stack with random
weights, and (b) loading any reference-trained checkpoint (safetensors) into
the TPU model. Only depends on numpy + a state_dict-like mapping
{name: np.ndarray}; torch is not imported here.

Layout conversions: conv OIHW -> HWIO; dense (out,in) -> (in,out);
torch nn.MultiheadAttention in_proj -> split q/k/v.
"""

from __future__ import annotations

import numpy as np


def _dense(sd, prefix):
    return {"kernel": sd[prefix + ".weight"].T, "bias": sd[prefix + ".bias"]}


def _dense_nb(sd, prefix):
    return {"kernel": sd[prefix + ".weight"].T}


def _conv(sd, prefix, bias=True):
    out = {"kernel": sd[prefix + ".weight"].transpose(2, 3, 1, 0)}
    if bias:
        out["bias"] = sd[prefix + ".bias"]
    return out


def _ln(sd, prefix):
    return {"scale": sd[prefix + ".weight"], "bias": sd[prefix + ".bias"]}


def convert_swin_backbone(sd: dict, prefix: str, depths) -> dict:
    """HF SwinBackbone state_dict subtree -> SwinBackbone flax params."""
    p = {}
    p["patch_embed"] = _conv(sd, f"{prefix}.embeddings.patch_embeddings.projection")
    p["patch_norm"] = _ln(sd, f"{prefix}.embeddings.norm")
    for s, depth in enumerate(depths):
        for b in range(depth):
            bp = f"{prefix}.encoder.layers.{s}.blocks.{b}"
            blk = {
                "norm1": _ln(sd, f"{bp}.layernorm_before"),
                "norm2": _ln(sd, f"{bp}.layernorm_after"),
                "attention": {
                    "query": _dense(sd, f"{bp}.attention.self.query"),
                    "key": _dense(sd, f"{bp}.attention.self.key"),
                    "value": _dense(sd, f"{bp}.attention.self.value"),
                    "proj": _dense(sd, f"{bp}.attention.output.dense"),
                    "relative_position_bias_table": sd[
                        f"{bp}.attention.self.relative_position_bias_table"
                    ],
                },
                "mlp_fc1": _dense(sd, f"{bp}.intermediate.dense"),
                "mlp_fc2": _dense(sd, f"{bp}.output.dense"),
            }
            p[f"stage{s}_block{b}"] = blk
        if s < len(depths) - 1:
            dp = f"{prefix}.encoder.layers.{s}.downsample"
            p[f"downsample{s}"] = {
                "norm": _ln(sd, f"{dp}.norm"),
                "reduction": _dense_nb(sd, f"{dp}.reduction"),
            }
        p[f"out_norm{s}"] = _ln(sd, f"{prefix}.hidden_states_norms.stage{s + 1}")
    return p


def convert_pixel_decoder(sd: dict, prefix: str, encoder_layers: int, num_fpn: int = 1) -> dict:
    p = {"level_embed": sd[f"{prefix}.level_embed"]}
    for i in range(3):
        p[f"input_proj{i}_conv"] = _conv(sd, f"{prefix}.input_projections.{i}.0")
        gn = f"{prefix}.input_projections.{i}.1"
        p[f"input_proj{i}_norm"] = {"scale": sd[gn + ".weight"], "bias": sd[gn + ".bias"]}
    for li in range(encoder_layers):
        lp = f"{prefix}.encoder.layers.{li}"
        p[f"layer{li}"] = {
            "self_attn": {
                "sampling_offsets": _dense(sd, f"{lp}.self_attn.sampling_offsets"),
                "attention_weights": _dense(sd, f"{lp}.self_attn.attention_weights"),
                "value_proj": _dense(sd, f"{lp}.self_attn.value_proj"),
                "output_proj": _dense(sd, f"{lp}.self_attn.output_proj"),
            },
            "self_attn_layer_norm": _ln(sd, f"{lp}.self_attn_layer_norm"),
            "fc1": _dense(sd, f"{lp}.fc1"),
            "fc2": _dense(sd, f"{lp}.fc2"),
            "final_layer_norm": _ln(sd, f"{lp}.final_layer_norm"),
        }
    for i in range(num_fpn):
        ap = f"{prefix}.adapter_{i + 1}"
        p[f"adapter{i}_conv"] = _conv(sd, f"{ap}.0", bias=False)
        p[f"adapter{i}_norm"] = {"scale": sd[f"{ap}.1.weight"], "bias": sd[f"{ap}.1.bias"]}
        op = f"{prefix}.layer_{i + 1}"
        p[f"fpn{i}_conv"] = _conv(sd, f"{op}.0", bias=False)
        p[f"fpn{i}_norm"] = {"scale": sd[f"{op}.1.weight"], "bias": sd[f"{op}.1.bias"]}
    p["mask_projection"] = _conv(sd, f"{prefix}.mask_projection")
    return p


def _mha_from_torch(sd: dict, prefix: str, d: int) -> dict:
    """torch nn.MultiheadAttention -> q/k/v/out projections."""
    w = sd[f"{prefix}.in_proj_weight"]
    b = sd[f"{prefix}.in_proj_bias"]
    return {
        "q_proj": {"kernel": w[:d].T, "bias": b[:d]},
        "k_proj": {"kernel": w[d : 2 * d].T, "bias": b[d : 2 * d]},
        "v_proj": {"kernel": w[2 * d :].T, "bias": b[2 * d :]},
        "out_proj": _dense(sd, f"{prefix}.out_proj"),
    }


def convert_transformer_module(sd: dict, prefix: str, decoder_layers: int, hidden_dim: int) -> dict:
    p = {
        "queries_embedder": sd[f"{prefix}.queries_embedder.weight"],
        "queries_features": sd[f"{prefix}.queries_features.weight"],
        "level_embed": sd[f"{prefix}.level_embed.weight"],
        "decoder_layernorm": _ln(sd, f"{prefix}.decoder.layernorm"),
        "mask_predictor": {
            f"mask_embedder{i}": _dense(sd, f"{prefix}.decoder.mask_predictor.mask_embedder.{i}.0")
            for i in range(3)
        },
    }
    for li in range(decoder_layers - 1):
        lp = f"{prefix}.decoder.layers.{li}"
        p[f"layer{li}"] = {
            "cross_attn": _mha_from_torch(sd, f"{lp}.cross_attn", hidden_dim),
            "cross_attn_layer_norm": _ln(sd, f"{lp}.cross_attn_layer_norm"),
            "self_attn": {
                "q_proj": _dense(sd, f"{lp}.self_attn.q_proj"),
                "k_proj": _dense(sd, f"{lp}.self_attn.k_proj"),
                "v_proj": _dense(sd, f"{lp}.self_attn.v_proj"),
                "out_proj": _dense(sd, f"{lp}.self_attn.out_proj"),
            },
            "self_attn_layer_norm": _ln(sd, f"{lp}.self_attn_layer_norm"),
            "fc1": _dense(sd, f"{lp}.fc1"),
            "fc2": _dense(sd, f"{lp}.fc2"),
            "final_layer_norm": _ln(sd, f"{lp}.final_layer_norm"),
        }
    return p


def config_from_hf(hf_config: dict):
    """HF Mask2FormerConfig dict (config.json) -> ModelConfig.

    Lets users load any reference-trained checkpoint directory
    (reference checkpoints: mask2former/checkpoints/standard + remote/*)."""
    from ..config import ModelConfig, SwinConfig

    bb = hf_config.get("backbone_config", {}) or {}
    backbone = SwinConfig(
        patch_size=bb.get("patch_size", 4),
        embed_dim=bb.get("embed_dim", 96),
        depths=tuple(bb.get("depths", (2, 2, 6, 2))),
        num_heads=tuple(bb.get("num_heads", (3, 6, 12, 24))),
        window_size=bb.get("window_size", 7),
        mlp_ratio=bb.get("mlp_ratio", 4.0),
        qkv_bias=bb.get("qkv_bias", True),
        drop_path_rate=bb.get("drop_path_rate", 0.3),
        layer_norm_eps=bb.get("layer_norm_eps", 1e-5),
    )
    num_labels = len(hf_config.get("id2label", {})) or 2
    return ModelConfig(
        backbone=backbone,
        num_labels=num_labels,
        feature_size=hf_config.get("feature_size", 256),
        mask_feature_size=hf_config.get("mask_feature_size", 256),
        encoder_layers=hf_config.get("encoder_layers", 6),
        encoder_feedforward_dim=hf_config.get("encoder_feedforward_dim", 1024),
        hidden_dim=hf_config.get("hidden_dim", 256),
        num_queries=hf_config.get("num_queries", 100),
        decoder_layers=hf_config.get("decoder_layers", 10),
        num_attention_heads=hf_config.get("num_attention_heads", 8),
        dim_feedforward=hf_config.get("dim_feedforward", 2048),
        class_weight=hf_config.get("class_weight", 2.0),
        mask_weight=hf_config.get("mask_weight", 5.0),
        dice_weight=hf_config.get("dice_weight", 5.0),
        no_object_weight=hf_config.get("no_object_weight", 0.1),
        train_num_points=hf_config.get("train_num_points", 12544),
        oversample_ratio=hf_config.get("oversample_ratio", 3.0),
        importance_sample_ratio=hf_config.get("importance_sample_ratio", 0.75),
    )


def load_hf_checkpoint(model_dir: str, version: str = "0.0.0"):
    """Load an HF Mask2Former checkpoint directory (config.json +
    model.safetensors or pytorch_model.bin) -> (ModelConfig, flax params).

    The returned params cover the shared Mask2Former trunk; version-specific
    fusion modules (DGGM/DSAM/...) are NOT present in stock HF checkpoints and
    must be initialized fresh (the reference does the same: its custom modules
    are seeded at construction, custom_model.py:18-25,52)."""
    import json
    import os

    with open(os.path.join(model_dir, "config.json")) as f:
        hf_config = json.load(f)
    cfg = config_from_hf(hf_config).replace(version=version)

    st_path = os.path.join(model_dir, "model.safetensors")
    if os.path.exists(st_path):
        from safetensors.numpy import load_file

        sd = load_file(st_path)
    else:
        import torch

        sd = {
            k: v.numpy()
            for k, v in torch.load(
                os.path.join(model_dir, "pytorch_model.bin"), map_location="cpu", weights_only=True
            ).items()
        }
    return cfg, convert_mask2former(sd, cfg)


def graft(init_params: dict, pretrained: dict, path: str = "") -> tuple[dict, list[str]]:
    """Merge a converted pretrained subtree onto a freshly-initialized param
    tree. Leaves with mismatched shapes are kept at their fresh init and
    reported (reference analogue: from_pretrained with a different num_labels
    re-initializes the class head). Returns (merged, skipped_paths)."""
    merged = dict(init_params)
    skipped: list[str] = []
    for k, v in pretrained.items():
        sub = f"{path}/{k}" if path else k
        if isinstance(v, dict):
            child, sk = graft(dict(merged.get(k, {})), v, sub)
            merged[k] = child
            skipped += sk
        else:
            cur = merged.get(k)
            if cur is not None and tuple(np.shape(cur)) != tuple(np.shape(v)):
                skipped.append(f"{sub}: checkpoint {np.shape(v)} vs model {np.shape(cur)}")
            else:
                merged[k] = v
    return merged, skipped


def convert_mask2former(state_dict: dict, cfg) -> dict:
    """Full HF Mask2FormerForUniversalSegmentation state_dict -> flax params."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    params = {
        "pixel_level_module": {
            "encoder": convert_swin_backbone(
                sd, "model.pixel_level_module.encoder", cfg.backbone.depths
            ),
            "pixel_decoder": convert_pixel_decoder(
                sd, "model.pixel_level_module.decoder", cfg.encoder_layers
            ),
        },
        "transformer_module": {
            **convert_transformer_module(
                sd, "model.transformer_module", cfg.decoder_layers, cfg.hidden_dim
            ),
            "class_predictor": _dense(sd, "class_predictor"),
        },
    }
    return params
