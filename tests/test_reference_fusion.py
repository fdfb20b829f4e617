"""Differential tests against the reference's OWN torch fusion modules.

The reference repo is importable in this environment
(`sys.path.insert(0, '/root/reference')` -> `mask2former.utils.custom_model`),
so the novel-paper modules — DSAM (custom_model.py:622-820), the DGGM family
(:1009-1269), the three E-DSAM ratio predictors (:823-897, :1272-1360,
:1363-1487), the intrinsics predictor (:900-1006), the fusers (:505-619) and
the full version-dispatched pixel-level forward (:56-390) — are pinned here
against the actual upstream code with seeded torch weights converted to flax,
NOT against transcriptions by the same author (which could share a
misconception on the histogram / find_peaks / window-edge logic).

Depth maps in the decomposition sweeps are quantized to integer levels so the
512-bin histogram assignment is robust to f32-vs-f64 arithmetic (a value can
only flip bins if it lies within ~1e-4 of a bin edge; integer levels over a
[0, 255]-ish range keep every pixel far from every edge). One continuous-value
case is kept with a mismatch-budget assertion instead of exact equality.

Marked slow: torch CPU forwards + several jax compiles.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from rgbdseg_tpu.config import ModelConfig, SwinConfig
from rgbdseg_tpu.models import fusion as F
from rgbdseg_tpu.models.mask2former import PixelLevelModule
from rgbdseg_tpu.ops.depth_decomp import dsam_region_masks
from rgbdseg_tpu.ops.image import to_grayscale
from rgbdseg_tpu.ops.resize import adaptive_max_pool2d
from rgbdseg_tpu.utils import hf_convert

pytestmark = pytest.mark.slow

if "/root/reference" not in sys.path:
    sys.path.insert(0, "/root/reference")

refcm = pytest.importorskip("mask2former.utils.custom_model")


def _sd(mod):
    return {k: v.detach().numpy() for k, v in mod.state_dict().items()}


def _nhwc(t):
    return t.detach().permute(0, 2, 3, 1).numpy()


def _randomize_bn_stats(mod, seed=0):
    g = torch.Generator().manual_seed(seed)
    for m in mod.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.3)
            m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) + 0.5)


# ---------------------------------------------------------------------------
# Depth-map zoo for the decomposition differential
# ---------------------------------------------------------------------------


def _depth_cases():
    rng = np.random.RandomState(7)
    cases = []
    # quantized random (integer levels; many per-bin plateaus in the histogram)
    for i in range(6):
        cases.append(("quant%d" % i, rng.randint(0, 256, (48, 64)).astype(np.float32)))
    # few distinct levels -> wide histogram plateaus, exercises plateau-midpoint
    for i in range(3):
        cases.append(("levels%d" % i, rng.choice([3, 9, 50, 51, 200], (48, 64)).astype(np.float32)))
    # bimodal gaussian-ish, quantized
    for i in range(3):
        a = np.round(rng.normal(60, 5, (48, 64)))
        b = np.round(rng.normal(180, 8, (48, 64)))
        pick = rng.rand(48, 64) < 0.5
        cases.append(("bimodal%d" % i, np.where(pick, a, b).clip(0, 255).astype(np.float32)))
    # NaN holes (invalid depth) over quantized values
    for i in range(3):
        d = rng.randint(0, 256, (48, 64)).astype(np.float32)
        d[rng.rand(48, 64) < 0.15] = np.nan
        cases.append(("nan%d" % i, d))
    # constant map (degenerate range; np.histogram expands to +/-0.5)
    cases.append(("const", np.full((48, 64), 42.0, np.float32)))
    # two values only
    cases.append(("binary", np.where(rng.rand(48, 64) < 0.7, 10.0, 230.0).astype(np.float32)))
    return cases


def _reference_masks(helper, d, ratio, T=3):
    """Run the reference's own decomposition pipeline (custom_model.py:671-682)."""
    hist, edges = helper._calculate_depth_histogram(d)
    modes = helper._select_depth_distribution_modes(hist, edges, num_modes=T)
    if modes:
        windows = helper._define_depth_interval_windows(modes, window_size_ratio=ratio)
        masks = helper._generate_depth_region_masks(d, windows)
    else:
        masks = [np.zeros_like(d, dtype=bool)] * (T + 1)
    return modes, masks


@pytest.mark.parametrize("ratio", [0.1, 0.37])
def test_decomposition_matches_reference_exactly(ratio):
    """Region masks + active-slot encoding == the reference's variable-length
    mask list, across the depth zoo (quantized values -> exact equality)."""
    helper = refcm.DSAModule(96, 192)
    T = 3
    for name, d in _depth_cases():
        modes, ref_masks = _reference_masks(helper, d, ratio, T)
        k = len(modes)
        masks, active = jax.tree.map(
            np.asarray,
            dsam_region_masks(jnp.asarray(d)[None], jnp.asarray([ratio])),
        )
        masks, active = masks[0], active[0]
        if k == 0:
            assert masks.sum() == 0, name
            np.testing.assert_array_equal(active, np.ones(T + 1), err_msg=name)
            continue
        for i in range(k + 1):  # K window masks + remainder in slot K
            np.testing.assert_array_equal(
                masks[i].astype(bool), ref_masks[i], err_msg=f"{name} slot {i} (K={k})"
            )
            assert active[i] == 1.0, name
        for i in range(k + 1, T + 1):
            assert active[i] == 0.0, f"{name} slot {i} should be inactive (K={k})"


def test_decomposition_continuous_values_budget():
    """Continuous (non-quantized) depth: f32-vs-f64 bin-edge flips are allowed
    a tiny budget, but the structure (number of modes) must agree."""
    helper = refcm.DSAModule(96, 192)
    rng = np.random.RandomState(3)
    total = mismatched = 0
    for i in range(5):
        d = (rng.rand(48, 64) * 97.3 + 1.7).astype(np.float32)
        modes, ref_masks = _reference_masks(helper, d, 0.25)
        k = len(modes)
        masks, active = jax.tree.map(
            np.asarray, dsam_region_masks(jnp.asarray(d)[None], jnp.asarray([0.25]))
        )
        assert int(active[0].sum()) == min(k + 1, 4) or k == 0
        for j in range(min(k + 1, 4)):
            total += d.size
            mismatched += (masks[0, j].astype(bool) != ref_masks[j]).sum()
    assert mismatched / total < 5e-3, f"{mismatched}/{total} mask pixels differ"


# ---------------------------------------------------------------------------
# Module-level differentials (seeded torch weights -> flax)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("cin,cout", [(96, 192), (384, 768), (192, 192)])
def test_dsam_module_matches_reference(cin, cout):
    """Full DSAModule forward (decomposition + region convs + residual),
    strided (in != out) and 1x1 (in == out) paths, incl. NaN-holed depth."""
    torch.manual_seed(0)
    ref = refcm.DSAModule(cin, cout).eval()
    params = hf_convert.convert_dsam(_sd(ref), "")

    rng = np.random.RandomState(1)
    feats = rng.randn(2, 16, 24, cin).astype(np.float32)
    depth = rng.randint(0, 256, (2, 64, 96)).astype(np.float32)
    depth[0, :20, :30] = np.nan  # hole region
    ratio = 0.21

    outs = []
    with torch.no_grad():
        for b in range(2):
            t = torch.from_numpy(feats[b : b + 1].transpose(0, 3, 1, 2))
            outs.append(ref(t, torch.from_numpy(depth[b]), window_size_ratio=ratio))
    ref_out = torch.cat(outs, 0)

    masks, active = dsam_region_masks(jnp.asarray(depth), jnp.full((2,), ratio))
    mk = adaptive_max_pool2d(jnp.transpose(masks, (0, 2, 3, 1)), (16, 24))
    mine = F.DSAModule(in_channels=cin, out_channels=cout).apply(
        {"params": params}, jnp.asarray(feats), mk, jnp.asarray(active)
    )
    np.testing.assert_allclose(np.asarray(mine), _nhwc(ref_out), atol=2e-4, rtol=1e-4)


def _scale_feats(rng, b=2, hw=(16, 24), chans=(96, 192, 384, 768)):
    h, w = hw
    return [
        rng.randn(b, h // 2**i, w // 2**i, c).astype(np.float32) for i, c in enumerate(chans)
    ]


def test_dggm_variants_match_reference():
    rng = np.random.RandomState(2)
    maps = _scale_feats(rng)
    grad = rng.randn(2, 64, 96, 3).astype(np.float32)
    mask = (rng.rand(2, 64, 96, 1) > 0.3).astype(np.float32)
    t_maps = [torch.from_numpy(m.transpose(0, 3, 1, 2)) for m in maps]
    t_grad = torch.from_numpy(grad.transpose(0, 3, 1, 2))
    t_mask = torch.from_numpy(mask.transpose(0, 3, 1, 2))
    chans = [96, 192, 384, 768]

    torch.manual_seed(3)
    cases = [
        (refcm.DepthGradientInjection(chans, 3), F.DepthGradientInjection(), "inject",
         (t_grad,), (jnp.asarray(grad),)),
        (refcm.DepthGradientInjectionWithMask(chans, 3), F.DepthGradientInjectionWithMask(),
         "inject_mask", (t_grad, t_mask), (jnp.asarray(grad), jnp.asarray(mask))),
        (refcm.DepthGradientInjectionResidual(chans, 3), F.DepthGradientInjectionResidual(),
         "residual", (t_grad, t_mask), (jnp.asarray(grad), jnp.asarray(mask))),
    ]
    for ref, mine, kind, t_args, j_args in cases:
        ref.eval()
        params = hf_convert.convert_dggm(_sd(ref), "", kind)
        with torch.no_grad():
            ref_out = ref(t_maps, *t_args)
        out = mine.apply({"params": params}, [jnp.asarray(m) for m in maps], *j_args)
        for i, (o, r) in enumerate(zip(out, ref_out)):
            np.testing.assert_allclose(
                np.asarray(o), _nhwc(r), atol=1e-4, rtol=1e-4, err_msg=f"{kind} scale {i}"
            )


def test_feature_fusers_match_reference():
    rng = np.random.RandomState(4)
    color = _scale_feats(rng)
    depth = _scale_feats(rng)
    t_c = [torch.from_numpy(m.transpose(0, 3, 1, 2)) for m in color]
    t_d = [torch.from_numpy(m.transpose(0, 3, 1, 2)) for m in depth]
    j_c = [jnp.asarray(m) for m in color]
    j_d = [jnp.asarray(m) for m in depth]

    torch.manual_seed(5)
    ref = refcm.FeatureFuser().eval()
    out = F.FeatureFuser().apply(
        {"params": hf_convert.convert_feature_fuser(_sd(ref), "")}, j_c, j_d
    )
    with torch.no_grad():
        ref_out = ref(t_c, t_d)
    for i, (o, r) in enumerate(zip(out, ref_out)):
        np.testing.assert_allclose(np.asarray(o), _nhwc(r), atol=1e-4, rtol=1e-4)

    ref2 = refcm.FeatureFuserWithSpatialAttention().eval()
    out2 = F.FeatureFuserWithSpatialAttention().apply(
        {"params": hf_convert.convert_feature_fuser_attn(_sd(ref2), "")}, j_c, j_d
    )
    with torch.no_grad():
        ref_out2 = ref2(t_c, t_d)
    for i, (o, r) in enumerate(zip(out2, ref_out2)):
        np.testing.assert_allclose(np.asarray(o), _nhwc(r), atol=1e-4, rtol=1e-4)


def test_ratio_predictors_match_reference():
    rng = np.random.RandomState(6)
    depth_maps = _scale_feats(rng)
    depth_img = rng.rand(2, 64, 96, 3).astype(np.float32)
    t_maps = [torch.from_numpy(m.transpose(0, 3, 1, 2)) for m in depth_maps]
    t_img = torch.from_numpy(depth_img.transpose(0, 3, 1, 2))

    torch.manual_seed(7)
    # v1: GAP-over-pyramid MLP
    ref1 = refcm.RatioPredictor([96, 192, 384, 768]).eval()
    out1 = F.RatioPredictor().apply(
        {"params": hf_convert.convert_ratio_predictor(_sd(ref1), "")},
        [jnp.asarray(m) for m in depth_maps],
    )
    with torch.no_grad():
        np.testing.assert_allclose(
            np.asarray(out1), ref1(t_maps).numpy(), atol=1e-5, rtol=1e-5
        )

    # v2: conv net on the depth image (BatchNorm stats randomized)
    ref2 = refcm.DepthImageRatioPredictor(3).eval()
    _randomize_bn_stats(ref2, 21)
    p2, bs2 = hf_convert.convert_depth_image_ratio_predictor(_sd(ref2), "")
    out2 = F.DepthImageRatioPredictor().apply(
        {"params": p2, "batch_stats": bs2}, jnp.asarray(depth_img)
    )
    with torch.no_grad():
        np.testing.assert_allclose(
            np.asarray(out2), ref2(t_img).numpy(), atol=1e-5, rtol=1e-5
        )

    # v3 (final, version 0.4.0): multi-scale convs + channel attention
    ref3 = refcm.EnhancedDepthImageRatioPredictor(3).eval()
    _randomize_bn_stats(ref3, 22)
    p3, bs3 = hf_convert.convert_enhanced_ratio_predictor(_sd(ref3), "")
    out3 = F.EnhancedDepthImageRatioPredictor().apply(
        {"params": p3, "batch_stats": bs3}, jnp.asarray(depth_img)
    )
    with torch.no_grad():
        np.testing.assert_allclose(
            np.asarray(out3), ref3(t_img).numpy(), atol=1e-5, rtol=1e-5
        )


def test_intrinsics_predictor_matches_reference():
    rng = np.random.RandomState(8)
    gray = rng.rand(2, 64, 96, 1).astype(np.float32)
    torch.manual_seed(9)
    ref = refcm.IntrinsicsPredictorFromDepthImage().eval()
    params = hf_convert.convert_intrinsics_predictor(_sd(ref), "")
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(gray.transpose(0, 3, 1, 2)), (64, 96))
    fx, fy, cx, cy = F.IntrinsicsPredictor().apply({"params": params}, jnp.asarray(gray))
    for b in range(2):
        for mine, key in ((fx, "fx"), (fy, "fy"), (cx, "cx"), (cy, "cy")):
            np.testing.assert_allclose(
                float(mine[b]), ref_out[b][key], atol=1e-4, rtol=1e-4, err_msg=key
            )


def test_surface_normals_intrinsics_matches_reference():
    """Intrinsics-based normals (ops/normals.surface_normals_intrinsics) vs
    the reference's host-numpy `calculate_surface_normals`
    (data_process.py:1308-1371): same 3D-point cross-product formulation,
    same invalid-depth → (0,0,0) handling, including a zero-depth patch that
    exercises the NaN gradient propagation band around invalid pixels."""
    from mask2former.utils.data_process import calculate_surface_normals

    from rgbdseg_tpu.ops import normals as N

    rng = np.random.RandomState(21)
    d = rng.uniform(0.5, 8.0, size=(48, 64)).astype(np.float32)
    d[10:18, 20:30] = 0.0  # invalid-depth patch
    intr = {"fx": 57.3, "fy": 61.1, "cx": 31.5, "cy": 23.5}
    ref_n, ref_m = calculate_surface_normals(d, intr)
    out_n, out_m = jax.jit(N.surface_normals_intrinsics)(
        jnp.asarray(d), intr["fx"], intr["fy"], intr["cx"], intr["cy"]
    )
    np.testing.assert_allclose(np.asarray(out_n), ref_n, atol=1e-4, rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(out_m), ref_m)


# ---------------------------------------------------------------------------
# Full version-dispatched pixel-level forward (custom_model.py:56-390)
# ---------------------------------------------------------------------------


def _hf_pixel_config():
    from transformers import Mask2FormerConfig, SwinConfig as HFSwin

    return Mask2FormerConfig(
        backbone_config=HFSwin(
            image_size=96,
            patch_size=4,
            embed_dim=96,
            depths=[2, 2, 6, 2],
            num_heads=[3, 6, 12, 24],
            window_size=7,
            drop_path_rate=0.0,
            out_features=["stage1", "stage2", "stage3", "stage4"],
        ),
        feature_size=256,
        mask_feature_size=256,
        encoder_layers=2,
        hidden_dim=256,
        num_attention_heads=8,
        dropout=0.0,
    )


def _my_pixel_config(version):
    return ModelConfig(
        backbone=SwinConfig(
            embed_dim=96, depths=(2, 2, 6, 2), num_heads=(3, 6, 12, 24), drop_path_rate=0.0
        ),
        num_labels=3,
        encoder_layers=2,
        version=version,
    )


def _pixel_inputs(version, rng):
    """(B, H, W, C) channels-last input. Depth channels are a quantized gray
    value replicated x3 so the histogram differential is bin-edge robust (the
    3-channel->gray path itself is pinned by test_ops_depth)."""
    b, h, w = 2, 64, 96
    total = {
        "0.0.0": 3,
        "0.0.1": 6,
        "0.0.2": 7,
        "0.0.3": 7,
        "0.0.7": 4,
        "0.1.0": 6,
        "0.1.1": 6,
        "0.1.2": 6,
        "0.1.3": 6,
        "0.2.0": 9,
        "0.3.0": 10,
        "0.4.0": 10,
    }[version]
    x = rng.rand(b, h, w, total).astype(np.float32)
    if version in ("0.0.0", "0.0.1"):
        return x  # RGB only / RGB + gradient-depth; nothing quantized
    if version in ("0.0.2", "0.0.3"):
        # RGB + gradient-depth (3:6) + binary gradient mask (6:7); no DSAM,
        # so no quantization constraints apply
        x[..., 6] = (rng.rand(b, h, w) > 0.3).astype(np.float32)
        return x
    if version == "0.0.7":
        # gray depth (3:4): positive depths + an invalid-zero patch so the
        # in-forward normals path exercises its invalid-depth masking
        x[..., 3] = rng.uniform(0.5, 8.0, (b, h, w)).astype(np.float32)
        x[:, 12:20, 30:44, 3] = 0.0
        return x
    q = rng.randint(0, 256, (b, h, w, 1)).astype(np.float32) / 255.0
    x[..., 3:6] = q  # depth: quantized, equal channels
    if version == "0.2.0":
        # the DSAM decomposition consumes the CSF-fused depth (6:9), so THAT
        # block must be the quantized equal-channel gray for edge robustness
        q2 = rng.randint(0, 256, (b, h, w, 1)).astype(np.float32) / 255.0
        x[..., 6:9] = q2
    if total == 10:
        x[..., 9:10] = (rng.rand(b, h, w, 1) > 0.3).astype(np.float32)  # binary mask
    return x


def _assert_depth_clear_of_window_edges(ref, version, x, margin_frac=5e-5):
    """Flake guard (VERDICT r3 #5): the pixel-level forward is a STEP
    function of depth at the DSAM window edges — a depth pixel within
    numeric-jitter distance of an edge can flip its region mask between
    runs/implementations and produce an O(1) local deviation no sane atol
    covers. This fixture check proves the comparison below is safely in the
    continuous regime: every (quantized) depth value must sit at least
    `margin_frac * depth_range` from every interval-window edge, computed
    with the reference's own decomposition helpers at the reference's own
    predicted ratio. If this ever fires, REGENERATE the fixture (different
    seed / quantization), don't widen the output tolerance."""
    if not hasattr(ref, "dsam0"):
        return  # no DSAM decomposition in this version — no window edges
    depth_t = torch.from_numpy(x.transpose(0, 3, 1, 2)[:, 3:6])
    with torch.no_grad():
        if version in ("0.1.3", "0.3.0"):
            feats = list(ref.depth_encoder(depth_t).feature_maps)
            ratios = ref.ratio_predictor(feats).reshape(-1)
        elif version == "0.4.0":
            ratios = ref.ratio_predictor(depth_t).reshape(-1)
        else:  # fixed default ratio (custom_model.py:647)
            ratios = torch.full((x.shape[0],), 0.1)
    if version == "0.2.0":
        # the 9-channel else branch decomposes the CSF-fused depth (6:9),
        # custom_model.py:360,369 — check edge distance on THAT block
        depth_t = torch.from_numpy(x.transpose(0, 3, 1, 2)[:, 6:9])
    helper = ref.dsam0
    for b in range(x.shape[0]):
        with torch.no_grad():
            gray = ref.to_grayscale(depth_t[b]).squeeze().numpy()
        hist, edges_ = helper._calculate_depth_histogram(gray)
        modes = helper._select_depth_distribution_modes(hist, edges_, num_modes=3)
        if not modes:
            continue
        windows = helper._define_depth_interval_windows(modes, window_size_ratio=float(ratios[b]))
        rng_span = max(float(gray.max() - gray.min()), 1e-12)
        for lo, hi in windows:
            for edge in (lo, hi):
                dist = float(np.min(np.abs(gray - edge)))
                assert dist > margin_frac * rng_span, (
                    f"fixture depth value within {dist / rng_span:.2e} of a DSAM "
                    f"window edge (version {version}, sample {b}, edge {edge}); "
                    "regenerate the fixture instead of widening tolerances"
                )


@pytest.mark.parametrize(
    "version",
    [
        "0.0.0",
        "0.0.1",
        "0.0.2",
        "0.0.3",
        "0.0.7",
        "0.1.0",
        "0.1.1",
        "0.1.2",
        "0.1.3",
        "0.2.0",
        "0.3.0",
        "0.4.0",
    ],
)
def test_pixel_level_forward_matches_reference(version):
    """The reference's CustomMask2FormerPixelLevelModule forward — per-sample
    DSAM python loop, `.item()` ratio syncs, detached two-branch sum — vs this
    framework's fully-batched jittable forward, at Swin-T scale (embed 96),
    B=2, non-square 64x96 input, through the pixel decoder."""
    torch.manual_seed(11)
    hf_cfg = _hf_pixel_config()
    ref = refcm.CustomMask2FormerPixelLevelModule(hf_cfg, version=version).eval()
    # ROOT CAUSE of the r3/r4 order-dependent flakes in this test: the HF
    # pixel decoder's level_embed is a RAW `nn.Parameter(torch.Tensor(...))`
    # (modeling_mask2former.py:1222) that only `_init_weights` (via
    # post_init) zeroes — and constructing the bare pixel-level module never
    # runs post_init, leaving UNINITIALIZED HEAP MEMORY as the parameter.
    # Whether that garbage decodes as benign denormals or as NaN/inf depends
    # on the process's allocation history, which is exactly why the failure
    # appeared only in long combined runs and hit a different version each
    # time (diagnosed r4: after a failing forward, ref.state_dict() showed
    # decoder.level_embed non-finite; torch.manual_seed can't help — no RNG
    # draw ever touches it). Apply HF's documented init (normal_(std=0) ==
    # zeros, modeling_mask2former.py:2143), exactly as from_pretrained-
    # loaded reference checkpoints would provide.
    with torch.no_grad():
        ref.decoder.level_embed.zero_()

    cfg = _my_pixel_config(version)
    params, batch_stats = hf_convert.convert_pixel_level_module(_sd(ref), cfg)

    rng = np.random.RandomState(13)
    x = _pixel_inputs(version, rng)
    _assert_depth_clear_of_window_edges(ref, version, x)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))

    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
    # JIT the forward (the production path); the finiteness pre-assert below
    # turns any future input-garbage recurrence into an unambiguous artifact
    # instead of a mystery tolerance excursion.
    mask_features, multi_scale = jax.jit(PixelLevelModule(cfg).apply)(variables, jnp.asarray(x))
    for name, arr in [("mask_features", mask_features)] + [
        (f"multi_scale[{i}]", m) for i, m in enumerate(multi_scale)
    ]:
        n_bad = int(jnp.sum(~jnp.isfinite(arr)))
        assert n_bad == 0, (
            f"{name} has {n_bad} non-finite values (version {version}) — "
            "input-parameter garbage (an uninitialized reference tensor?), "
            "not numeric drift; see the level_embed note above"
        )

    np.testing.assert_allclose(
        np.asarray(mask_features),
        _nhwc(ref_out.decoder_last_hidden_state),
        atol=2e-3,
        rtol=1e-3,
        err_msg=f"mask_features version {version}",
    )
    for i, (m, r) in enumerate(zip(multi_scale, ref_out.decoder_hidden_states)):
        np.testing.assert_allclose(
            np.asarray(m),
            _nhwc(r),
            atol=2e-3,
            rtol=1e-3,
            err_msg=f"multi_scale[{i}] version {version}",
        )
