"""Roofline arithmetic for the 640x480 v0.4.0 inference forward (VERDICT r2 #5).

Pulls flops + bytes-accessed from the AOT executable's cost analysis and
compares the bandwidth/compute lower bounds against the measured frame time.
If measured ~ bytes/HBM_BW, the model is bandwidth-bound and the MFU ceiling
is structural, not a scheduling artifact.
"""
import os, sys, time, json

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
import jax.numpy as jnp
import numpy as np

from rgbdseg_tpu.config import ModelConfig
from rgbdseg_tpu.models.mask2former import Mask2FormerRGBD

B = int(os.environ.get("B", "1"))
h, w = 480, 640
cfg = ModelConfig(num_labels=40, version="0.4.0")
model = Mask2FormerRGBD(cfg)

variables = jax.jit(model.init)({"params": jax.random.PRNGKey(0)}, jnp.zeros((1, h, w, 10), jnp.float32))
params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), variables["params"])
batch_stats = variables.get("batch_stats", {})


def fwd(px):
    return model.apply({"params": params, "batch_stats": batch_stats}, px.astype(jnp.bfloat16), deterministic=True)


compiled = jax.jit(fwd).lower(jnp.zeros((B, h, w, 10), jnp.float32)).compile()
ca = compiled.cost_analysis()
if isinstance(ca, (list, tuple)):
    ca = ca[0]
flops = float(ca.get("flops", 0))
byk = {k: v for k, v in ca.items() if "bytes" in k}
bytes_acc = float(ca.get("bytes accessed", 0))

rng = np.random.RandomState(0)
args = [jnp.asarray(rng.rand(B, h, w, 10), jnp.float32) for _ in range(12)]
# Force EVERY input physically resident before the timed loop (ADVICE r3):
# jnp.asarray enqueues H2D lazily, and ~11 x 12 MB f32 uploads over the
# ~37 MB/s tunnel would otherwise serialize INTO the timed region, inflating
# measured_ms toward (and past) the bandwidth floor this script exists to
# compare against. Same one-scalar D2H barrier as bench._force_resident.
for a in args:
    float(a.ravel()[0])
jax.block_until_ready(compiled(args[0]))
t0 = time.perf_counter()
for a in args[1:]:
    out = compiled(a)
jax.block_until_ready(out)
dt = (time.perf_counter() - t0) / (len(args) - 1)

PEAK_FLOPS = 197e12  # v5e bf16
HBM_BW = 819e9  # v5e GB/s
print(json.dumps({
    "batch": B,
    "flops_per_call": flops,
    "bytes_accessed_per_call": bytes_acc,
    "byte_keys": byk,
    "measured_ms": round(dt * 1e3, 3),
    "compute_bound_ms": round(flops / PEAK_FLOPS * 1e3, 3),
    "bandwidth_bound_ms": round(bytes_acc / HBM_BW * 1e3, 3),
    "arithmetic_intensity_flops_per_byte": round(flops / max(bytes_acc, 1), 2),
    "mfu": round(flops / dt / PEAK_FLOPS, 4),
    "hbm_bw_utilization": round(bytes_acc / dt / HBM_BW, 4),
}, indent=1))
