"""Dump the bf16 inference forward's compiled HLO; print metadata for named hot ops."""
import re, sys
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
import jax.numpy as jnp, numpy as np

from rgbdseg_tpu.config import ModelConfig
from rgbdseg_tpu.models.mask2former import Mask2FormerRGBD

h, w = 480, 640
cfg = ModelConfig(num_labels=40, version="0.4.0")
model = Mask2FormerRGBD(cfg)

variables = jax.eval_shape(lambda: model.init({"params": jax.random.PRNGKey(0)}, jnp.zeros((1, h, w, 10), jnp.float32)))
params_s, bs_s = variables["params"], variables.get("batch_stats", {})
params = jax.tree.map(lambda s: jnp.zeros(s.shape, jnp.bfloat16 if s.dtype == jnp.float32 else s.dtype), params_s)
batch_stats = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), bs_s)

def fwd(px):
    return model.apply({"params": params, "batch_stats": batch_stats}, px.astype(jnp.bfloat16), deterministic=True)

txt = jax.jit(fwd).lower(jnp.zeros((1, h, w, 10), jnp.float32)).compile().as_text()
print(f"HLO lines: {len(txt.splitlines())}")

hot = sys.argv[1:] or [
    "multiply_reduce_fusion", "convert_reduce_fusion", "concatenate.112",
    "copy.3835", "copy.3834", "pad_maximum_fusion", "fusion.264", "reshape.4514",
    "fusion.152", "convolution_bitcast_fusion", "copy.3686", "fusion.471",
    "multiply_bitcast_fusion", "fusion.556", "fusion.555", "reduce.252",
]
for name in hot:
    pat = re.compile(r"^\s*(?:ROOT )?%?" + re.escape(name) + r"(?:\.\d+)?\s*=.*$", re.M)
    seen = 0
    for m in pat.finditer(txt):
        line = m.group(0)
        meta = re.search(r'metadata=\{[^}]*\}', line)
        shape = re.search(r"=\s*(\S+)\s", line)
        print(f"--- {name}: {shape.group(1) if shape else '?'}")
        if meta:
            print("    " + meta.group(0)[:400])
        seen += 1
        if seen >= 3:
            break
    if not seen:
        print(f"--- {name}: NOT FOUND")
