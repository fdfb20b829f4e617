"""Dump compiled HLO of the criterion and locate the hot fusions' metadata."""
import re
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
import jax, jax.numpy as jnp, numpy as np

from rgbdseg_tpu.config import ModelConfig
from rgbdseg_tpu.ops.losses import mask2former_loss

h, w, t, q = 480, 640, 16, 100
hm, wm = h // 4, w // 4
cfg = ModelConfig(num_labels=40, version="0.4.0")

class Out:
    pass

def crit(cl_stack, ml_stack, masks, classes, valid):
    def loss_fn(ml):
        o = Out()
        o.class_queries_logits = cl_stack[-1]
        o.masks_queries_logits = ml[-1]
        o.aux_class_logits = [cl_stack[i] for i in range(9)]
        o.aux_mask_logits = [ml[i] for i in range(9)]
        total, _ = mask2former_loss(cfg, o, masks, classes, valid, jax.random.PRNGKey(3))
        return total
    return jax.grad(loss_fn)(ml_stack)

args = (
    jnp.zeros((10, 1, q, 41), jnp.float32),
    jnp.zeros((10, 1, q, hm, wm), jnp.float32),
    jnp.zeros((1, t, h, w), jnp.float32),
    jnp.zeros((1, t), jnp.int32),
    jnp.ones((1, t), bool),
)
txt = jax.jit(crit).lower(*args).compile().as_text()
print("HLO chars:", len(txt))
for fname in ["fusion.499", "fusion.500", "fusion.517", "fusion.511", "fusion.512", "fusion.518", "fusion.508", "sort.10"]:
    for line in txt.splitlines():
        if (" %s = " % fname) in line or ("%%%s " % fname) in line:
            m = re.search(r'metadata=\{[^}]*\}', line)
            shape = line.strip().split(" = ")[1][:80] if " = " in line else ""
            print(f"\n{fname}: {shape}")
            print("  ", m.group(0)[:300] if m else "(no metadata)")
            break
