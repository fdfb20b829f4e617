"""Dump the train step's compiled HLO; print metadata for the hot ops."""
import re
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
import jax, jax.numpy as jnp, numpy as np, optax

from rgbdseg_tpu.config import ModelConfig
from rgbdseg_tpu.models.mask2former import Mask2FormerRGBD
from rgbdseg_tpu.ops.losses import mask2former_loss

h, w, t = 480, 640, 16
cfg = ModelConfig(num_labels=40, version="0.4.0")
model = Mask2FormerRGBD(cfg)

variables = jax.eval_shape(lambda: model.init({"params": jax.random.PRNGKey(0)}, jnp.zeros((1, h, w, 10), jnp.float32)))
params_s, bs_s = variables["params"], variables.get("batch_stats", {})
params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), params_s)
batch_stats = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), bs_s)
tx = optax.adamw(1e-4)
opt_state = tx.init(params)

def train_step(params, opt_state, batch_stats, px, masks, classes, valid):
    def loss_fn(p):
        pc = jax.tree.map(lambda a: a.astype(jnp.bfloat16), p)
        out, mut = model.apply({"params": pc, "batch_stats": batch_stats}, px.astype(jnp.bfloat16),
                               deterministic=False, mutable=["batch_stats"],
                               rngs={"dropout": jax.random.PRNGKey(1), "droppath": jax.random.PRNGKey(2)})
        total, _ = mask2former_loss(cfg, out, masks, classes, valid, jax.random.PRNGKey(3))
        return total, mut["batch_stats"]
    (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    updates, new_opt = tx.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), new_opt, new_bs, loss

args = (params, opt_state, batch_stats,
        jnp.zeros((1, h, w, 10), jnp.float32),
        jnp.zeros((1, t, h, w), jnp.float32),
        jnp.zeros((1, t), jnp.int32),
        jnp.ones((1, t), bool))
txt = jax.jit(train_step, donate_argnums=(0, 1, 2)).lower(*args).compile().as_text()
print("HLO chars:", len(txt))
want = ["while.127", "while.128", "while.130", "while.124", "while.132",
        "fusion.12177", "fusion.12178", "fusion.12123", "fusion.12175", "sort.26",
        "fusion.2282", "fusion.12149"]
for fname in want:
    pat = re.compile(r"%" + re.escape(fname) + r" = ")
    for line in txt.splitlines():
        if pat.search(line):
            m = re.search(r'metadata=\{[^}]*\}', line)
            shape = line.strip().split(" = ", 1)[1][:90]
            print(f"\n{fname}: {shape}")
            print("  ", (m.group(0)[:360] if m else "(no metadata)"))
            break
# while bodies carry no metadata on the while op itself; find their body names
for fname in ["while.127", "while.128", "while.130", "while.124", "while.132"]:
    pat = re.compile(r"%" + re.escape(fname) + r" = .*body=%([\w.\-]+)")
    mm = pat.search(txt)
    if mm:
        body = mm.group(1)
        # first op with metadata inside the body computation
        bsec = txt.split(f"%{body} ", 1)
        if len(bsec) > 1:
            meta = re.findall(r'source_file="([^"]+)" source_line=(\d+)', bsec[1][:20000])
            from collections import Counter
            print(f"\n{fname} body={body} top sources:", Counter(meta).most_common(4))
