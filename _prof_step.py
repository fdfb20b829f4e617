"""Profile the full train step; aggregate device ops by source component."""
import glob, gzip, json, collections, os, re
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
rng = np.random.RandomState(0)

variables = jax.jit(model.init)({"params": jax.random.PRNGKey(0)}, jnp.zeros((1, h, w, 10), jnp.float32))
params, batch_stats = variables["params"], variables.get("batch_stats", {})
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

step = jax.jit(train_step, donate_argnums=(0, 1, 2))

def mk():
    return (jnp.asarray(rng.rand(1, h, w, 10), jnp.float32),
            jnp.asarray(rng.rand(1, t, h, w) > 0.7, jnp.float32),
            jnp.asarray(rng.randint(0, 40, (1, t)), jnp.int32),
            jnp.ones((1, t), bool))

batches = [mk() for _ in range(4)]
params, opt_state, batch_stats, loss = step(params, opt_state, batch_stats, *batches[0])
jax.block_until_ready(loss)

jax.profiler.start_trace("/tmp/step_trace")
for b in batches[1:]:
    params, opt_state, batch_stats, loss = step(params, opt_state, batch_stats, *b)
jax.block_until_ready(loss)
jax.profiler.stop_trace()

path = sorted(glob.glob("/tmp/step_trace/plugins/profile/*/*.trace.json.gz"))[-1]
with gzip.open(path, "rt") as fh:
    tr = json.load(fh)
ev = [e for e in tr["traceEvents"] if e.get("ph") == "X"]
pids = {p["pid"]: p["args"].get("name", "") for p in tr["traceEvents"]
        if p.get("ph") == "M" and p.get("name") == "process_name" and "args" in p}
dev_pids = [pid for pid, nm in pids.items() if "TPU" in nm]
agg = collections.Counter()
for e in ev:
    if e["pid"] in dev_pids:
        agg[e.get("name", "?")] += e.get("dur", 0) / 1e3
print("top ops (ms per step, 3 steps):")
for name, ms in agg.most_common(40):
    print(f"{ms/3:9.2f}  {name}")
