"""Profile the standalone criterion fwd+bwd; aggregate device-lane ops."""
import glob, gzip, json, time, collections
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
import jax, jax.numpy as jnp, numpy as np

from rgbdseg_tpu.config import ModelConfig
from rgbdseg_tpu.ops.losses import mask2former_loss

h, w, t, q = 480, 640, 16, 100
hm, wm = h // 4, w // 4
cfg = ModelConfig(num_labels=40, version="0.4.0")
rng = np.random.RandomState(0)

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

f = jax.jit(crit)

def mk():
    cl = jnp.asarray(rng.rand(10, 1, q, 41), jnp.float32)
    ml = jnp.asarray(rng.rand(10, 1, q, hm, wm), jnp.float32)
    masks = jnp.asarray(rng.rand(1, t, h, w) > 0.7, jnp.float32)
    classes = jnp.asarray(rng.randint(0, 40, (1, t)), jnp.int32)
    valid = jnp.ones((1, t), bool)
    return cl, ml, masks, classes, valid

args = [mk() for _ in range(4)]
jax.block_until_ready(f(*args[0]))

jax.profiler.start_trace("/tmp/crit_trace")
for a in args[1:]:
    out = f(*a)
jax.block_until_ready(out)
jax.profiler.stop_trace()

path = sorted(glob.glob("/tmp/crit_trace/plugins/profile/*/*.trace.json.gz"))[-1]
with gzip.open(path, "rt") as fh:
    tr = json.load(fh)
ev = [e for e in tr["traceEvents"] if e.get("ph") == "X"]
pids = {p["pid"]: p["args"].get("name", "") for p in tr["traceEvents"]
        if p.get("ph") == "M" and p.get("name") == "process_name" and "args" in p}
dev_pids = [pid for pid, nm in pids.items() if "TPU" in nm and "pjrt" not in nm.lower()]
agg = collections.Counter()
tot = 0.0
for e in ev:
    if e["pid"] in dev_pids:
        name = e.get("name", "?")
        dur = e.get("dur", 0) / 1e3  # ms
        agg[name] += dur
        tot += dur
print(f"total device ms over 3 runs: {tot:.1f}  (per-run {tot/3:.1f})")
for name, ms in agg.most_common(25):
    print(f"{ms/3:9.2f} ms  {name}")
