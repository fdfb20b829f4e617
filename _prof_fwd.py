"""Profile the bf16 inference forward (bench.py's workload); aggregate device ops."""
import glob, gzip, json, collections
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
import jax, jax.numpy as jnp, numpy as np

from rgbdseg_tpu.config import ModelConfig
from rgbdseg_tpu.models.mask2former import Mask2FormerRGBD

h, w = 480, 640
cfg = ModelConfig(num_labels=40, version="0.4.0")
model = Mask2FormerRGBD(cfg)
rng = np.random.RandomState(0)

variables = jax.jit(model.init)({"params": jax.random.PRNGKey(0)}, jnp.zeros((1, h, w, 10), jnp.float32))
params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), variables["params"])
batch_stats = variables.get("batch_stats", {})

def fwd(px):
    return model.apply({"params": params, "batch_stats": batch_stats}, px.astype(jnp.bfloat16), deterministic=True)

f = jax.jit(fwd)
args = [jnp.asarray(rng.rand(1, h, w, 10), jnp.float32) for _ in range(7)]
jax.block_until_ready(f(args[0]))

jax.profiler.start_trace("/tmp/fwd_trace")
for a in args[1:]:
    out = f(a)
jax.block_until_ready(out)
jax.profiler.stop_trace()

path = sorted(glob.glob("/tmp/fwd_trace/plugins/profile/*/*.trace.json.gz"))[-1]
with gzip.open(path, "rt") as fh:
    tr = json.load(fh)
ev = [e for e in tr["traceEvents"] if e.get("ph") == "X"]
pids = {p["pid"]: p["args"].get("name", "") for p in tr["traceEvents"]
        if p.get("ph") == "M" and p.get("name") == "process_name" and "args" in p}
dev_pids = [pid for pid, nm in pids.items() if "TPU" in nm and "pjrt" not in nm.lower()]
agg = collections.Counter()
tot = 0.0
n = 6
for e in ev:
    if e["pid"] in dev_pids:
        name = e.get("name", "?")
        dur = e.get("dur", 0) / 1e3  # ms
        agg[name] += dur
        tot += dur
print(f"total device ms over {n} runs: {tot:.1f}  (per-run {tot/n:.2f})")
for name, ms in agg.most_common(40):
    print(f"{ms/n:9.3f} ms  {name}")
