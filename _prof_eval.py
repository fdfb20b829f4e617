"""Attribute the eval path's device time: forward vs the _eval_stats_device
program (PERF.md eval ledger — what separates the measured 46.7 img/s from
the ~48.7 img/s B=4 forward ceiling). Runs 4 eval update cycles under the
profiler and splits device busy time by executable (trace events carry the
jit function name in their name/args)."""

import collections
import glob
import gzip
import json

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
import jax.numpy as jnp
import numpy as np

from rgbdseg_tpu.config import ModelConfig
from rgbdseg_tpu.data.pipeline import Batch
from rgbdseg_tpu.models.mask2former import Mask2FormerRGBD
from rgbdseg_tpu.train.evaluator import Evaluator

batch, h, w, t = 4, 480, 640, 8
cfg = ModelConfig(num_labels=40, version="0.4.0")
model = Mask2FormerRGBD(cfg)
variables = jax.jit(model.init)(
    {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, h, w, 10), jnp.float32)
)
variables = jax.tree.map(
    lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, variables
)


@jax.jit
def forward(px):
    out = model.apply(variables, px, deterministic=True)
    return out.class_queries_logits, out.masks_queries_logits


rng = np.random.RandomState(0)
xs = [jnp.asarray(rng.rand(batch, h, w, 10), jnp.bfloat16) for _ in range(5)]
gts = []
for _ in range(5):
    masks = np.zeros((batch, t, h, w), np.float32)
    for b in range(batch):
        for j in range(t):
            y0, x0 = rng.randint(0, h - 80), rng.randint(0, w - 80)
            masks[b, j, y0 : y0 + 80, x0 : x0 + 80] = 1.0
    gts.append(
        Batch(
            pixel_values=np.zeros((batch, h, w, 10), np.float32),
            mask_labels=masks,
            class_labels=rng.randint(0, 40, (batch, t)).astype(np.int32),
            valid=np.ones((batch, t), bool),
            orig_sizes=np.tile([[h, w]], (batch, 1)).astype(np.int32),
            mask_labels_packed=np.packbits(masks.astype(bool).reshape(batch, t, -1), axis=-1),
        )
    )

ev = Evaluator({i: str(i) for i in range(40)}, threshold=0.0, eval_at_original_size=True)
for leaf in xs:
    float(leaf.ravel()[0])
jax.block_until_ready(forward(xs[0]))
ev.update(*forward(xs[0]), gts[0])
ev.flush()
ev.reset()

jax.profiler.start_trace("/tmp/eval_trace")
for x, gt in zip(xs[1:], gts[1:]):
    ev.update(*forward(x), gt)
ev.flush()
jax.profiler.stop_trace()
n = len(xs) - 1

path = sorted(glob.glob("/tmp/eval_trace/plugins/profile/*/*.trace.json.gz"))[-1]
with gzip.open(path, "rt") as fh:
    tr = json.load(fh)
pids = {
    p["pid"]: p["args"].get("name", "")
    for p in tr["traceEvents"]
    if p.get("ph") == "M" and p.get("name") == "process_name" and "args" in p
}
dev_pids = {pid for pid, nm in pids.items() if "TPU" in nm and "pjrt" not in nm.lower()}


def busy(events):
    ivals = sorted((e["ts"], e["ts"] + e.get("dur", 0)) for e in events)
    tot = 0.0
    if ivals:
        cs, ce = ivals[0]
        for s, e in ivals[1:]:
            if s > ce:
                tot += ce - cs
                cs, ce = s, e
            else:
                ce = max(ce, e)
        tot += ce - cs
    return tot / 1e3


dev_events = [e for e in tr["traceEvents"] if e.get("ph") == "X" and e["pid"] in dev_pids]
# Group events by top-level module: the run-id lane names events like
# "jit_forward" / "jit__eval_stats_device"; fall back to counting everything.
by_mod = collections.defaultdict(list)
for e in dev_events:
    name = e.get("name", "")
    key = "stats" if "stats" in name else ("forward" if "forward" in name else "other")
    by_mod[key].append(e)
total_ms = busy(dev_events)
print(f"device busy total: {total_ms / n:.2f} ms/batch over {n} batches (B={batch})")
for key in ("forward", "stats", "other"):
    if by_mod[key]:
        print(f"  {key:8s}: {busy(by_mod[key]) / n:7.2f} ms/batch ({len(by_mod[key])} events)")
top = collections.Counter()
for e in by_mod["other"]:
    top[e.get("name", "?")[:60]] += e.get("dur", 0)
for name, us in top.most_common(6):
    print(f"    other: {us / 1e3 / n:7.2f} ms/batch  {name}")
