"""Bisect the 640x480 B=1 train step: model fwd+bwd vs criterion fwd+bwd."""
import os, time, json
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
import jax, jax.numpy as jnp, numpy as np, optax

from rgbdseg_tpu.config import ModelConfig
from rgbdseg_tpu.models.mask2former import Mask2FormerRGBD
from rgbdseg_tpu.ops.losses import mask2former_loss, layer_losses
from rgbdseg_tpu.ops.matcher import hungarian_batch

h, w, t, q = 480, 640, 16, 100
cfg = ModelConfig(num_labels=40, version="0.4.0")
model = Mask2FormerRGBD(cfg)
rng = np.random.RandomState(0)

variables = jax.jit(model.init)({"params": jax.random.PRNGKey(0)}, jnp.zeros((1, h, w, 10), jnp.float32))
params, batch_stats = variables["params"], variables.get("batch_stats", {})

def timeit(fn, args_list, name):
    out = fn(*args_list[0]); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for a in args_list[1:]:
        out = fn(*a)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / (len(args_list) - 1)
    print(f"{name}: {dt*1000:.1f} ms")
    return dt

N = 4
bf16p = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)

# 1) model fwd+bwd, trivial loss
def fwdbwd(p, px):
    def loss_fn(pp):
        pc = jax.tree.map(lambda a: a.astype(jnp.bfloat16), pp)
        out, _ = model.apply({"params": pc, "batch_stats": batch_stats}, px.astype(jnp.bfloat16),
                             deterministic=False, mutable=["batch_stats"],
                             rngs={"dropout": jax.random.PRNGKey(1), "droppath": jax.random.PRNGKey(2)})
        s = jnp.sum(out.class_queries_logits.astype(jnp.float32)) + jnp.sum(out.masks_queries_logits.astype(jnp.float32))
        for a, m in zip(out.aux_class_logits, out.aux_mask_logits):
            s += jnp.sum(a.astype(jnp.float32)) + jnp.sum(m.astype(jnp.float32))
        return s
    return jax.grad(loss_fn)(p)

f1 = jax.jit(fwdbwd)
args1 = [(params, jnp.asarray(rng.rand(1, h, w, 10), jnp.float32)) for _ in range(N)]
timeit(f1, args1, "model fwd+bwd (trivial loss, all layers consumed)")

# 2) criterion fwd+bwd standalone on random logits (mask logits at stride-4 res)
hm, wm = h // 4, w // 4
class Out:
    pass

def crit(cl_stack, ml_stack, masks, classes, valid):
    o = Out()
    o.class_queries_logits = cl_stack[-1]
    o.masks_queries_logits = ml_stack[-1]
    o.aux_class_logits = [cl_stack[i] for i in range(9)]
    o.aux_mask_logits = [ml_stack[i] for i in range(9)]
    def loss_fn(ml):
        o2 = Out()
        o2.class_queries_logits = cl_stack[-1]
        o2.masks_queries_logits = ml[-1]
        o2.aux_class_logits = [cl_stack[i] for i in range(9)]
        o2.aux_mask_logits = [ml[i] for i in range(9)]
        total, _ = mask2former_loss(cfg, o2, masks, classes, valid, jax.random.PRNGKey(3))
        return total
    return jax.grad(loss_fn)(ml_stack)

f2 = jax.jit(crit)
def mk2():
    cl = jnp.asarray(rng.rand(10, 1, q, 41), jnp.float32)
    ml = jnp.asarray(rng.rand(10, 1, q, hm, wm), jnp.float32)
    masks = jnp.asarray(rng.rand(1, t, h, w) > 0.7, jnp.float32)
    classes = jnp.asarray(rng.randint(0, 40, (1, t)), jnp.int32)
    valid = jnp.ones((1, t), bool)
    return cl, ml, masks, classes, valid
args2 = [mk2() for _ in range(N)]
timeit(f2, args2, "criterion fwd+bwd (10 layers, random logits)")

# 3) hungarian alone, 10 layers batched
f3 = jax.jit(lambda c: hungarian_batch(c))
args3 = [(jnp.asarray(rng.rand(10, t, q), jnp.float32),) for _ in range(N)]
timeit(f3, args3, "hungarian 10x(16x100)")
