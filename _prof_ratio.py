"""A/B the E-DSAM ratio-predictor formulations on TPU at 640x480 bf16.

Variants: BN folded (default) vs unfolded (RGBDSEG_FOLD_BN=0), and merged
im2col front conv (default) vs XLA native conv (RGBDSEG_EDSAM_CONV=conv).
Iterations run INSIDE one executable via lax.scan over stacked distinct
inputs (PERF.md measurement rules 1-2)."""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
import jax.numpy as jnp
import numpy as np

from rgbdseg_tpu.models.fusion import EnhancedDepthImageRatioPredictor

N = 16
rng = np.random.RandomState(0)
xs = jnp.asarray(rng.rand(N, 1, 480, 640, 3), jnp.bfloat16)

m = EnhancedDepthImageRatioPredictor()
vs = jax.jit(m.init, static_argnames=("deterministic",))(
    {"params": jax.random.PRNGKey(0)}, xs[0].astype(jnp.float32), deterministic=True
)
params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), vs["params"])
bs = vs.get("batch_stats", {})


def run_variant(env):
    for k in ("RGBDSEG_FOLD_BN", "RGBDSEG_EDSAM_CONV"):
        os.environ.pop(k, None)
    os.environ.update(env)

    def scan_all(xs):
        def body(_, x):
            return None, m.apply({"params": params, "batch_stats": bs}, x, deterministic=True)

        return jax.lax.scan(body, None, xs)[1]

    f = jax.jit(scan_all)
    jax.block_until_ready(f(xs))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(f(xs))
        best = min(best, (time.perf_counter() - t0) / N)
    print(f"{env or 'DEFAULT (fold, im2col)'}: {best*1e3:.3f} ms/call")


run_variant({})
run_variant({"RGBDSEG_EDSAM_CONV": "conv"})
run_variant({"RGBDSEG_FOLD_BN": "0"})

run_variant({"RGBDSEG_EDSAM_FLAT": "1"})
