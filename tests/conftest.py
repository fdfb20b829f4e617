"""Test configuration: force CPU with 8 virtual devices so multi-chip sharding
tests run anywhere (the driver validates real-TPU behavior separately)."""

import os

# Hard-force CPU. The session may boot jax at interpreter startup (via a
# sitecustomize TPU-tunnel plugin) with JAX_PLATFORMS already bound, so
# setting os.environ here is too late — update the LIVE config instead.
# If the tunnel is down, any backend init on its platform hangs forever;
# CPU tests must never depend on tunnel liveness.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: the suite jits hundreds of programs and this box
# may have a single CPU core — cold-compiling everything takes >30 min, cached
# reruns minutes. Cache entries key on HLO + flags — but NOT on the host's
# CPU feature set: /tmp persists across driver sessions on DIFFERENT
# machines, and XLA:CPU loads cross-host AOT entries with a "machine
# features mismatch" warning and subtly different codegen (different
# vectorization = different float reassociation). That makes parity-test
# numerics depend on whether an executable was compiled fresh on THIS host
# or loaded from another host's entry — i.e. on run HISTORY, the prime
# suspect for the order-dependent test_reference_fusion[0.1.3] excursion
# (VERDICT r3 #5: failed once in a combined run — plausibly the fresh
# compile — then passed repeatedly once its cache entry existed). Key the
# cache dir by the host's CPU flags so entries never cross machine types.
import hashlib

try:
    with open("/proc/cpuinfo") as _f:
        for _line in _f:
            if _line.startswith("flags"):
                _cpu_tag = hashlib.sha1(_line.encode()).hexdigest()[:8]
                break
        else:
            _cpu_tag = "generic"
except OSError:  # pragma: no cover - non-Linux
    _cpu_tag = "generic"
_cache_dir = os.environ.get("RGBDSEG_TEST_CACHE_DIR", f"/tmp/jax_cache_{_cpu_tag}")
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# This JAX build's DEFAULT matmul/conv precision loses ~1e-3 accuracy even on
# CPU; numerics/parity tests need true f32 accumulation.
jax.config.update("jax_default_matmul_precision", "float32")
