"""Test config.

The environment auto-registers the TPU backend (axon sitecustomize) in
every process; tests run on it when the tunnel is up — XLA:TPU compiles
these programs orders of magnitude faster than XLA:CPU on this host.
If no TPU is reachable, fall back to CPU explicitly.

NOTE: never set --xla_force_host_platform_device_count here — carving
the host into 8 virtual devices cripples XLA:CPU for every test.
Multi-device mesh coverage lives in tests/test_multichip.py, which
re-execs itself in a subprocess with the flag set.
"""
import os

os.environ.setdefault("JAX_ENABLE_X64", "0")
# Persistent compile cache: golden renders re-jit identical programs in
# every test process; caching them across runs/processes is the single
# biggest suite-runtime lever (TPU compiles go through the tunnel).
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_pbrt"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

try:
    import jax

    jax.devices()
except Exception:  # tunnel down: force CPU before any test imports jax
    os.environ["JAX_PLATFORMS"] = "cpu"
