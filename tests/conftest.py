"""Test configuration: local-CPU JAX, 8 virtual devices, f64.

The ambient environment may register a remote-TPU PJRT plugin at interpreter
startup (sitecustomize) and programmatically set ``jax_platforms`` to prefer
it; every compile then crosses a tunnel and the suite crawls.  Overriding the
*config* (not just the env var, which the programmatic setting beats) pins
the suite to the local CPU backend.

Multi-chip sharding logic is tested on a fake 8-device CPU mesh
(``xla_force_host_platform_device_count``), and f64 matches the reference's
torch.double (SURVEY.md section 7).
"""

import os

# NF_TPU_TEST_BACKEND=tpu runs the suite against the real accelerator
# (x64 off — TPU f64 is emulated); default pins the local CPU backend.
_backend = os.environ.get("NF_TPU_TEST_BACKEND", "cpu")

flags = os.environ.get("XLA_FLAGS", "")
if _backend == "cpu" and "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

if _backend == "cpu":
    jax.config.update("jax_platforms", "cpu")  # beat programmatic override
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
else:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
# Persistent compilation cache: repeated test runs skip recompiles.
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
