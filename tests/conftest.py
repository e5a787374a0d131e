"""Test env: force JAX onto CPU with 8 virtual devices so multi-chip
sharding paths can be exercised without TPU hardware (SURVEY.md section 4).

This environment preloads jax at interpreter startup (sitecustomize), so
setting JAX_PLATFORMS via os.environ here is too late — the platform must
be forced through jax.config after import. XLA_FLAGS still works as long
as no backend has been instantiated yet. pytest.ini additionally blocks
the jaxtyping plugin, which would otherwise touch jax before this file.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# Persistent compilation cache: amortize cold XLA compiles across runs.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

# Opt-in ON-CHIP suite (VERDICT r2 item 2): PEMP_TPU_TESTS=1 leaves the
# platform alone so `pytest -m tpu tests/test_tpu_onchip.py` runs the
# compiled-kernel bit-parity checks on the real TPU. The env var alone
# is not enough — a stale `export PEMP_TPU_TESTS=1` must not send the
# whole CPU suite through the tunneled TPU backend — so the invocation
# must also actually target the tpu tests ("-m tpu" or the onchip
# module on the command line).
import sys

_tpu_invocation = any(
    a == "tpu" or "test_tpu_onchip" in a for a in sys.argv[1:])
if not (os.environ.get("PEMP_TPU_TESTS") == "1" and _tpu_invocation):
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax  # noqa: E402  (already preloaded by sitecustomize anyway)

    jax.config.update("jax_platforms", "cpu")