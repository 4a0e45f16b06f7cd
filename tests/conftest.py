import os

# Tests run on a virtual 8-device CPU mesh. The env image's sitecustomize
# (/root/.axon_site) imports jax at interpreter startup to register the axon
# TPU plugin, so setting JAX_PLATFORMS here is too late for jax.config's
# env snapshot -- force the platform through the config API instead (legal
# because no backend has been initialized yet). XLA_FLAGS is still read
# lazily at CPU client creation, so the env var works for the device count.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()

# NOTE: the suite is compile-bound on CPU (~25 min cold). JAX's persistent
# compilation cache does not engage for the CPU backend in this jax build
# (verified: zero cache entries written), so there is no cheap speedup knob;
# run individual test files while iterating, or the fast tier:
#   python -m pytest tests/ -m quick -q


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "quick: fast tier (seconds per test; run with -m quick)")
