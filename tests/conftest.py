import os

# Tests run on a virtual 8-device CPU mesh; must be set before importing jax.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
# NOTE: the suite is compile-bound on CPU (~25 min cold). JAX's persistent
# compilation cache does not engage for the CPU backend in this jax build
# (verified: zero cache entries written), so there is no cheap speedup knob;
# run individual test files while iterating.
