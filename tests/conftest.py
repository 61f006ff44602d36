import os

# Tests run on CPU with a virtual 8-device mesh so multi-chip sharding paths are
# exercised without TPU hardware (the driver separately dry-runs them).
#
# Forcing the platform via os.environ["JAX_PLATFORMS"] is NOT enough here: the
# machine's baked sitecustomize imports jax and registers the axon TPU PJRT
# plugin at interpreter startup (before conftest runs), and after that the env
# var is ignored — the round-2 end-of-round test log silently ran the whole
# suite on the TPU this way (slow remote compiles, serialized on the single TPU
# grant, one sharding test red). jax.config.update("jax_platforms", ...) wins
# over the plugin registration, so use that, and hard-assert the outcome.
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)  # f64 islands for reference-parity tests

assert jax.devices()[0].platform == "cpu", (
    "tests must run on the CPU backend; got %r — the axon plugin won the platform "
    "selection (see conftest.py)" % (jax.devices(),)
)
assert len(jax.devices()) == 8, (
    "expected 8 virtual CPU devices for sharding tests, got %d" % len(jax.devices())
)
