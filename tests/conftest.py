import os

# Tests run on CPU with a virtual 8-device mesh so multi-chip sharding paths are
# exercised without TPU hardware (the driver separately dry-runs them). Force the
# platform: the harness exports JAX_PLATFORMS=axon (the real TPU tunnel), and a
# setdefault would silently run every "CPU" test on the TPU — slow remote
# compiles and bf16-matmul noise in tests that assert f64-grade parity.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)  # f64 islands for reference-parity tests
