#!/bin/bash
# CPU test runner. PALLAS_AXON_POOL_IPS must be cleared BEFORE the interpreter starts:
# the baked sitecustomize registers the axon TPU PJRT plugin in every python process,
# and concurrent processes serialize on the single TPU grant (~200s stalls).
exec env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
  XLA_FLAGS="--xla_force_host_platform_device_count=8 $XLA_FLAGS" \
  python -m pytest tests/ -q "$@"
