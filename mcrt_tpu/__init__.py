"""mcrt_tpu: a TPU-native differentiable Monte Carlo renderer (JAX/XLA/Pallas).

Brand-new framework with the capabilities of linusmossberg/monte-carlo-ray-tracer,
re-architected as a wavefront pipeline over SoA ray megabatches. See README.md.
"""
from .scene.loader import Scene  # noqa: F401
from .render import RenderConfig, render, render_to_file  # noqa: F401

__version__ = "0.1.0"
