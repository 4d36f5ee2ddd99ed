"""TPU-native hybrid rendering framework (JAX/XLA/Pallas).

A brand-new implementation of the capabilities of the Vulkan sample
diharaw/hybrid-rendering: deferred G-buffer pipeline + ray-traced soft
shadows / AO / stochastic GGX reflections / DDGI probe-grid GI, each with
SVGF-style denoising, followed by TAA and ACES tone mapping, validated
against a bundled progressive ground-truth path tracer.

Instead of VK_KHR_ray_tracing_pipeline + hardware acceleration structures,
everything is batched wavefront JAX/Pallas kernels composed into one jitted
frame function per frame (XLA program order replaces Vulkan barriers;
donated buffers replace ping-pong image flips).
"""

__version__ = "0.1.0"

from hybrid_rendering_tpu import config, types  # noqa: F401
