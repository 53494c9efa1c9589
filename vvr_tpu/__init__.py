"""vvr_tpu — a TPU-native voxel raytracing framework (JAX/XLA/Pallas).

A from-scratch rebuild of the capabilities of jedjoud10/vulkan-voxel-raytracer
(reference mounted at /root/reference; structural analysis in SURVEY.md),
designed TPU-first: mask-predicated wavefront kernels over a dense occupancy
mip pyramid instead of the reference's recursive per-pixel megakernel.
"""

__version__ = "0.1.0"

from vvr_tpu.config import RenderConfig, WorldConfig  # noqa: F401
