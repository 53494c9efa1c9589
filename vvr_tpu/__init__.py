"""vvr_tpu — a TPU-native voxel raytracing framework (JAX/XLA/Pallas).

A from-scratch rebuild of the capabilities of jedjoud10/vulkan-voxel-raytracer
(reference mounted at /root/reference; structural analysis in SURVEY.md),
designed TPU-first: mask-predicated wavefront kernels over a dense occupancy
mip pyramid instead of the reference's recursive per-pixel megakernel.
"""

__version__ = "0.1.0"

import os as _os

# Persistent XLA compilation cache: TPU compiles of the traversal loops take
# minutes through the remote-compile tunnel; cache them across processes.
# CPU-only runs skip it — XLA:CPU AOT artifacts are machine-feature-pinned
# and can SIGILL when reloaded under a different feature set.
if (_os.environ.get("VVR_NO_COMPILE_CACHE") != "1"
        and _os.environ.get("JAX_PLATFORMS", "") != "cpu"):
    import jax as _jax

    _cache_dir = _os.environ.get("VVR_COMPILE_CACHE",
                                 _os.path.expanduser("~/.cache/jax_comp"))
    try:
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - older jax
        pass

from vvr_tpu.config import RenderConfig, WorldConfig  # noqa: F401
