"""Configuration — the single source of render/world knobs.

Mirrors the reference's clap CLI flags (/root/reference/src/main.rs:33-80) and
its SPIR-V specialization constants (/root/reference/src/pipeline.rs:102-112):
quality knobs here are *trace-time Python constants* baked into the jitted
frame function (the TPU analog of spec constants), while per-frame dynamic
state (camera, sun, time) travels as traced arguments (the analog of push
constants, /root/reference/src/pipeline.rs:7-17).
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class WorldConfig:
    """World/scene shape. Reference: src/voxel/util.rs:5-6 (SVO_DEPTH=5 ->
    1024^3 world of 16^3 chunks of 64^3 voxels)."""

    depth: int = 5                  # tree depth; world size = 4**depth
    seed: int = 0                   # worldgen seed (reference uses seed 0)
    # FBM terrain parameters (reference: src/voxel.rs:60-91)
    fbm_octaves: int = 6
    fbm_frequency: float = 0.001
    fbm_amplitude: float = 700.0
    fbm_offset: float = 80.0
    terrace_step: float = 10.0
    detail_octaves: int = 3
    detail_frequency: float = 0.01

    @property
    def size(self) -> int:
        """World edge length in voxels (1 << (depth*2))."""
        return 1 << (2 * self.depth)

    @property
    def chunk_count(self) -> int:
        """Chunks per edge; reference caps at 16 (src/voxel.rs:68)."""
        return min(self.size // 64, 16)


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Render quality knobs. Field-for-field parity with the reference CLI
    (src/main.rs:36-79) plus TPU-specific tiling knobs."""

    width: int = 800                # reference default window (renderer.rs:205)
    height: int = 600
    downscale_factor: int = 1       # render at (w/h)/downscale, composite up
    shadow_samples: int = 1         # 0 = off, 1 = hard, N>1 = jittered soft
    max_ray_iterations: int = 3     # bounce loop cap (1-8)
    round_normals: bool = False     # kept for parity; no-op in reference too
    ambient_occlusion: bool = False
    ao_mode: str = "filtered"       # "filtered": SVT trilinear sample along
                                    # the normal (raytracer.slang:274-277,
                                    # the reference's live path); "overlap":
                                    # planar overlap-query estimator
                                    # (ops/overlap.py; the reference's
                                    # library AO, ray_stuff_other.slang:
                                    # 450-520 + raytracer.slang:283-297)
    wavy_reflections: bool = False
    pixelated_shadows: bool = False
    enable_debug_stuff: bool = False
    point_lights: bool = False      # the reference's (disabled) 10-light loop
    debug_type: int = 6             # reference DebugType enum numbering
                                    # (raytracer.slang:46-53): 0=raster dbg
                                    # ("Combined" dispatches the raster path,
                                    # renderer.rs:694), 1=iterations,
                                    # 2=buffer fetches, 3=normals, 4=world,
                                    # 5=exit type; 6=main raytraced frame
    # TPU knobs (no reference analog; group_size_exp becomes the ray tile)
    ray_tile: int = 4096            # rays per traversal batch lane-block
    traversal_max_steps: int = 256  # static HDDA iteration cap
    traversal: str = "auto"         # "pyramid": hierarchical brick HDDA
                                    # (ops/traverse.py); "jump": flat
                                    # superbrick DDA with distance jumps
                                    # (ops/jump.py); "jump2": the two-tier
                                    # narrow-state variant (ops/jump2.py —
                                    # measured slower at the flagship
                                    # composition, kept selectable with a
                                    # ledger row in PROGRESS.md); "auto":
                                    # jump while the row table stays in the
                                    # fast gather regime (<= 64K
                                    # superbricks, i.e. size <= 320 —
                                    # PROGRESS.md microbench), pyramid
                                    # beyond
    primary_raster: str = "auto"    # primary-ray visibility via the
                                    # exposed-face rasterizer
                                    # (ops/rastertrace.py): "auto" = on for
                                    # the main view (debug heatmaps need
                                    # the DDA's traversal counters),
                                    # "on" / "off" force it
    sun_mask: str = "auto"          # conservative sun-space occlusion
                                    # classifier (ops/sunshadow.py):
                                    # hard shadows use exact grids; soft
                                    # shadows (N>1) use CONE grids whose
                                    # margins cover every jittered
                                    # direction, so one classification
                                    # serves all N samples; "off"
    # Sky resources (reference: src/skybox.rs:43-45)
    skybox_resolution: int = 256
    clouds_resolution: int = 512
    sky_cache_quantum: float = 0.25  # sky/cloud textures are regenerated
                                    # only when (sun, quantize(time)) moves
                                    # to a new bucket — the reference
                                    # regenerates per frame but consumes the
                                    # PREVIOUS frame's sky (1-frame latency,
                                    # SURVEY.md §3.2); a 0.25 s quantum is
                                    # the same class of approximation for
                                    # ~10% of frame budget. 0 disables.
    # Post (reference: post_process_compute.slang)
    bloom_enabled: bool = True
    bloom_strength: float = 0.05
    bloom_sample_mip: int = 2

    def use_jump(self, world_size: int) -> bool:
        """Resolve the traversal knob for a world of `world_size` voxels."""
        if self.traversal == "jump":
            return True
        if self.traversal in ("pyramid", "jump2", "paged"):
            return False
        return (world_size // 8) ** 3 <= 65536

    def use_paged(self, world_size: int) -> bool:
        """Paged two-level grid (ops/paged.py): explicit, or auto at
        scales where the flat grid's row table leaves the fast-gather
        regime (>64K superbricks, i.e. >512^3)."""
        if self.traversal == "paged":
            return True
        return self.traversal == "auto" and (world_size // 8) ** 3 > 65536

    @property
    def render_width(self) -> int:
        return self.width // self.downscale_factor

    @property
    def render_height(self) -> int:
        return self.height // self.downscale_factor


# Debug render modes — the reference DebugType enum values
# (shaders/raytracer.slang:46-53). Mode 0 ("Combined") dispatches the
# rasterization debug path (src/renderer.rs:694-771); 6 is the normal
# raytraced frame (a non-DEBUG build in the reference).
DEBUG_RASTER = 0
DEBUG_ITERATIONS = 1
DEBUG_BUFFER_FETCHES = 2
DEBUG_NORMALS = 3
DEBUG_WORLD = 4
DEBUG_EXIT_TYPE = 5
DEBUG_MAIN = 6
