from vvr_tpu.world.chunk import Chunk, ChunkKind, CHUNK_SIZE  # noqa: F401
from vvr_tpu.world.pyramid import OccupancyPyramid, build_pyramid  # noqa: F401
from vvr_tpu.world.generator import generate_world  # noqa: F401
from vvr_tpu.world.tree import SparseVoxelTree, flatten_tree  # noqa: F401
