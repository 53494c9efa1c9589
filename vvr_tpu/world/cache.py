"""World cache — checkpoint/resume of the generated world.

The reference persists chunks as zlib-compressed CBOR under the platform data
dir (src/voxel.rs:31-56,97-109, custom codec src/voxel/chunk.rs:27-132), with
--force-regenerate to bypass. Here: chunk bitsets are bit-packed, zlib'd and
stored in an .npz alongside the flattened tree buffers (SURVEY.md §5
'serialize the flattened arrays + chunk bitsets')."""

from __future__ import annotations

import pathlib
import zlib

import numpy as np

from vvr_tpu.world.chunk import CHUNK_SIZE, Chunk


def default_cache_path(size: int) -> pathlib.Path:
    base = pathlib.Path.home() / ".cache" / "vvr_tpu"
    return base / f"map_{size}.npz"


def save_world(path: pathlib.Path, chunks: list[Chunk], size: int) -> None:
    path = pathlib.Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    positions = np.stack([c.position for c in chunks])
    packed = np.packbits(
        np.stack([c.voxels for c in chunks]).reshape(len(chunks), -1), axis=1,
        bitorder="little")
    blob = zlib.compress(packed.tobytes(), level=1)  # Compression::fast()
    np.savez(path, positions=positions, voxels_zlib=np.frombuffer(blob, np.uint8),
             n_chunks=len(chunks), size=size)


def save_tree(path: pathlib.Path, tree) -> None:
    """Checkpoint the flattened SVO buffers (SURVEY.md §5: 'serialize the
    flattened (indices, bitmasks, aabbs) arrays')."""
    path = pathlib.Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(
        path, indices=tree.indices, bitmasks=tree.bitmasks, aabbs=tree.aabbs,
        depth=tree.depth,
        level_keys=np.array(sorted(tree.level_starts), np.int64),
        level_vals=np.array([tree.level_starts[k]
                             for k in sorted(tree.level_starts)], np.int64))


def load_tree(path: pathlib.Path):
    from vvr_tpu.world.tree import SparseVoxelTree
    path = pathlib.Path(path)
    if not path.exists():
        return None
    with np.load(path) as z:
        starts = {int(k): int(v) for k, v in zip(z["level_keys"], z["level_vals"])}
        return SparseVoxelTree(z["indices"], z["bitmasks"], z["aabbs"],
                               starts, int(z["depth"]), {})


def load_world(path: pathlib.Path) -> list[Chunk] | None:
    path = pathlib.Path(path)
    if not path.exists():
        return None
    with np.load(path) as z:
        positions = z["positions"]
        n = int(z["n_chunks"])
        raw = zlib.decompress(z["voxels_zlib"].tobytes())
        bits = np.unpackbits(np.frombuffer(raw, np.uint8).reshape(n, -1),
                             axis=1, bitorder="little")
    vox = bits.reshape(n, CHUNK_SIZE, CHUNK_SIZE, CHUNK_SIZE).astype(bool)
    return [Chunk(positions[i], vox[i]).rebuild() for i in range(n)]
