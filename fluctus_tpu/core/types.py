"""Core pytree dataclasses: scene-on-device, params, hits, path state.

This is the TPU counterpart of the reference's shared host/device structs
(reference: src/geom.h:52-260). Where the reference encodes SoA access with
offset macros (src/geom.h:24-50), JAX pytrees of arrays are natively SoA, so
every struct-of-arrays here is simply a dataclass whose fields are batched
jnp arrays.

Static (compile-time) vs traced (runtime) split mirrors the reference's
compile-define vs param-buffer split (src/kernel_impl.hpp, SURVEY §5.6):
`RenderConfig` fields are jit-static python values (changing one re-traces,
exactly like the reference's kernel recompile-on-toggle); `RenderParams`
fields are traced arrays (camera moves do not recompile).
"""
from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
import numpy as np
from flax import struct

# BSDF taxonomy — bitmask values match the reference so scene files and the
# material-type scene bitmask round-trip identically
# (reference: src/bxdf_types.h:4-11).
BXDF_DIFFUSE = 1 << 1
BXDF_GLOSSY = 1 << 2
BXDF_GGX_ROUGH_REFLECTION = 1 << 3
BXDF_IDEAL_REFLECTION = 1 << 4
BXDF_GGX_ROUGH_DIELECTRIC = 1 << 5
BXDF_IDEAL_DIELECTRIC = 1 << 6
BXDF_EMISSIVE = 1 << 7

BXDF_SINGULAR_MASK = BXDF_IDEAL_REFLECTION | BXDF_IDEAL_DIELECTRIC

# Dense ids used for lax.switch dispatch on device (bitmask -> index).
BSDF_TYPES = [
    BXDF_DIFFUSE, BXDF_GLOSSY, BXDF_GGX_ROUGH_REFLECTION,
    BXDF_IDEAL_REFLECTION, BXDF_GGX_ROUGH_DIELECTRIC, BXDF_IDEAL_DIELECTRIC,
    BXDF_EMISSIVE,
]
BSDF_ID = {t: i for i, t in enumerate(BSDF_TYPES)}
NUM_BSDF_TYPES = len(BSDF_TYPES)


@struct.dataclass
class Materials:
    """SoA material table (reference: src/geom.h:113-124 `Material`)."""
    kd: jnp.ndarray        # (M, 3) diffuse reflectivity
    ks: jnp.ndarray        # (M, 3) specular reflectivity
    ke: jnp.ndarray        # (M, 3) emission
    ns: jnp.ndarray        # (M,)  specular exponent (phong shininess)
    ni: jnp.ndarray        # (M,)  index of refraction
    map_kd: jnp.ndarray    # (M,)  int32 texture descriptor idx or -1
    map_ks: jnp.ndarray    # (M,)  int32
    map_n: jnp.ndarray     # (M,)  int32 (normal map)
    bsdf_id: jnp.ndarray   # (M,)  int32 dense id into BSDF_TYPES


@struct.dataclass
class TextureAtlas:
    """All textures packed into one flat u8 RGBA buffer + descriptor table
    (reference: src/clcontext.cpp:570-611, src/geom.h:126-131)."""
    data: jnp.ndarray      # (total_bytes,) uint8, RGBA8 rows
    offset: jnp.ndarray    # (T,) uint32 byte offset of texture start
    width: jnp.ndarray     # (T,) int32
    height: jnp.ndarray    # (T,) int32


@struct.dataclass
class EnvMap:
    """Lat-long HDR environment with alias-method importance tables
    (reference: src/envmap.{hpp,cpp}, src/env_map.cl). The image is a
    differentiable leaf (inverse-rendering target)."""
    image: jnp.ndarray       # (H, W, 3) float32 linear radiance
    pdf_table: jnp.ndarray   # (H*W,) float32 — flat image-space pdf (×HW)
    prob_table: jnp.ndarray  # (H*W,) float32 — alias acceptance probability
    alias_table: jnp.ndarray # (H*W,) int32 — alias index


@struct.dataclass
class FlatBVH:
    """Flat 2-wide BVH: left child = i+1, right child explicit, parent links
    for stackless traversal (reference: src/geom.h:71-80 `GPUNode`,
    src/bvh.cpp:61-88), stored SoA for vectorized gathers."""
    node_lo: jnp.ndarray     # (N, 3) float32 AABB min
    node_hi: jnp.ndarray     # (N, 3) float32 AABB max
    node_right: jnp.ndarray  # (N,) int32: inner -> right child; leaf -> iStart
    node_count: jnp.ndarray  # (N,) int32: 0 for inner, nPrims for leaf
    node_parent: jnp.ndarray # (N,) int32 (-1 at root)
    prim_idx: jnp.ndarray    # (K,) int32 indices into triangle arrays
                             # (K >= n_tris when SBVH duplicates references)


@struct.dataclass
class PackedBVH:
    """Gather-optimized traversal layout (see accel/pack.py): one row gather
    per traversal step. root_ref is static-encoded in the arrays' companion
    int (kept as a 0-d array so the pytree stays traceable)."""
    child_boxes: jnp.ndarray  # (N, 16) f32
    child_refs: jnp.ndarray   # (N, 2) i32
    leaf_tris: jnp.ndarray    # (L, 8, 9) f32 [v0, e1, e2]
    leaf_ids: jnp.ndarray     # (L, 8) i32
    root_ref: jnp.ndarray     # () i32 encoded root


@struct.dataclass
class WideBVH:
    """8-ary fat-leaf traversal layout (see accel/wide.py). root_ref/depth/
    leaf_width are static (per-scene jit specialization, like the reference's
    per-scene kernel defines).

    mxu_nodes_t/mxu_leaves_t: optional precomputed transposed bf16 gather
    tables for the MXU traversal kernel (ops/traverse_mxu.mxu_tables).
    Built once at scene upload; without them the encode (rounding, splits,
    transposes) is retraced INSIDE every render program — measured as a
    per-segment cost in the wavefront loop."""
    nodes: jnp.ndarray    # (N, 56) f32
    leaves: jnp.ndarray   # (L, W, 10) f32
    root_ref: int = struct.field(pytree_node=False, default=0)
    depth: int = struct.field(pytree_node=False, default=8)
    leaf_width: int = struct.field(pytree_node=False, default=16)
    mxu_nodes_t: jnp.ndarray | None = None
    mxu_leaves_t: jnp.ndarray | None = None


@struct.dataclass
class ForestTables:
    """Beyond-VMEM traversal tables: every treelet chunk's MXU gather tables
    stacked along a leading chunk axis, HBM-resident and streamed through
    VMEM by the forest kernel (ops/traverse_forest.py) one chunk block per
    grid step. Leaf triangle ids are GLOBAL (no per-chunk prim maps).

    Reference analogue: none — the reference traverses one global-memory BVH
    per thread (src/bvh.cl:234-310); the TPU form tiles the scene into
    VMEM-sized treelets and schedules (ray-block, chunk) visits."""
    nodes: jnp.ndarray     # (C, 72, Tp) bf16 — per-chunk node gather tables
    leaves: jnp.ndarray    # (C, 30W, Lp) bf16 — per-chunk leaf gather tables
    boxes: jnp.ndarray     # (C, 8) f32 — chunk AABB lo(3) hi(3) pad(2)
    # static per-scene specialization (like WideBVH.root_ref/depth)
    lvl: int = struct.field(pytree_node=False, default=8)
    leaf_width: int = struct.field(pytree_node=False, default=16)


@struct.dataclass
class BruteForest:
    """Beyond-VMEM brute-chunk tables (ops/traverse_brute.py): spatial
    bins of triangles with no per-chunk hierarchy; a chunk visit
    Möller-tests the whole chunk as (blk, tile) VPU planes, and the
    kernel itself computes each lane's next chunks from the in-VMEM
    chunk-AABB table. Replaces the treelet ForestTables as the default
    big-scene path (r4; see accel/forest.py HostBrute for rationale).

    Reference analogue: src/bvh.cl:234-310 traverses one global-memory
    BVH; the TPU form streams HBM-resident chunk tables through VMEM
    with per-ray work-queue scheduling."""
    tris: jnp.ndarray     # (C, 16, Tp) f32 per-chunk Möller tables
    boxes: jnp.ndarray    # (C, 8) f32 chunk AABBs
    boxes_t: jnp.ndarray  # (8, Cp) f32 component-major chunk AABBs
    # per-tile AABBs (C, 8, NTp) for the r5 visit-list kernel's in-VMEM
    # tile pruning; None falls back to the round-loop scheduler
    tboxes: jnp.ndarray | None = None
    # builder tile size (triangles per tbox entry) — the vlist kernel's
    # Möller tile must match it exactly
    tile: int = struct.field(pytree_node=False, default=512)


@struct.dataclass
class Geometry:
    """SoA triangle soup (reference: src/geom.h:89-95 `Triangle`). Padded to a
    lane-friendly length; pad triangles are degenerate (never hit)."""
    v0: jnp.ndarray       # (M, 3) float32 positions
    v1: jnp.ndarray       # (M, 3)
    v2: jnp.ndarray       # (M, 3)
    n0: jnp.ndarray       # (M, 3) shading normals
    n1: jnp.ndarray       # (M, 3)
    n2: jnp.ndarray       # (M, 3)
    uv0: jnp.ndarray      # (M, 2)
    uv1: jnp.ndarray      # (M, 2)
    uv2: jnp.ndarray      # (M, 2)
    mat_id: jnp.ndarray   # (M,) int32 into Materials


@struct.dataclass
class AreaLight:
    """Rectangular area light (reference: src/geom.h:103-111)."""
    pos: jnp.ndarray      # (3,)
    right: jnp.ndarray    # (3,)
    up: jnp.ndarray       # (3,)
    normal: jnp.ndarray   # (3,)
    emission: jnp.ndarray # (3,) E
    size: jnp.ndarray     # (2,) half-extents


@struct.dataclass
class Camera:
    """Pinhole + thin-lens camera (reference: src/geom.h:146-155)."""
    pos: jnp.ndarray          # (3,)
    dir: jnp.ndarray          # (3,)
    up: jnp.ndarray           # (3,)
    right: jnp.ndarray        # (3,)
    fov: jnp.ndarray          # () degrees
    aperture_size: jnp.ndarray  # ()
    focal_dist: jnp.ndarray     # ()


@struct.dataclass
class DeviceScene:
    """Everything resident on device, replicated per chip
    (reference analogue: `deviceBuffers`, src/clcontext.hpp:166-210)."""
    geom: Geometry
    bvh: FlatBVH
    pbvh: PackedBVH
    wbvh: WideBVH
    # Beyond-VMEM scenes: tuple of VMEM-sized treelets (chunks padded to
    # uniform shapes so one packet program serves all) + per-chunk maps from
    # chunk-local to global triangle ids. Empty when wbvh fits VMEM.
    wforest: tuple = ()
    wforest_maps: tuple = ()
    # Stacked-chunk tables for the streamed treelet forest kernel
    # (beyond-VMEM fallback path); None when the scene fits VMEM.
    ftables: Optional[ForestTables] = None
    # Brute-chunk tables (the DEFAULT beyond-VMEM path since r4); None
    # when the scene fits VMEM or FLUCTUS_FOREST=treelet.
    bforest: Optional[BruteForest] = None
    materials: Materials = None
    atlas: TextureAtlas = None
    envmap: EnvMap = None


@struct.dataclass
class RenderParams:
    """Traced (non-recompiling) render parameters
    (reference: src/geom.h:163-180 `RenderParams`)."""
    camera: Camera
    area_light: AreaLight
    env_strength: jnp.ndarray   # ()
    world_radius: jnp.ndarray   # () — ½·scene diagonal (src/tracer.cpp:66-67)
    exposure: jnp.ndarray       # () postprocess


class RenderConfig(struct.PyTreeNode):
    """Static configuration — every field is a jit-static python value.

    Mirrors the reference's compile defines: USE_ENV_MAP, USE_AREA_LIGHT,
    SAMPLE_EXPLICIT/IMPLICIT, maxBounces slider, tonemap op
    (src/kernel_impl.hpp:49-67, src/geom.h:163-180)."""
    width: int = struct.field(pytree_node=False, default=512)
    height: int = struct.field(pytree_node=False, default=512)
    max_bounces: int = struct.field(pytree_node=False, default=4)
    use_env_map: bool = struct.field(pytree_node=False, default=True)
    use_area_light: bool = struct.field(pytree_node=False, default=False)
    sample_impl: bool = struct.field(pytree_node=False, default=True)
    sample_expl: bool = struct.field(pytree_node=False, default=True)
    use_roulette: bool = struct.field(pytree_node=False, default=False)
    tonemap_op: int = struct.field(pytree_node=False, default=2)  # 0=lin,1=reinhard,2=uc2
    backend: str = struct.field(pytree_node=False, default="auto")  # traversal impl: auto|jnp|pallas
    # Bitmask of BSDF types present in the scene; prunes dispatch codegen
    # like the reference's per-scene BXDF_USE_* defines
    # (src/kernel_impl.hpp:261-266). 0xFE = all types.
    bsdf_types_mask: int = struct.field(pytree_node=False, default=0xFE)
    # Rays per traversal tile; pixels are processed in tiles of this size to
    # bound the traversal stack footprint ((tile, 64) i32 in HBM).
    tile_size: int = struct.field(pytree_node=False, default=1 << 16)
    # Wavefront path-pool size (paths in flight; reference wfBufferSize
    # default 2^20, src/settings.cpp:20).
    pool_size: int = struct.field(pytree_node=False, default=1 << 20)


@struct.dataclass
class Hit:
    """Batched hit record (reference: src/geom.h:133-142)."""
    t: jnp.ndarray          # (...,) float32, big when miss
    prim: jnp.ndarray       # (...,) int32 triangle index, -1 = miss
    p: jnp.ndarray          # (..., 3) position
    n: jnp.ndarray          # (..., 3) geometric/shading normal
    uv: jnp.ndarray         # (..., 2) interpolated tex coords
    mat_id: jnp.ndarray     # (...,) int32
    area_light: jnp.ndarray # (...,) bool — hit the (virtual) area light quad


@struct.dataclass
class PathState:
    """Per-path wavefront state, SoA over the path pool
    (reference: src/geom.h:196-236 `GPUTaskState`). The RNG seed field of the
    reference is replaced by (pixel, sample, bounce) counters for the
    stateless PCG4D RNG."""
    orig: jnp.ndarray           # (N, 3)
    dir: jnp.ndarray            # (N, 3)
    throughput: jnp.ndarray     # (N, 3) T
    radiance: jnp.ndarray       # (N, 3) Ei
    pixel_index: jnp.ndarray    # (N,) uint32
    sample_index: jnp.ndarray   # (N,) uint32 — per-pixel sample counter
    path_len: jnp.ndarray       # (N,) uint32
    last_pdf_w: jnp.ndarray     # (N,)
    last_specular: jnp.ndarray  # (N,) bool
    alive: jnp.ndarray          # (N,) bool


def empty_hit(shape, t_max=np.float32(np.finfo(np.float32).max)) -> Hit:
    """EMPTY_HIT analogue (reference: src/geom.h:144)."""
    z3 = jnp.zeros(shape + (3,), jnp.float32)
    return Hit(
        t=jnp.full(shape, t_max, jnp.float32),
        prim=jnp.full(shape, -1, jnp.int32),
        p=z3,
        n=z3,
        uv=jnp.zeros(shape + (2,), jnp.float32),
        mat_id=jnp.zeros(shape, jnp.int32),
        area_light=jnp.zeros(shape, bool),
    )


def default_camera() -> Camera:
    """reference: src/tracer.cpp:760-776 initCamera defaults."""
    return Camera(
        pos=jnp.array([0.0, 1.0, 3.5], jnp.float32),
        dir=jnp.array([0.0, 0.0, -1.0], jnp.float32),
        up=jnp.array([0.0, 1.0, 0.0], jnp.float32),
        right=jnp.array([1.0, 0.0, 0.0], jnp.float32),
        fov=jnp.float32(60.0),
        aperture_size=jnp.float32(0.0),
        focal_dist=jnp.float32(0.5),
    )


def default_area_light() -> AreaLight:
    """reference: src/tracer.cpp:789-798 initAreaLight defaults."""
    return AreaLight(
        pos=jnp.array([1.0, 1.0, 0.0], jnp.float32),
        right=jnp.array([0.0, 0.0, -1.0], jnp.float32),
        up=jnp.array([0.0, 1.0, 0.0], jnp.float32),
        normal=jnp.array([-1.0, 0.0, 0.0], jnp.float32),
        emission=jnp.array([200.0, 200.0, 200.0], jnp.float32),
        size=jnp.array([0.5, 0.5], jnp.float32),
    )


def default_params(world_radius: float = 1.0) -> RenderParams:
    return RenderParams(
        camera=default_camera(),
        area_light=default_area_light(),
        env_strength=jnp.float32(1.0),
        world_radius=jnp.float32(world_radius),
        exposure=jnp.float32(1.0),
    )
