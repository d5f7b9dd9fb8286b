"""Host-side builder for the streamed treelet forest (beyond-VMEM scenes).

Partitions the triangle set into spatial chunks small enough that one
chunk's MXU gather tables fit VMEM, builds an independent wide BVH per
chunk with GLOBAL triangle ids baked into the leaf tables, pads every
chunk to a common table shape, and encodes the stacked tables for the
streamed forest kernel (ops/traverse_forest.py).

Reference analogue: none — the reference traverses one global-memory BVH
(src/bvh.cl:234-310); on TPU the per-lane gather primitive (one-hot matmul)
has per-step cost proportional to the resident table height, so the scene
is tiled into fixed-size treelets that stream HBM->VMEM through the
Pallas grid while ray blocks visit only the treelets they intersect.
"""
from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np

from fluctus_tpu.accel.wide import LEAF_WIDTH, build_wide

# Chunk size in triangles. Per-step traversal cost inside a chunk scales
# with its table heights (one-hot construction + matmul are O(rows)), so
# smaller chunks are cheaper per step but raise the chunks-visited count
# per ray block; ~8k tris lands the leaf table around 1024 rows (~2 MB of
# kernel VMEM with double buffering) — tuned on the forest bench.
TARGET_TRIS = 8192


@dataclass
class HostForest:
    nodes: np.ndarray     # (C, 72, Tp) bf16-as-uint16 view or float32 staged
    leaves: np.ndarray    # (C, 30W, Lp)
    boxes: np.ndarray     # (C, 8) f32 chunk AABB lo(3) hi(3) pad(2)
    lvl: int              # max wide depth over chunks + 1
    leaf_width: int


def _split_chunks(v0, v1, v2, target_tris: int) -> list[np.ndarray]:
    """Spatial median split on the widest centroid axis until every chunk
    holds <= target_tris triangles (same scheme as accel/wide.py
    build_wide_forest, sized by count instead of table bytes)."""
    centroid = ((np.minimum(np.minimum(v0, v1), v2)
                 + np.maximum(np.maximum(v0, v1), v2)) * 0.5)
    chunks: list[np.ndarray] = []
    stack = [np.arange(len(v0), dtype=np.int64)]
    while stack:
        ids = stack.pop()
        if len(ids) <= target_tris:
            chunks.append(ids)
            continue
        c = centroid[ids]
        axis = int(np.argmax(c.max(0) - c.min(0)))
        order = np.argsort(c[:, axis], kind="stable")
        half = len(ids) // 2
        stack.append(ids[order[:half]])
        stack.append(ids[order[half:]])
    return chunks


def _wrap_leaf_root(h):
    """Chunks whose whole triangle set fits one fat leaf get a 1-node
    wrapper so every chunk's root is node 0 (the kernel's static root)."""
    if h.root_ref >= 0:
        return h
    lv = h.leaves
    # bounding box of the leaf's triangles
    k = lv.shape[1]
    a = lv[:, :, 0:3]
    b = a + lv[:, :, 3:6]
    c = a + lv[:, :, 6:9]
    tid = lv[:, :, 9].view(np.int32)
    m = (tid >= 0)[..., None]
    big = np.float32(3e37)
    lo = np.minimum(np.minimum(np.where(m, a, big).min((0, 1)),
                               np.where(m, b, big).min((0, 1))),
                    np.where(m, c, big).min((0, 1)))
    hi = np.maximum(np.maximum(np.where(m, a, -big).max((0, 1)),
                               np.where(m, b, -big).max((0, 1))),
                    np.where(m, c, -big).max((0, 1)))
    row = np.zeros(56, np.float32)
    row[0:48:6] = np.inf
    row[0:3] = lo
    row[3:6] = hi
    refs = np.zeros(8, np.int32)
    refs[0] = h.root_ref  # the leaf
    row[48:56] = refs.view(np.float32)
    h.nodes = row[None, :]
    h.root_ref = 0
    h.depth = 1
    return h


@dataclass
class HostBrute:
    """Brute-force chunk tables (the r4 beyond-VMEM redesign): chunks are
    spatial bins of <= target_tris triangles with NO per-chunk hierarchy —
    a chunk visit Möller-tests every triangle as full (blk, tile) VPU
    planes. Motivation (BASELINE r4): the treelet kernel's per-visit cost
    is dominated by the leaf one-hot matmul, whose cost is invariant in
    leaf width (30·tris_chunk rows) — the brute scan does the same
    triangle work without the stack walk, the node matmul, or the bf16
    encode (which cost 316 s at 6.3M tris), and scales linearly DOWN with
    chunk size. Reference analogue: src/bvh.cl:253-279's leaf loop,
    promoted to the whole chunk."""
    tris: np.ndarray     # (C, 16, Tp) f32: rows [ax ay az e1x..e2z tid+1 0..]
    boxes: np.ndarray    # (C, 8) f32 chunk AABB lo(3) hi(3) pad(2)
    boxes_t: np.ndarray  # (8, Cp) f32 component-major [lox loy loz hix hiy
    #                       hiz 0 0], pad chunks pushed to 3e37 (never hit)
    tboxes: np.ndarray | None = None  # (C, 8, NTp) f32 per-TILE AABBs
    tile: int = 512       # triangles per tbox entry (kernel tile unit)
    #   (rows like boxes_t); tiles are the kernel's Möller loop unit —
    #   tris within a chunk are spatially re-ordered so each tile of
    #   `tile` consecutive triangles is tight, letting the kernel skip
    #   tiles no lane can hit (r5 vlist scheduler). Pad tiles inverted.


BRUTE_TARGET_TRIS = 8192
# tbox granularity: 128-tri tiles + the vlist kernel's ~1024-tri guard
# groups measured best on the 6.3M-tri protocol sweep (t128/g8 beats the
# old t512 ~10% on primaries and bounces; finer boxes prune more)
BRUTE_TILE = int(os.environ.get("FLUCTUS_BRUTE_TILE", "128"))


def build_brute_forest(v0, v1, v2,
                       target_tris: int = BRUTE_TARGET_TRIS,
                       tile: int | None = None) -> HostBrute:
    """Partition triangles into spatial chunks (median split — no SAH/SBVH
    build needed, unlike the treelet forest) and pack per-chunk Möller
    tables. Every triangle lands in exactly one chunk (no duplication), so
    cross-chunk min-merges never tie on one prim. Within a chunk,
    triangles are re-ordered by a second median-split recursion down to
    `tile` so each tile of consecutive triangles is spatially tight; the
    per-tile AABBs (tboxes) let the kernel prune whole tiles."""
    if tile is None:
        tile = BRUTE_TILE
    n = len(v0)
    assert n < (1 << 24) - 1, "brute forest: tri ids exceed f32-exact range"
    chunk_ids = _split_chunks(v0, v1, v2, target_tris)
    c = len(chunk_ids)
    tp = max(-(-max(len(ids) for ids in chunk_ids) // tile) * tile, tile)
    nt = tp // tile
    ntp = -(-nt // 128) * 128
    tris = np.zeros((c, 16, tp), np.float32)
    boxes = np.zeros((c, 8), np.float32)
    tboxes = np.zeros((c, 8, ntp), np.float32)
    tboxes[:, 0:3, :] = 3.0e37     # pad tiles: inverted, never hit
    tboxes[:, 3:6, :] = -3.0e37
    for i, ids in enumerate(chunk_ids):
        if len(ids) > tile:
            # spatial tile ordering: concatenate the median-split leaves
            sub = _split_chunks(v0[ids], v1[ids], v2[ids], tile)
            ids = ids[np.concatenate(sub)]
        k = len(ids)
        a = v0[ids]
        tris[i, 0:3, :k] = a.T
        tris[i, 3:6, :k] = (v1[ids] - a).T
        tris[i, 6:9, :k] = (v2[ids] - a).T
        # tid+1 as f32 (exact below 2^24); pad slots stay 0 = invalid
        tris[i, 9, :k] = (ids + 1).astype(np.float32)
        t = np.concatenate([v0[ids], v1[ids], v2[ids]])
        boxes[i, 0:3] = t.min(0)
        boxes[i, 3:6] = t.max(0)
        for j in range(-(-k // tile)):
            jj = ids[j * tile:(j + 1) * tile]
            tj = np.concatenate([v0[jj], v1[jj], v2[jj]])
            tboxes[i, 0:3, j] = tj.min(0)
            tboxes[i, 3:6, j] = tj.max(0)
    cp = -(-c // 128) * 128
    # pad chunks get an INVERTED far box (lo > hi => tmn > tmax, never
    # hit; a degenerate far point would still "hit" at tmn == tmax)
    boxes_t = np.zeros((8, cp), np.float32)
    boxes_t[0:3] = 3.0e37
    boxes_t[3:6] = -3.0e37
    boxes_t[0:3, :c] = boxes[:, 0:3].T
    boxes_t[3:6, :c] = boxes[:, 3:6].T
    return HostBrute(tris=tris, boxes=boxes, boxes_t=boxes_t,
                     tboxes=tboxes, tile=tile)


def build_host_forest(v0, v1, v2, build_binary,
                      leaf_width: int = LEAF_WIDTH,
                      target_tris: int = TARGET_TRIS) -> HostForest:
    """Build the stacked, padded per-chunk wide-BVH tables (float32 staging;
    device-side bf16 encoding happens in scene upload via
    traverse_forest.encode_forest)."""
    chunk_ids = _split_chunks(v0, v1, v2, target_tris)
    hosts = []
    for ids in chunk_ids:
        built = build_binary(v0[ids], v1[ids], v2[ids])
        h = build_wide(built, v0[ids], v1[ids], v2[ids],
                       leaf_width=leaf_width)
        h = _wrap_leaf_root(h)
        # remap leaf triangle ids chunk-local -> global
        tid = h.leaves[:, :, 9].view(np.int32).copy()
        valid = tid >= 0
        tid[valid] = ids[tid[valid]].astype(np.int32)
        h.leaves[:, :, 9] = tid.view(np.float32)
        hosts.append(h)

    n_max = max(h.nodes.shape[0] for h in hosts)
    l_max = max(h.leaves.shape[0] for h in hosts)
    # pad chunk tables to a common shape (and the kernel's 128 alignment
    # once here, so the device encode never repads per chunk)
    n_max = -(-n_max // 128) * 128
    l_max = -(-l_max // 128) * 128
    c = len(hosts)
    nodes = np.zeros((c, n_max, 56), np.float32)
    nodes[:, :, 0:48:6] = np.inf           # pad rows: children never hit
    leaves = np.zeros((c, l_max, leaf_width, 10), np.float32)
    leaves[..., 9] = np.frombuffer(np.int32(-1).tobytes(),
                                   np.float32)[0]  # pad slots: tid -1
    boxes = np.zeros((c, 8), np.float32)
    lvl = 1
    for i, (h, ids) in enumerate(zip(hosts, chunk_ids)):
        nodes[i, :h.nodes.shape[0]] = h.nodes
        leaves[i, :h.leaves.shape[0]] = h.leaves
        lvl = max(lvl, int(h.depth) + 1)
        t = np.concatenate([v0[ids], v1[ids], v2[ids]])
        boxes[i, 0:3] = t.min(0)
        boxes[i, 3:6] = t.max(0)
        assert h.nodes.shape[0] < (1 << 16), "forest chunk node count"
        assert h.leaves.shape[0] < (1 << 16), "forest chunk leaf count"
    assert len(v0) < (1 << 24) - 1, "global tri ids exceed 3-byte encoding"
    return HostForest(nodes=nodes, leaves=leaves, boxes=boxes, lvl=lvl,
                      leaf_width=leaf_width)
