"""Pack a built BVH into the TPU traversal layout.

TPU-first redesign of the reference's GPUNode array (src/geom.h:71-80): the
traversal loop is gather-bound on TPU, so the layout is organized so each
traversal step costs exactly ONE row gather:

  * child-pair nodes: (N, 16) f32 rows [left_lo(3) left_hi(3) right_lo(3)
    right_hi(3) pad(4)] — popping an inner node tests BOTH children from one
    64-byte row (the reference gathers per-node AABBs one at a time).
  * child refs: (N, 2) int32 — >=0: inner node index; <0: leaf, encoding
    ~ref = leaf row index.
  * swizzled leaves: (L, 8, 9) f32 rows [v0, e1, e2] per triangle slot with
    (L, 8) int32 original triangle ids (pad slots -1, degenerate) — one
    288-byte row gather tests a whole leaf (v1-v0/v2-v0 pre-computed for
    Möller-Trumbore).
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from fluctus_tpu.accel.bvh import BuiltBVH

LEAF_WIDTH = 8


@dataclass
class PackedLayoutHost:
    child_boxes: np.ndarray  # (N, 16) f32
    child_refs: np.ndarray   # (N, 2) i32
    leaf_tris: np.ndarray    # (L, 8, 9) f32
    leaf_ids: np.ndarray     # (L, 8) i32
    root_ref: int            # encoded ref of the root (inner idx or ~leaf)


def pack_bvh(built: BuiltBVH, v0: np.ndarray, v1: np.ndarray,
             v2: np.ndarray) -> PackedLayoutHost:
    n = built.n_nodes
    counts = built.node_count
    rights = built.node_right

    is_leaf = counts > 0
    leaf_nodes = np.flatnonzero(is_leaf)
    leaf_row_of_node = np.full(n, -1, np.int64)
    leaf_row_of_node[leaf_nodes] = np.arange(len(leaf_nodes))

    # --- swizzled leaf blocks
    l = len(leaf_nodes)
    leaf_tris = np.zeros((max(l, 1), LEAF_WIDTH, 9), np.float32)
    leaf_ids = np.full((max(l, 1), LEAF_WIDTH), -1, np.int32)
    for row, node in enumerate(leaf_nodes):
        start, cnt = rights[node], counts[node]
        ids = built.prim_idx[start:start + cnt]
        k = min(cnt, LEAF_WIDTH)
        a = v0[ids[:k]]
        leaf_tris[row, :k, 0:3] = a
        leaf_tris[row, :k, 3:6] = v1[ids[:k]] - a
        leaf_tris[row, :k, 6:9] = v2[ids[:k]] - a
        leaf_ids[row, :k] = ids[:k]

    def encode(child: np.ndarray) -> np.ndarray:
        lr = leaf_row_of_node[child]
        return np.where(lr >= 0, ~lr, child).astype(np.int32)

    # --- child-pair rows for inner nodes (leaf rows unused, left zeroed)
    child_boxes = np.zeros((n, 16), np.float32)
    child_refs = np.zeros((n, 2), np.int32)
    inner = np.flatnonzero(~is_leaf)
    if len(inner):
        left = inner + 1
        right = rights[inner].astype(np.int64)
        child_boxes[inner, 0:3] = built.node_lo[left]
        child_boxes[inner, 3:6] = built.node_hi[left]
        child_boxes[inner, 6:9] = built.node_lo[right]
        child_boxes[inner, 9:12] = built.node_hi[right]
        child_refs[inner, 0] = encode(left)
        child_refs[inner, 1] = encode(right)

    root_ref = int(encode(np.asarray([0]))[0])
    return PackedLayoutHost(child_boxes=child_boxes, child_refs=child_refs,
                            leaf_tris=leaf_tris, leaf_ids=leaf_ids,
                            root_ref=root_ref)
