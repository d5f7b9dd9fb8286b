"""SBVH (spatial-split BVH) builder — Stich et al. 2009.

Capability target (reference: src/sbvh.{hpp,cpp}): object SAH splits vs
chopped-binning spatial splits with reference duplication, α overlap
threshold, bounded leaf size. Emits the same FlatBVH SoA arrays as the plain
builder, with prim_idx possibly longer than n_tris (duplicated references).

NOTE(round 1): currently delegates to the full-sweep SAH object builder —
spatial splits land with the San Miguel scaling milestone. The interface and
cache format are final.
"""
from __future__ import annotations

import numpy as np

from fluctus_tpu.accel.bvh import MAX_DEPTH, MAX_LEAF, BuiltBVH, build_bvh

ALPHA = 1e-5  # overlap threshold (reference: src/sbvh.hpp:70-71)


def build_sbvh(v0: np.ndarray, v1: np.ndarray, v2: np.ndarray,
               max_leaf: int = MAX_LEAF,
               max_depth: int = MAX_DEPTH) -> BuiltBVH:
    return build_bvh(v0, v1, v2, max_leaf=max_leaf, max_depth=max_depth)
