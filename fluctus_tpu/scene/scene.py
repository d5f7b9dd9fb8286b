"""Host scene container: loaders -> flat arrays -> DeviceScene.

This is the L2 layer (reference: src/scene.{hpp,cpp}): model loading with
format dispatch by extension (src/scene.cpp:53-103), the default material
convention (src/scene.cpp:13-26), the material-type bitmask used for BSDF
code specialization (src/scene.cpp:299), texture import, environment map
attachment, and BVH/SBVH construction with an on-disk cache keyed by the
scene file hash (src/tracer.cpp:574-590, src/bvh.cpp:102-192 — npz instead
of a custom binary format).
"""
from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np
import xxhash

from fluctus_tpu.accel import bvh as bvh_mod
from fluctus_tpu.core.types import BXDF_DIFFUSE
from fluctus_tpu.scene import envmap as envmap_mod
from fluctus_tpu.scene.loaders.obj import MtlMaterial, load_obj
from fluctus_tpu.scene.loaders.ply import load_ply
from fluctus_tpu.scene.textures import TexturePool

DEFAULT_CACHE_DIR = "data/hierarchies"


def default_material() -> MtlMaterial:
    """reference: src/scene.cpp:13-26 (Kd 0.64, Ni 1.8, Ns 700, diffuse)."""
    return MtlMaterial(name="__default__", kd=(0.64, 0.64, 0.64),
                       ks=(0.0, 0.0, 0.0), ke=(0.0, 0.0, 0.0),
                       ns=700.0, ni=1.8, bsdf_type=BXDF_DIFFUSE)


def file_hash(path: str) -> str:
    """xxhash of file contents (reference: src/utils.cpp:63-91)."""
    h = xxhash.xxh64()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


@dataclass
class HostScene:
    # triangle soup (SoA, NumPy)
    v0: np.ndarray
    v1: np.ndarray
    v2: np.ndarray
    n0: np.ndarray
    n1: np.ndarray
    n2: np.ndarray
    uv0: np.ndarray
    uv1: np.ndarray
    uv2: np.ndarray
    mat_id: np.ndarray
    materials: list                       # list[MtlMaterial], [0] = default
    textures: TexturePool = field(default_factory=TexturePool)
    envmap: "envmap_mod.HostEnvMap | None" = None
    bvh: "bvh_mod.BuiltBVH | None" = None
    hash: str = ""
    name: str = ""

    # material descriptor indices resolved during texture import
    map_kd: np.ndarray | None = None
    map_ks: np.ndarray | None = None
    map_n: np.ndarray | None = None
    # quad-emitter frame parsed from a PBRT AreaLightSource (loaders/pbrt.py)
    area_light_hint: dict | None = None

    @property
    def n_tris(self) -> int:
        return len(self.v0)

    @property
    def material_types_mask(self) -> int:
        """Bitmask of BSDF types present (reference: src/scene.cpp:299),
        used for static kernel specialization."""
        mask = 0
        for m in self.materials:
            mask |= m.bsdf_type
        return mask

    def bounds(self):
        lo = np.minimum(np.minimum(self.v0.min(0), self.v1.min(0)),
                        self.v2.min(0))
        hi = np.maximum(np.maximum(self.v0.max(0), self.v1.max(0)),
                        self.v2.max(0))
        return lo, hi

    def world_radius(self) -> float:
        """½·scene diagonal (reference: src/tracer.cpp:66-67)."""
        lo, hi = self.bounds()
        return float(np.linalg.norm(hi - lo) * 0.5)

    def load_env_map(self, path: str) -> None:
        self.envmap = envmap_mod.load(path)

    def build_bvh(self, cache_dir: str | None = DEFAULT_CACHE_DIR,
                  use_sbvh: bool = True) -> None:
        """Build or load cached hierarchy
        (reference: src/tracer.cpp:574-590 initHierarchy)."""
        cache_path = None
        if cache_dir and self.hash:
            kind = "sbvh" if use_sbvh else "bvh"
            # algorithm-version key: builder quality changes must invalidate
            # stale cache entries (the reference keys only by scene hash,
            # src/tracer.cpp:574-590, because its builder never changes)
            ver = bvh_mod.BUILDER_VERSION
            cache_path = os.path.join(
                cache_dir, f"hierarchy_{kind}_v{ver}_{self.hash}.npz")
            if os.path.exists(cache_path):
                z = np.load(cache_path)
                self.bvh = bvh_mod.BuiltBVH(
                    node_lo=z["node_lo"], node_hi=z["node_hi"],
                    node_right=z["node_right"], node_count=z["node_count"],
                    node_parent=z["node_parent"], prim_idx=z["prim_idx"],
                    depth=int(z["depth"]))
                return
        self.bvh = None
        if os.environ.get("FLUCTUS_NATIVE", "1") != "0":
            from fluctus_tpu.accel import native
            self.bvh = native.build_native(
                self.v0, self.v1, self.v2, bvh_mod.MAX_LEAF,
                bvh_mod.MAX_DEPTH, 1e-5, use_sbvh)
        if self.bvh is None:  # NumPy fallback
            if use_sbvh:
                from fluctus_tpu.accel.sbvh import build_sbvh
                self.bvh = build_sbvh(self.v0, self.v1, self.v2)
            else:
                self.bvh = bvh_mod.build_bvh(self.v0, self.v1, self.v2)
        if cache_path:
            os.makedirs(cache_dir, exist_ok=True)
            np.savez_compressed(
                cache_path, node_lo=self.bvh.node_lo, node_hi=self.bvh.node_hi,
                node_right=self.bvh.node_right, node_count=self.bvh.node_count,
                node_parent=self.bvh.node_parent, prim_idx=self.bvh.prim_idx,
                depth=self.bvh.depth)

    def material_arrays(self):
        """SoA material table with dense bsdf ids + texture slots."""
        from fluctus_tpu.core.types import BSDF_ID
        mats = self.materials
        kd = np.asarray([m.kd for m in mats], np.float32)
        ks = np.asarray([m.ks for m in mats], np.float32)
        ke = np.asarray([m.ke for m in mats], np.float32)
        ns = np.asarray([m.ns for m in mats], np.float32)
        ni = np.asarray([m.ni for m in mats], np.float32)
        bsdf_id = np.asarray([BSDF_ID[m.bsdf_type] for m in mats], np.int32)
        n = len(mats)
        map_kd = self.map_kd if self.map_kd is not None \
            else np.full(n, -1, np.int32)
        map_ks = self.map_ks if self.map_ks is not None \
            else np.full(n, -1, np.int32)
        map_n = self.map_n if self.map_n is not None \
            else np.full(n, -1, np.int32)
        return kd, ks, ke, ns, ni, map_kd, map_ks, map_n, bsdf_id

    def to_device(self):
        """Upload everything as a DeviceScene pytree (replicated per chip;
        reference analogue: CLContext::uploadSceneData,
        src/clcontext.cpp:522-611)."""
        import jax.numpy as jnp

        from fluctus_tpu.accel.pack import pack_bvh
        from fluctus_tpu.accel.wide import build_wide
        from fluctus_tpu.core.types import (
            DeviceScene, EnvMap, FlatBVH, Geometry, Materials, PackedBVH,
            TextureAtlas, WideBVH)

        # FAST BIG-SCENE PATH (r4): scenes far beyond the in-VMEM table
        # budget traverse ONLY through the brute-chunk forest, which
        # needs no hierarchy at all — skip the minutes-scale SBVH build,
        # the wide collapse, and the Flat/Packed/Wide uploads entirely
        # (r3 verdict weak 3: 145 s SBVH + 316 s encode per session at
        # 6.3M tris; the brute build is a median split, seconds).
        # FLUCTUS_FAST_BIG=0 restores the full build (e.g. for wide-
        # backend oracle comparisons on big scenes).
        if fast_big_eligible(self):
            return self._to_device_fast_big()

        if self.bvh is None:
            self.build_bvh(cache_dir=None, use_sbvh=False)

        geom = Geometry(
            v0=jnp.asarray(self.v0), v1=jnp.asarray(self.v1),
            v2=jnp.asarray(self.v2), n0=jnp.asarray(self.n0),
            n1=jnp.asarray(self.n1), n2=jnp.asarray(self.n2),
            uv0=jnp.asarray(self.uv0), uv1=jnp.asarray(self.uv1),
            uv2=jnp.asarray(self.uv2), mat_id=jnp.asarray(self.mat_id))
        bvh = FlatBVH(
            node_lo=jnp.asarray(self.bvh.node_lo),
            node_hi=jnp.asarray(self.bvh.node_hi),
            node_right=jnp.asarray(self.bvh.node_right),
            node_count=jnp.asarray(self.bvh.node_count),
            node_parent=jnp.asarray(self.bvh.node_parent),
            prim_idx=jnp.asarray(self.bvh.prim_idx))
        packed = pack_bvh(self.bvh, self.v0, self.v1, self.v2)
        pbvh = PackedBVH(
            child_boxes=jnp.asarray(packed.child_boxes),
            child_refs=jnp.asarray(packed.child_refs),
            leaf_tris=jnp.asarray(packed.leaf_tris),
            leaf_ids=jnp.asarray(packed.leaf_ids),
            root_ref=jnp.asarray(packed.root_ref, jnp.int32))
        wide = build_wide(self.bvh, self.v0, self.v1, self.v2)
        wbvh = WideBVH(
            nodes=jnp.asarray(wide.nodes),
            leaves=jnp.asarray(wide.leaves),
            root_ref=int(wide.root_ref), depth=int(wide.depth),
            leaf_width=int(wide.leaves.shape[1]))
        wbvh = _attach_mxu_tables(wbvh)

        # Beyond-VMEM scenes: build the streamed treelet forest (stacked
        # per-chunk tables, HBM-resident, scheduled per ray block — see
        # ops/traverse_forest.py). FLUCTUS_PACKET_FOREST=1 restores the r1
        # per-chunk packet forest for the explicit "pallas" backend.
        wforest, wforest_maps = (), ()
        ftables = None
        bforest = None
        table_bytes = (wide.nodes.size + wide.leaves.size) * 4
        if table_bytes > (8 << 20):

            def build_binary(a, b, c):
                if os.environ.get("FLUCTUS_NATIVE", "1") != "0":
                    from fluctus_tpu.accel import native
                    r = native.build_native(a, b, c, bvh_mod.MAX_LEAF,
                                            bvh_mod.MAX_DEPTH, 1e-5, True)
                    if r is not None:
                        return r
                return bvh_mod.build_bvh(a, b, c)

            if os.environ.get("FLUCTUS_PACKET_FOREST", "0") == "1":
                from fluctus_tpu.accel.wide import build_wide_forest
                hosts, maps = build_wide_forest(self.v0, self.v1, self.v2,
                                                build_binary)
                n_max = max(h.nodes.shape[0] for h in hosts)
                l_max = max(h.leaves.shape[0] for h in hosts)
                chunks = []
                for h in hosts:
                    nodes = np.zeros((n_max, 56), np.float32)
                    nodes[:, 0:48:6] = np.inf  # pad rows: never hit
                    nodes[:h.nodes.shape[0]] = h.nodes
                    leaves = np.zeros((l_max,) + h.leaves.shape[1:],
                                      np.float32)
                    leaves[..., 9] = np.float32(
                        np.frombuffer(np.int32(-1).tobytes(), np.float32)[0])
                    leaves[:h.leaves.shape[0]] = h.leaves
                    assert h.root_ref == 0, "forest chunk root must be inner"
                    chunks.append(_attach_mxu_tables(WideBVH(
                        nodes=jnp.asarray(nodes), leaves=jnp.asarray(leaves),
                        root_ref=0, depth=int(h.depth),
                        leaf_width=int(h.leaves.shape[1]))))
                wforest = tuple(chunks)
                wforest_maps = tuple(jnp.asarray(m) for m in maps)
            elif os.environ.get("FLUCTUS_FOREST", "brute") == "treelet":
                from fluctus_tpu.accel.forest import (TARGET_TRIS,
                                                      build_host_forest)
                from fluctus_tpu.accel.wide import LEAF_WIDTH
                from fluctus_tpu.ops.traverse_forest import encode_forest
                # sweepable on real HW: chunk size trades per-step leaf
                # matmul cost (~ lp x 30W per step) against visits/ray
                tt = int(os.environ.get("FLUCTUS_FOREST_TARGET_TRIS",
                                        TARGET_TRIS))
                lw = int(os.environ.get("FLUCTUS_FOREST_LEAF_WIDTH",
                                        LEAF_WIDTH))
                hostf = build_host_forest(self.v0, self.v1, self.v2,
                                          build_binary, target_tris=tt,
                                          leaf_width=lw)
                ftables = encode_forest(hostf)
            else:
                # DEFAULT big-scene path (r4): brute-chunk tables — no
                # per-chunk hierarchy, no bf16 encode (the treelet encode
                # cost 316 s at 6.3M tris, BASELINE r3f); build is a
                # median split + array packing, seconds at 10M tris
                from fluctus_tpu.accel.forest import build_brute_forest
                from fluctus_tpu.core.types import BruteForest
                tt = int(os.environ.get(
                    "FLUCTUS_BRUTE_TARGET_TRIS",
                    _brute_auto_target(len(self.v0))))
                hostb = build_brute_forest(self.v0, self.v1, self.v2,
                                           target_tris=tt)
                bforest = BruteForest(
                    tris=jnp.asarray(hostb.tris),
                    boxes=jnp.asarray(hostb.boxes),
                    boxes_t=jnp.asarray(hostb.boxes_t),
                    tboxes=jnp.asarray(hostb.tboxes),
                    tile=hostb.tile)
        mats, atlas, envd = self._shading_device()
        return DeviceScene(geom=geom, bvh=bvh, pbvh=pbvh, wbvh=wbvh,
                           wforest=wforest, wforest_maps=wforest_maps,
                           ftables=ftables, bforest=bforest,
                           materials=mats, atlas=atlas, envmap=envd)

    def _shading_device(self):
        """Materials + texture atlas + env tables as device pytrees (the
        shading half of uploadSceneData, src/clcontext.cpp:570-611 +
        createEnvMap :467-511)."""
        import jax.numpy as jnp

        from fluctus_tpu.core.types import EnvMap, Materials, TextureAtlas

        kd, ks, ke, ns, ni, map_kd, map_ks, map_n, bsdf_id = \
            self.material_arrays()
        mats = Materials(
            kd=jnp.asarray(kd), ks=jnp.asarray(ks), ke=jnp.asarray(ke),
            ns=jnp.asarray(ns), ni=jnp.asarray(ni),
            map_kd=jnp.asarray(map_kd), map_ks=jnp.asarray(map_ks),
            map_n=jnp.asarray(map_n), bsdf_id=jnp.asarray(bsdf_id))
        data, offs, ws, hs = self.textures.pack()
        atlas = TextureAtlas(
            data=jnp.asarray(data), offset=jnp.asarray(offs),
            width=jnp.asarray(ws), height=jnp.asarray(hs))
        env = self.envmap if self.envmap is not None else envmap_mod.dummy()
        envd = EnvMap(
            image=jnp.asarray(env.image),
            pdf_table=jnp.asarray(env.pdf_table),
            prob_table=jnp.asarray(env.prob_table),
            alias_table=jnp.asarray(env.alias_table))
        return mats, atlas, envd

    def _to_device_fast_big(self):
        """Big-scene upload via the brute-chunk forest ONLY: geometry +
        shading + brute tables; no SAH/SBVH build and no Flat/Packed/Wide
        hierarchies (their fields stay None — only the 'mxu' backend is
        valid, which the brute dispatch satisfies)."""
        import jax.numpy as jnp

        from fluctus_tpu.accel.forest import (BRUTE_TARGET_TRIS,
                                              build_brute_forest)
        from fluctus_tpu.core.types import BruteForest, DeviceScene, Geometry

        geom = Geometry(
            v0=jnp.asarray(self.v0), v1=jnp.asarray(self.v1),
            v2=jnp.asarray(self.v2), n0=jnp.asarray(self.n0),
            n1=jnp.asarray(self.n1), n2=jnp.asarray(self.n2),
            uv0=jnp.asarray(self.uv0), uv1=jnp.asarray(self.uv1),
            uv2=jnp.asarray(self.uv2), mat_id=jnp.asarray(self.mat_id))
        tt = int(os.environ.get("FLUCTUS_BRUTE_TARGET_TRIS",
                                _brute_auto_target(len(self.v0))))
        hostb = build_brute_forest(self.v0, self.v1, self.v2,
                                   target_tris=tt)
        bforest = BruteForest(
            tris=jnp.asarray(hostb.tris),
            boxes=jnp.asarray(hostb.boxes),
            boxes_t=jnp.asarray(hostb.boxes_t),
            tboxes=jnp.asarray(hostb.tboxes),
            tile=hostb.tile)
        mats, atlas, envd = self._shading_device()
        return DeviceScene(geom=geom, bvh=None, pbvh=None, wbvh=None,
                           bforest=bforest,
                           materials=mats, atlas=atlas, envmap=envd)


def _brute_auto_target(n_tris: int) -> int:
    """Brute chunk size scaled to the scene: chunk count (scheduling +
    per-block all-C slab cost) and per-visit tile-loop cost trade off —
    measured sweet spots: 8192 tris/chunk at 703k tris (C=86-128),
    32768 at 6.3M (C=192; the 8192 default there made C=1024 and ran
    5x slower, BASELINE r4c)."""
    import math
    if n_tris <= 0:
        return 8192
    return 1 << int(np.clip(round(math.log2(max(n_tris / 192, 1))),
                            13, 15))


def fast_big_eligible(host) -> bool:
    """True when `host` will upload via the fast big-scene path (brute
    forest only; no hierarchy build needed) — see to_device.

    Gated on the accelerator platform: the brute path's only renderable
    backend is a Pallas TPU kernel, so on CPU (where a >~124k-tri scene
    would otherwise upload brute-only with bvh/wbvh None and every render
    raise) the full hierarchy build is kept. FLUCTUS_FAST_BIG=0 remains
    the explicit override on any platform."""
    import jax
    # FLUCTUS_FAST_BIG_MIN_TRIS lowers the cutover (default ~124k tris =
    # the 8 MB wide-table threshold): mid-size interiors can win on the
    # brute-vlist path because the MXU stack kernel's one-hot gather cost
    # scales with table WIDTH while a brute visit prunes at tile level
    min_tris = int(os.environ.get("FLUCTUS_FAST_BIG_MIN_TRIS",
                                  (8 << 20) // 68))
    return (len(host.v0) > min_tris
            and jax.default_backend() not in ("cpu",)
            and os.environ.get("FLUCTUS_FOREST", "brute") == "brute"
            and os.environ.get("FLUCTUS_PACKET_FOREST", "0") != "1"
            and os.environ.get("FLUCTUS_FAST_BIG", "1") != "0")


def _attach_mxu_tables(wbvh):
    """Precompute the MXU traversal gather tables once at upload (the
    encode is pure array work; leaving it to the traversal call retraces
    it into every render program — inside the wavefront scan that meant
    re-encoding every segment)."""
    if wbvh.root_ref < 0 or wbvh.nodes.shape[0] >= (1 << 16) \
            or wbvh.leaves.shape[0] >= (1 << 16):
        return wbvh
    from fluctus_tpu.ops.traverse_mxu import mxu_tables
    nodes_t, leaves_t = mxu_tables(wbvh)
    return wbvh.replace(mxu_nodes_t=nodes_t, mxu_leaves_t=leaves_t)


def load_scene(path: str, env_map: str | None = None) -> HostScene:
    """Load a model by extension (reference: src/scene.cpp:53-103)."""
    ext = os.path.splitext(path)[1].lower()
    pool = TexturePool()
    area_light_hint = None
    if ext == ".ply":
        v0, v1, v2, n0, n1, n2, uv0, uv1, uv2 = load_ply(path)
        mats = [default_material()]
        mat_id = np.zeros(len(v0), np.int32)
        map_arrays = None
    elif ext == ".obj":
        mesh = load_obj(path)
        v0, v1, v2 = mesh.v0, mesh.v1, mesh.v2
        n0, n1, n2 = mesh.n0, mesh.n1, mesh.n2
        uv0, uv1, uv2 = mesh.uv0, mesh.uv1, mesh.uv2
        mat_id = mesh.mat_id
        mats = [default_material()] + mesh.materials
        folder = os.path.dirname(path)
        map_kd = np.full(len(mats), -1, np.int32)
        map_ks = np.full(len(mats), -1, np.int32)
        map_n = np.full(len(mats), -1, np.int32)
        for i, m in enumerate(mats[1:], start=1):
            if m.map_kd:
                map_kd[i] = pool.try_import(os.path.join(folder, m.map_kd),
                                            m.map_kd)
            if m.map_ks:
                map_ks[i] = pool.try_import(os.path.join(folder, m.map_ks),
                                            m.map_ks)
            if m.map_bump:
                map_n[i] = pool.try_import(os.path.join(folder, m.map_bump),
                                           m.map_bump)
        map_arrays = (map_kd, map_ks, map_n)
    elif ext in (".pbrt", ".pbf"):
        if ext == ".pbf":
            # binary container opened directly (reference:
            # src/scene.cpp:573-620 Scene::loadPBFModel)
            from fluctus_tpu.scene.loaders.pbf import load_pbf
            (v0, v1, v2, n0, n1, n2, uv0, uv1, uv2, mat_id,
             pbrt_mats, area_light_hint) = load_pbf(path)
        else:
            from fluctus_tpu.scene.loaders.pbrt import load_pbrt
            (v0, v1, v2, n0, n1, n2, uv0, uv1, uv2, mat_id,
             pbrt_mats, area_light_hint) = load_pbrt(path)
        mats = [default_material()] + pbrt_mats
        folder = os.path.dirname(path)
        map_kd = np.full(len(mats), -1, np.int32)
        map_ks = np.full(len(mats), -1, np.int32)
        map_n = np.full(len(mats), -1, np.int32)
        for i, m in enumerate(mats[1:], start=1):
            if m.map_kd:
                map_kd[i] = pool.try_import(os.path.join(folder, m.map_kd),
                                            m.map_kd)
            if m.map_ks:
                map_ks[i] = pool.try_import(os.path.join(folder, m.map_ks),
                                            m.map_ks)
        map_arrays = (map_kd, map_ks, map_n)
    else:
        raise ValueError(f"unsupported scene format: {path}")

    scene = HostScene(
        v0=v0, v1=v1, v2=v2, n0=n0, n1=n1, n2=n2,
        uv0=uv0, uv1=uv1, uv2=uv2, mat_id=np.asarray(mat_id, np.int32),
        materials=mats, textures=pool,
        hash=file_hash(path), name=os.path.basename(path))
    if map_arrays is not None:
        scene.map_kd, scene.map_ks, scene.map_n = map_arrays
    scene.area_light_hint = area_light_hint
    if env_map:
        scene.load_env_map(env_map)
    return scene
