"""Texture import + atlas packing.

Capability parity with the reference: DevIL import to RGBA8 with name-based
dedup (reference: src/texture.cpp:16-41, src/scene.cpp:304-320) and packing of
all textures into one flat byte buffer with a descriptor table
(reference: src/clcontext.cpp:570-611). PIL replaces DevIL.
"""
from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np


@dataclass
class HostTexture:
    name: str
    rgba: np.ndarray  # (H, W, 4) uint8


@dataclass
class TexturePool:
    textures: list = field(default_factory=list)
    _by_name: dict = field(default_factory=dict)

    def try_import(self, path: str, name: str) -> int:
        """Load-or-reuse by name; -1 when missing
        (reference: src/scene.cpp:304-320 tryImportTexture)."""
        if not name:
            return -1
        if name in self._by_name:
            return self._by_name[name]
        if not os.path.exists(path):
            return -1
        try:
            from PIL import Image
            img = Image.open(path)
            # PIL rows are top-to-bottom; reference DevIL loads with origin at
            # lower-left (IL_ORIGIN_LOWER_LEFT) so uv (0,0) is bottom-left.
            rgba = np.asarray(img.convert("RGBA"), np.uint8)[::-1]
        except Exception:
            return -1
        idx = len(self.textures)
        self.textures.append(HostTexture(name=name, rgba=rgba))
        self._by_name[name] = idx
        return idx

    def pack(self):
        """-> (data (total,) u8, offsets u32, widths i32, heights i32);
        one descriptor per texture (reference: src/clcontext.cpp:570-611)."""
        if not self.textures:
            # 1-byte placeholder: real RGBA payloads are multiples of 4 and
            # >= 4 bytes (a 1x1 texture packs to exactly 4), so size < 4 is
            # an unambiguous no-texture marker (see ops/texture._atlas_empty)
            return (np.zeros(1, np.uint8), np.zeros(1, np.uint32),
                    np.ones(1, np.int32), np.ones(1, np.int32))
        blobs, offs, ws, hs = [], [], [], []
        off = 0
        for t in self.textures:
            h, w = t.rgba.shape[:2]
            flat = np.ascontiguousarray(t.rgba).reshape(-1)
            blobs.append(flat)
            offs.append(off)
            ws.append(w)
            hs.append(h)
            off += flat.size
        return (np.concatenate(blobs), np.asarray(offs, np.uint32),
                np.asarray(ws, np.int32), np.asarray(hs, np.int32))
