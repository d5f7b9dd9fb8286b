"""Image export (reference: CLContext::saveImage, src/clcontext.cpp:386-465 —
PNG via DevIL there, PIL here; .hdr via the RGBE writer)."""
from __future__ import annotations

import os

import numpy as np

from fluctus_tpu.io.hdr import write_hdr


def save_image(path: str, img: np.ndarray) -> None:
    """Save (H, W, 3) float32. .hdr -> linear RGBE; else 8-bit (expects the
    caller to have applied postprocess/tonemap for LDR formats)."""
    img = np.asarray(img, np.float32)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    if path.lower().endswith(".hdr"):
        write_hdr(path, img)
        return
    from PIL import Image
    u8 = np.clip(img * 255.0 + 0.5, 0, 255).astype(np.uint8)
    Image.fromarray(u8).save(path)
