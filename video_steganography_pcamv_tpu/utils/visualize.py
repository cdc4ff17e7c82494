"""MB-overlay visualization (PPM dumps).

Reference: common/visualize.c + display-x11.c (--visualize: live X11
overlay of MB types/partitions/MVs during encode, Makefile VIS=yes).
Headless re-design: per-frame PPM images with the same information —
MB-kind tinting (intra red, inter blue, skip untouched), partition
split lines, and MV rays — written next to the output file.
"""

from __future__ import annotations

import numpy as np

# kind ids used by the encoder hook
K_SKIP, K_INTER, K_I16, K_I4 = 0, 1, 2, 3

_TINT = {
    K_INTER: (0, 0, 90),     # blue-ish: inter
    K_I16: (110, 0, 0),      # red: intra 16x16
    K_I4: (110, 60, 0),      # orange: intra 4x4
}


def overlay_frame(y_plane: np.ndarray, kind: np.ndarray,
                  part: np.ndarray | None,
                  mv8: np.ndarray | None) -> np.ndarray:
    """Grayscale luma + MB-kind tint + partition lines + MV rays.
    Returns [H, W, 3] uint8."""
    h, w = y_plane.shape
    img = np.stack([y_plane] * 3, axis=-1).astype(np.int32)
    mbh, mbw = kind.shape
    for my in range(mbh):
        for mx in range(mbw):
            k = int(kind[my, mx])
            y0, x0 = 16 * my, 16 * mx
            if k in _TINT:
                t = _TINT[k]
                img[y0:y0 + 16, x0:x0 + 16] = (
                    img[y0:y0 + 16, x0:x0 + 16] * 2 // 3
                    + np.array(t) // 1)
            # MB grid
            img[y0, x0:x0 + 16] //= 2
            img[y0:y0 + 16, x0] //= 2
            if part is not None and k == K_INTER:
                p = int(part[my, mx])
                if p in (1, 3):   # horizontal split
                    img[y0 + 8, x0:x0 + 16, 1] = 255
                if p in (2, 3):   # vertical split
                    img[y0:y0 + 16, x0 + 8, 1] = 255
            if mv8 is not None and k in (K_SKIP, K_INTER):
                cy, cx = y0 + 8, x0 + 8
                mvx = int(mv8[2 * my, 2 * mx, 0]) // 4
                mvy = int(mv8[2 * my, 2 * mx, 1]) // 4
                steps = max(abs(mvx), abs(mvy), 1)
                for s in range(steps + 1):
                    py = min(max(cy + mvy * s // steps, 0), h - 1)
                    px = min(max(cx + mvx * s // steps, 0), w - 1)
                    img[py, px] = (255, 255, 0)
    return np.clip(img, 0, 255).astype(np.uint8)


def write_ppm(path: str, rgb: np.ndarray) -> None:
    h, w = rgb.shape[:2]
    with open(path, "wb") as f:
        f.write(f"P6\n{w} {h}\n255\n".encode())
        f.write(rgb.tobytes())
