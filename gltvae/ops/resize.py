"""Device-side separable bilinear image resize (MXU GEMMs).

The reference resizes every image on the host training thread with PIL
(/root/reference/utils_data.py:48-63: 178x218 JPEG -> 64x64 -> f32). The
TPU-native alternative ships full-resolution uint8 and resizes INSIDE the
train/eval jit: a separable resampling is two small matmuls
(out = A_H · x · A_Wᵀ per channel), which XLA maps straight onto the MXU
and fuses with the normalize that precedes the first conv.

The interpolation weights use the half-pixel-center convention with an
antialiasing triangle filter whose support scales with the downsampling
ratio — the same resampling PIL's BILINEAR and jax.image.resize
(antialias=True) perform, so device-resized and host-resized pipelines see
the same images up to f32 rounding.

Whether full-res shipping wins depends on the bus: at 64px it moves ~10x
the bytes per image, at 128px ~2.4x (see tools/bench_data.py and
docs/BENCH_NOTES.md for measured numbers; DataConfig.device_resize picks
the pipeline).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=32)
def _linear_weights(src: int, dst: int) -> np.ndarray:
    """(dst, src) resampling matrix: half-pixel centers, triangle filter
    with support scaled by the downsampling ratio (antialiased)."""
    ratio = src / dst
    scale = max(ratio, 1.0)
    out = np.zeros((dst, src), np.float32)
    for i in range(dst):
        center = (i + 0.5) * ratio - 0.5
        lo = int(np.floor(center - scale))
        hi = int(np.ceil(center + scale))
        js = np.arange(lo, hi + 1)
        w = np.clip(1.0 - np.abs(js - center) / scale, 0.0, None)
        # out-of-range taps are DROPPED and the row renormalized (the
        # PIL / jax.image edge convention), not clamped onto edge pixels
        keep = (js >= 0) & (js < src)
        out[i, js[keep]] = w[keep]
    return out / out.sum(axis=1, keepdims=True)


def resize_bilinear(x, out_h: int, out_w: int):
    """(B, H, W, C) f32 -> (B, out_h, out_w, C) via two separable GEMMs."""
    _, h, w, _ = x.shape
    if (h, w) == (out_h, out_w):
        return x
    a_h = jnp.asarray(_linear_weights(h, out_h))
    a_w = jnp.asarray(_linear_weights(w, out_w))
    x = jnp.einsum('bhwc,Hh->bHwc', x, a_h)
    return jnp.einsum('bHwc,Ww->bHWc', x, a_w)
