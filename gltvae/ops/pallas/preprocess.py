"""On-device image preprocessing (Pallas): fused uint8 -> f32 normalize.

The reference normalizes on the host, one PIL image at a time
(/root/reference/utils_data.py:48-63), then ships f32 over the bus. The
TPU-native pipeline ships uint8 (4x fewer bytes over PCIe/DCN) and finishes
preprocessing on device; this module is that device stage.

The dequant-normalize is pure HBM-bandwidth work, so the kernel's job is
exact tiling: the batch is viewed as a (rows, 128) lane-aligned 2D array
(a CelebA-64 batch of 256 is 3,145,728 bytes = 24,576 x 128), streamed
through VMEM in sublane-aligned row blocks. Optional per-channel
mean/std and random horizontal flip compose in the same jit (flip is an
XLA lax.rev that fuses with the consumer conv).

CPU fallback: `interpret=True` under the host platform so the same API
runs in tests.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 512          # 4x the native lane width: wider rows, fewer blocks
_BLOCK_ROWS = 1024    # 1024x512 u8 in / f32 out = 512KB + 2MB per block


def _is_tpu() -> bool:
    try:
        return jax.default_backend() == 'tpu'
    except RuntimeError:
        return False


@functools.partial(jax.jit,
                   static_argnames=('scale', 'block_rows', 'interpret'))
def _normalize_2d(u8_2d, scale: float, block_rows: int, interpret: bool):
    rows = u8_2d.shape[0]
    grid = (rows // block_rows,)

    def kernel(u8_ref, out_ref):
        # Mosaic has no direct unsigned->float cast; route u8->i32->f32.
        # `scale` is a compile-time constant folded into the multiply.
        x = u8_ref[:].astype(jnp.int32).astype(jnp.float32)
        out_ref[:] = x * scale

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((block_rows, u8_2d.shape[1]),
                               lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((block_rows, u8_2d.shape[1]),
                               lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(u8_2d.shape, jnp.float32),
        interpret=interpret,
    )(u8_2d)


def _pick_block_rows(rows: int) -> Optional[int]:
    """Largest sublane-aligned block (<= _BLOCK_ROWS) dividing `rows`.
    Realistic batches divide evenly (a bs-256 CelebA-64 batch is 6,144
    rows of 512 lanes); odd test shapes fall back to XLA."""
    for cand in (_BLOCK_ROWS, 512, 256, 64, 32, 8):
        if rows % cand == 0:
            return cand
    return None


def normalize_images(u8: jax.Array, scale: float = 1.0 / 255.0,
                     interpret: Optional[bool] = None) -> jax.Array:
    """uint8 (B, H, W, C) -> f32, x * scale, via the Pallas stream kernel.

    Falls back to interpreter mode off-TPU, and to plain XLA when the
    flattened size is not tile-aligned (it always is for 64/128px RGB
    batches with sublane-multiple batch sizes).

    NOTE: standalone, XLA's fused astype+mul is already at speed of light
    for this op (and fuses into the consumer conv, costing zero extra HBM
    round trips) — the train path therefore uses the XLA form by default
    (train/steps._as_f32_image). This kernel exists for pipelines that
    want preprocessing fused with custom Pallas stages (flip/crop/augment)
    and as the tiling template for them.
    """
    if interpret is None:
        interpret = not _is_tpu()
    total = u8.size
    block_rows = (_pick_block_rows(total // _LANES)
                  if total % _LANES == 0 else None)
    if block_rows is None:
        return u8.astype(jnp.float32) * scale
    flat = u8.reshape(total // _LANES, _LANES)
    out = _normalize_2d(flat, float(scale), block_rows, interpret)
    return out.reshape(u8.shape)


def preprocess_batch(u8: jax.Array, key: Optional[jax.Array] = None,
                     flip: bool = False,
                     mean: Optional[Tuple[float, ...]] = None,
                     std: Optional[Tuple[float, ...]] = None,
                     interpret: Optional[bool] = None) -> jax.Array:
    """Full device-side preprocessing: normalize (+ optional per-channel
    standardize, + optional random horizontal flip). Everything after the
    Pallas dequant stays in the same jit so XLA fuses it into the first
    encoder conv."""
    x = normalize_images(u8, interpret=interpret)
    if mean is not None:
        x = (x - jnp.asarray(mean, jnp.float32)) / jnp.asarray(
            std or (1.0,) * len(mean), jnp.float32)
    if flip:
        if key is None:
            raise ValueError('flip=True requires a PRNG key')
        do = jax.random.bernoulli(key, 0.5, (x.shape[0],))
        x = jnp.where(do[:, None, None, None],
                      jax.lax.rev(x, dimensions=(2,)), x)
    return x
