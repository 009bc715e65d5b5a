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


# ---------------------------------------------------------------------
# Fused train-time augmentation: random crop + horizontal flip +
# dequant-normalize in ONE kernel pass (uint8 in HBM read once, f32 out
# written once). A framework extension — the reference trains with no
# augmentation at all (utils_data.py:48-63 is a bare resize) — exposed
# opt-in via `train.py --augment-pad`.
#
# TPU mapping: per-image crop offsets land at unaligned sublane/lane
# positions (dy is any int; W*C is never a multiple of 128), where
# dynamic slices either fail Mosaic's alignment proofs (sublane: "index
# must be a multiple of 8") or degenerate into slow gathers (lane). Both
# crops are instead expressed as one-hot selection matmuls that ride the
# MXU with fully static indexing:
#     out = R(dy) @ x_u8 @ E(dx, flip) * scale
# R [S, H] selects rows, E [W*C, S*C] selects columns and applies the
# flip, both built in-kernel from iotas. The accumulations are exact
# (0/1 matrices, f32), so the kernel is bit-identical to the XLA
# dynamic_slice + rev + scale composition it replaces — asserted in
# tests/test_traversal_preprocess.py.
# ---------------------------------------------------------------------


def _augment_kernel(dy_ref, dx_ref, flip_ref, u8_ref, out_ref, *,
                    out_size: int, channels: int, scale: float):
    i = pl.program_id(0)
    S, C = out_size, channels
    dy, dx, fl = dy_ref[i], dx_ref[i], flip_ref[i]
    x = u8_ref[0].astype(jnp.int32).astype(jnp.float32)   # [H, W*C]
    H, WC = x.shape
    # row crop: one-hot row selector R[i, h] = (h == dy + i)
    ri = jax.lax.broadcasted_iota(jnp.int32, (S, H), 0)
    rh = jax.lax.broadcasted_iota(jnp.int32, (S, H), 1)
    rsel = (rh == dy + ri).astype(jnp.float32)
    rows = jax.lax.dot(rsel, x,
                       precision=jax.lax.Precision.HIGHEST)  # [S, W*C]
    # column crop + flip: rows index the input w*C+c layout, cols the
    # output j*C+c layout
    row = jax.lax.broadcasted_iota(jnp.int32, (WC, S * C), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (WC, S * C), 1)
    w_in, c_in = row // C, row % C
    j, c_out = col // C, col % C
    j_src = jnp.where(fl > 0, S - 1 - j, j)
    sel = ((w_in == dx + j_src) & (c_in == c_out)).astype(jnp.float32)
    out_ref[0] = jax.lax.dot(rows, sel,
                             precision=jax.lax.Precision.HIGHEST) * scale


def _draw_crop_flip(key, B: int, H: int, W: int, S: int, flip: bool):
    """The (dy, dx, flip) draw shared by every augment entry point — the
    stacked path must produce bit-identical randomness to N separate
    per-step calls, so the draw lives in exactly one place."""
    k_y, k_x, k_f = jax.random.split(key, 3)
    dy = jax.random.randint(k_y, (B,), 0, H - S + 1, dtype=jnp.int32)
    dx = jax.random.randint(k_x, (B,), 0, W - S + 1, dtype=jnp.int32)
    fl = (jax.random.bernoulli(k_f, 0.5, (B,)).astype(jnp.int32)
          if flip else jnp.zeros((B,), jnp.int32))
    return dy, dx, fl


# public name: the Trainer's mesh path draws GLOBAL-batch vectors itself
# (then slices per shard) so augmented runs are mesh-shape-invariant
draw_crop_flip = _draw_crop_flip


@functools.partial(jax.jit, static_argnames=('out_size', 'interpret',
                                             'scale', 'channels'))
def _fused_augment(u8_flat, dy, dx, flip, out_size: int,
                   scale: float, interpret: bool, channels: int = 3):
    B, H, WC = u8_flat.shape
    C = channels
    S = out_size
    kernel = functools.partial(_augment_kernel, out_size=S, channels=C,
                               scale=scale)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(B,),
            in_specs=[pl.BlockSpec((1, H, WC), lambda i, *_: (i, 0, 0))],
            out_specs=pl.BlockSpec((1, S, S * C), lambda i, *_: (i, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((B, S, S * C), jnp.float32),
        interpret=interpret,
    )(dy, dx, flip, u8_flat)


def fused_augment_given(u8: jax.Array, dy: jax.Array, dx: jax.Array,
                        fl: jax.Array, out_size: int,
                        scale: float = 1.0 / 255.0,
                        interpret: Optional[bool] = None) -> jax.Array:
    """fused_augment with externally-drawn per-image (dy, dx, flip) [B]
    vectors — the entry the mesh path uses: each shard draws the GLOBAL
    batch's vectors from the replicated key and passes its own rows, so
    augmented training is bit-identical across mesh shapes (and to the
    single-device run)."""
    if interpret is None:
        interpret = not _is_tpu()
    B, H, W, C = u8.shape
    S = out_size
    if H < S or W < S:
        raise ValueError(f'input {H}x{W} smaller than crop {S}')
    out = _fused_augment(u8.reshape(B, H, W * C), dy, dx, fl, S,
                         float(scale), interpret, channels=C)
    return out.reshape(B, S, S, C)


def fused_augment_stacked_given(u8: jax.Array, dy: jax.Array,
                                dx: jax.Array, fl: jax.Array,
                                out_size: int,
                                scale: float = 1.0 / 255.0,
                                interpret: Optional[bool] = None
                                ) -> jax.Array:
    """Stacked twin of fused_augment_given: u8 [n, B, H, W, C] with
    per-inner-step vectors [n, B]."""
    if interpret is None:
        interpret = not _is_tpu()
    n, B, H, W, C = u8.shape
    S = out_size
    if H < S or W < S:
        raise ValueError(f'input {H}x{W} smaller than crop {S}')
    out = _fused_augment(u8.reshape(n * B, H, W * C), dy.reshape(-1),
                         dx.reshape(-1), fl.reshape(-1), S,
                         float(scale), interpret, channels=C)
    return out.reshape(n, B, S, S, C)


def fused_augment(u8: jax.Array, key: jax.Array, out_size: int,
                  flip: bool = True, scale: float = 1.0 / 255.0,
                  interpret: Optional[bool] = None) -> jax.Array:
    """uint8 [B, H, W, C] -> f32 [B, S, S, C]: per-image random crop to
    S x S + random horizontal flip + x*scale, one fused Pallas pass."""
    B, H, W, C = u8.shape
    dy, dx, fl = _draw_crop_flip(key, B, H, W, out_size, flip)
    return fused_augment_given(u8, dy, dx, fl, out_size, scale, interpret)


def fused_augment_stacked(u8: jax.Array, keys: jax.Array, out_size: int,
                          flip: bool = True, scale: float = 1.0 / 255.0,
                          interpret: Optional[bool] = None) -> jax.Array:
    """uint8 [n, B, H, W, C] + per-inner-step keys [n] -> f32
    [n, B, S, S, C]: bit-identical to n separate
    `fused_augment(u8[i], keys[i])` calls, but ONE kernel dispatch.

    This is how the scan train path augments a whole chunk while keeping
    the per-step noise stream — training results stay invariant to
    --steps-per-dispatch (each inner step draws from its own key exactly
    as per-step dispatch would)."""
    n, B, H, W, C = u8.shape
    dy, dx, fl = jax.vmap(
        lambda k: _draw_crop_flip(k, B, H, W, out_size, flip))(keys)
    return fused_augment_stacked_given(u8, dy, dx, fl, out_size, scale,
                                       interpret)


def augment_xla(u8: jax.Array, key: jax.Array, out_size: int,
                flip: bool = True,
                scale: float = 1.0 / 255.0) -> jax.Array:
    """XLA twin of fused_augment (vmapped dynamic_slice + rev + scale) —
    the equivalence oracle and the bench competitor."""
    B, H, W, C = u8.shape
    S = out_size
    dy, dx, fl = _draw_crop_flip(key, B, H, W, S, flip)

    def one(img, y0, x0, f):
        crop = jax.lax.dynamic_slice(img, (y0, x0, 0), (S, S, C))
        crop = jnp.where(f > 0, jax.lax.rev(crop, dimensions=(1,)), crop)
        return crop.astype(jnp.float32) * scale

    return jax.vmap(one)(u8, dy, dx, fl)
