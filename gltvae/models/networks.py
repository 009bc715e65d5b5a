"""Flax networks for the gated CCVAE, designed MXU-first.

Architectural semantics reproduce /root/reference/networks.py exactly —
verified against the reference's .h5 checkpoints in
tests/test_networks_golden.py — but the implementation is TPU-native:

- NHWC convs lower straight onto the MXU via lax.conv_general_dilated;
  the reference's explicit 1-px `tf.pad` + VALID conv pairs
  (networks.py:21-28) become a single conv with asymmetric-capable
  ((1,1),(1,1)) padding, which XLA fuses (no extra HBM round trip).
- TF's Conv2DTranspose is matched bit-for-bit by lax.conv_transpose with
  `transpose_kernel=True` and the kernel stored in TF's (kh, kw, out, in)
  layout (verified to <1e-13 in f64 against tf.keras).
- The reference's "tile z to [B, z, y] then mask-and-reduce" custom layers
  (MyInferenceLayer networks.py:62-74, MyCondGenerationLayer 89-106) are
  algebraically collapsed into single masked matmuls: the tiled tensor never
  materializes, the MXU sees one [B, z] x [z, y] GEMM.
- A `compute_dtype` knob runs conv/matmul math in bf16 with f32 params and
  f32 heads (posterior scales stay f32 for the softplus/clip numerics).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax

from gltvae.ops.sampling import clip_passthrough

# Keras-compatible initializers: conv/dense default to glorot_uniform,
# the reference's custom gating layers use RandomNormal(stddev=0.05)
# ('random_normal', networks.py:69-70) and zeros/ones (networks.py:97-100).
glorot = nn.initializers.glorot_uniform()
random_normal_05 = nn.initializers.normal(stddev=0.05)


class TFConvTranspose(nn.Module):
    """Transposed conv matching tf.keras.layers.Conv2DTranspose exactly.

    Kernel parameter layout is TF's (kh, kw, out_ch, in_ch) so reference
    .h5 weights drop in unchanged; `lax.conv_transpose(transpose_kernel=
    True)` then computes the identical gradient-of-conv.
    """

    features: int
    kernel_size: Tuple[int, int] = (4, 4)
    strides: Tuple[int, int] = (2, 2)
    padding: str = 'SAME'
    dtype: Any = jnp.float32
    precision: Any = None

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        kshape = (*self.kernel_size, self.features, in_ch)
        # glorot over (in=last, out=second-to-last) axes of the TF layout.
        kernel_init = nn.initializers.variance_scaling(
            1.0, 'fan_avg', 'uniform', in_axis=-1, out_axis=-2)
        kernel = self.param('kernel', kernel_init, kshape, jnp.float32)
        bias = self.param('bias', nn.initializers.zeros, (self.features,),
                          jnp.float32)
        # No preferred_element_type here: mixing a f32 accumulator type
        # with bf16 operands breaks lax.conv_transpose's VJP (the backward
        # conv sees a f32 cotangent against a bf16 kernel). The MXU
        # accumulates bf16 products in f32 natively regardless.
        y = lax.conv_transpose(
            x.astype(self.dtype), kernel.astype(self.dtype),
            self.strides, self.padding,
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            transpose_kernel=True,
            precision=self.precision,
        )
        return (y + bias.astype(self.dtype)).astype(self.dtype)


class S2DConv(nn.Module):
    """First encoder conv in space-to-depth form — an exact regrouping.

    The reference's pad-1 + VALID 4x4 stride-2 conv (networks.py:21-24)
    reads a 3-channel image, and 3 channels pad to TPU lane tiles — real
    HBM traffic that XLA's cost model undercounts (docs/BENCH_NOTES.md,
    round 4). The same sum regrouped as

        pad 1px -> space-to-depth(2) -> 2x2 stride-1 VALID conv

    consumes a 4C-channel, quarter-area input instead: identical FLOPs
    (the im2col K dim is 4*4*C either way), far less padded traffic.
    The kernel parameter stays in the canonical (4, 4, C, F) layout —
    same init stream, same checkpoint/golden/h5 shapes as the direct
    form — and is rearranged at trace time (folded to a constant by XLA).
    """

    features: int
    dtype: Any = jnp.float32
    precision: Any = None

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1]
        kernel = self.param('kernel', glorot, (4, 4, c_in, self.features),
                            jnp.float32)
        bias = self.param('bias', nn.initializers.zeros, (self.features,),
                          jnp.float32)
        if x.shape[1] % 2 or x.shape[2] % 2:
            raise ValueError(f's2d input conv needs even H/W, got {x.shape}')
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        b, h, w, c = xp.shape
        xs = xp.reshape(b, h // 2, 2, w // 2, 2, c)
        xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)
        # W[2a+p, 2b+q, c, o] -> W'[a, b, (p,q,c), o]: output[i,j] of the
        # strided conv reads padded rows 2i..2i+3 = s2d cells i, i+1.
        k = kernel.reshape(2, 2, 2, 2, c_in, self.features)
        k = k.transpose(0, 2, 1, 3, 4, 5).reshape(2, 2, 4 * c_in,
                                                  self.features)
        y = lax.conv_general_dilated(
            xs.astype(self.dtype), k.astype(self.dtype),
            window_strides=(1, 1), padding='VALID',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            precision=self.precision)
        return y + bias.astype(self.dtype)


def space_to_depth(x):
    """(B, H, W, C) -> (B, H/2, W/2, 4C), channel order (p, q, c) with
    (p, q) the within-cell pixel. Matches S2DTransposeLast's output order
    so recon losses can compare in s2d space (a pure re-indexing: any
    per-pixel sum is unchanged)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)


def depth_to_space(y):
    """Inverse of space_to_depth: (B, h, w, 4C) -> (B, 2h, 2w, C)."""
    b, h, w, c4 = y.shape
    c = c4 // 4
    y = y.reshape(b, h, w, 2, 2, c)
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h, 2 * w, c)


class S2DTransposeLast(nn.Module):
    """Decoder's final 4x4/stride-2 SAME conv-transpose in
    space-to-depth form — an exact regrouping (the output-side twin of
    S2DConv).

    The direct form writes an (S, S, 3) image whose 3 channels pad to
    TPU lane tiles; this form produces the SAME pixels as an
    (S/2, S/2, 12) tensor via one 3x3/stride-1 conv over the input:
        out[2u+r] = sum_i X[i] W[2(u-i)+r+1]     (stride-2 transpose)
    regrouped per sub-pixel (r, s) gives taps k_y = r+3-2dy in a 3-tap
    window (structural zeros where k leaves [0,4)). Kernel stays in
    TFConvTranspose's canonical (kh, kw, out, in) layout — identical
    params, checkpoints, goldens — and the 3x3 gather kernel is built at
    trace time (constant-folded).
    """

    features: int
    dtype: Any = jnp.float32
    precision: Any = None

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        kshape = (4, 4, self.features, in_ch)
        kernel_init = nn.initializers.variance_scaling(
            1.0, 'fan_avg', 'uniform', in_axis=-1, out_axis=-2)
        kernel = self.param('kernel', kernel_init, kshape, jnp.float32)
        bias = self.param('bias', nn.initializers.zeros, (self.features,),
                          jnp.float32)
        zero = jnp.zeros((self.features, in_ch), kernel.dtype)
        rows = []
        for dy in range(3):
            cols = []
            for dx in range(3):
                subs = []
                for r in range(2):
                    for s in range(2):
                        ky, kx = r + 3 - 2 * dy, s + 3 - 2 * dx
                        subs.append(kernel[ky, kx] if 0 <= ky < 4
                                    and 0 <= kx < 4 else zero)
                cols.append(jnp.stack(subs))      # (4, out, in)
            rows.append(jnp.stack(cols))          # (3, 4, out, in)
        k3 = jnp.stack(rows)                      # (3, 3, 4, out, in)
        # -> (dy, dx, in, (r,s,out)) for NHWC/HWIO
        k3 = k3.transpose(0, 1, 4, 2, 3).reshape(3, 3, in_ch,
                                                 4 * self.features)
        y = lax.conv_general_dilated(
            x.astype(self.dtype), k3.astype(self.dtype),
            window_strides=(1, 1), padding=((1, 1), (1, 1)),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            precision=self.precision)
        return y + jnp.tile(bias, 4).astype(self.dtype)


class Encoder(nn.Module):
    """q(z|x): strided conv stack -> two dense heads.

    Reference: networks.py:7-37. 64x64x3 -> (pad1+valid 4x4 s2 convs:
    32,32,64,128) -> 4x4x128 -> valid 4x4 s1 conv(256) -> 1x1x256 ->
    Dense locs (ReLU — the reference's unusual nonnegative posterior
    means, networks.py:17) and Dense scale (softplus, clipped to
    [1e-3, 1e3], networks.py:18,33-34).

    locs_act='linear' (ModelConfig.posterior_locs) drops the locs ReLU —
    the standard VAE head. docs/HEAD2HEAD.md traced the reference's
    sup=1.0 one-one seed bimodality to the nonnegativity constraint, so
    this is the framework's measured out-train knob; 'relu' stays the
    parity default (all goldens pin it).
    """

    z_dim: int
    features: Sequence[int] = (32, 32, 64, 128)
    hidden: int = 256
    locs_act: str = 'relu'
    input_s2d: bool = False
    dtype: Any = jnp.float32
    precision: Any = None

    @nn.compact
    def __call__(self, x):
        h = x.astype(self.dtype)
        for i, f in enumerate(self.features):
            if i == 0 and self.input_s2d:
                # Exact space-to-depth regrouping of the same conv; the
                # param tree ('conv1', canonical kernel layout) is
                # unchanged, so the flag is a pure execution strategy.
                h = S2DConv(f, dtype=self.dtype, precision=self.precision,
                            name='conv1')(h)
            else:
                # pad 1px + VALID 4x4 s2 == conv with ((1,1),(1,1)) padding.
                h = nn.Conv(f, (4, 4), strides=(2, 2),
                            padding=((1, 1), (1, 1)),
                            kernel_init=glorot, dtype=self.dtype,
                            precision=self.precision, name=f'conv{i + 1}')(h)
            h = nn.relu(h)
        h = nn.Conv(self.hidden, (4, 4), strides=(1, 1), padding='VALID',
                    kernel_init=glorot, dtype=self.dtype,
                    precision=self.precision,
                    name=f'conv{len(self.features) + 1}')(h)
        h = nn.relu(h)
        h = h.reshape((h.shape[0], -1))
        locs = nn.Dense(self.z_dim, kernel_init=glorot, dtype=self.dtype,
                        precision=self.precision, name='locs')(h)
        if self.locs_act == 'relu':
            locs = nn.relu(locs)
        scale = nn.Dense(self.z_dim, kernel_init=glorot, dtype=self.dtype,
                         precision=self.precision, name='scale')(h)
        # Scale head numerics stay f32 regardless of compute dtype.
        scale = jax.nn.softplus(scale.astype(jnp.float32))
        scale = clip_passthrough(scale, 1e-3, 1e3)
        return locs.astype(jnp.float32), scale


class Decoder(nn.Module):
    """p(x|z): dense -> 1x1 feature map -> transpose-conv stack -> sigmoid.

    Reference: networks.py:40-59. Note the hidden_dim=z_dim quirk: the
    caller constructs Decoder(hidden_dim=z_dim) (gated_ccvae.py:34), so
    fc1 is Dense(45) not 256; `hidden` preserves that as the default via
    CCVAE wiring.
    """

    hidden: int
    features: Sequence[int] = (128, 64, 32, 32)
    out_channels: int = 3
    # output_s2d: the final conv-transpose emits the image in
    # space-to-depth form (B, S/2, S/2, 4C), channel order (p, q, c) —
    # same pixels, half the padded HBM traffic (S2DTransposeLast).
    # Callers wanting an (S, S, C) image apply depth_to_space; losses
    # compare in s2d space directly.
    output_s2d: bool = False
    dtype: Any = jnp.float32
    precision: Any = None

    @nn.compact
    def __call__(self, z):
        h = nn.relu(nn.Dense(self.hidden, kernel_init=glorot, dtype=self.dtype,
                             precision=self.precision, name='fc1')(z.astype(self.dtype)))
        h = h.reshape((h.shape[0], 1, 1, self.hidden))
        h = nn.relu(TFConvTranspose(self.features[0], strides=(1, 1),
                                    padding='VALID', dtype=self.dtype,
                                    precision=self.precision,
                                    name='conv1t')(h))
        for i, f in enumerate(self.features[1:]):
            h = nn.relu(TFConvTranspose(f, strides=(2, 2), padding='SAME',
                                        dtype=self.dtype,
                                        precision=self.precision,
                                        name=f'conv{i + 2}t')(h))
        last = f'conv{len(self.features) + 1}t'
        if self.output_s2d:
            x = S2DTransposeLast(self.out_channels, dtype=self.dtype,
                                 precision=self.precision, name=last)(h)
        else:
            x = TFConvTranspose(self.out_channels, strides=(2, 2),
                                padding='SAME', dtype=self.dtype,
                                precision=self.precision, name=last)(h)
        return jax.nn.sigmoid(x.astype(jnp.float32))


class GatedClassifier(nn.Module):
    """q(y|z,c): per-label masked linear head.

    The reference tiles z_classify to [B, z, y], multiplies by the gates
    and a (z, y) kernel, and reduces over z (networks.py:62-74, 83-86):
        logits[b,j] = Σ_i z[b,i]·c[i,j]·W[i,j] + b[j]
    which is exactly  z @ (c ⊙ W) + b  — one GEMM, no tiling.
    """

    y_dim: int
    z_classify: int
    dtype: Any = jnp.float32
    precision: Any = None

    @nn.compact
    def __call__(self, z_classify, gates):
        w = self.param('kernel', random_normal_05,
                       (self.z_classify, self.y_dim), jnp.float32)
        b = self.param('bias', random_normal_05, (self.y_dim,), jnp.float32)
        logits = jnp.dot(z_classify.astype(self.dtype),
                         (gates * w).astype(self.dtype),
                         precision=self.precision,
                         preferred_element_type=jnp.float32) + b
        return logits.astype(jnp.float32)


class ConditionalPrior(nn.Module):
    """p(z_classify | y, c): gated linear maps for true/false label states.

    Reference: networks.py:89-106, 109-127. With cᵀ the transposed gates,
        locs  = y @ (cᵀ ⊙ W_loc_true) + (1-y) @ (cᵀ ⊙ W_loc_false)
        scale = softplus(y @ (cᵀ ⊙ W_sc_true) + (1-y) @ (cᵀ ⊙ W_sc_false))
    clipped to [1e-3, 1e3]. Kernels: loc zeros-init, scale ones-init —
    so at init the prior is N(0, softplus(Σ gates)) as in the reference.
    Two GEMMs replace the tile-mask-reduce custom layers.
    """

    z_classify: int
    y_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, y, gates):
        shape = (self.y_dim, self.z_classify)
        w_loc_t = self.param('loc_true', nn.initializers.zeros, shape, jnp.float32)
        w_loc_f = self.param('loc_false', nn.initializers.zeros, shape, jnp.float32)
        w_sc_t = self.param('scale_true', nn.initializers.ones, shape, jnp.float32)
        w_sc_f = self.param('scale_false', nn.initializers.ones, shape, jnp.float32)
        ct = gates.T  # (y_dim, z_classify)
        y = y.astype(jnp.float32)
        locs = y @ (ct * w_loc_t) + (1.0 - y) @ (ct * w_loc_f)
        scale = y @ (ct * w_sc_t) + (1.0 - y) @ (ct * w_sc_f)
        scale = jax.nn.softplus(scale)
        scale = clip_passthrough(scale, 1e-3, 1e3)
        return locs, scale
