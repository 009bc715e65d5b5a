"""StableHLO serving artifacts via jax.export.

Packages the deterministic attribute-prediction path (and optionally the
decoder/reconstruction path) as ONE self-contained serialized program:
weights baked in as constants, symbolic batch dimension, uint8 input
with on-device dequantization, exported for both cpu and tpu platforms.
A server deserializes with `load_serving()` and calls it on any JAX
backend — no gltvae model code, checkpoint plumbing, or Python class
graph needed at serving time; the artifact IS the model.

The reference has no serving or export path at all — its load_model is
eval-only inside the training script (/root/reference/
gated_ccvae.py:146-165). Framework extension per the production-serving
scope; `tools/export_serving.py` is the CLI.

Deterministic protocol only (posterior-mean z, expected gates): a
serving endpoint must be reproducible; the reference's stochastic eval
protocol stays available live via tools/infer.py --stochastic.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np


def _bake(model, params):
    import jax
    import jax.numpy as jnp
    # constants must be device-agnostic concrete arrays
    return jax.tree.map(lambda a: jnp.asarray(np.asarray(a)), params)


def export_predict(model, params, *,
                   platforms: Sequence[str] = ('cpu', 'tpu')) -> bytes:
    """Serialize uint8 [b,S,S,3] -> attribute probs f32 [b,y_dim].

    `b` is symbolic: one artifact serves any batch size. The pixel path
    matches training exactly: uint8 -> f32/255 on device, then the
    shared CCVAE.predict_probs deterministic protocol.
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jexport
    from gltvae.models.ccvae import Temps

    params = _bake(model, params)
    s = model.cfg.image_size

    def serve(u8):
        x = u8.astype(jnp.float32) / 255.0
        return model.predict_probs(params, x, None,
                                   Temps(gating=jnp.float32(1.0)),
                                   deterministic=True)

    spec = jax.ShapeDtypeStruct(
        jexport.symbolic_shape(f'b, {s}, {s}, 3'), jnp.uint8)
    return bytes(jexport.export(jax.jit(serve),
                                platforms=tuple(platforms))(spec).serialize())


def export_reconstruct(model, params, *,
                       platforms: Sequence[str] = ('cpu', 'tpu')) -> bytes:
    """Serialize uint8 [b,S,S,3] -> reconstruction f32 [b,S,S,3] in
    [0,1] (posterior-mean z through the decoder)."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    params = _bake(model, params)
    s = model.cfg.image_size

    def serve(u8):
        x = u8.astype(jnp.float32) / 255.0
        return model.reconstruct(params, x)

    spec = jax.ShapeDtypeStruct(
        jexport.symbolic_shape(f'b, {s}, {s}, 3'), jnp.uint8)
    return bytes(jexport.export(jax.jit(serve),
                                platforms=tuple(platforms))(spec).serialize())


def load_serving(path_or_bytes):
    """Deserialize an artifact; returns an object whose .call(u8) runs
    the baked program on the current backend."""
    from jax import export as jexport
    if isinstance(path_or_bytes, (bytes, bytearray)):
        blob = path_or_bytes
    else:
        with open(path_or_bytes, 'rb') as f:
            blob = f.read()
    return jexport.deserialize(bytearray(blob))
