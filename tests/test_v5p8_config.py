"""BASELINE config 5: the v5p-8 data-parallel sweep at global batch 4096.

No 8-chip pod exists on this machine, so the proof is ahead-of-time:
the REAL-shape supervised train step (64px flagship model, global batch
4096, k=100 MC marginal, uint8 inputs with on-device normalize) is
lowered and compiled over an 8-device mesh, and the compiled program's
cost analysis is checked against the single-chip step (16x the batch ->
16x the FLOPs; the psum adds only O(params)). Execution semantics of
the same parallel step are covered at small shapes by
tests/test_parallel.py (single-device == mesh numerics) and
__graft_entry__.dryrun_multichip.
"""

import numpy as np
import pytest

from gltvae.config import ModelConfig, TrainConfig, v5p8_sweep


def test_sweep_enumerates_all_modes():
    entries = v5p8_sweep()
    assert len(entries) == 9  # 3 gate modes x 3 sup fractions
    names = [n for n, _, _ in entries]
    assert len(set(names)) == 9
    for _, model, train in entries:
        assert train.batch_size == 4096
        assert model.compute_dtype == 'bfloat16'
    assert sum('one-one' in n for n in names) == 3
    assert sum('learnable' in n for n in names) == 3


@pytest.mark.slow
def test_global_batch_4096_compiles_over_8_device_mesh():
    import jax
    import jax.numpy as jnp
    from gltvae.models.ccvae import CCVAE
    from gltvae.parallel.mesh import create_mesh
    from gltvae.parallel.dp import (make_parallel_train_steps, shard_state,
                                    shard_batch)
    from gltvae.train.state import create_train_state

    assert len(jax.devices()) >= 8
    _, model_cfg, train_cfg = v5p8_sweep()[0]
    # f32 on the CPU mesh (bf16 conv lowering is TPU's job); shapes and
    # shardings — what this test pins — are dtype-independent
    import dataclasses
    model_cfg = dataclasses.replace(model_cfg, compute_dtype='float32')
    model = CCVAE(model_cfg)
    rng = np.random.RandomState(0)
    mu = rng.rand(18, 18).astype(np.float32)
    mesh = create_mesh(jax.devices()[:8])
    state = create_train_state(model, train_cfg, jax.random.key(0),
                               mu_init=mu)
    state = shard_state(state, mesh)
    sup_step, _ = make_parallel_train_steps(model, train_cfg, mesh,
                                            donate=False)
    B = train_cfg.batch_size
    x = jnp.asarray(rng.randint(0, 256, (B, 64, 64, 3)), jnp.uint8)
    y = jnp.asarray((rng.rand(B, 18) > 0.5).astype(np.float32))
    x, y = shard_batch((x, y), mesh)
    # per-device shard is batch/8
    assert x.sharding.shard_shape(x.shape)[0] == B // 8

    compiled = sup_step.lower(state, x, y, 1.0).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = ca.get('flops', 0.0)
    # cost_analysis is PER-DEVICE under SPMD: per-device batch is
    # 4096/8 = 512, i.e. 2x the bs-256 single-chip step (28.5 GFLOP,
    # BENCH_NOTES roofline table) within compiler-version slack
    assert 4.5e10 < flops < 7.5e10, flops
