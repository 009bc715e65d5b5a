"""Multi-host (DCN) data parallelism: a REAL 2-process jax.distributed run
on localhost CPU. Each process owns 2 virtual devices (4 global); the
gradient psum crosses the process boundary — the single-host ICI story
(test_parallel/test_shardmap) extended over the reference's empty DCN slot
(SURVEY.md §1/§2: jax.distributed.initialize, parallel/mesh.py:45-55).

The 2-process run must produce the same loss and post-step parameters as a
single-process run over the same GLOBAL batch (DP semantics are mesh-shape
independent)."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r'''
import sys
import jax
jax.config.update('jax_platforms', 'cpu')
pid, nproc, port, out = (int(sys.argv[1]), int(sys.argv[2]), sys.argv[3],
                         sys.argv[4])
sys.path.insert(0, {repo!r})
if nproc > 1:
    from gltvae.parallel.mesh import initialize_multihost
    initialize_multihost(coordinator_address='127.0.0.1:' + port,
                         num_processes=nproc, process_id=pid)

import numpy as np
import jax.numpy as jnp
from gltvae.config import ModelConfig, TrainConfig
from gltvae.models.ccvae import CCVAE
from gltvae.parallel.mesh import create_mesh
from gltvae.parallel.dp import (make_parallel_train_steps, shard_state,
                                shard_batch)
from gltvae.train.state import create_train_state

assert jax.process_count() == nproc, (jax.process_count(), nproc)
GLOBAL_B = 8
cfg = ModelConfig(image_size=16, z_dim=12, y_dim=6, enc_features=(8, 8),
                  enc_hidden=16, dec_features=(16, 8))
tc = TrainConfig(batch_size=GLOBAL_B, classifier_mc_samples=2)
model = CCVAE(cfg)
rng = np.random.RandomState(0)
mu = rng.rand(cfg.z_classify, cfg.y_dim).astype(np.float32)
state = create_train_state(model, tc, jax.random.key(0), mu_init=mu)
mesh = create_mesh()
state = shard_state(state, mesh)
sup, _ = make_parallel_train_steps(model, tc, mesh, donate=False)

# every process draws the same GLOBAL batch; shard_batch keeps the local
# slice its devices own (the Trainer convention for multi-host runs)
x = rng.randint(0, 256, (GLOBAL_B, 16, 16, 3)).astype(np.uint8)
y = (rng.rand(GLOBAL_B, 6) > 0.5).astype(np.float32)
xg, yg = shard_batch((x, y), mesh)

state, m = sup(state, xg, yg, 1.0)
loss = float(jax.device_get(m['loss']))

# the semi-sup mixed chunk (lax.cond-selected sup/unsup inside lax.scan)
# with its gradient psums crossing the PROCESS boundary — the dispatch
# the paper's sup=0.2/0.5 schedules ride
from gltvae.parallel.dp import (make_parallel_mixed_scan_train_step,
                                shard_stacked_batch)
mixed = make_parallel_mixed_scan_train_step(model, tc, mesh, donate=False)
xs = rng.randint(0, 256, (2, GLOBAL_B, 16, 16, 3)).astype(np.uint8)
ys = (rng.rand(2, GLOBAL_B, 6) > 0.5).astype(np.float32)
xsg, ysg = shard_stacked_batch((xs, ys), mesh)
state, mm = mixed(state, xsg, ysg, np.asarray([True, False]), 1.0)
mixed_loss = np.asarray(jax.device_get(mm['loss']))

if pid == 0:
    np.savez(out, loss=loss, mixed_loss=mixed_loss,
             mu=np.asarray(jax.device_get(state.params['mu'])),
             clf=np.asarray(
                 jax.device_get(state.params['classifier']['kernel'])))
'''


SHARDED_WORKER = r'''
import sys
import jax
jax.config.update('jax_platforms', 'cpu')
pid, nproc, port, out = (int(sys.argv[1]), int(sys.argv[2]), sys.argv[3],
                         sys.argv[4])
sys.path.insert(0, {repo!r})
if nproc > 1:
    from gltvae.parallel.mesh import initialize_multihost
    initialize_multihost(coordinator_address='127.0.0.1:' + port,
                         num_processes=nproc, process_id=pid)

import numpy as np
import jax.numpy as jnp
from gltvae.config import ModelConfig, TrainConfig
from gltvae.data.pipeline import ArrayDataset, BatchLoader
from gltvae.models.ccvae import CCVAE
from gltvae.parallel.mesh import create_mesh
from gltvae.parallel.dp import (make_parallel_train_steps,
                                make_parallel_mixed_scan_train_step,
                                shard_state, shard_batch,
                                shard_stacked_batch)
from gltvae.train.state import create_train_state

assert jax.process_count() == nproc
GLOBAL_B = 8

class CountingDataset:
    """Counts rows actually fetched/decoded by THIS process."""
    def __init__(self, ds):
        self.ds, self.rows = ds, 0
    def __len__(self):
        return len(self.ds)
    def fetch(self, idxs):
        self.rows += len(idxs)
        return self.ds.fetch(idxs)

rng = np.random.RandomState(7)
images = rng.randint(0, 256, (40, 16, 16, 3), dtype=np.uint8)
labels = (rng.rand(40, 6) > 0.5).astype(np.float32)
counted = CountingDataset(ArrayDataset(images, labels))
# host-sharded loader: identical seed-coordinated global stream on every
# process, but each fetches only its contiguous 1/N slice of every batch
loader = BatchLoader(counted, GLOBAL_B, seed=3,
                     shard=(pid, nproc) if nproc > 1 else None)

cfg = ModelConfig(image_size=16, z_dim=12, y_dim=6, enc_features=(8, 8),
                  enc_hidden=16, dec_features=(16, 8))
tc = TrainConfig(batch_size=GLOBAL_B, classifier_mc_samples=2)
model = CCVAE(cfg)
mu = np.random.RandomState(0).rand(cfg.z_classify, cfg.y_dim
                                   ).astype(np.float32)
state = create_train_state(model, tc, jax.random.key(0), mu_init=mu)
mesh = create_mesh()
state = shard_state(state, mesh)
sup, _ = make_parallel_train_steps(model, tc, mesh, donate=False)
mixed = make_parallel_mixed_scan_train_step(model, tc, mesh, donate=False)
local = nproc > 1

it = iter(loader)
x, y = next(it)
state, m = sup(state, shard_batch(x, mesh, local=local),
               shard_batch(y, mesh, local=local), 1.0)
loss = float(jax.device_get(m['loss']))

bx, by = zip(next(it), next(it))
xs, ys = shard_stacked_batch((np.stack(bx), np.stack(by)), mesh,
                             local=local)
state, mm = mixed(state, xs, ys, np.asarray([True, False]), 1.0)

# the host-sharding payoff: this process decoded only its 1/N share of
# the 3 global batches consumed above
assert counted.rows == 3 * GLOBAL_B // nproc, (counted.rows, nproc)

if pid == 0:
    np.savez(out, loss=loss,
             mixed_loss=np.asarray(jax.device_get(mm['loss'])),
             mu=np.asarray(jax.device_get(state.params['mu'])),
             clf=np.asarray(
                 jax.device_get(state.params['classifier']['kernel'])))
'''


def _free_port():
    with socket.socket() as s:
        s.bind(('127.0.0.1', 0))
        return s.getsockname()[1]


def _run(nproc, devices_per_proc, out, port, timeout=420, worker=None):
    code = (WORKER if worker is None else worker).format(repo=REPO)
    env = dict(os.environ)
    kept = [t for t in env.get('XLA_FLAGS', '').split()
            if 'xla_force_host_platform_device_count' not in t]
    env['XLA_FLAGS'] = ' '.join(
        kept + [f'--xla_force_host_platform_device_count={devices_per_proc}'])
    env['JAX_PLATFORMS'] = 'cpu'
    procs = [subprocess.Popen(
        [sys.executable, '-c', code, str(pid), str(nproc), str(port), out],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in range(nproc)]
    outs = [p.communicate(timeout=timeout)[0].decode() for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, f'worker rc={p.returncode}:\n{o[-3000:]}'


def test_two_process_dcn_matches_single_process(tmp_path):
    port = _free_port()
    out2 = str(tmp_path / 'two.npz')
    out1 = str(tmp_path / 'one.npz')
    _run(nproc=2, devices_per_proc=2, out=out2, port=port)
    _run(nproc=1, devices_per_proc=4, out=out1, port=_free_port())
    a, b = np.load(out1), np.load(out2)
    np.testing.assert_allclose(a['loss'], b['loss'], rtol=1e-5)
    np.testing.assert_allclose(a['mixed_loss'], b['mixed_loss'], rtol=1e-5)
    np.testing.assert_allclose(a['mu'], b['mu'], rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(a['clf'], b['clf'], rtol=1e-5, atol=1e-7)


def test_host_sharded_input_matches_and_halves_decode(tmp_path):
    """Host-sharded multi-host input (VERDICT r3 item 1): each of the 2
    processes decodes exactly GLOBAL_B/2 rows per batch (asserted inside
    the worker), and the post-step params match a single-process run
    decoding the full global batches — the sharded loaders reproduce the
    identical global arrays by construction, so the only delta is the
    cross-process gradient psum's float reduction order (same tolerance
    as test_two_process_dcn_matches_single_process)."""
    port = _free_port()
    out2 = str(tmp_path / 'two.npz')
    out1 = str(tmp_path / 'one.npz')
    _run(nproc=2, devices_per_proc=2, out=out2, port=port,
         worker=SHARDED_WORKER)
    _run(nproc=1, devices_per_proc=4, out=out1, port=_free_port(),
         worker=SHARDED_WORKER)
    a, b = np.load(out1), np.load(out2)
    np.testing.assert_allclose(a['loss'], b['loss'], rtol=1e-5)
    np.testing.assert_allclose(a['mixed_loss'], b['mixed_loss'], rtol=1e-5)
    np.testing.assert_allclose(a['mu'], b['mu'], rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(a['clf'], b['clf'], rtol=1e-5, atol=1e-7)
