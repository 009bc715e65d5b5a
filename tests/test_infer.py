"""Batch-inference CLI (tools/infer.py) and --init-from-h5 warm start.

Both consume the reference's real trained checkpoint, so these double as
end-to-end checks of the h5 interchange path on flagship shapes."""

import csv
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow


@pytest.fixture(scope='module')
def image_dir(tmp_path_factory):
    import PIL.Image
    d = tmp_path_factory.mktemp('imgs')
    rng = np.random.RandomState(0)
    for i in range(3):
        PIL.Image.fromarray(
            rng.randint(0, 255, (218, 178, 3), dtype=np.uint8)
        ).save(d / f'im{i}.jpg', quality=90)
    # arbitrary photo dirs include non-RGB modes — must decode to 3ch
    PIL.Image.fromarray(
        rng.randint(0, 255, (218, 178), dtype=np.uint8), mode='L'
    ).save(d / 'gray.png')
    PIL.Image.fromarray(
        rng.randint(0, 255, (218, 178, 4), dtype=np.uint8), mode='RGBA'
    ).save(d / 'rgba.png')
    return d


def test_infer_cli_from_reference_h5(image_dir, ref_param_dir, tmp_path):
    from tools.infer import main
    out = tmp_path / 'preds.csv'
    main(['--checkpoint', ref_param_dir, '--images', str(image_dir),
          '--output', str(out), '--batch-size', '4'])
    rows = list(csv.reader(open(out)))
    assert len(rows) == 6                       # header + 5 images
    assert rows[0][0] == 'image_id'
    assert len(rows[0]) == 1 + 18 * 2           # 18 hard + 18 prob columns
    for row in rows[1:]:
        hard = [int(v) for v in row[1:19]]
        probs = [float(v) for v in row[19:]]
        assert set(hard) <= {0, 1}
        assert all(0.0 <= p <= 1.0 for p in probs)
        assert hard == [int(p >= 0.5) for p in probs]
    # default path is deterministic: a rerun is byte-identical
    out2 = tmp_path / 'preds2.csv'
    main(['--checkpoint', ref_param_dir, '--images', str(image_dir),
          '--output', str(out2), '--batch-size', '4'])
    assert open(out).read() == open(out2).read()
    # stochastic protocol runs too (sampled z + gates at temp 0.3)
    out3 = tmp_path / 'preds3.csv'
    main(['--checkpoint', ref_param_dir, '--images', str(image_dir),
          '--output', str(out3), '--batch-size', '4', '--stochastic'])
    assert len(list(csv.reader(open(out3)))) == 6


def test_pil_backend_decodes_non_rgb_to_3ch(image_dir):
    """The PIL fallback path (hosts without cv2) must convert L/RGBA/P
    modes to RGB — np.stack would otherwise fail on mixed shapes."""
    from gltvae.data.celeba import ImageFolderDataset, _SplitData
    names = sorted(os.listdir(image_dir))
    ds = ImageFolderDataset(str(image_dir),
                            _SplitData(names, np.zeros((len(names), 1))),
                            64, backend='pil')
    x, _ = ds.fetch(np.arange(len(names)))
    assert x.shape == (len(names), 64, 64, 3) and x.dtype == np.uint8


def test_init_from_h5_warm_start(ref_param_dir):
    """Trainer.load_params drops the reference's trained weights into a
    live train state; a step then updates from exactly those values."""
    import jax
    from gltvae.config import ModelConfig, TrainConfig
    from gltvae.train.loop import Trainer
    from gltvae.utils.h5_import import load_reference_checkpoint

    trainer = Trainer(ModelConfig(),
                      TrainConfig(batch_size=4, classifier_mc_samples=2),
                      mu_init=np.eye(18, dtype=np.float32))
    ref = load_reference_checkpoint(ref_param_dir)
    trainer.load_params(ref)
    for a, b in zip(jax.tree.leaves(trainer.state.params),
                    jax.tree.leaves(ref)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    rng = np.random.RandomState(0)
    x = rng.randint(0, 256, (4, 64, 64, 3), dtype=np.uint8)
    y = (rng.rand(4, 18) > 0.5).astype(np.float32)
    state, m = trainer._sup_step(trainer.state, x, y, 1.0)
    assert np.isfinite(float(m['loss']))
    assert int(state.step) == 1


def test_export_h5_cli_roundtrip(tmp_path):
    """tools/export_h5.py: Orbax run dir -> reference-format .h5 set that
    h5_import reads back bit-identically (train->reference interchange)."""
    import jax
    from gltvae.config import ModelConfig, TrainConfig
    from gltvae.models.ccvae import CCVAE
    from gltvae.train.checkpoint import CheckpointManager
    from gltvae.train.state import create_train_state
    from gltvae.utils.h5_import import load_reference_checkpoint

    rng = np.random.RandomState(0)
    model = CCVAE(ModelConfig())
    mu = rng.rand(18, 18).astype(np.float32)
    state = create_train_state(model, TrainConfig(), jax.random.key(0),
                               mu_init=mu)
    run_dir = tmp_path / 'run'
    mgr = CheckpointManager(str(run_dir / 'orbax'))
    mgr.save(state, metrics={'val_accuracy': 0.5}, wait=True)
    mgr.close()

    from tools.export_h5 import main
    out = tmp_path / 'exported'
    main(['--checkpoint', str(run_dir), '--out', str(out)])
    assert (out / 'encoder_model_best.h5').exists()
    assert (out / 'learned_gating_matrix_best.csv').exists()

    back = load_reference_checkpoint(str(out))
    for a, b in zip(jax.tree.leaves(back),
                    jax.tree.leaves(jax.device_get(state.params))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_infer_cli_mesh_matches_single_device(image_dir, ref_param_dir,
                                              tmp_path):
    """--mesh (DP serving over the 8-device CPU mesh) must produce a CSV
    byte-identical to the single-device deterministic path: params are
    replicated, the batch shards over 'data', and predict_probs is
    deterministic given (params, x)."""
    from tools.infer import main
    single = tmp_path / 'single.csv'
    main(['--checkpoint', ref_param_dir, '--images', str(image_dir),
          '--output', str(single), '--batch-size', '8'])
    meshed = tmp_path / 'mesh.csv'
    main(['--checkpoint', ref_param_dir, '--images', str(image_dir),
          '--output', str(meshed), '--batch-size', '8', '--mesh'])
    assert open(single).read() == open(meshed).read()
    # batch size not divisible by the mesh fails fast with a clear error
    import pytest as _pytest
    with _pytest.raises(SystemExit, match='multiple of the'):
        main(['--checkpoint', ref_param_dir, '--images', str(image_dir),
              '--output', str(tmp_path / 'x.csv'), '--batch-size', '6',
              '--mesh'])
