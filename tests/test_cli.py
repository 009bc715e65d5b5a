"""CLI config plumbing (train.py) — argument parsing and config
construction, including the 128px path and reference-default parity."""

import pytest

import train as cli


def test_defaults_match_reference():
    """configs.py:4-27 defaults: 75 epochs, z 45, lr 1e-4, bs 256,
    l1 0.2, learnable/inferred, sup sweep {1.0, 0.5, 0.2}."""
    a = cli.parse_args([])
    assert a.epochs == 75 and a.z_dim == 45 and a.lr == 1e-4
    assert a.batch_size == 256 and a.l1_reg == 0.2
    assert a.gate_type == 'learnable' and a.gate_subtype == 'inferred'
    assert a.sup == [1.0, 0.5, 0.2]
    assert a.do_test and not a.do_train


def test_short_flags():
    a = cli.parse_args(['-n', '10', '-bs', '64', '-lr', '0.001'])
    assert a.epochs == 10 and a.batch_size == 64 and a.lr == 0.001


def test_build_configs_64():
    a = cli.parse_args(['--compute-dtype', 'bfloat16'])
    m, t, d = cli.build_configs(a, sup=0.5)
    assert m.z_dim == 45 and m.y_dim == 18
    assert m.compute_dtype == 'bfloat16'
    assert t.perc_supervision == 0.5
    assert t.gating_temp_for(m) == 1.0   # learnable
    assert d.use_easy_labels


def test_build_configs_128():
    a = cli.parse_args(['--image-size', '128'])
    m, t, d = cli.build_configs(a, sup=1.0)
    assert m.image_size == 128 and m.y_dim == 40 and m.z_dim == 100
    assert not d.use_easy_labels


def test_fixed_gate_temp():
    a = cli.parse_args(['--gate-type', 'fixed', '--gate-subtype', 'one-one'])
    m, t, _ = cli.build_configs(a, sup=1.0)
    assert t.gating_temp_for(m) == 0.3   # gated_ccvae.py:474


def test_invalid_choice_rejected():
    with pytest.raises(SystemExit):
        cli.parse_args(['--gate-subtype', 'bogus'])


def test_synthetic_loaders_modes():
    a = cli.parse_args(['--synthetic', '-bs', '8'])
    _, t, d = cli.build_configs(a, sup=0.5)
    loaders, mu, local = cli.make_loaders(a, d, t, y_dim=18)
    assert set(loaders) == {'sup', 'unsup', 'valid', 'test'}
    assert mu.shape == (18, 18)
    assert local is False                 # single-process: global batches


def test_partial_dist_flags_rejected():
    """A partial --dist-* set would silently run single-host (coordinator
    without num-processes) or crash inside jax.distributed (no process-id);
    main() must reject it up front."""
    with pytest.raises(SystemExit, match='dist'):
        cli.main(['--dist-coordinator', 'localhost:1234', '--synthetic'])
    with pytest.raises(SystemExit, match='dist'):
        cli.main(['--dist-num-processes', '2', '--synthetic'])


def test_persistent_compilation_cache_populates(tmp_path):
    """enable_persistent_compilation_cache points jax at an on-disk
    executable cache; a fresh compile must leave an entry there (the
    cross-process reload is what cuts CLI cold-start from minutes to
    seconds on the TPU tunnel)."""
    import os
    import jax
    import jax.numpy as jnp
    from gltvae.utils.compile_cache import (
        enable_persistent_compilation_cache)
    d = enable_persistent_compilation_cache(str(tmp_path / 'xla'),
                                            min_compile_time_secs=0.0)
    try:
        # program must be unique within the test session: an HLO already
        # compiled earlier is served from jax's in-memory cache and never
        # reaches the persistent layer
        def f(x):
            return (x @ (x + 0.12345)).sum() * 7.654321
        jax.jit(f)(jnp.ones((123, 123))).block_until_ready()
        assert os.listdir(d), 'no cache entry written'
    finally:
        jax.config.update('jax_compilation_cache_dir', None)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)


def test_128px_configs_carry_gate_subtype():
    """celeba128 must thread gate_subtype through: a fixed/one-one 128px
    run previously trained a fixed/inferred model under the one-one dir
    name (mu = co-occurrence instead of identity)."""
    a = cli.parse_args(['--image-size', '128', '--gate-type', 'fixed',
                        '--gate-subtype', 'one-one'])
    m, _, _ = cli.build_configs(a, sup=1.0)
    assert m.gate_type == 'fixed' and m.gate_subtype == 'one-one'
    assert m.y_dim == 40


def test_model_config_roundtrip(tmp_path):
    """train.py records model_config.json; tools rebuild the exact
    ModelConfig from it (incl. non-default z_dim — the round-2 advisor's
    opaque-restore-error case)."""
    import dataclasses
    from gltvae.config import (ModelConfig, save_model_config,
                               load_model_config)
    cfg = ModelConfig(z_dim=60, gate_type='fixed', gate_subtype='one-one')
    save_model_config(cfg, str(tmp_path))
    back = load_model_config(str(tmp_path))
    assert back == cfg
    assert dataclasses.asdict(back)['z_dim'] == 60
    assert load_model_config(str(tmp_path / 'nope')) is None


def test_resolve_model_config_flag_semantics(tmp_path, capsys):
    """tools.infer.resolve_model_config: --z-dim must be honored at any
    --image-size (it was silently dropped for 128px runs without a
    recorded config), defaulted flags must not print conflict notes
    against a recorded config, and an explicitly conflicting flag must."""
    import argparse
    from gltvae.config import ModelConfig, celeba128, save_model_config
    from tools.infer import resolve_model_config

    def ns(checkpoint, **kw):
        base = dict(checkpoint=checkpoint, image_size=None, gate_type=None,
                    gate_subtype=None, z_dim=None)
        base.update(kw)
        return argparse.Namespace(**base)

    # no recorded config: z_dim override applies at 128px too
    cfg = resolve_model_config(ns(str(tmp_path / 'none'),
                                  image_size=128, z_dim=100))
    assert cfg.z_dim == 100
    assert cfg.image_size == 128
    # defaults-only reconstruction matches ModelConfig defaults
    assert resolve_model_config(ns(str(tmp_path / 'none'))) == ModelConfig()

    # recorded config wins; defaulted flags stay silent
    rec = ModelConfig(z_dim=60, gate_type='fixed', gate_subtype='one-one')
    save_model_config(rec, str(tmp_path))
    capsys.readouterr()
    assert resolve_model_config(ns(str(tmp_path))) == rec
    assert 'note:' not in capsys.readouterr().out
    # an explicitly conflicting flag is noted (and still overridden)
    assert resolve_model_config(ns(str(tmp_path), z_dim=45)) == rec
    assert 'z-dim=60' in capsys.readouterr().out


def test_render_cli_smoke(tmp_path, monkeypatch):
    """tools/render.py: traversal PNG from a fresh init (the north-star
    renderer's user-facing surface; previously never CLI-driven in
    tests)."""
    import sys
    out = str(tmp_path / 'trav.png')
    monkeypatch.setattr(sys, 'argv',
                        ['render.py', '--mode', 'traversal', '--out', out,
                         '--dims', '27', '28', '--n-steps', '3'])
    import importlib
    render = importlib.import_module('tools.render')
    render.main()
    import os
    assert os.path.getsize(out) > 1000


def test_prng_flag_plumbs_to_train_config():
    a = cli.parse_args(['--prng', 'rbg'])
    _, t, _ = cli.build_configs(a, sup=1.0)
    assert t.prng_impl == 'rbg'
    # default stays the bit-reproducible parity impl
    a = cli.parse_args([])
    _, t, _ = cli.build_configs(a, sup=1.0)
    assert t.prng_impl == 'threefry'
    with pytest.raises(SystemExit):
        cli.parse_args(['--prng', 'philox'])


def test_result_json_test_only_preserves_history(tmp_path):
    """A --do-test-only rerun must refresh test_accuracy without erasing
    the training history/throughput the original run recorded (consumed
    by tools/parity_head2head.py)."""
    import json
    import os
    d = str(tmp_path)
    cli._write_result_json(
        d, {'history': [1, 2], 'best_val_accuracy': 0.7,
            'images_per_sec': 123.0}, 0.61)
    cli._write_result_json(d, None, 0.59)     # test-only rerun
    with open(os.path.join(d, 'result.json')) as f:
        payload = json.load(f)
    assert payload['test_accuracy'] == 0.59
    assert payload['history'] == [1, 2]
    assert payload['images_per_sec'] == 123.0
    # a no-op invocation (nothing ran) leaves the record untouched
    cli._write_result_json(d, None, None)
    with open(os.path.join(d, 'result.json')) as f:
        assert json.load(f) == payload


def test_platform_flag_on_every_jax_cli():
    """--platform {auto,cpu,tpu,axon} must exist on every CLI that can
    touch the jax backend: site hooks on some hosts force the TPU
    platform regardless of JAX_PLATFORMS, so config-level override is
    the only way to run the toolchain TPU-less (utils/platform.py)."""
    assert cli.parse_args(['--synthetic']).platform == 'auto'
    assert cli.parse_args(['--platform', 'cpu']).platform == 'cpu'

    from tools.infer import parse_args as infer_args
    a = infer_args(['--checkpoint', 'c', '--images', 'i', '--output', 'o',
                    '--platform', 'cpu'])
    assert a.platform == 'cpu'
    from tools.export_serving import parse_args as serve_args
    assert serve_args(['--checkpoint', 'c', '--output', 'o',
                       '--platform', 'cpu']).platform == 'cpu'
    from tools.export_h5 import parse_args as h5_args
    assert h5_args(['--checkpoint', 'c', '--out', 'o',
                    '--platform', 'cpu']).platform == 'cpu'


def test_apply_platform_is_noop_on_auto(monkeypatch):
    """'auto' must not touch jax.config (the default backend choice)."""
    from gltvae.utils.platform import apply_platform
    calls = []
    import jax
    monkeypatch.setattr(jax.config, 'update',
                        lambda *a: calls.append(a))
    apply_platform('auto')
    assert calls == []
    apply_platform('cpu')
    assert calls == [('jax_platforms', 'cpu')]


def test_head2head_compare_missing_accuracy_is_na():
    """A leg with no parseable test accuracy must yield parity=None
    (n/a), never a delta computed against 0.0."""
    from tools.parity_head2head import compare
    ref = {'test_accuracy': None, 'val_accuracy': [0.5, 0.6]}
    glt = {'test_accuracy': 0.72, 'val_accuracy': [0.5, 0.61]}
    c = compare(ref, glt, tol=0.06)
    assert c['parity'] is None and c['test_delta'] is None
    both = compare({'test_accuracy': 0.70, 'val_accuracy': [0.6]},
                   glt, tol=0.06)
    assert both['parity'] is True and abs(both['test_delta'] - 0.02) < 1e-9


def test_bench_init_watchdog_emits_error_json():
    """bench.py must not hang forever on a dead backend: with an
    already-expired deadline it prints one self-describing JSON error
    line (schema fields present, value null) and exits nonzero."""
    import json as _json
    import os
    import subprocess
    import sys
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, os.path.join(repo, 'bench.py'),
         '--platform', 'cpu', '--init-timeout', '0.001'],
        capture_output=True, text=True, timeout=120)
    assert r.returncode != 0
    line = [l for l in r.stdout.splitlines() if l.startswith('{')][-1]
    out = _json.loads(line)
    assert out['value'] is None and out['vs_baseline'] is None
    assert 'error' in out and out['unit'] == 'images/sec'


def test_head2head_train_seed_plumbing():
    """--train-seed must override the training RNG for both legs while
    leaving the corpus seed (--seed) alone, and must suffix the reference
    artifact name so seeds never clobber each other."""
    from tools.parity_head2head import parse_args, train_seed
    a = parse_args(['--workdir', 'w'])
    assert train_seed(a) == 0 and a.train_seed is None
    a = parse_args(['--workdir', 'w', '--train-seed', '3'])
    assert train_seed(a) == 3 and a.seed == 0


def test_test_only_rerun_adopts_recorded_config(tmp_path):
    """A --do-test-only rerun with defaulted flags must adopt the run
    dir's model_config.json (non-default z_dim here) rather than clobber
    it and fail the Orbax restore with a template mismatch."""
    import json as _json
    import os
    base = ['--synthetic', '--synthetic-n', '16', '--sup', '1.0',
            '-bs', '8', '--epochs', '1', '--platform', 'cpu',
            '--output-dir', str(tmp_path), '--no-compilation-cache']
    cli.main(base + ['--do-train', '--z-dim', '24'])
    rec_path = tmp_path / 'params_1.0_learnable' / 'model_config.json'
    with open(rec_path) as f:
        assert _json.load(f)['z_dim'] == 24
    # rerun WITHOUT --z-dim: must adopt z_dim=24 from the record
    results = cli.main(base)
    assert 0.0 <= results[1.0] <= 1.0
    with open(rec_path) as f:
        assert _json.load(f)['z_dim'] == 24     # record survived
