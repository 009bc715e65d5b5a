"""MetricsLogger TensorBoard stream: scalar event files appear alongside
the CSV (SURVEY §5 metrics/observability plan; the reference has only a
free-text ./logs file)."""

import os

import numpy as np
import pytest

from gltvae.train.metrics import MetricsLogger


def test_tensorboard_events_written(tmp_path):
    pytest.importorskip('tensorflow')
    tb_dir = str(tmp_path / 'tb')
    m = MetricsLogger(path=str(tmp_path / 'metrics.csv'),
                      tensorboard_dir=tb_dir)
    for step in range(3):
        m.log(step, {'loss': float(step), 'elbo': -float(step)},
              epoch=0, supervised=1)
    m.flush()
    files = [f for root, _, fs in os.walk(tb_dir) for f in fs
             if 'tfevents' in f]
    assert files, f'no event files under {tb_dir}'
    # and the CSV stream is unaffected
    assert len(m.rows) == 3
    assert m.rows[1]['loss'] == 1.0


def test_no_tensorboard_dir_never_imports_writer(tmp_path):
    m = MetricsLogger(path=str(tmp_path / 'metrics.csv'))
    m.log(0, {'loss': np.float32(1.0)})
    m.flush()
    assert m._tb_writer is None
