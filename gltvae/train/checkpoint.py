"""Orbax checkpointing of the FULL train state (params + Adam moments +
step + PRNG key + μ) — bit-exact training resume, which the reference
cannot do (it saves only model weights; gated_ccvae.py:388-419,
SURVEY.md §5).

Also exports the learned gating matrix in the reference's artifact format
(learned_gating_matrix_{id}.npy + labeled .csv, gated_ccvae.py:395-401)
so the reference's Quantitative_analysis workflow consumes our runs
unchanged.

Compatibility: the opt_state pytree follows the CURRENT optimizer
(train/state.py::keras_adam, a bare ScaleByAdamState). Checkpoints written
by earlier builds that used optax.adam's chain tuple do not restore —
StandardRestore fails on the tree-structure mismatch; retrain or export
weights via utils/h5_export and reimport.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
import orbax.checkpoint as ocp

from gltvae.train.state import TrainState


class CheckpointManager:
    """Thin wrapper over ocp.CheckpointManager with best/last slots
    (mirrors the reference's best/last naming)."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                best_fn=lambda m: m.get('val_accuracy', -np.inf),
                best_mode='max'),
        )

    def save(self, state: TrainState, metrics: Optional[dict] = None,
             wait: bool = False):
        step = int(state.step)
        self._mgr.save(step, args=ocp.args.StandardSave(state),
                       metrics=metrics or {})
        if wait:
            self._mgr.wait_until_finished()

    def restore(self, template: TrainState,
                step: Optional[int] = None) -> TrainState:
        self._mgr.wait_until_finished()
        if step is None:
            step = self._mgr.best_step()
            if step is None:
                step = self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f'no checkpoint in {self.directory}')
        return self._mgr.restore(step,
                                 args=ocp.args.StandardRestore(template))

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def all_steps(self):
        return list(self._mgr.all_steps())

    def delete(self, step: int):
        """Remove an existing checkpoint (e.g. a stale same-step save from
        a previous run into the same directory)."""
        self._mgr.wait_until_finished()
        self._mgr.delete(step)

    def best_step(self) -> Optional[int]:
        return self._mgr.best_step()

    def wait_until_finished(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.wait_until_finished()
        self._mgr.close()


def export_gating_matrix(mu, param_dir: str, model_id: str,
                         label_names: Sequence[str]):
    """Reference-format μ artifacts (gated_ccvae.py:395-401, 414-419)."""
    import pandas as pd
    os.makedirs(param_dir, exist_ok=True)
    mu = np.asarray(jax.device_get(mu))
    np.save(os.path.join(param_dir, f'learned_gating_matrix_{model_id}.npy'),
            mu)
    index = [f'z{i + 1}' for i in range(mu.shape[0])]
    pd.DataFrame(mu, index=index, columns=list(label_names)).to_csv(
        os.path.join(param_dir, f'learned_gating_matrix_{model_id}.csv'))
