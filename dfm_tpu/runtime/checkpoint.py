"""Checkpointing (orbax): periodic save, max-keep, auto-resume.

Equivalent of the reference's mmcv CheckpointHook + `--auto-resume`
(apis/train.py:308-318, checkpoint_config interval=1 max_keep_ckpts=10).

Checkpoints are saved as a Composite of two items so evaluation can
restore the model without knowing the optimizer pytree structure:
  * 'model': {step, params, batch_stats}
  * 'opt':   {opt_state}
"""

import os
from typing import Any, Optional

__all__ = ['CheckpointManager']


class CheckpointManager:
    def __init__(self, directory, max_keep=10):
        import orbax.checkpoint as ocp
        self._ocp = ocp
        self._dir = os.path.abspath(directory)
        os.makedirs(self._dir, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self._dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_keep, create=True),
            item_names=('model', 'opt'))

    def save(self, step: int, state: Any, force=False):
        """`state` is a runtime.train.TrainState (or anything with step /
        params / batch_stats / opt_state attributes)."""
        ocp = self._ocp
        if step == self.latest_step():
            return
        model = dict(step=state.step, params=state.params,
                     batch_stats=state.batch_stats)
        opt = dict(opt_state=state.opt_state)
        self._mgr.save(step, args=ocp.args.Composite(
            model=ocp.args.StandardSave(model),
            opt=ocp.args.StandardSave(opt)), force=force)
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore_model(self, params, batch_stats, step: Optional[int] = None):
        """Restore only the model item (for evaluation/inference)."""
        ocp = self._ocp
        step = step if step is not None else self.latest_step()
        if step is None:
            return None
        import numpy as np
        template = dict(step=np.zeros((), np.int32), params=params,
                        batch_stats=batch_stats)
        out = self._mgr.restore(step, args=ocp.args.Composite(
            model=ocp.args.StandardRestore(template)))
        return out['model']

    def restore(self, state_template: Any, step: Optional[int] = None):
        """Restore a full TrainState (for resume)."""
        ocp = self._ocp
        step = step if step is not None else self.latest_step()
        if step is None:
            return None
        model_t = dict(step=state_template.step,
                       params=state_template.params,
                       batch_stats=state_template.batch_stats)
        opt_t = dict(opt_state=state_template.opt_state)
        out = self._mgr.restore(step, args=ocp.args.Composite(
            model=ocp.args.StandardRestore(model_t),
            opt=ocp.args.StandardRestore(opt_t)))
        return state_template.replace(
            step=out['model']['step'], params=out['model']['params'],
            batch_stats=out['model']['batch_stats'],
            opt_state=out['opt']['opt_state'])
