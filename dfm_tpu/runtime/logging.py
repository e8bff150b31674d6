"""Metric logging + profiling hooks.

Equivalent of the reference's log_config (TextLoggerHook +
TensorboardLoggerHook every 50 iters,
configs/dfm/dfm_r34_1x8_kitti-3d-3class.py:394-397) and of a
`jax.profiler` trace hook (the reference has no in-repo tracer; SURVEY
§5 lists it as the TPU-native addition):

  * scalars always go to `<work_dir>/metrics.jsonl` (one JSON per log
    step — the analog of mmcv's .log.json, consumed by
    tools/analyze_logs.py);
  * TensorBoard event files are written when a SummaryWriter backend
    is importable (torch.utils.tensorboard in this image);
  * `profile_trace(work_dir, steps)` context captures an xplane trace
    viewable in TensorBoard's profile plugin / xprof.
"""

import contextlib
import json
import os
import time

__all__ = ['MetricsLogger', 'profile_trace']


class MetricsLogger:
    """JSONL + (optional) TensorBoard scalar logger."""

    def __init__(self, work_dir, use_tensorboard=True):
        os.makedirs(work_dir, exist_ok=True)
        self.jsonl_path = os.path.join(work_dir, 'metrics.jsonl')
        self._jsonl = open(self.jsonl_path, 'a')
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(
                    log_dir=os.path.join(work_dir, 'tf_logs'))
            except Exception:
                self._tb = None

    def log(self, step, scalars, prefix='train'):
        rec = dict(step=int(step), time=time.time(),
                   **{f'{prefix}/{k}': float(v)
                      for k, v in scalars.items()})
        self._jsonl.write(json.dumps(rec) + '\n')
        self._jsonl.flush()
        if self._tb is not None:
            for k, v in scalars.items():
                self._tb.add_scalar(f'{prefix}/{k}', float(v), int(step))

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()


@contextlib.contextmanager
def profile_trace(work_dir, enabled=True):
    """jax.profiler trace context; view with TensorBoard's profile
    plugin or xprof (`tensorboard --logdir <work_dir>/profile`)."""
    if not enabled:
        yield
        return
    import jax
    trace_dir = os.path.join(work_dir, 'profile')
    os.makedirs(trace_dir, exist_ok=True)
    with jax.profiler.trace(trace_dir):
        yield
