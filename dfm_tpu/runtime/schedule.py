"""Learning-rate schedules (optax).

`liga_schedule` mirrors the reference's LIGALrUpdaterHook
(mmdet3d/core/hook/liga_lrupdater_hook.py:10-88): cosine warmup
    k = ratio + (1 - ratio) * (1 - cos(pi * t / warmup_iters)) / 2
followed by step decay at given iteration boundaries.
"""

import numpy as np
import optax

__all__ = ['liga_schedule', 'step_schedule']


def liga_schedule(base_lr: float,
                  warmup_iters: int = 464,
                  warmup_ratio: float = 0.1,
                  decay_steps=(),
                  gamma: float = 0.1):
    """Cosine-warmup + step-decay schedule (iteration-based).

    Args:
        decay_steps: iterations at which lr is multiplied by `gamma`
            (convert epoch boundaries with steps_per_epoch upstream).
    """
    decay_steps = tuple(decay_steps)

    def fn(count):
        import jax.numpy as jnp
        t = jnp.asarray(count, jnp.float32)
        k = warmup_ratio + (1 - warmup_ratio) * \
            (1 - jnp.cos(np.pi * jnp.minimum(t, warmup_iters) /
                         max(warmup_iters, 1))) / 2
        warm = jnp.where(t < warmup_iters, k, 1.0)
        decay = 1.0
        for s in decay_steps:
            decay = decay * jnp.where(t >= s, gamma, 1.0)
        return base_lr * warm * decay

    return fn


def step_schedule(base_lr: float, decay_steps=(), gamma: float = 0.1):
    return liga_schedule(base_lr, warmup_iters=0, warmup_ratio=1.0,
                         decay_steps=decay_steps, gamma=gamma)
