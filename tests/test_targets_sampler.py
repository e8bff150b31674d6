"""IoUNegPiecewiseSampler equivalent (core/targets.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from dfm_tpu.core.targets import iou_neg_piecewise_sample


def test_piecewise_negative_sampling():
    n = 2048
    rng = np.random.RandomState(0)
    assigned = jnp.asarray(np.where(rng.rand(n) < 0.9, -1,
                                    rng.randint(0, 5, n)))
    ious = jnp.asarray(rng.rand(n) * 0.6, jnp.float32)
    w = iou_neg_piecewise_sample(assigned, ious, jax.random.PRNGKey(0),
                                 num_expected_neg=256)
    sel = np.asarray(w) > 0
    # only negatives selected, within budget
    assert sel.sum() <= 256
    assert (np.asarray(assigned)[sel] == -1).all()
    # hard band [0.1, 0.55) dominates per the 0.8/0.2 split
    hard = sel & (np.asarray(ious) >= 0.1) & (np.asarray(ious) < 0.55)
    easy = sel & (np.asarray(ious) < 0.1)
    assert hard.sum() > easy.sum()
    assert (np.asarray(ious)[sel] < 0.55).all()
