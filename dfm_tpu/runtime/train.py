"""Training engine: train state + jitted data-parallel train step.

TPU-native replacement for the reference's mmcv runner stack
(apis/train.py:180-319: DDP wrap, OptimizerHook grad-clip, LR hooks):
one jitted `train_step` over a data-parallel mesh; gradient averaging,
grad-clip (L2, 35 as the DfM config) and the LIGA schedule live inside
optax; BatchNorm stats update through the mutable 'batch_stats'
collection and are globally synced by the sharded batch reduction.
"""

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

__all__ = ['TrainState', 'create_train_state', 'make_train_step',
           'make_optimizer']


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats=None):
        updates, new_opt_state = self.tx.update(grads, self.opt_state,
                                                self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1, params=new_params,
            batch_stats=(new_batch_stats if new_batch_stats is not None
                         else self.batch_stats),
            opt_state=new_opt_state)


def make_optimizer(learning_rate, weight_decay=1e-4, grad_clip_norm=35.0,
                   frozen_prefixes=()):
    """AdamW + global-norm clip (reference optimizer_config:
    grad_clip max_norm=35 norm_type=2, AdamW wd=1e-4).

    frozen_prefixes: top-level param-tree keys that receive NO updates
    (and no weight decay) — the reference's requires_grad_(False)
    teacher freeze (detectors/dfm.py:72-75); e.g. ('lidar_teacher',).
    """
    tx = optax.chain(
        optax.clip_by_global_norm(grad_clip_norm),
        optax.adamw(learning_rate, weight_decay=weight_decay))
    if not frozen_prefixes:
        return tx

    def labels(params):
        return {k: ('frozen' if k in frozen_prefixes else 'train')
                for k in params}

    return optax.multi_transform(
        {'train': tx, 'frozen': optax.set_to_zero()}, labels)


def create_train_state(variables, tx):
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables['params'],
        batch_stats=variables.get('batch_stats', {}),
        opt_state=tx.init(variables['params']),
        tx=tx)


def make_train_step(model, loss_fn: Callable, donate: bool = True,
                    model_args_fn: Optional[Callable] = None):
    """Build the jitted train step.

    Args:
        model: flax module with apply(variables, *inputs, train=True).
        loss_fn: (outputs, batch, rng) -> (total, dict) — e.g. a closure
            over dfm_loss with its config.
        model_args_fn: batch -> positional model inputs. Defaults to the
            DfM convention (img, meta); other families supply theirs via
            runtime/adapters.py.

    Returns:
        train_step(state, batch, rng) -> (state, metrics dict).
        Under a data-parallel mesh, shard `batch` on dim 0 and replicate
        `state`; XLA inserts the gradient all-reduce.
    """
    if model_args_fn is None:
        model_args_fn = lambda batch: (batch['img'], batch['meta'])

    def compute_loss(params, batch_stats, batch, rng):
        outputs, mutated = model.apply(
            {'params': params, 'batch_stats': batch_stats},
            *model_args_fn(batch), train=True,
            mutable=['batch_stats'],
            rngs={'dropout': jax.random.fold_in(rng, 1)})
        total, losses = loss_fn(outputs, batch, rng)
        return total, (losses, mutated['batch_stats'])

    def train_step(state, batch, rng):
        (total, (losses, new_bs)), grads = jax.value_and_grad(
            compute_loss, has_aux=True)(
                state.params, state.batch_stats, batch, rng)
        new_state = state.apply_gradients(grads, new_batch_stats=new_bs)
        metrics = dict(loss=total, **losses)
        metrics['grad_norm'] = optax.global_norm(grads)
        return new_state, metrics

    if donate:
        return jax.jit(train_step, donate_argnums=(0,))
    return jax.jit(train_step)
