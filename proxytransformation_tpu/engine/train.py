"""Training machinery: optimizer, schedule, jitted train/eval steps.

Replicates the reference recipe (reference:
configs/grounding/proxy-tiblock33-gs12-wbias-ddr0.6-clip.py:204-221,
tools/train.py:94-105): AdamW lr 5e-4 wd 5e-4, param-wise lr multipliers
(text_encoder ×0, decoder ×0.1), grad-norm clip 10, MultiStepLR
milestones [8, 11] γ=0.1 over 12 epochs.

TPU-first: one jitted train step over a `data`-sharded batch with
replicated params — XLA inserts the gradient all-reduce (the reference's
DDP/NCCL). BatchNorm statistics are computed over the *global* batch
under jit semantics (sync-BN; the reference's per-GPU local BN is an
artifact of DDP, not a design choice).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    # exponential-moving-average weights (reference ema.py:123-189);
    # None unless the EMA hook is enabled (create_train_state with_ema)
    ema_params: Any = None

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


def build_lr_schedule(base_lr: float, steps_per_epoch: int,
                      max_epochs: int = 12,
                      milestones: Sequence[int] = (8, 11),
                      gamma: float = 0.1) -> optax.Schedule:
    """MultiStepLR by epoch (reference configs/...clip.py:216-221)."""
    boundaries = {m * steps_per_epoch: gamma for m in milestones}
    return optax.piecewise_constant_schedule(base_lr, boundaries)


def _label_params(params: Dict) -> Dict:
    """Param groups mirroring the reference paramwise_cfg
    (configs/...clip.py:208-212) plus the frozen 2D stem/stage1
    (frozen_stages=1, configs/...clip.py:36)."""

    def label(path: Tuple[str, ...]) -> str:
        parts = [getattr(p, 'key', str(p)) for p in path]
        if parts and parts[0] == 'text_encoder':
            return 'frozen'
        if parts and parts[0] == 'backbone' and len(parts) > 1 and (
                parts[1] in ('conv1', 'bn1') or
                parts[1].startswith('layer1_')):
            return 'frozen'
        if parts and parts[0] == 'decoder':
            return 'decoder'
        return 'default'

    return jax.tree_util.tree_map_with_path(lambda p, _: label(p), params)


def build_optimizer(params, base_lr: float = 5e-4,
                    weight_decay: float = 5e-4,
                    decoder_lr_mult: float = 0.1,
                    clip_norm: float = 10.0,
                    schedule: Optional[optax.Schedule] = None):
    """AdamW + lr multipliers + global-norm clipping."""
    sched = schedule or (lambda step: base_lr)

    def adamw(mult):
        return optax.chain(
            optax.clip_by_global_norm(clip_norm),
            optax.scale_by_adam(),
            optax.add_decayed_weights(weight_decay),
            optax.scale_by_learning_rate(
                lambda step: sched(step) * mult))

    labels = _label_params(params)
    tx = optax.multi_transform(
        {
            'default': adamw(1.0),
            'decoder': adamw(decoder_lr_mult),
            'frozen': optax.set_to_zero(),
        }, labels)
    return tx


def create_train_state(model, variables, tx,
                       with_ema: bool = False) -> TrainState:
    params = variables['params']
    return TrainState(step=jnp.zeros((), jnp.int32),
                      params=params,
                      batch_stats=variables.get('batch_stats', {}),
                      opt_state=tx.init(params),
                      ema_params=(jax.tree_util.tree_map(jnp.copy, params)
                                  if with_ema else None))


def make_train_step(model, tx, ema=None) -> Callable:
    """One optimizer step; jit (optionally with shardings) at call site.

    `ema`: optional `models.misc.ExpMomentumEMA` — when given (and the
    state was created `with_ema=True`), the step also advances the EMA
    weight average (the reference's opt-in ExpMomentumEMA hook,
    reference models/layers/ema.py:123-189)."""

    def train_step(state: TrainState, batch: Dict, rng) -> Tuple[TrainState,
                                                                 Dict]:
        dropout_rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            out, mutated = model.apply(
                {'params': params, 'batch_stats': state.batch_stats},
                batch, mode='loss', train=True, mutable=['batch_stats'],
                rngs={'dropout': dropout_rng})
            total = sum(jax.tree_util.tree_leaves(out))
            return total, (out, mutated)

        (total, (losses, mutated)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema_params = state.ema_params
        if ema is not None and ema_params is not None:
            ema_params = ema.update(ema_params, params, state.step)
        new_state = state.replace(step=state.step + 1, params=params,
                                  opt_state=opt_state,
                                  batch_stats=mutated['batch_stats'],
                                  ema_params=ema_params)
        metrics = dict(losses)
        metrics['total_loss'] = total
        metrics['grad_norm'] = optax.global_norm(grads)
        return new_state, metrics

    return train_step


def make_eval_step(model) -> Callable:

    def eval_step(state: TrainState, batch: Dict) -> Dict:
        return model.apply(
            {'params': state.params, 'batch_stats': state.batch_stats},
            batch, mode='predict', train=False)

    return eval_step
