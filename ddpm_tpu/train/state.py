"""Train state: parameters, optimizer, EMA — one pytree, one jitted update.

The reference splits this across torch objects (Adam, LambdaLR warmup,
shadow-dict EMA, DDP; ddpm_torch/utils/train.py). Here the whole training
state is a single pytree so the entire update — loss, grads, clip, Adam,
LR warmup, EMA — is one fused XLA program with donated buffers.

Optimizer parity (ddpm_torch/train.py:128-132): Adam(lr, beta1, beta2, eps)
with per-update LR multiplier ``min((step + 1) / warmup, 1)`` and global-norm
gradient clipping at ``grad_norm`` (utils/train.py:159-161).

EMA parity (utils/train.py:300-305): decay_t = min(decay, (1 + n) / (10 + n))
where n counts completed updates, applied to all trainable params.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

__all__ = ["TrainState", "make_optimizer", "warmup_schedule", "DummyScheduler"]


def warmup_schedule(base_lr: float, warmup: int, stride: int = 1) -> optax.Schedule:
    """LambdaLR-equivalent: lr * min((t+1)/warmup, 1) at update index t.

    ``stride`` quantizes t to epochs (t -> t // stride) for schedulers the
    reference steps once per epoch rather than per update — the toy
    trainer's warmup (train_toy.py:21,93-95 steps LambdaLR at epoch end,
    toy/toy_utils.py:92-93)."""
    if warmup <= 0:
        return optax.constant_schedule(base_lr)

    def schedule(count):
        return base_lr * jnp.minimum((count // stride + 1.0) / warmup, 1.0)

    return schedule


def make_optimizer(
    lr: float,
    grad_norm: Optional[float] = 1.0,
    warmup: int = 0,
    beta1: float = 0.9,
    beta2: float = 0.999,
    eps: float = 1e-8,
    warmup_stride: int = 1,
) -> optax.GradientTransformation:
    parts = []
    if grad_norm is not None and grad_norm > 0:
        parts.append(optax.clip_by_global_norm(grad_norm))
    parts.append(
        optax.inject_hyperparams(optax.adam)(
            learning_rate=warmup_schedule(lr, warmup, warmup_stride),
            b1=beta1, b2=beta2, eps=eps,
        )
    )
    return optax.chain(*parts)


@struct.dataclass
class TrainState:
    """Complete training state; a single device-resident pytree."""

    step: jnp.ndarray  # () int32 — number of completed optimizer updates
    params: Any
    opt_state: Any
    ema_params: Any
    # grad accumulation buffer (zeros-like params) and micro-step counter;
    # present only when num_accum > 1 to avoid wasting HBM otherwise
    grad_accum: Any = None
    accum_step: jnp.ndarray = None  # () int32
    tx: optax.GradientTransformation = struct.field(pytree_node=False, default=None)
    ema_decay: float = struct.field(pytree_node=False, default=0.9999)
    num_accum: int = struct.field(pytree_node=False, default=1)

    @classmethod
    def create(
        cls,
        params: Any,
        tx: optax.GradientTransformation,
        ema_decay: float = 0.9999,
        use_ema: bool = True,
        num_accum: int = 1,
    ) -> "TrainState":
        opt_state = tx.init(params)
        ema_params = jax.tree.map(jnp.copy, params) if use_ema else None
        grad_accum = (
            jax.tree.map(jnp.zeros_like, params) if num_accum > 1 else None
        )
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=opt_state,
            ema_params=ema_params,
            grad_accum=grad_accum,
            accum_step=jnp.zeros((), jnp.int32) if num_accum > 1 else None,
            tx=tx,
            ema_decay=ema_decay,
            num_accum=num_accum,
        )

    def _ema_update(self, new_params, step):
        """EMA with the reference's warmup: min(decay, (1+n)/(10+n)).

        The reference increments its update counter BEFORE computing the
        decay (utils/train.py:300-305), so on the first update n=1 and
        decay=2/11; ``step`` here still counts completed updates, hence +1.
        """
        if self.ema_params is None:
            return None
        n = step.astype(jnp.float32) + 1.0
        decay = jnp.minimum(self.ema_decay, (1.0 + n) / (10.0 + n))
        return jax.tree.map(
            lambda e, p: decay * e + (1.0 - decay) * p, self.ema_params, new_params
        )

    def apply_gradients(self, grads) -> "TrainState":
        """One optimizer update from (already accumulated/averaged) grads."""
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        new_ema = self._ema_update(new_params, self.step)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            ema_params=new_ema,
        )

    def accumulate_gradients(self, grads) -> "TrainState":
        """Micro-batch path: buffer grads; apply every ``num_accum``-th call.

        Mirrors utils/train.py:148-165 — loss there is pre-divided by
        num_accum, so here each micro-grad contributes grads/num_accum and the
        update fires when the buffer holds the full-batch average.

        Branchless on purpose: the optimizer/EMA update is computed every
        micro-step and per-leaf ``where``-selected against the carried state.
        An earlier ``lax.cond(do_update, do_buffer)`` version duplicated the
        whole update graph into both branches, which blew XLA compile time
        from ~4 min to >30 min for the CelebA-HQ 256^2 step on a v5e; the
        wasted speculative update is a few ms of elementwise parameter
        traffic per micro-step — noise next to the UNet fwd+bwd.
        """
        assert self.num_accum > 1 and self.grad_accum is not None
        scale = 1.0 / self.num_accum
        acc = jax.tree.map(lambda a, g: a + scale * g, self.grad_accum, grads)
        is_update = (self.accum_step + 1) % self.num_accum == 0

        updated = self.apply_gradients(acc)

        def sel(u, o):
            return jnp.where(is_update, u, o)

        return self.replace(
            step=sel(updated.step, self.step),
            params=jax.tree.map(sel, updated.params, self.params),
            opt_state=jax.tree.map(sel, updated.opt_state, self.opt_state),
            ema_params=(
                None
                if self.ema_params is None
                else jax.tree.map(sel, updated.ema_params, self.ema_params)
            ),
            grad_accum=jax.tree.map(lambda a: sel(jnp.zeros_like(a), a), acc),
            accum_step=self.accum_step + 1,
        )


class DummyScheduler:
    """No-op LR scheduler stand-in for API parity with the reference
    (ddpm_torch/utils/train.py:16-26). In this framework the learning-rate
    schedule is a pure function of ``TrainState.step`` baked into the optax
    chain (``warmup_schedule``), so there is nothing to step — this class
    exists so reference-style orchestration code ports cleanly."""

    def init(self, *a, **k):
        return None

    def step(self, *a, **k):
        return None

    def state_dict(self):
        return {}

    def load_state_dict(self, _):
        return None
