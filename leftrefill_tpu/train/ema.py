"""Exponential moving average of parameters.

Behavioural reference: /root/reference/ldm/modules/ema.py:5-80 (LitEma) —
buffer-based EMA with warmup decay ``min(decay, (1+n)/(10+n))``, plus the
store/restore context used by ema_scope (ddpm.py:205-218).  LeftRefill ships
with ``use_ema: False``, but the capability is part of the framework surface.

Functional: EMAState is a pytree (ema params + update count); ``update`` is
jittable and composes with the train step.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

Params = Any


@dataclasses.dataclass
class EMAState:
    ema_params: Params
    num_updates: jax.Array  # int32 scalar
    decay: float = 0.9999

    def swap(self, params: Params) -> tuple[Params, Params]:
        """ema_scope store/restore: returns (ema for eval, original kept)."""
        return self.ema_params, params


jax.tree_util.register_pytree_node(
    EMAState,
    lambda s: ((s.ema_params, s.num_updates), s.decay),
    lambda decay, ch: EMAState(ch[0], ch[1], decay),
)


def init_ema(params: Params, decay: float = 0.9999) -> EMAState:
    return EMAState(
        ema_params=jax.tree_util.tree_map(jnp.asarray, params),
        num_updates=jnp.zeros((), jnp.int32),
        decay=decay,
    )


def update_ema(state: EMAState, params: Params) -> EMAState:
    """One EMA step with warmup decay (ema.py:32-34)."""
    n = state.num_updates + 1
    decay = jnp.minimum(state.decay, (1.0 + n) / (10.0 + n))
    new_ema = jax.tree_util.tree_map(
        lambda e, p: e * decay + (1.0 - decay) * p.astype(e.dtype),
        state.ema_params,
        params,
    )
    return EMAState(new_ema, n, state.decay)
