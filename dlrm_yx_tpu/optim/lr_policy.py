"""LR schedule: linear warmup -> freeze -> quadratic polynomial decay ->
freeze at floor.

Behavioral parity with ``LRPolicyScheduler`` in
``/root/reference/dlrm_s_pytorch.py:188-222`` including its quirks:
  * step_count is 1-based (torch's _LRScheduler calls step() once at
    construction), so training iteration k (0-based) sees step_count = k+1;
  * warmup scale at step s is s/W, so the peak reached is (W-1)/W — between
    warmup and decay the lr FREEZES at that last warmup value (when
    num_decay_steps > 0) rather than at base_lr;
  * decay scale is ((ND - (s - DS)) / ND)^2 with an absolute floor of 1e-7;
  * after decay the lr freezes at the last decayed value;
  * with num_decay_steps == 0 the lr is just base_lr (no adjustment).

Implemented as a pure jittable function of the step counter.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

MIN_LR = 1e-7


@dataclasses.dataclass(frozen=True)
class LRPolicy:
    base_lr: float
    num_warmup_steps: int = 0
    decay_start_step: int = 0
    num_decay_steps: int = 0

    def __post_init__(self):
        if 0 < self.decay_start_step < self.num_warmup_steps:
            raise ValueError("warmup must finish before decay starts")

    def __call__(self, iteration):
        """lr at 0-based training iteration (jnp or python int)."""
        s = jnp.asarray(iteration, jnp.float32) + 1.0  # torch step_count
        w = float(self.num_warmup_steps)
        ds = float(self.decay_start_step)
        nd = float(self.num_decay_steps)
        base = float(self.base_lr)

        if self.num_decay_steps == 0 and self.num_warmup_steps == 0:
            return jnp.full_like(s, base)

        warm = base * (s / w if w > 0 else 1.0)
        last_warm = base * ((w - 1.0) / w) if w > 0 else base
        decayed = jnp.maximum(MIN_LR, base * ((nd - (s - ds)) / nd) ** 2) if nd > 0 else base
        last_decay = max(MIN_LR, base * (1.0 / nd) ** 2) if nd > 0 else base

        lr = jnp.where(
            s < w,
            warm,
            jnp.where(
                (nd > 0) & (s >= ds) & (s < ds + nd),
                decayed,
                jnp.where(
                    nd > 0,
                    jnp.where(s < ds, last_warm, last_decay),
                    base,
                ),
            ),
        )
        return lr
