"""LR / momentum schedules (optax schedules built from mmcv-style cfgs).

Capability parity with the reference's schedule configs
(reference: configs/_base_/schedules/cyclic_20e.py:4-17 — one-cycle cyclic
lr with target_ratio (10, 1e-4) and cyclic momentum; distill cfg step
policy ...to_bevdepth4d_r50.py:345-351; BEVFormer CosineAnnealing
:299-304; plus the patched min_lr step updater tools/lr_updater_modified.py).

All schedules are per-step functions (optax convention); epoch-based
policies take steps_per_epoch.
"""
from __future__ import annotations

import math
from typing import Optional, Sequence

import optax


def _warmup_wrap(schedule, warmup: Optional[str], warmup_iters: int,
                 warmup_ratio: float, base_lr: float):
    if warmup is None:
        return schedule

    def wrapped(step):
        import jax.numpy as jnp
        frac = jnp.clip(step / max(warmup_iters, 1), 0.0, 1.0)
        if warmup == "linear":
            # mmcv rule: k = 1 - (1 - frac) * (1 - ratio)
            k = 1.0 - (1.0 - frac) * (1.0 - warmup_ratio)
        elif warmup == "exp":
            k = warmup_ratio ** (1 - frac)
        elif warmup == "constant":
            k = warmup_ratio
        else:
            raise NotImplementedError(warmup)
        return jnp.where(step < warmup_iters, base_lr * k, schedule(step))

    return wrapped


def min_(a, b):
    import jax.numpy as jnp
    return jnp.minimum(a, b)


def step_lr(base_lr: float, steps_per_epoch: int,
            step: Sequence[int], gamma: float = 0.1,
            min_lr: Optional[float] = None,
            warmup: Optional[str] = None, warmup_iters: int = 500,
            warmup_ratio: float = 1.0 / 3):
    """Epoch-milestone step decay (reference StepLrUpdaterHook + the
    modified min_lr variant tools/lr_updater_modified.py)."""
    boundaries = {int(e * steps_per_epoch): gamma for e in step}
    sched = optax.piecewise_constant_schedule(base_lr, boundaries)

    def with_floor(s):
        v = sched(s)
        if min_lr is not None:
            import jax.numpy as jnp
            v = jnp.maximum(v, min_lr)
        return v

    return _warmup_wrap(with_floor, warmup, warmup_iters, warmup_ratio,
                        base_lr)


def cyclic_lr(base_lr: float, total_steps: int,
              target_ratio: Sequence[float] = (10, 1e-4),
              cyclic_times: int = 1, step_ratio_up: float = 0.4):
    """One-cycle cyclic lr (reference CyclicLrUpdaterHook semantics with
    cosine annealing inside each phase)."""
    max_lr = base_lr * target_ratio[0]
    final_lr = base_lr * target_ratio[1]
    cycle_len = total_steps // max(cyclic_times, 1)
    up = int(cycle_len * step_ratio_up)

    def sched(step):
        import jax.numpy as jnp
        s = jnp.mod(step, cycle_len)
        up_frac = jnp.clip(s / max(up, 1), 0.0, 1.0)
        down_frac = jnp.clip((s - up) / max(cycle_len - up, 1), 0.0, 1.0)
        lr_up = base_lr + (max_lr - base_lr) * \
            0.5 * (1 - jnp.cos(jnp.pi * up_frac))
        lr_down = max_lr + (final_lr - max_lr) * \
            0.5 * (1 - jnp.cos(jnp.pi * down_frac))
        return jnp.where(s < up, lr_up, lr_down)

    return sched


def cyclic_momentum(base_momentum: float = 0.9, total_steps: int = 1,
                    target_ratio: Sequence[float] = (0.85 / 0.95, 1.0),
                    cyclic_times: int = 1, step_ratio_up: float = 0.4):
    """Cyclic momentum mirroring cyclic lr (reference momentum config)."""
    lo = base_momentum * target_ratio[0]
    cycle_len = total_steps // max(cyclic_times, 1)
    up = int(cycle_len * step_ratio_up)

    def sched(step):
        import jax.numpy as jnp
        s = jnp.mod(step, cycle_len)
        up_frac = jnp.clip(s / max(up, 1), 0.0, 1.0)
        down_frac = jnp.clip((s - up) / max(cycle_len - up, 1), 0.0, 1.0)
        m_up = base_momentum + (lo - base_momentum) * \
            0.5 * (1 - jnp.cos(jnp.pi * up_frac))
        m_down = lo + (base_momentum - lo) * \
            0.5 * (1 - jnp.cos(jnp.pi * down_frac))
        return jnp.where(s < up, m_up, m_down)

    return sched


def cosine_annealing_lr(base_lr: float, total_steps: int,
                        min_lr_ratio: float = 1e-3,
                        warmup: Optional[str] = "linear",
                        warmup_iters: int = 500,
                        warmup_ratio: float = 1.0 / 3):
    """CosineAnnealing policy (reference BEVFormer schedule)."""
    min_lr = base_lr * min_lr_ratio

    def sched(step):
        import jax.numpy as jnp
        frac = jnp.clip(step / max(total_steps, 1), 0.0, 1.0)
        return min_lr + (base_lr - min_lr) * \
            0.5 * (1 + jnp.cos(jnp.pi * frac))

    return _warmup_wrap(sched, warmup, warmup_iters, warmup_ratio, base_lr)


def build_lr_schedule(lr_config: dict, base_lr: float,
                      total_steps: int, steps_per_epoch: int):
    """Build from an mmcv-style lr_config dict (policy key)."""
    cfg = dict(lr_config)
    policy = cfg.pop("policy", "step").lower()
    warmup = cfg.pop("warmup", None)
    warmup_iters = cfg.pop("warmup_iters", 500)
    warmup_ratio = cfg.pop("warmup_ratio", 1.0 / 3)
    if policy == "step":
        return step_lr(base_lr, steps_per_epoch, cfg.get("step", []),
                       cfg.get("gamma", 0.1), cfg.get("min_lr"),
                       warmup, warmup_iters, warmup_ratio)
    if policy == "cyclic":
        return cyclic_lr(base_lr, total_steps,
                         cfg.get("target_ratio", (10, 1e-4)),
                         cfg.get("cyclic_times", 1),
                         cfg.get("step_ratio_up", 0.4))
    if policy == "cosineannealing":
        return cosine_annealing_lr(base_lr, total_steps,
                                   cfg.get("min_lr_ratio", 1e-3),
                                   warmup, warmup_iters, warmup_ratio)
    raise NotImplementedError(policy)
