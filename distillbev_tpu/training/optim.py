"""Optimizer construction (optax AdamW + paramwise lr_mult + grad clip).

Capability parity with the reference's optimizer assembly
(reference: mmcv build_optimizer with paramwise_cfg lr_mult for backbones,
configs/teacher_transformer/lidarformer.py:295-303 and distill cfg
optimizer blocks; grad_clip max_norm, apis/mmdet_train.py OptimizerHook).

``paramwise_cfg.custom_keys`` maps parameter-path substrings to lr_mult;
implemented as an optax mask-partition so it works under jit and with
arbitrary schedules.  ``frozen_keys`` zeroes updates entirely — the
functional counterpart of torch ``requires_grad=False`` / frozen_stages.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import optax


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", k)) for k in path)


def _match_mult(path: str, custom_keys: Dict[str, Dict]) -> float:
    best = None
    for key, spec in custom_keys.items():
        if key in path:
            if best is None or len(key) > best[0]:
                best = (len(key), spec.get("lr_mult", 1.0))
    return best[1] if best else 1.0


def build_optimizer(optimizer_cfg: dict,
                    lr_schedule: Callable,
                    params,
                    grad_clip: Optional[dict] = None,
                    momentum_schedule: Optional[Callable] = None):
    """Build an optax GradientTransformation from an mmcv-style cfg."""
    cfg = dict(optimizer_cfg)
    opt_type = cfg.pop("type", "AdamW").lower()
    base_lr = cfg.pop("lr", 1e-4)
    weight_decay = cfg.pop("weight_decay", 0.01)
    paramwise = dict(cfg.pop("paramwise_cfg", {}) or {})
    custom_keys = {k: dict(v) for k, v in
                   dict(paramwise.get("custom_keys", {})).items()}
    frozen_keys = list(paramwise.get("frozen_keys", []))
    betas = cfg.pop("betas", (0.9, 0.999))
    eps = cfg.pop("eps", 1e-8)

    def core(mult: float):
        def scaled_lr(step):
            return lr_schedule(step) * mult

        if opt_type == "adamw":
            if momentum_schedule is not None:
                # cyclic momentum rides on b1 (reference
                # CyclicMomentumUpdaterHook on Adam betas[0])
                return optax.inject_hyperparams(optax.adamw)(
                    learning_rate=scaled_lr, b1=momentum_schedule,
                    b2=betas[1], eps=eps, weight_decay=weight_decay)
            return optax.adamw(scaled_lr, b1=betas[0], b2=betas[1],
                               eps=eps, weight_decay=weight_decay)
        if opt_type == "adam":
            return optax.adam(scaled_lr, b1=betas[0], b2=betas[1], eps=eps)
        if opt_type == "sgd":
            if momentum_schedule is not None:
                return optax.inject_hyperparams(optax.sgd)(
                    learning_rate=scaled_lr,
                    momentum=momentum_schedule,
                    nesterov=cfg.get("nesterov", False))
            return optax.sgd(scaled_lr,
                             momentum=cfg.get("momentum", 0.9),
                             nesterov=cfg.get("nesterov", False))
        raise NotImplementedError(opt_type)

    # label each leaf by its lr_mult group
    mults = sorted({1.0} | {
        spec.get("lr_mult", 1.0) for spec in custom_keys.values()})
    labels = jax.tree_util.tree_map_with_path(
        lambda path, _: ("frozen" if any(
            k in _path_str(path) for k in frozen_keys)
            else f"mult_{_match_mult(_path_str(path), custom_keys)}"),
        params)
    transforms = {f"mult_{m}": core(m) for m in mults}
    transforms["frozen"] = optax.set_to_zero()
    tx = optax.multi_transform(transforms, labels)

    chain = []
    if grad_clip:
        max_norm = dict(grad_clip).get("max_norm")
        if max_norm:
            chain.append(optax.clip_by_global_norm(max_norm))
    chain.append(tx)
    return optax.chain(*chain)
