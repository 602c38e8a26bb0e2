"""Jitted train steps: teacher detector training + distillation training.

Replaces the reference's runner/hook stack (reference:
apis/mmdet_train.py:29-201 — EpochBasedRunner + OptimizerHook + DDP) with
pure functions: one ``train_step(state, batch) -> (state, metrics)`` per
recipe, jitted once and executed under GSPMD sharding over the data mesh.
The teacher runs inside the same jit under ``stop_gradient`` (the
reference runs it under torch.no_grad, bevdet_distill.py:1437), so XLA
overlaps teacher and student compute and no extra host sync exists.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models.detectors.bevdet import ImgInputs


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


class PointsBatch(NamedTuple):
    """LiDAR detector batch (teacher training)."""
    points: jnp.ndarray        # [B, N, C]
    point_mask: jnp.ndarray    # [B, N]
    gt_boxes: jnp.ndarray      # [B, M, 9] bottom-center boxes
    gt_labels: jnp.ndarray     # [B, M]
    gt_mask: jnp.ndarray       # [B, M]


class DistillBatch(NamedTuple):
    """Camera-student distillation batch."""
    img_inputs: ImgInputs
    points: jnp.ndarray
    point_mask: jnp.ndarray
    gt_boxes: jnp.ndarray
    gt_labels: jnp.ndarray
    gt_mask: jnp.ndarray


def gravity_centered(gt_boxes: jnp.ndarray) -> jnp.ndarray:
    """bottom-center -> gravity-center z (head targets use gravity z,
    reference centerpoint_head.get_targets_single:472-477)."""
    return gt_boxes.at[..., 2].add(gt_boxes[..., 5] * 0.5)


def make_detector_train_step(model, tx) -> Callable:
    """Plain LiDAR detector (CenterPoint family) train step."""

    def train_step(state: TrainState, batch: PointsBatch):
        gt = gravity_centered(batch.gt_boxes)

        def loss_fn(params):
            (preds, _), new_state = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch.points, batch.point_mask, train=True,
                mutable=["batch_stats"])
            losses = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                preds, gt, batch.gt_labels, batch.gt_mask,
                method=model.loss)
            total = sum(jax.tree_util.tree_leaves(losses))
            return total, (losses, new_state["batch_stats"])

        (total, (losses, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state,
                                       state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(losses)
        metrics["total_loss"] = total
        metrics["grad_norm"] = optax.global_norm(grads)
        return TrainState(params, new_stats, opt_state,
                          state.step + 1), metrics

    return train_step


def _half(tree):
    """fp32 -> bf16 for compute (weights/activations); scalars stay."""
    return jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 and
        x.ndim >= 1 else x, tree)


def _full(tree):
    return jax.tree_util.tree_map(
        lambda x: x.astype(jnp.float32)
        if hasattr(x, "dtype") and x.dtype == jnp.bfloat16 else x, tree)


def make_distill_train_step(student, teacher, tx,
                            use_depth_loss: bool = True,
                            mixed_precision: bool = False,
                            show_teacher_loss: bool = False,
                            accum_steps: int = 1) -> Callable:
    """Distillation train step: student det loss + depth loss + distill
    losses, teacher frozen (reference BEVDepth4DDistill.forward_train,
    bevdet_distill_more.py:457-520).

    mixed_precision=True runs forward/backward in bfloat16 (params cast
    per-step; fp32 master weights live in the optimizer) — the TPU
    counterpart of the reference's Fp16OptimizerHook + force_fp32
    boundaries (losses, geometry and BN statistics stay fp32 by
    construction in our modules).

    accum_steps>1 splits the batch into that many microbatches and runs
    them sequentially under ``lax.scan``, averaging gradients before the
    single optimizer update — large effective batches (the reference
    trains at samples_per_gpu=8) with the activation working set of one
    microbatch.  BN batch statistics are computed per microbatch and the
    EMA updates averaged, which matches the reference's per-GPU BN
    semantics under DDP (each GPU normalizes over its own samples_per_gpu
    slice; apis/mmdet_train.py:72-86 never syncs BN for these recipes)."""

    def _grads_one_batch(params, batch_stats, teacher_variables,
                         batch: DistillBatch, epoch: jnp.ndarray):
        """(grads, total, losses, new_stats) for one (micro)batch."""
        gt = gravity_centered(batch.gt_boxes)
        # frozen teacher forward — no grads, XLA overlaps it freely
        t_preds, t_bundle = teacher.apply(
            teacher_variables, batch.points, batch.point_mask,
            train=False)
        t_preds = jax.lax.stop_gradient(_full(t_preds))
        t_bundle = jax.lax.stop_gradient(_full(t_bundle))
        teacher_metrics = {}
        if show_teacher_loss:
            # diagnostic: the frozen teacher's own detection loss on this
            # batch (reference show_teacher_loss,
            # bevdet_distill.py:1425-1435 — logged, never backpropagated)
            t_losses = teacher.apply(teacher_variables, t_preds, gt,
                                     batch.gt_labels, batch.gt_mask,
                                     method=teacher.loss)
            if isinstance(t_losses, tuple):
                t_losses = t_losses[0]
            teacher_metrics["teacher_loss"] = sum(
                jax.tree_util.tree_leaves(t_losses))

        def loss_fn(params):
            variables = {"params": _half(params) if mixed_precision
                         else params,
                         "batch_stats": batch_stats}
            (preds, bundle, depth), new_state = student.apply(
                variables, batch.img_inputs, train=True,
                mutable=["batch_stats"])
            if mixed_precision:
                preds = _full(preds)
                bundle = _full(bundle)
                depth = _full(depth) if depth is not None else None
            det_losses, targets = student.apply(
                variables, preds, gt, batch.gt_labels, batch.gt_mask,
                True, method=student.head_loss)
            heatmaps = targets[0]
            losses = dict(det_losses)
            if use_depth_loss and depth is not None and \
                    batch.img_inputs.depth_gt is not None:
                losses["loss_depth"] = student.apply(
                    variables, depth, batch.img_inputs.depth_gt,
                    method=student.depth_loss)
            distill = student.apply(
                variables, bundle, preds, t_bundle, t_preds, gt,
                batch.gt_labels, batch.gt_mask, heatmaps, epoch,
                True, method=student.distill_losses)
            losses.update(distill)
            total = sum(jax.tree_util.tree_leaves(losses))
            return total, (losses, new_state["batch_stats"])

        (total, (losses, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        losses = dict(losses)
        losses.update(teacher_metrics)
        return grads, total, losses, new_stats

    def train_step(state: TrainState, teacher_variables,
                   batch: DistillBatch, epoch: jnp.ndarray):
        if mixed_precision:
            # images to bf16 (the student image path is the FLOPs bulk);
            # points stay fp32 — voxel coordinates need the mantissa
            batch = batch._replace(
                img_inputs=batch.img_inputs._replace(
                    imgs=batch.img_inputs.imgs.astype(jnp.bfloat16)))
            # teacher params to bf16 too (batch_stats stay fp32 — BN
            # normalizes in fp32 internally).  With the teacher's
            # compute_dtype/backbone_dtype set this halves its conv
            # bandwidth (measured 66 -> 56 ms at flagship sizes, 0.14%
            # mean-rel feature diff); with an fp32-configured teacher the
            # activations promote back to fp32 and numerics are unchanged
            teacher_variables = dict(teacher_variables)
            teacher_variables["params"] = _half(
                teacher_variables["params"])

        if accum_steps <= 1:
            grads, total, losses, new_stats = _grads_one_batch(
                state.params, state.batch_stats, teacher_variables,
                batch, epoch)
        else:
            # [B, ...] -> [A, B//A, ...]; scan forces sequential
            # microbatch execution, so peak activation memory is one
            # microbatch's
            def split(x):
                if x is None or not hasattr(x, "shape"):
                    return x
                b = x.shape[0]
                if b % accum_steps:
                    raise ValueError(
                        f"batch size {b} not divisible by "
                        f"accum_steps={accum_steps}")
                return x.reshape((accum_steps, b // accum_steps)
                                 + x.shape[1:])

            micro = jax.tree_util.tree_map(split, batch)

            def body(carry, mb):
                g_acc, s_acc = carry
                grads, total, losses, new_stats = _grads_one_batch(
                    state.params, state.batch_stats, teacher_variables,
                    mb, epoch)
                g_acc = jax.tree_util.tree_map(jnp.add, g_acc, grads)
                s_acc = jax.tree_util.tree_map(jnp.add, s_acc, new_stats)
                return (g_acc, s_acc), (total, losses)

            g0 = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            s0 = jax.tree_util.tree_map(jnp.zeros_like,
                                        state.batch_stats)
            (g_acc, s_acc), (totals, losses_stk) = jax.lax.scan(
                body, (g0, s0), micro)
            inv = 1.0 / accum_steps
            grads = jax.tree_util.tree_map(lambda g: g * inv, g_acc)
            new_stats = jax.tree_util.tree_map(lambda s: s * inv, s_acc)
            total = totals.mean()
            losses = jax.tree_util.tree_map(lambda l: l.mean(),
                                            losses_stk)

        updates, opt_state = tx.update(grads, state.opt_state,
                                       state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(losses)
        metrics["total_loss"] = total
        metrics["grad_norm"] = optax.global_norm(grads)
        return TrainState(params, new_stats, opt_state,
                          state.step + 1), metrics

    return train_step


def init_train_state(params, batch_stats, tx) -> TrainState:
    return TrainState(params, batch_stats, tx.init(params),
                      jnp.zeros((), jnp.int32))


class BEVFormerBatch(NamedTuple):
    """Transformer-student distillation batch (queue protocol)."""
    imgs: jnp.ndarray           # [B, T, N, H, W, 3]
    can_bus: jnp.ndarray        # [B, T, 18]
    lidar2img: jnp.ndarray      # [B, T, N, 4, 4]
    prev_exists: jnp.ndarray    # [B, T]
    points: jnp.ndarray
    point_mask: jnp.ndarray
    gt_boxes: jnp.ndarray
    gt_labels: jnp.ndarray
    gt_mask: jnp.ndarray


def make_bevformer_distill_train_step(student, teacher, tx,
                                      bev_h: int, bev_w: int,
                                      mixed_precision: bool = False,
                                      seed: int = 0) -> Callable:
    """BEVFormer distillation step (reference
    bevformer_distill.py forward_train:926-984): detection loss +
    FGD on (student bev_embed, teacher bev_feat) + hs/query distill.

    mixed_precision mirrors the CNN path (bf16 forward/backward, fp32
    masters + losses) — the reference's BEVFormer scripts train under
    Fp16OptimizerHook, and the full-size model (queue=4, 6 cams at
    900x1600) does not fit a 16 GB v5e chip at fp32."""

    def train_step(state: TrainState, teacher_variables,
                   batch: BEVFormerBatch, epoch: jnp.ndarray):
        gt = gravity_centered(batch.gt_boxes)
        if mixed_precision:
            batch = batch._replace(
                imgs=batch.imgs.astype(jnp.bfloat16))
            teacher_variables = dict(teacher_variables)
            teacher_variables["params"] = _half(
                teacher_variables["params"])
        t_outs, t_bundle = teacher.apply(
            teacher_variables, batch.points, batch.point_mask,
            train=False)
        t_outs = jax.lax.stop_gradient(_full(t_outs))
        t_bundle = jax.lax.stop_gradient(_full(t_bundle))
        t_dec = None
        fp_mode = dict(student.distill_params or {}).get(
            "fp_as_foreground", "none")
        if (fp_mode[0] if isinstance(fp_mode, (list, tuple))
                else fp_mode) != "none":
            # decoded teacher boxes feed bbox-based FP mining
            # (reference bevformer_distill.py:736-743)
            t_dec = jax.lax.stop_gradient(teacher.apply(
                teacher_variables, t_outs, method=teacher.get_bboxes))

        # dropout stream derived from the run seed (reference seeded-run
        # semantics, tools/train.py:180-183) and the step counter
        dropout_rng = jax.random.fold_in(jax.random.PRNGKey(seed),
                                         state.step)

        def loss_fn(params):
            variables = {"params": _half(params) if mixed_precision
                         else params,
                         "batch_stats": state.batch_stats}
            (outs, bundle), new_state = student.apply(
                variables, batch.imgs, batch.can_bus, batch.lidar2img,
                batch.prev_exists, train=True,
                mutable=["batch_stats"],
                rngs={"dropout": dropout_rng})
            if mixed_precision:
                outs = _full(outs)
                bundle = _full(bundle)
            det_losses = student.apply(
                variables, outs, gt, batch.gt_labels, batch.gt_mask,
                method=student.loss)
            losses = dict(det_losses)
            distill = student.apply(
                variables, outs, t_outs, t_bundle.bev_feat, gt,
                batch.gt_labels, batch.gt_mask, epoch, bev_h, bev_w,
                True, t_dec,
                method=student.distill_losses_bevformer)
            losses.update(distill)
            total = sum(jax.tree_util.tree_leaves(losses))
            return total, (losses, new_state["batch_stats"])

        (total, (losses, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state,
                                       state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(losses)
        metrics["total_loss"] = total
        metrics["grad_norm"] = optax.global_norm(grads)
        return TrainState(params, new_stats, opt_state,
                          state.step + 1), metrics

    return train_step


def make_bevformer_distill_split_steps(student, teacher, tx,
                                       bev_h: int, bev_w: int,
                                       mixed_precision: bool = False,
                                       seed: int = 0
                                       ) -> Tuple[Callable, Callable]:
    """The BEVFormer distill step as TWO jittable pieces:
    ``teacher_fn(teacher_variables, batch) -> (t_outs, t_bev_feat,
    t_dec)`` and ``student_fn(state, t_outs, t_bev_feat, t_dec, batch,
    epoch) -> (state, metrics)``.

    Identical math to make_bevformer_distill_train_step (the teacher is
    frozen, so cutting the graph at its outputs changes nothing), but
    each piece's HLO is roughly half the fused step's — this is the
    compile-memory escape hatch for running the FULL-SIZE flagship
    (queue=4, 6 cams at 928x1600, spconv teacher) through compilers
    that cannot hold the fused graph.  The fused variant stays the
    default for training (XLA overlaps teacher and student compute)."""

    def teacher_fn(teacher_variables, batch: BEVFormerBatch):
        if mixed_precision:
            teacher_variables = dict(teacher_variables)
            teacher_variables["params"] = _half(
                teacher_variables["params"])
        t_outs, t_bundle = teacher.apply(
            teacher_variables, batch.points, batch.point_mask,
            train=False)
        t_outs = jax.lax.stop_gradient(_full(t_outs))
        t_bev_feat = jax.lax.stop_gradient(_full(t_bundle.bev_feat))
        t_dec = None
        fp_mode = dict(student.distill_params or {}).get(
            "fp_as_foreground", "none")
        if (fp_mode[0] if isinstance(fp_mode, (list, tuple))
                else fp_mode) != "none":
            t_dec = jax.lax.stop_gradient(teacher.apply(
                teacher_variables, t_outs, method=teacher.get_bboxes))
        return t_outs, t_bev_feat, t_dec

    def student_fn(state: TrainState, t_outs, t_bev_feat, t_dec,
                   batch: BEVFormerBatch, epoch: jnp.ndarray):
        gt = gravity_centered(batch.gt_boxes)
        if mixed_precision:
            batch = batch._replace(
                imgs=batch.imgs.astype(jnp.bfloat16))
        dropout_rng = jax.random.fold_in(jax.random.PRNGKey(seed),
                                         state.step)

        def loss_fn(params):
            variables = {"params": _half(params) if mixed_precision
                         else params,
                         "batch_stats": state.batch_stats}
            (outs, bundle), new_state = student.apply(
                variables, batch.imgs, batch.can_bus, batch.lidar2img,
                batch.prev_exists, train=True,
                mutable=["batch_stats"],
                rngs={"dropout": dropout_rng})
            if mixed_precision:
                outs = _full(outs)
                bundle = _full(bundle)
            det_losses = student.apply(
                variables, outs, gt, batch.gt_labels, batch.gt_mask,
                method=student.loss)
            losses = dict(det_losses)
            distill = student.apply(
                variables, outs, t_outs, t_bev_feat, gt,
                batch.gt_labels, batch.gt_mask, epoch, bev_h, bev_w,
                True, t_dec,
                method=student.distill_losses_bevformer)
            losses.update(distill)
            total = sum(jax.tree_util.tree_leaves(losses))
            return total, (losses, new_state["batch_stats"])

        (total, (losses, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state,
                                       state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(losses)
        metrics["total_loss"] = total
        metrics["grad_norm"] = optax.global_norm(grads)
        return TrainState(params, new_stats, opt_state,
                          state.step + 1), metrics

    return teacher_fn, student_fn


def make_bevformer_train_step(model, tx,
                              mixed_precision: bool = False,
                              seed: int = 0) -> Callable:
    """Plain (non-distill) BEVFormer train step — detection loss only
    (reference bevformer.py forward_train; the reference trains the
    BEVFormer baseline through the same custom runner path,
    tools/train.py:234-242)."""

    def train_step(state: TrainState, teacher_variables,
                   batch: BEVFormerBatch, epoch: jnp.ndarray):
        del teacher_variables, epoch      # uniform step signature
        gt = gravity_centered(batch.gt_boxes)
        if mixed_precision:
            batch = batch._replace(
                imgs=batch.imgs.astype(jnp.bfloat16))
        dropout_rng = jax.random.fold_in(jax.random.PRNGKey(seed),
                                         state.step)

        def loss_fn(params):
            variables = {"params": _half(params) if mixed_precision
                         else params,
                         "batch_stats": state.batch_stats}
            (outs, _bundle), new_state = model.apply(
                variables, batch.imgs, batch.can_bus, batch.lidar2img,
                batch.prev_exists, train=True,
                mutable=["batch_stats"],
                rngs={"dropout": dropout_rng})
            if mixed_precision:
                outs = _full(outs)
            losses = dict(model.apply(
                variables, outs, gt, batch.gt_labels, batch.gt_mask,
                method=model.loss))
            total = sum(jax.tree_util.tree_leaves(losses))
            return total, (losses, new_state["batch_stats"])

        (total, (losses, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state,
                                       state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(losses)
        metrics["total_loss"] = total
        metrics["grad_norm"] = optax.global_norm(grads)
        return TrainState(params, new_stats, opt_state,
                          state.step + 1), metrics

    return train_step


def make_camera_distill_train_step(student, teacher, tx,
                                   use_depth_loss: bool = True,
                                   mixed_precision: bool = False
                                   ) -> Callable:
    """Camera(4D teacher) -> camera(student) distillation step
    (reference BEVDepth4DtoBEVDet/BEVDepthDistill,
    bevdet_distill_more.py:624-807): the frozen 4D camera teacher sees
    both frames of the doubled inputs, the student only the key frame
    (sliced inside its extract_img_feat)."""

    def train_step(state: TrainState, teacher_variables,
                   batch: DistillBatch, epoch: jnp.ndarray):
        gt = gravity_centered(batch.gt_boxes)
        if mixed_precision:
            batch = batch._replace(
                img_inputs=batch.img_inputs._replace(
                    imgs=batch.img_inputs.imgs.astype(jnp.bfloat16)))

        t_preds, t_bundle, _t_depth = teacher.apply(
            teacher_variables, batch.img_inputs, train=False)
        t_preds = jax.lax.stop_gradient(_full(t_preds))
        t_bundle = jax.lax.stop_gradient(_full(t_bundle))

        def loss_fn(params):
            variables = {"params": _half(params) if mixed_precision
                         else params,
                         "batch_stats": state.batch_stats}
            (preds, bundle, depth), new_state = student.apply(
                variables, batch.img_inputs, train=True,
                mutable=["batch_stats"])
            if mixed_precision:
                preds = _full(preds)
                bundle = _full(bundle)
                depth = _full(depth) if depth is not None else None
            det_losses, targets = student.apply(
                variables, preds, gt, batch.gt_labels, batch.gt_mask,
                True, method=student.head_loss)
            heatmaps = targets[0]
            losses = dict(det_losses)
            if use_depth_loss and depth is not None and \
                    batch.img_inputs.depth_gt is not None:
                losses["loss_depth"] = student.apply(
                    variables, depth, batch.img_inputs.depth_gt,
                    method=student.depth_loss)
            distill = student.apply(
                variables, bundle, preds, t_bundle, t_preds, gt,
                batch.gt_labels, batch.gt_mask, heatmaps, epoch,
                True, method=student.distill_losses)
            losses.update(distill)
            total = sum(jax.tree_util.tree_leaves(losses))
            return total, (losses, new_state["batch_stats"])

        (total, (losses, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state,
                                       state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(losses)
        metrics["total_loss"] = total
        metrics["grad_norm"] = optax.global_norm(grads)
        return TrainState(params, new_stats, opt_state,
                          state.step + 1), metrics

    return train_step
