"""Distillation mask generation — fully on-device.

Capability parity with the reference's mask machinery
(reference: mmdet3d/models/detectors/bevdet_distill.py —
foreground_scale_mask:755-843, attention masks:1084-1108, add_fp_as_fg
:846-970, non-empty-bg:1130-1161).

TPU-native design: the reference computes the FG mask with *numpy
points_in_rbbox on the host every step* (bevdet_distill.py:787) — a
device->host sync in the hot loop.  Here every mask is a statically-shaped
jnp computation over padded GT arrays that fuses into the loss graph:
* FG membership: BEV cell coords vs z-flattened boxes
  (core.bbox.box_jax_ops.points_in_rbbox_bev);
* per-pixel owning box = lowest box index among containers (the
  reference's np.unique(first-occurrence) rule);
* FP connected components ('dfs' mode): iterative min-label propagation
  (a few dozen fused 3x3 min-pool steps) instead of host BFS.

All feature maps are channels-last [B, H, W, C]; masks are [B, H, W].
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ...core.bbox.box_jax_ops import points_in_rbbox_bev


def bev_pixel_coords(h: int, w: int, voxel_size, pc_range,
                     out_size_factor: int,
                     center_offset: float = 0.0) -> jnp.ndarray:
    """[H*W, 2] (x, y) metric coords of BEV pixels, row-major (row=y).

    ``center_offset=0`` matches the CNN distiller (pixel corner,
    bevdet_distill.py:766-767); ``0.5`` matches the BEVFormer variant's
    cell centers (bevformer_distill.py:391+).
    """
    xs = (jnp.arange(w, dtype=jnp.float32) + center_offset) * \
        voxel_size[0] * out_size_factor + pc_range[0]
    ys = (jnp.arange(h, dtype=jnp.float32) + center_offset) * \
        voxel_size[1] * out_size_factor + pc_range[1]
    gx = jnp.broadcast_to(xs[None, :], (h, w))
    gy = jnp.broadcast_to(ys[:, None], (h, w))
    return jnp.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1)


def foreground_scale_mask(gt_boxes: jnp.ndarray,
                          gt_mask: jnp.ndarray,
                          h: int, w: int,
                          voxel_size, pc_range, grid_size,
                          avg_fg_scale_mask: bool = False,
                          context_length: float = 0.0,
                          context_weight: float = 0.0,
                          center_offset: float = 0.0,
                          transpose: bool = False,
                          ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """FG / fg-scale / bg-scale masks.

    gt_boxes [B, M, 7+] (x, y, z, dx, dy, dz, yaw, ...); gt_mask [B, M].
    Returns fg_mask, fg_scale, bg_scale each [B, H, W] fp32.

    ``transpose`` is the reference's ``transpose_mask`` flag
    (bevdet_distill.py:828-836): the reference flattens its pixel list
    x-major, and transpose_mask=False re-transposes into [H, W] — which
    is exactly this function's native row-major orientation.
    transpose_mask=True keeps the x-major flat order, i.e. (for the
    square grids every config uses) the transposed orientation.
    """
    assert grid_size[0] % w == 0
    osf = grid_size[0] // w
    coords = bev_pixel_coords(h, w, voxel_size, pc_range, osf,
                              center_offset)
    cell_area = voxel_size[0] * voxel_size[1] * osf * osf

    def per_sample(boxes, mask):
        bev_boxes = jnp.concatenate(
            [boxes[:, 0:2], boxes[:, 3:5], boxes[:, 6:7]], axis=-1)
        bev_boxes = jnp.where(mask[:, None], bev_boxes, 0.0)
        inside = points_in_rbbox_bev(coords, bev_boxes)      # [HW, M]
        fg = inside.any(axis=-1)
        m = boxes.shape[0]
        # owning box = lowest index among containers
        first = jnp.argmax(
            jnp.where(inside, m - jnp.arange(m)[None, :], 0), axis=-1)
        if avg_fg_scale_mask:
            n_fg = jnp.maximum(fg.sum(), 1)
            fg_scale = jnp.where(fg, 1.0 / n_fg, 0.0)
        else:
            area = jnp.maximum(boxes[:, 3] * boxes[:, 4], 1e-6)
            fg_scale = jnp.where(
                fg, jnp.sqrt(cell_area / area[first]), 0.0)
        fg_f = fg.astype(jnp.float32)
        if context_length > 0 and context_weight > 0:
            ext = voxel_size[0] * osf * context_length
            big = bev_boxes.at[:, 2:4].add(
                jnp.where(mask[:, None], ext, 0.0))
            inside_big = points_in_rbbox_bev(coords, big)
            fg_big = inside_big.any(axis=-1)
            first_big = jnp.argmax(
                jnp.where(inside_big, m - jnp.arange(m)[None, :], 0),
                axis=-1)
            fg_f = jnp.maximum(fg_f,
                               fg_big.astype(jnp.float32) * context_weight)
            area = jnp.maximum(boxes[:, 3] * boxes[:, 4], 1e-6)
            # context pixels get (non-sqrt) cellArea/boxArea (reference
            # bevdet_distill.py:816-818)
            ctx_scale = jnp.where(fg_big, cell_area / area[first_big],
                                  0.0)
            fg_scale = jnp.where(fg_big, ctx_scale, fg_scale)
        n_bg = jnp.maximum(h * w - (fg_f != 0).sum(), 1)
        bg_scale = jnp.full((h * w,), 1.0, jnp.float32) / n_bg
        return (fg_f.reshape(h, w), fg_scale.reshape(h, w),
                bg_scale.reshape(h, w))

    fg, fgs, bgs = jax.vmap(per_sample)(gt_boxes, gt_mask)
    if transpose:
        assert h == w, "transpose_mask=True needs a square BEV grid"
        fg, fgs, bgs = (m.swapaxes(1, 2) for m in (fg, fgs, bgs))
    return fg, fgs, bgs


def fp_bbox_masks(teacher_boxes: jnp.ndarray,
                  teacher_scores: jnp.ndarray,
                  teacher_valid: jnp.ndarray,
                  gt_boxes: jnp.ndarray, gt_mask: jnp.ndarray,
                  h: int, w: int, voxel_size, pc_range, grid_size,
                  output_threshold: float,
                  center_offset: float = 0.5
                  ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Bbox-decoded FP-as-FG for the transformer path (reference
    bevformer_distill.py add_fp_as_fg_bbox:573-647): pixels inside a
    confident teacher box (score > threshold) but outside every GT box.

    teacher_boxes [B, K, 7+] decoded boxes; teacher_scores [B, K];
    teacher_valid [B, K].  Returns fp_mask, fp_scale (average mode),
    fp_count — on-device, no host decode round-trip.
    """
    assert grid_size[0] % w == 0
    osf = grid_size[0] // w
    coords = bev_pixel_coords(h, w, voxel_size, pc_range, osf,
                              center_offset)

    def per_sample(tb, ts, tv, gb, gm):
        sel = tv & (ts > output_threshold)
        bev_t = jnp.concatenate(
            [tb[:, 0:2], tb[:, 3:5], tb[:, 6:7]], axis=-1)
        bev_t = jnp.where(sel[:, None], bev_t, 0.0)
        in_t = points_in_rbbox_bev(coords, bev_t) & sel[None, :]
        bev_g = jnp.concatenate(
            [gb[:, 0:2], gb[:, 3:5], gb[:, 6:7]], axis=-1)
        bev_g = jnp.where(gm[:, None], bev_g, 0.0)
        in_g = points_in_rbbox_bev(coords, bev_g) & gm[None, :]
        fp = in_t.any(-1) & ~in_g.any(-1)
        n = fp.sum()
        fp_scale = jnp.where(fp, 1.0 / jnp.maximum(n, 1), 0.0)
        return (fp.astype(jnp.float32).reshape(h, w),
                fp_scale.reshape(h, w), n.astype(jnp.float32))

    return jax.vmap(per_sample)(teacher_boxes, teacher_scores,
                                teacher_valid, gt_boxes, gt_mask)


def spatial_attention(feat: jnp.ndarray, t: float) -> jnp.ndarray:
    """softmax(mean|feat|/T over pixels) * H * W  -> [B, H, W]."""
    b, h, w, _ = feat.shape
    a = jnp.abs(feat).mean(axis=-1).reshape(b, h * w)
    a = jax.nn.softmax(a / t, axis=-1) * (h * w)
    return jax.lax.stop_gradient(a.reshape(b, h, w))


def channel_attention(feat: jnp.ndarray, t: float) -> jnp.ndarray:
    """softmax over channels of mean|feat| * C -> [B, C]."""
    c = feat.shape[-1]
    a = jnp.abs(feat).mean(axis=(1, 2))
    a = jax.nn.softmax(a / t, axis=-1) * c
    return jax.lax.stop_gradient(a)


def resize_mask(m: jnp.ndarray, target_hw: Tuple[int, int]) -> jnp.ndarray:
    """Max-pool down or repeat up a [B, H, W] mask to target size
    (reference size-matching in add_fp_as_fg:870-921)."""
    b, h, w = m.shape
    th, tw = target_hw
    if (h, w) == (th, tw):
        return m
    if h > th:
        assert h % th == 0 and w % tw == 0
        f_h, f_w = h // th, w // tw
        return m.reshape(b, th, f_h, tw, f_w).max(axis=(2, 4))
    assert th % h == 0 and tw % w == 0
    f_h, f_w = th // h, tw // w
    return jnp.broadcast_to(
        m[:, :, None, :, None],
        (b, h, f_h, w, f_w)).reshape(b, th, tw)


def heatmap_channel_max(preds, clip: bool = True) -> jnp.ndarray:
    """Max over all task heatmap channels.  preds: list of per-task dicts
    with 'heatmap' [B, H, W, K] -> [B, H, W]."""
    from ..losses import clip_sigmoid
    hms = []
    for p in preds:
        hm = p["heatmap"]
        hms.append(clip_sigmoid(hm) if clip else hm)
    return jax.lax.stop_gradient(
        jnp.concatenate(hms, axis=-1).max(axis=-1))


def fp_mask_from_heatmaps(mode: str,
                          fg_mask: jnp.ndarray,
                          gt_hm_max: jnp.ndarray,
                          teacher_hm_max: jnp.ndarray,
                          student_hm_max: jnp.ndarray,
                          thres: float,
                          gt_thres: Optional[float] = None) -> jnp.ndarray:
    """FP mining modes (reference add_fp_as_fg:891-905).  All [B, H, W];
    caller pre-resizes to a common resolution.  Returns float mask."""
    if gt_thres is None:
        gt_thres = thres
    if mode == "teacher":
        fp = (gt_hm_max < gt_thres) & (teacher_hm_max > thres)
    elif mode == "student":
        fp = (gt_hm_max < gt_thres) & (student_hm_max > thres)
    elif mode == "teacher_selected_student":
        fp = ((gt_hm_max < gt_thres) & (student_hm_max > thres) &
              (teacher_hm_max < gt_thres))
    elif mode == "teacher+teacher_selected_student":
        fp1 = (gt_hm_max < gt_thres) & (teacher_hm_max > thres)
        fp2 = ((gt_hm_max < gt_thres) & (student_hm_max > thres) &
               (teacher_hm_max < gt_thres))
        fp = fp1 | fp2
    else:
        raise NotImplementedError(mode)
    fp = fp & (fg_mask == 0)
    return jax.lax.stop_gradient(fp.astype(jnp.float32))


def connected_component_scale(fp_mask: jnp.ndarray,
                              max_iters: Optional[int] = None
                              ) -> jnp.ndarray:
    """Per-pixel 1/|component| over 4-connected FP components
    (reference 'dfs' fp_scale_mode, add_fp_as_fg:930-969, host BFS).

    Iterative min-label propagation: each pixel starts with its flat
    index; repeatedly take the min over the 4-neighborhood restricted to
    FP pixels until fixpoint.  Worst case needs H+W iterations (snake
    components); real FP blobs converge in a handful.
    """
    b, h, w = fp_mask.shape
    on = fp_mask > 0
    big = jnp.int32(h * w)
    init = jnp.where(
        on, jnp.arange(h * w, dtype=jnp.int32).reshape(1, h, w), big)
    init = jnp.broadcast_to(init, (b, h, w))
    iters = max_iters if max_iters is not None else (h + w)

    def propagate(labels):
        up = jnp.concatenate([labels[:, :1], labels[:, :-1]], axis=1)
        down = jnp.concatenate([labels[:, 1:], labels[:, -1:]], axis=1)
        left = jnp.concatenate([labels[:, :, :1], labels[:, :, :-1]],
                               axis=2)
        right = jnp.concatenate([labels[:, :, 1:], labels[:, :, -1:]],
                                axis=2)
        nbr = jnp.minimum(jnp.minimum(up, down), jnp.minimum(left, right))
        return jnp.where(on, jnp.minimum(labels, nbr), big)

    def cond(state):
        i, labels, changed = state
        return changed & (i < iters)

    def body(state):
        i, labels, _ = state
        new = propagate(labels)
        return i + 1, new, jnp.any(new != labels)

    _, labels, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), init, jnp.bool_(True)))

    # component sizes via one-hot-free scatter-add per sample
    def sizes(lab):
        flat = lab.reshape(-1)
        cnt = jnp.zeros((h * w + 1,), jnp.float32).at[flat].add(
            1.0, mode="drop")
        return cnt[flat].reshape(h, w)

    comp_size = jax.vmap(sizes)(labels)
    return jnp.where(on, 1.0 / jnp.maximum(comp_size, 1.0), 0.0)


def fp_scale_average(fp_mask: jnp.ndarray) -> jnp.ndarray:
    """'average' fp_scale_mode: 1 / (total FP pixels per sample)."""
    n = jnp.maximum(fp_mask.sum(axis=(1, 2), keepdims=True), 1.0)
    return jnp.where(fp_mask > 0, 1.0 / n, 0.0)


def non_empty_background(canvas: jnp.ndarray, fg_mask: jnp.ndarray
                         ) -> jnp.ndarray:
    """Non-empty background pixels from the teacher canvas
    (reference bevdet_distill.py:1130-1137): canvas channel-max,
    max-pooled to the mask resolution, nonzero & not foreground."""
    b, ch, cw, _ = canvas.shape
    _, h, w = fg_mask.shape
    cmax = canvas.max(axis=-1)
    ne = resize_mask(cmax, (h, w))
    return jax.lax.stop_gradient(
        ((fg_mask == 0) & (ne != 0)).astype(jnp.float32))


def extended_foreground_masks(gt_boxes: jnp.ndarray,
                              gt_mask: jnp.ndarray,
                              h: int, w: int,
                              voxel_size, pc_range, grid_size,
                              radius_func: str = "centerpoint2",
                              radius_scale: float = 1.0,
                              gaussian_overlap: float = 0.1,
                              min_radius: int = 2):
    """Gauss-family extended FG mask + draw_scale mask.

    Reference: bevdet_distill.py:1019-1078 — get_targets_single with a
    custom radius func gives per-class gaussians whose channel max is the
    extended FG mask (foreground_mask2), and ``draw_scale``
    (bevdet_distill.py:135-151) writes max(1/ceil(l*w)) inside each
    object's square radius patch (fg_scale_mask2).

    Returns (fg2 [B, H, W], fg_scale2 [B, H, W]).
    """
    from ...core.gaussian import gaussian_scale_mask_dense, radius_jnp
    assert grid_size[0] % w == 0
    osf = grid_size[0] // w
    cx = (gt_boxes[..., 0] - pc_range[0]) / voxel_size[0] / osf
    cy = (gt_boxes[..., 1] - pc_range[1]) / voxel_size[1] / osf
    dxf = gt_boxes[..., 3] / voxel_size[0] / osf
    dyf = gt_boxes[..., 4] / voxel_size[1] / osf
    radius = radius_jnp(radius_func, dyf, dxf, gaussian_overlap,
                        radius_scale)
    radius = jnp.maximum(radius, float(min_radius))

    def per_sample(c_xy, r, ok, dx, dy):
        fg2 = gaussian_scale_mask_dense(c_xy, r, ok, h, w)
        # draw_scale: inside each object's radius patch, at least
        # 1/ceil(area) (max-composed over objects)
        area = jnp.ceil(jnp.maximum(dx * dy, 1e-6))
        value = 1.0 / area
        ys = jnp.arange(h, dtype=jnp.float32)[:, None]
        xs = jnp.arange(w, dtype=jnp.float32)[None, :]
        cxi = jnp.floor(c_xy[:, 0]).astype(jnp.float32)
        cyi = jnp.floor(c_xy[:, 1]).astype(jnp.float32)
        r_int = jnp.floor(r)
        inpatch = ((jnp.abs(xs[None] - cxi[:, None, None]) <=
                    r_int[:, None, None]) &
                   (jnp.abs(ys[None] - cyi[:, None, None]) <=
                    r_int[:, None, None]) & ok[:, None, None])
        per_obj = jnp.where(inpatch, value[:, None, None], 0.0)
        return fg2, per_obj.max(axis=0)

    return jax.vmap(per_sample)(
        jnp.stack([cx, cy], -1), radius, gt_mask, dxf, dyf)
