"""Reference hs/query similarity distillation for the BEVFormer family.

Faithful counterparts of the reference's two transformer-side distill
losses (reference: mmdet3d/models/detectors/bevformer_distill.py:364-374
``query_distill_loss``, :376-385 ``hs_distill_loss``), with the
reference's config keys (``query_criterion``/``query_loss_weight``,
``feat_criterion``/``hs_feat_loss_weights``) and normalizations.

Layout note: the reference feats arrive as [B, C, H, W] and are
flattened to [B, HW, C]; this repo is channels-last so the flatten is a
plain reshape.  ``hs`` keeps the reference's [L, B, Q, C] stacking
(decoder layers leading).
"""
from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from ..builder import build_loss


def query_distill_loss(teacher_feat: jnp.ndarray,
                       teacher_query: jnp.ndarray,
                       teacher_hs: jnp.ndarray,
                       student_feat: jnp.ndarray,
                       student_query: jnp.ndarray,
                       student_hs: jnp.ndarray,
                       query_criterion: dict,
                       query_loss_weight: float) -> Dict[str, jnp.ndarray]:
    """bev_embed <-> query-embedding / hs similarity-map loss
    (reference bevformer_distill.py:364-374).

    * feats [B, H, W, C] -> [B, HW, C]
    * ``query`` is the learned [Q, 2C] query_embedding; the similarity
      uses its SECOND half (the content part; the first half is the
      positional query), summed over queries -> [B, HW]
    * ``hs`` [L, B, Q, C]: per-layer feat@hs similarity summed over
      queries -> [B, HW, L]
    * loss = criterion(t_query_sim, s_query_sim) +
      criterion(t_hs_sim, s_hs_sim), scaled by ``query_loss_weight``.
    """
    criterion = build_loss(dict(query_criterion))
    b = teacher_feat.shape[0]
    t_flat = teacher_feat.reshape(b, -1, teacher_feat.shape[-1])
    s_flat = student_feat.reshape(b, -1, student_feat.shape[-1])
    t_half = teacher_query[:, teacher_query.shape[1] // 2:]   # [Q, C]
    s_half = student_query[:, student_query.shape[1] // 2:]
    t_query_sim = (t_flat @ t_half.T).sum(-1)                 # [B, HW]
    s_query_sim = (s_flat @ s_half.T).sum(-1)
    # einsum('bij,bjkl->bikl', feat, hs.permute(1,3,0,2)).sum(-1)
    # == sum over queries of per-layer feat.hs dot products
    t_hs_sim = jnp.einsum("bnc,lbqc->bnl", t_flat, teacher_hs)
    s_hs_sim = jnp.einsum("bnc,lbqc->bnl", s_flat, student_hs)
    loss = criterion(t_query_sim, s_query_sim) + \
        criterion(t_hs_sim, s_hs_sim)
    return {"query_loss": loss * query_loss_weight}


def hs_distill_loss(teacher_feat: jnp.ndarray,
                    student_feat: jnp.ndarray,
                    feat_criterion: dict,
                    hs_feat_loss_weights: float
                    ) -> Dict[str, jnp.ndarray]:
    """Plain hs-feature distill for ('hs', 'hs') feat-position pairs
    (reference bevformer_distill.py:376-385): feats are the squeezed
    decoder stacks; loss = criterion(student, teacher).sum() * w / dim0
    — the reference's ``student_B`` is the leading (layer) axis of the
    squeezed [L, Q, C] stack."""
    criterion = build_loss(dict(feat_criterion))
    t = jnp.squeeze(teacher_feat)
    s = jnp.squeeze(student_feat)
    lead = s.shape[0]
    loss = criterion(s, t).sum() * hs_feat_loss_weights / lead
    return {"hs_feat_loss": loss}
