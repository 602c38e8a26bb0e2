"""Model registries (reference: mmdet3d/models/builder.py).

One parent ``MODELS`` registry with child registries per component role;
``build_*`` helpers instantiate flax modules from config dicts.  Unlike the
reference (torch ``nn.Module`` instances holding state), building here
returns *stateless* flax ``nn.Module`` definitions; parameters live in
separate pytrees created by ``module.init``.
"""
from __future__ import annotations

from ..registry import Registry, build_from_cfg

MODELS = Registry("models")
BACKBONES = Registry("backbones", parent=MODELS)
NECKS = Registry("necks", parent=MODELS)
HEADS = Registry("heads", parent=MODELS)
LOSSES = Registry("losses", parent=MODELS)
DETECTORS = Registry("detectors", parent=MODELS)
VOXEL_ENCODERS = Registry("voxel_encoders", parent=MODELS)
MIDDLE_ENCODERS = Registry("middle_encoders", parent=MODELS)
TRANSFORMERS = Registry("transformers", parent=MODELS)
ATTENTION = Registry("attention", parent=MODELS)
BBOX_CODERS = Registry("bbox_coders", parent=MODELS)


def build_backbone(cfg):
    return build_from_cfg(cfg, BACKBONES)


def build_neck(cfg):
    return build_from_cfg(cfg, NECKS)


def build_head(cfg):
    return build_from_cfg(cfg, HEADS)


def build_loss(cfg):
    return build_from_cfg(cfg, LOSSES)


def build_voxel_encoder(cfg):
    return build_from_cfg(cfg, VOXEL_ENCODERS)


def build_middle_encoder(cfg):
    return build_from_cfg(cfg, MIDDLE_ENCODERS)


def build_transformer(cfg):
    return build_from_cfg(cfg, TRANSFORMERS)


def build_attention(cfg):
    return build_from_cfg(cfg, ATTENTION)


def build_bbox_coder(cfg):
    return build_from_cfg(cfg, BBOX_CODERS)


def build_detector(cfg, train_cfg=None, test_cfg=None):
    """Build a detector; train_cfg/test_cfg are merged in as attributes
    (reference builder passes them through to the detector ctor)."""
    defaults = {}
    if train_cfg is not None:
        defaults["train_cfg"] = train_cfg
    if test_cfg is not None:
        defaults["test_cfg"] = test_cfg
    return build_from_cfg(cfg, DETECTORS, defaults or None)


def build_model(cfg, train_cfg=None, test_cfg=None):
    return build_detector(cfg, train_cfg, test_cfg)
