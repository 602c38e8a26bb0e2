from .builder import (MODELS, BACKBONES, NECKS, HEADS, LOSSES, DETECTORS,
                      VOXEL_ENCODERS, MIDDLE_ENCODERS, TRANSFORMERS,
                      ATTENTION, build_backbone, build_neck, build_head,
                      build_loss, build_detector, build_model,
                      build_voxel_encoder, build_middle_encoder)
from . import layers, losses
from .voxel_encoders import pillar_encoder  # noqa: F401 — registration
from .middle_encoders import pillar_scatter  # noqa: F401
from .backbones import second  # noqa: F401
from .backbones import resnet  # noqa: F401
from .necks import second_fpn  # noqa: F401
from .necks import fpn  # noqa: F401
from .necks import view_transformer  # noqa: F401
from .necks import view_transformer_reproduce  # noqa: F401
from .backbones import swin  # noqa: F401
from .dense_heads import centerpoint_head  # noqa: F401
from .detectors import centerpoint  # noqa: F401
from .detectors import bevdet  # noqa: F401
from .detectors import bevdet_distill  # noqa: F401
from .distill import fgd as _fgd  # noqa: F401
from .distill import masks as distill_masks  # noqa: F401
from .voxel_encoders import voxel_encoder  # noqa: F401
from .middle_encoders import sparse_encoder  # noqa: F401
from .middle_encoders import sparse_unet  # noqa: F401
from .transformer import attention as _attn  # noqa: F401
from .transformer import encoder as _enc  # noqa: F401
from .transformer import decoder as _dec  # noqa: F401
from .transformer import perception_transformer as _pt  # noqa: F401
from .dense_heads import bevformer_head  # noqa: F401
from .detectors import lidarformer  # noqa: F401
from .detectors import bevformer  # noqa: F401
from .detectors import mvx_two_stage  # noqa: F401
from .detectors import single_stage  # noqa: F401
