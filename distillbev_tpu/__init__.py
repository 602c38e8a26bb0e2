"""distillbev_tpu — TPU-native cross-modal BEV distillation framework.

A ground-up JAX/XLA/Pallas/pjit re-design of the capabilities of
qcraftai/distill-bev (DistillBEV, ICCV 2023): LiDAR teachers (CenterPoint,
DynamicCenterPoint, MVP, LidarFormer/MVPFormer) distilling into multi-camera
BEV students (BEVDepth4D, BEVFormer) on nuScenes.
"""
__version__ = "0.1.0"

from .config import Config, ConfigDict, DictAction
from .registry import Registry, build_from_cfg

__all__ = [
    "Config", "ConfigDict", "DictAction", "Registry", "build_from_cfg",
    "__version__",
]
