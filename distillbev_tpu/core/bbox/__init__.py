from .structures import LiDARInstance3DBoxes, get_box_type
from . import box_np_ops, box_jax_ops

__all__ = ["LiDARInstance3DBoxes", "get_box_type", "box_np_ops",
           "box_jax_ops"]
