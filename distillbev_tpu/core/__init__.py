from .bbox.structures import LiDARInstance3DBoxes, get_box_type
from .bbox import box_np_ops, box_jax_ops
from . import gaussian, post_processing
from .points import LiDARPoints

__all__ = [
    "LiDARInstance3DBoxes", "get_box_type", "box_np_ops", "box_jax_ops",
    "gaussian", "post_processing", "LiDARPoints",
]
