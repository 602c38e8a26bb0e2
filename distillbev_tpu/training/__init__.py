from . import schedules, optim, param_utils
from .train_step import (TrainState, PointsBatch, DistillBatch,
                         BEVFormerBatch, make_detector_train_step,
                         make_distill_train_step,
                         make_camera_distill_train_step,
                         make_bevformer_distill_train_step,
                         make_bevformer_distill_split_steps,
                         make_bevformer_train_step,
                         init_train_state, gravity_centered)
