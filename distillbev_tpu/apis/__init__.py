from .inference import init_model, inference_detector
from .test import run_eval, evaluate_results
