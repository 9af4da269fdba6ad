from vlm_clip_tpu.eval.evaluate import EvalResult, evaluate_model  # noqa: F401
from vlm_clip_tpu.eval.compare import compare_models  # noqa: F401
