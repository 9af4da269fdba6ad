from vlm_clip_tpu.train.optim import make_optimizer  # noqa: F401
