from vlm_clip_tpu.utils.logging import seed_everything, setup_logging  # noqa: F401
