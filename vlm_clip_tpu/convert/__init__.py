from vlm_clip_tpu.convert.hf import convert_hf_clip, load_hf_clip  # noqa: F401
