from vlm_clip_tpu.ops.fused_adapter import (  # noqa: F401
    feature_adapter_blend_fused,
    fused_enabled,
    seq_adapter_fused,
)
