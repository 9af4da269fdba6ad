from vlm_clip_tpu.core.config import (  # noqa: F401
    AdapterConfig,
    CLIPConfig,
    PipelineMConfig,
    PipelineTConfig,
    PipelineVConfig,
    TextConfig,
    TrainConfig,
    VisionConfig,
    clip_preset,
)
from vlm_clip_tpu.core.dtypes import DTypePolicy  # noqa: F401
