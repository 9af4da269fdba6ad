from vlm_clip_tpu.models import adapters as adapters  # noqa: F401
from vlm_clip_tpu.models import clip as clip  # noqa: F401
from vlm_clip_tpu.models import model_t as model_t  # noqa: F401
from vlm_clip_tpu.models.clip import (  # noqa: F401
    get_image_features,
    get_text_features,
    init_clip,
)
