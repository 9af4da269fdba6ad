from vlm_clip_tpu.data.captions import (  # noqa: F401
    EMOTIONS,
    get_emotion_descriptions,
    single_prompt,
)
