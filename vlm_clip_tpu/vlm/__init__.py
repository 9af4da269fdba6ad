from vlm_clip_tpu.vlm.extractor import (  # noqa: F401
    CachedContextExtractor,
    ContextExtractor,
    StubContextExtractor,
)
