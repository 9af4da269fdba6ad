"""Config dataclasses and presets.

One coherent config tree replacing the reference's three uncoordinated
mechanisms (reference: config.py:1-32, constants.py:1-17, train.py:13-36).
Value sets for the three pipelines are preserved as presets:

- Pipeline M ("modular", contrastive): reference train.py:13-36
- Pipeline T ("trung", class-text CE):  reference constants.py:4-12
- Pipeline V ("VLM-enhanced"):          reference config.py:8-32
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

# RAF-DB 7-class label set (reference config.py:28, constants.py:15-17).
EMOTIONS: Tuple[str, ...] = (
    "angry", "disgust", "fear", "happy", "neutral", "sad", "surprise",
)

# CLIP tokenizer special ids (openai/clip-* checkpoints).
CLIP_BOS_TOKEN_ID = 49406
CLIP_EOS_TOKEN_ID = 49407
CLIP_MAX_TEXT_LEN = 77

# CLIP image normalization stats (used by CLIPProcessor; the reference's
# video path instead uses ImageNet stats — see data/video.py).
CLIP_IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


@dataclasses.dataclass(frozen=True)
class VisionConfig:
    """ViT image tower hyperparameters (HF CLIPVisionConfig-compatible)."""

    hidden_size: int = 768
    intermediate_size: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    image_size: int = 224
    patch_size: int = 32
    layer_norm_eps: float = 1e-5
    hidden_act: str = "quick_gelu"

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def seq_len(self) -> int:
        return self.num_patches + 1  # + class token

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


@dataclasses.dataclass(frozen=True)
class TextConfig:
    """CLIP text transformer hyperparameters (HF CLIPTextConfig-compatible)."""

    hidden_size: int = 512
    intermediate_size: int = 2048
    num_layers: int = 12
    num_heads: int = 8
    vocab_size: int = 49408
    max_positions: int = 77
    layer_norm_eps: float = 1e-5
    hidden_act: str = "quick_gelu"
    eos_token_id: int = CLIP_EOS_TOKEN_ID
    # HF CLIP with config eos_token_id==2 pools at argmax(input_ids) (the EOT
    # token has the highest id in the CLIP vocab); openai checkpoints use this
    # path. We default to the equivalent-but-explicit argmax pooling.
    pool_by_argmax_ids: bool = True

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


@dataclasses.dataclass(frozen=True)
class CLIPConfig:
    """Dual-tower CLIP with linear projections and learned logit scale."""

    vision: VisionConfig = dataclasses.field(default_factory=VisionConfig)
    text: TextConfig = dataclasses.field(default_factory=TextConfig)
    projection_dim: int = 512
    logit_scale_init: float = 2.6592  # ln(1/0.07), HF default
    name: str = "clip-vit-base-patch32"


_PRESETS = {
    # (vision hid, vision mlp, v layers, v heads, img, patch,
    #  text hid, text mlp, t layers, t heads, proj)
    "vit-base-patch32": (768, 3072, 12, 12, 224, 32, 512, 2048, 12, 8, 512),
    "vit-base-patch16": (768, 3072, 12, 12, 224, 16, 512, 2048, 12, 8, 512),
    "vit-large-patch14": (1024, 4096, 24, 16, 224, 14, 768, 3072, 12, 12, 768),
    "vit-large-patch14-336": (1024, 4096, 24, 16, 336, 14, 768, 3072, 12, 12, 768),
}


def clip_preset(name: str) -> CLIPConfig:
    """Build a CLIPConfig for a standard openai CLIP variant.

    Accepts either the short name (``vit-base-patch32``) or the full HF id
    (``openai/clip-vit-base-patch32``).
    """
    key = name.split("/")[-1]
    if key.startswith("clip-"):
        key = key[len("clip-"):]
    if key not in _PRESETS:
        raise ValueError(f"unknown CLIP preset {name!r}; know {sorted(_PRESETS)}")
    (vh, vm, vl, vhd, img, patch, th, tm, tl, thd, proj) = _PRESETS[key]
    return CLIPConfig(
        vision=VisionConfig(
            hidden_size=vh, intermediate_size=vm, num_layers=vl,
            num_heads=vhd, image_size=img, patch_size=patch,
        ),
        text=TextConfig(
            hidden_size=th, intermediate_size=tm, num_layers=tl, num_heads=thd,
        ),
        projection_dim=proj,
        name=key,
    )


@dataclasses.dataclass(frozen=True)
class AdapterConfig:
    """Union of the reference's adapter hyperparameters.

    - ``bottleneck_dim``: feature-adapter bottleneck (T: 64 constants.py:8,
      V: 192 config.py:16).
    - ``alpha/beta/gamma``: residual blend ratios (T/V, config.py:18-20).
    - ``dropout``: V adapters use Dropout(0.1) (model_v.py:22); T uses none.
    - ``text/vision_adapter_size``: sequence-adapter bottlenecks (M,
      train.py:16-17).
    - ``shared_adapter_layers``: cross-modal attention adapter stack depth
      (M, train.py:18).
    """

    bottleneck_dim: int = 64
    alpha: float = 0.2
    beta: float = 0.2
    gamma: float = 0.3
    dropout: float = 0.0
    text_adapter_size: int = 256
    vision_adapter_size: int = 256
    shared_adapter_layers: int = 2
    shared_num_heads: int = 8
    use_text_adapter: bool = True
    use_vision_adapter: bool = True
    use_shared_adapters: bool = True


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    batch_size: int = 32
    num_epochs: int = 5
    learning_rate: float = 3e-4
    weight_decay: float = 0.0
    warmup_steps: int = 0
    max_grad_norm: Optional[float] = None
    schedule: str = "constant"  # constant | linear | cosine
    seed: int = 42
    # dtype policy knobs (see core/dtypes.py)
    compute_dtype: str = "bfloat16"
    # adapters-only vs full fine-tune (reference model_m.py:21, 72-75)
    freeze_backbone: bool = True
    output_dir: str = "./checkpoints"
    save_every: int = 1
    eval_every: int = 1


@dataclasses.dataclass(frozen=True)
class PipelineMConfig:
    """Contrastive adapter fine-tuning preset (reference train.py:13-36)."""

    clip: CLIPConfig = dataclasses.field(
        default_factory=lambda: clip_preset("vit-base-patch32"))
    adapters: AdapterConfig = dataclasses.field(
        default_factory=lambda: AdapterConfig(
            text_adapter_size=256, vision_adapter_size=256,
            shared_adapter_layers=2))
    train: TrainConfig = dataclasses.field(
        default_factory=lambda: TrainConfig(
            batch_size=32, num_epochs=10, learning_rate=5e-5,
            weight_decay=0.01, warmup_steps=100, max_grad_norm=1.0,
            schedule="linear"))
    max_length: int = CLIP_MAX_TEXT_LEN


@dataclasses.dataclass(frozen=True)
class PipelineTConfig:
    """Class-text CE adapter preset (reference constants.py:4-12)."""

    clip: CLIPConfig = dataclasses.field(
        default_factory=lambda: clip_preset("vit-large-patch14"))
    adapters: AdapterConfig = dataclasses.field(
        default_factory=lambda: AdapterConfig(
            bottleneck_dim=64, alpha=0.2, beta=0.2, dropout=0.0))
    train: TrainConfig = dataclasses.field(
        default_factory=lambda: TrainConfig(
            batch_size=32, num_epochs=5, learning_rate=3e-4))


@dataclasses.dataclass(frozen=True)
class PipelineVConfig:
    """VLM-context-enhanced preset (reference config.py:8-32)."""

    clip: CLIPConfig = dataclasses.field(
        default_factory=lambda: clip_preset("vit-large-patch14"))
    adapters: AdapterConfig = dataclasses.field(
        default_factory=lambda: AdapterConfig(
            bottleneck_dim=192, alpha=0.2, beta=0.2, gamma=0.3, dropout=0.1))
    train: TrainConfig = dataclasses.field(
        default_factory=lambda: TrainConfig(
            batch_size=4, num_epochs=5, learning_rate=3e-4))
    vlm_model_name: str = "Qwen/Qwen2.5-VL-3B-Instruct"
    vlm_min_pixels: int = 128 * 28 * 28
    vlm_max_pixels: int = 640 * 28 * 28
    num_samples_to_display_per_class: int = 3
