"""Single-image demo (reference ``test_single_image``, trung.py:655-705):
one image -> per-class probabilities, printed with the prompt bank used,
plus a probability bar-chart png.
"""

from __future__ import annotations

import argparse


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="Classify one image with the "
                                            "zero-shot / adapter models")
    p.add_argument("image")
    p.add_argument("--clip-model-name", default="vit-large-patch14")
    p.add_argument("--adapter-ckpt", default=None,
                   help="T-style adapter checkpoint (fc1/fc2 dicts); "
                        "omit for pure zero-shot")
    p.add_argument("--all-descriptions", action="store_true")
    p.add_argument("--plot-out", default="single_image_probs.png")
    args = p.parse_args(argv)

    import numpy as np

    import jax.numpy as jnp

    from vlm_clip_tpu.cli.common import load_backbone, make_tokenizer
    from vlm_clip_tpu.core.config import EMOTIONS
    from vlm_clip_tpu.data.captions import get_emotion_descriptions
    from vlm_clip_tpu.data.preprocess import preprocess_host
    from vlm_clip_tpu.models.model_t import (CLIPAdapterT,
                                             ZeroShotEmotionRecognition)

    clip_params, cfg = load_backbone(args.clip_model_name)
    tokenizer = make_tokenizer(cfg)
    if args.adapter_ckpt:
        from vlm_clip_tpu.train.checkpoint import load_v_adapters

        model = CLIPAdapterT(clip_params, cfg, tokenizer)
        loaded = load_v_adapters(args.adapter_ckpt)
        if loaded:
            model.adapter_params.update(loaded)
        model.update_emotion_embeddings()
    else:
        model = ZeroShotEmotionRecognition(clip_params, cfg, tokenizer)

    px = preprocess_host(args.image, cfg.vision.image_size)[None]
    if args.all_descriptions:
        probs = model.predict_with_all_descriptions(jnp.asarray(px))
    else:
        probs = model.predict(jnp.asarray(px))
    probs = np.asarray(probs)[0]

    print(f"\nPredictions for {args.image}:")
    order = np.argsort(-probs)
    for i in order:
        bar = "#" * int(probs[i] * 40)
        print(f"  {EMOTIONS[i]:>9}: {probs[i]:.4f} {bar}")
    print(f"\nPredicted: {EMOTIONS[order[0]]} "
          f"(confidence {probs[order[0]]:.4f})")

    print("\nPrompt bank used:")
    for emotion, descs in get_emotion_descriptions().items():
        print(f"  {emotion}:")
        for d in descs:
            print(f"    - {d}")

    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(8, 4))
        ax.bar(list(EMOTIONS), probs)
        ax.set_ylabel("probability")
        ax.set_title(f"Emotion probabilities — {args.image}")
        plt.xticks(rotation=45)
        fig.savefig(args.plot_out, bbox_inches="tight", dpi=120)
        print(f"\nsaved probability chart to {args.plot_out}")
    except Exception as e:  # headless/plot-less environments
        print(f"(skipping plot: {e})")


if __name__ == "__main__":
    main()
