"""vlm_clip_tpu — a TPU-native CLIP-adapter framework.

A from-scratch JAX / XLA / Pallas / pjit rebuild of the capabilities of the
reference repo Quillboltcode/VLM-CLIP (parameter-efficient CLIP fine-tuning
with bottleneck / sequence / cross-modal adapters for facial-emotion
recognition; VLM-context-enhanced classification; zero-shot evaluation),
designed TPU-first:

- frozen dual-tower CLIP (ViT image tower + causal text transformer) as pure
  functional pytrees, bf16 compute / fp32 params, jit/pjit end-to-end;
- fused Pallas kernels for the hot ops (bottleneck adapters, contrastive
  head, on-TPU image normalization/patchify);
- SPMD via `jax.sharding.Mesh(('data', 'model'))`: DP shards the batch with
  an all_gather for the global contrastive logit matrix, TP shards attention
  heads / MLPs of the large towers;
- optax optimizers + orbax checkpoints with an adapter-only export matching
  the reference's checkpoint contract.

Reference behavior contracts are cited per-module as /root/reference file:line.
"""

__version__ = "0.1.0"

from vlm_clip_tpu.core import config as config  # noqa: F401
