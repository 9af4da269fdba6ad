"""Speculative decoding: measured acceptance on realistic text + TPU cost.

Random synthetic weights accept ~no drafts (their greedy chains don't
repeat phrases), so engine-only benches measure pure overhead and say
nothing about the benefit. This bench replaces the round-3 "projects
1.5-2.5x" arithmetic with measurements, in two halves:

1. ORACLE ACCEPTANCE (hermetic, model-independent): walk the shipped
   n-gram draft (`vlm/speculative.ngram_draft`) along reference-style
   VLM context descriptions — the reference's actual serving workload
   is "describe the emotion and facial expression ..." paragraphs
   (model_v.py:86,108-118), which reuse phrases heavily. At each round
   the draft is scored against the text's true continuation, exactly
   the acceptance test the engine applies when the model emits this
   text. This is the acceptance a greedy model that produces such text
   would realize; it is an upper bound only insofar as a sampled model
   emits less self-consistent text.

2. ROUND COST (real TPU): vanilla ms/step vs spec ms/round at the
   serving shapes (3B weights, 8 and 64 slots), via the engine's
   always-on rounds counter.

The combination — tok/s = slots * (1 + acceptance) / round_ms against
vanilla slots / step_ms — is printed as a table with every input
measured (acceptance from (1), costs from (2)).

    python -m vlm_clip_tpu.cli.bench_spec            # hermetic half
    python -m vlm_clip_tpu.cli.bench_spec --tpu      # + TPU round costs
"""

from __future__ import annotations

import argparse
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/vlm_clip_tpu_jaxcache")

# Reference-style VLM context descriptions (the workload class of
# model_v.py:108-118's generate calls): multi-sentence facial-expression
# paragraphs of the kind Qwen2.5-VL-Instruct produces for the extraction
# prompt. Composed for this bench; the phrase reuse across and within
# descriptions (the person's, slightly, suggesting, appears to be) is
# the statistical property prompt-lookup speculation exploits.
CORPUS = [
    "The person in the image appears to be experiencing a moment of "
    "genuine happiness. Their eyes are slightly narrowed with visible "
    "crinkling at the outer corners, and their eyebrows are relaxed "
    "and resting in a natural position. The mouth is curved into a "
    "broad smile with the corners of the mouth pulled upward, showing "
    "the upper teeth. The overall expression suggests warmth and "
    "genuine enjoyment of the moment.",
    "The person in the image appears to be experiencing sadness. "
    "Their eyes are slightly downcast with the upper eyelids drooping, "
    "and their eyebrows are drawn together and angled upward at the "
    "inner corners. The mouth is turned downward at the corners of "
    "the mouth, with the lower lip pushed slightly forward. The "
    "overall expression suggests a sense of loss or disappointment.",
    "The person in the image appears to be experiencing surprise. "
    "Their eyes are wide open with the whites visible above and below "
    "the iris, and their eyebrows are raised high on the forehead, "
    "creating horizontal wrinkles. The mouth is open in a relaxed "
    "oval shape with the jaw dropped. The overall expression suggests "
    "the person has just encountered something unexpected.",
    "The person in the image appears to be experiencing anger. Their "
    "eyes are narrowed and intense with a fixed glare, and their "
    "eyebrows are drawn together and pulled downward, creating "
    "vertical wrinkles between the eyebrows. The mouth is pressed "
    "into a tight line with the lips compressed. The overall "
    "expression suggests frustration and a readiness to confront.",
    "The person in the image appears to be experiencing fear. Their "
    "eyes are wide open with the upper eyelids raised and tension in "
    "the lower eyelids, and their eyebrows are raised and drawn "
    "together. The mouth is slightly open with the lips stretched "
    "horizontally toward the ears. The overall expression suggests "
    "alarm and a heightened state of alertness.",
    "The person in the image appears to be experiencing disgust. "
    "Their eyes are slightly narrowed, and their eyebrows are lowered. "
    "The nose is wrinkled with the upper lip raised, and the mouth is "
    "slightly open with the upper teeth showing. The overall "
    "expression suggests a strong aversion to something in the "
    "environment.",
    "The person in the image appears to have a neutral expression. "
    "Their eyes are open and relaxed with a steady gaze, and their "
    "eyebrows are resting in a natural position without tension. The "
    "mouth is closed with the lips resting together naturally, "
    "neither smiling nor frowning. The overall expression suggests "
    "calmness and composure, with no strong emotion visible.",
    "The person in the image shows a complex mixture of emotions. "
    "Their eyes are slightly narrowed, suggesting concentration, "
    "while their eyebrows are raised at the inner corners, suggesting "
    "concern. The mouth shows a slight asymmetry, with one corner of "
    "the mouth pulled upward in a half smile. The overall expression "
    "suggests the person is experiencing both amusement and "
    "uncertainty at the same time.",
]


def word_tokens(text: str):
    """Conservative word-level tokenization: one id per
    whitespace-delimited word (punctuation attached). A BPE tokenizer
    splits words into MORE tokens and raises n-gram repetition, so the
    acceptance measured on word tokens is a lower bound for the real
    tokenizer."""
    vocab = {}
    out = []
    for w in text.lower().split():
        out.append(vocab.setdefault(w, len(vocab) + 2))
    return out, vocab


def oracle_acceptance(tokens, k: int, n: int = 2, warmup: int = 0,
                      prompt=()):
    """Walk spec rounds along a known token stream: at each round the
    engine would emit the carried token, draft K continuations from the
    window, and accept the longest prefix agreeing with the model —
    which, for a model emitting exactly this stream, is the stream's
    true continuation. ``prompt`` seeds the window first, exactly as
    the engine seeds ``hist`` at install (prompt-lookup proper): drafts
    may then continue matches found in the prompt. Returns
    (rounds, accepted)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vlm_clip_tpu.vlm.speculative import ngram_draft

    # pin the walk to the host CPU backend: hundreds of tiny lookup
    # dispatches through the TPU tunnel pay ~30 ms RTT each
    cpu = jax.devices("cpu")[0]

    P = len(prompt)
    H = P + len(tokens) + 1
    hist = np.zeros((1, H), np.int32)
    hist[0, :P] = prompt
    g = P          # valid tokens in the window (prompt + emitted)
    i = 0          # position in the output stream
    rounds = accepted = 0
    while i < len(tokens):
        hist[0, g] = tokens[i]
        g += 1
        i += 1
        if i >= len(tokens):
            break
        with jax.default_device(cpu):
            draft = np.asarray(ngram_draft(jnp.asarray(hist),
                                           jnp.asarray([g]), k, n=n))[0]
        true = tokens[i:i + k]
        a = 0
        while a < len(true) and draft[a] == true[a]:
            a += 1
        if i > warmup:
            rounds += 1
            accepted += a
        for j in range(a):
            hist[0, g + j] = tokens[i + j]
        g += a
        i += a
    return rounds, accepted


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--tpu", action="store_true",
                   help="also measure engine round costs on the TPU")
    p.add_argument("--slots", default="8,64")
    p.add_argument("--budget", type=int, default=120)
    p.add_argument("--requests", type=int, default=128)
    args = p.parse_args(argv)

    # ---- half 1: oracle acceptance on realistic text (hermetic) ----------
    print("oracle acceptance of the n-gram draft on reference-style "
          "context descriptions (word tokens, lower bound):")
    acc_by_k = {}
    for k in (2, 4, 8):
        rounds = accepted = emitted = 0
        for text in CORPUS:
            toks, _ = word_tokens(text)
            r, a = oracle_acceptance(toks, k)
            rounds += r
            accepted += a
            emitted += r + a
        acc_by_k[k] = accepted / rounds
        print(f"  K={k}: {accepted / rounds:.2f} accepted/round -> "
              f"{emitted / rounds:.2f} tokens/forward "
              f"({rounds} rounds over {len(CORPUS)} descriptions)",
              flush=True)
    # cross-request phrase reuse: concatenate the corpus as one stream
    # (the engine's hist is per-slot, so this applies to LONG outputs
    # or repeated descriptions, not across slots — report separately)
    all_toks = []
    for text in CORPUS:
        all_toks.extend(word_tokens(text)[0])
    r, a = oracle_acceptance(all_toks, 4)
    acc_long = a / r
    print(f"  K=4 over one concatenated long stream: {acc_long:.2f} "
          f"accepted/round (phrase reuse across paragraphs)", flush=True)

    # ---- prompt-seeded window (prompt lookup proper) ---------------------
    # The engine seeds hist with the prompt at install; three workload
    # models, ordered by how much output text the prompt anticipates:
    #   instruction — the extraction instruction alone (phrases like
    #     "facial expression" recur in the output a handful of times);
    #   paraphrase  — a previous description of a DIFFERENT image in
    #     the prompt (multi-turn / few-shot): the output reuses the
    #     corpus scaffold ("The person in the image appears to be
    #     experiencing ...", "Their eyes are ...");
    #   re-describe — the SAME description in the prompt (refine/repeat
    #     /OCR-style loads): the output is essentially a prompt replay.
    from vlm_clip_tpu.vlm.extractor import VLM_PROMPT
    print("prompt-seeded acceptance (engine seeds hist with the "
          "prompt at install), K=4:")
    acc_seeded = {}
    for name, make in (
        ("instruction", lambda t: (VLM_PROMPT, t)),
        ("paraphrase", lambda t: (VLM_PROMPT + " " + CORPUS[
            (CORPUS.index(t) + 1) % len(CORPUS)], t)),
        ("re-describe", lambda t: (VLM_PROMPT + " " + t, t)),
    ):
        rounds = accepted = 0
        for text in CORPUS:
            ptxt, otxt = make(text)
            toks, _ = word_tokens(ptxt + " \x00 " + otxt)
            plen = len(ptxt.split()) + 1   # +1: the \x00 separator
            r, a = oracle_acceptance(toks[plen:], 4, prompt=toks[:plen])
            rounds += r
            accepted += a
        acc_seeded[name] = accepted / rounds
        print(f"  {name:12s}: {accepted / rounds:.2f} accepted/round "
              f"({rounds} rounds)", flush=True)

    if not args.tpu:
        return

    # ---- half 2: engine round costs at the serving shapes (real TPU) -----
    import dataclasses
    import time

    import numpy as np

    from vlm_clip_tpu.cli.bench_decode import synth_quantized_text_params
    from vlm_clip_tpu.cli.bench_vision import synth_vision_params
    from vlm_clip_tpu.vlm.engine import ContinuousBatchingEngine
    from vlm_clip_tpu.vlm.qwen import QwenVLGenerator
    from vlm_clip_tpu.vlm.qwen_convert import (
        fold_qwen_patch_normalization, quantize_qwen_params)
    from vlm_clip_tpu.vlm.qwen_model import qwen25vl_3b
    from vlm_clip_tpu.vlm.qwen_process import prepare_vision_inputs

    cfg = qwen25vl_3b()
    cfg = dataclasses.replace(cfg, text=dataclasses.replace(
        cfg.text, tie_word_embeddings=False))
    print("synthesizing 3B-shape params (8h4) ...", flush=True)
    text = synth_quantized_text_params(cfg.text, 8, 4, fused=True)
    vision = synth_vision_params(cfg.vision)
    vision = fold_qwen_patch_normalization(vision, cfg.vision)
    vision = quantize_qwen_params({"vision": vision}, 8)["vision"]
    gen = QwenVLGenerator({"text": text, "vision": vision}, cfg,
                          max_len=768)

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (448, 448, 3), np.uint8)
    vin = prepare_vision_inputs(img, cfg.vision, fixed_resolution=448,
                                raw_uint8=True)
    n_vis = vin.num_vision_tokens
    ids = np.asarray(
        [11, 22, cfg.vision_start_token_id] + [cfg.image_token_id] * n_vis
        + list(rng.integers(1, 10000, 24)), np.int64)

    def run(slots, spec_k):
        eng = ContinuousBatchingEngine(gen, n_slots=slots,
                                       sync_steps=16, spec_k=spec_k,
                                       refill_chunks=(32, 8, 1),
                                       profile=True)
        for _ in range(args.requests):
            eng.submit(ids, vin, max_new_tokens=args.budget)
        out = eng.flush()
        # timed second run (first pays compiles)
        eng2 = ContinuousBatchingEngine(gen, n_slots=slots,
                                        sync_steps=16, spec_k=spec_k,
                                        refill_chunks=(32, 8, 1),
                                        profile=True)
        for _ in range(args.requests):
            eng2.submit(ids, vin, max_new_tokens=args.budget)
        t0 = time.perf_counter()
        out = eng2.flush()
        dt = time.perf_counter() - t0
        toks = sum(len(v) for v in out.values())
        rounds = eng2.stats["rounds"]
        ms_round = eng2.stats["steps_s"] / rounds * 1e3
        # per-slot-round emission rate: vanilla emits <= 1 (slot
        # utilization); spec emits 1 + accepted drafts
        rate = toks / (rounds * slots)
        note = (f"measured accepted/round = {rate - 1:+.2f} "
                f"(synth weights)" if spec_k
                else f"slot utilization {rate:.2f}")
        print(f"  slots={slots} spec_k={spec_k}: {ms_round:.2f} ms/round "
              f"(decode only), {toks} tokens in {dt:.1f}s end-to-end, "
              + note, flush=True)
        return ms_round

    print("engine round costs (3B 8h4, budget "
          f"{args.budget}, {args.requests} requests):", flush=True)
    table = {}
    for slots in (int(s) for s in args.slots.split(",")):
        v = run(slots, 0)
        s4 = run(slots, 4)
        table[slots] = (v, s4)

    print("\nmeasured-throughput table (decode-only; acceptance "
          "measured on realistic text above, costs from this chip):")
    print(f"| slots | vanilla tok/s | spec4 @acc={acc_by_k[4]:.2f} "
          f"(single description) | spec4 @acc={acc_long:.2f} "
          "(long stream) |")
    for slots, (v, s4) in table.items():
        tv = slots / v * 1e3
        t0_ = slots * (1 + acc_by_k[4]) / s4 * 1e3
        t1_ = slots * (1 + acc_long) / s4 * 1e3
        print(f"| {slots} | {tv:.0f} | {t0_:.0f} ({t0_ / tv:.2f}x) | "
              f"{t1_:.0f} ({t1_ / tv:.2f}x) |")


if __name__ == "__main__":
    main()
