"""Pipeline parallelism (GPipe-style) for the Qwen text decoder.

The reference has no distributed execution at all (SURVEY.md §2.10 — its
only multi-device construct is HF ``device_map="auto"`` layer *placement*
for the quantized VLM, reference model_v.py:55, which is sequential: one
GPU works while the rest idle). This module is the TPU-native version of
that capability done right: the scanned layer stack ``[L, ...]`` is split
into ``S`` contiguous stages sharded over a ``pipe`` mesh axis, activations
hop stage-to-stage over ICI via ``jax.lax.ppermute``, and ``S`` microbatches
keep every stage busy in steady state (bubble fraction ``(S-1)/(M+S-1)``
for the prefill pass).

Why PP and not just TP for the VLM: TP's per-layer collectives need
high-bandwidth ICI all-to-all within a slice; PP only needs a
point-to-point ring, so it is the axis that crosses slices (DCN) and the
natural fit for decoder variants that outgrow one slice's HBM (Qwen2.5-VL
ships 3B/7B/72B; 72B int8 is ~72 GB — 5+ v5e chips of weights before
caches). Composability: the shard_map is manual over ``pipe`` ONLY
(``axis_names``); stage-local layer compute is ordinary
``text_decoder_layer``, so on a 2-D ``('pipe','model')`` mesh the TP
rules (parallel/sharding.py, via ``from_params(tp_rules=...)``) shard
within each stage and GSPMD inserts the per-layer collectives — proven
equivalent to single-device on the 4x2 CPU mesh
(tests/test_pipeline_parallel.py::test_pp_tp_composed_matches_oracle).

Decode uses token-ring pipelining: with ``M == S`` microbatches, the token
sampled at the last stage at tick ``t`` is ppermuted to stage 0, which
embeds it at tick ``t+1`` — every stage processes a different microbatch's
single-token step each tick, so decode throughput scales with stages
while per-token latency pays the ring traversal. KV caches are stage-local
(each stage holds rows only for its own layers), so cache HBM also scales
with stages.

Equivalence is proven on the 8-device CPU mesh in
tests/test_pipeline_parallel.py: pipelined prefill logits match
``text_forward`` and pipelined greedy generation matches the single-device
``lax.while_loop`` decode token-for-token.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vlm_clip_tpu.vlm.qwen_model import (QwenTextConfig, linear,
                                         mrope_cos_sin, rms_norm,
                                         text_decoder_layer)
from vlm_clip_tpu.vlm.sampling import GREEDY, SamplingConfig, sample_token

PIPE_AXIS = "pipe"

_NEG = -3.4028235e38


def create_pipe_mesh(n_stages: int, devices=None, model: int = 1) -> Mesh:
    """A ``('pipe',)`` mesh over the first ``n_stages`` devices, or a 2-D
    ``('pipe','model')`` mesh (``n_stages x model`` devices) when
    ``model > 1`` — tensor parallelism then shards WITHIN each stage
    (pass ``tp_rules`` to :meth:`PipelineGenerator.from_params`)."""
    devs = list(devices if devices is not None else jax.devices())
    need = n_stages * model
    if len(devs) < need:
        raise ValueError(f"need {need} devices, have {len(devs)}")
    if model == 1:
        return Mesh(np.asarray(devs[:n_stages]), (PIPE_AXIS,))
    from vlm_clip_tpu.parallel.mesh import MODEL_AXIS

    return Mesh(np.asarray(devs[:need]).reshape(n_stages, model),
                (PIPE_AXIS, MODEL_AXIS))


def split_stages(text_params: Dict[str, Any], n_stages: int
                 ) -> Dict[str, Any]:
    """Reshape the scanned layer stack ``[L, ...]`` to ``[S, L//S, ...]``.

    Non-layer leaves (embed_tokens, final_norm, lm_head) are returned
    unchanged — they are replicated (embedding is needed at stage 0, the
    head at the last stage; at 3B scale they are ~600 MB bf16 combined,
    a deliberate simplicity/memory trade documented here).
    """
    L = jax.tree.leaves(text_params["layers"])[0].shape[0]
    if L % n_stages:
        raise ValueError(f"{L} layers not divisible by {n_stages} stages")
    out = dict(text_params)
    out["layers"] = jax.tree.map(
        lambda a: a.reshape((n_stages, L // n_stages) + a.shape[1:]),
        text_params["layers"])
    return out


def shard_staged(staged_params: Dict[str, Any], mesh: Mesh,
                 tp_rules=None) -> Dict[str, Any]:
    """Place staged layers with axis 0 over ``pipe``; replicate the rest.

    With a 2-D ``('pipe','model')`` mesh and ``tp_rules`` (e.g.
    ``parallel.sharding.qwen_param_rules()``), each stage's layer slab is
    ADDITIONALLY tensor-parallel over ``model``: the rule spec for the
    stacked ``[L, ...]`` layout (leading ``None`` = layer axis) gets the
    stage axis prepended, so ``[S, L/S, ...]`` shards as
    ``P('pipe', None, <tp dims>)``. Divisibility fallback and the int4
    ``pallas_ok`` demotion mirror ``parallel.sharding.shard_params``.
    """
    import dataclasses

    from vlm_clip_tpu.ops.quant import QuantizedLinear
    from vlm_clip_tpu.parallel.sharding import _path_str, spec_for_path

    repl = NamedSharding(mesh, P())
    out = dict(staged_params)
    tp = tp_rules is not None and mesh.shape.get("model", 1) > 1

    def _staged_spec(path: str, a) -> Tuple[P, bool]:
        """(spec with 'pipe' prepended, tp_partitioned) + divis. check."""
        if not tp:
            return P(PIPE_AXIS), False
        spec = tuple(spec_for_path(path, tp_rules))
        dims = (PIPE_AXIS,) + spec
        dims = dims[:a.ndim] + (None,) * max(0, a.ndim - len(dims))
        for dim, axis in enumerate(dims):
            if axis is None or axis == PIPE_AXIS:
                continue
            if a.shape[dim] % mesh.shape[axis]:
                return P(PIPE_AXIS), False
        part = any(ax not in (None, PIPE_AXIS) for ax in dims)
        return P(*dims), part

    def _place(kp, node):
        path = "layers/" + _path_str(kp)
        if isinstance(node, QuantizedLinear):
            qw_spec, qw_part = _staged_spec(path + "/qweight", node.qweight)
            sc_spec, _ = _staged_spec(path + "/scale", node.scale)
            placed = dataclasses.replace(
                node,
                qweight=jax.device_put(node.qweight,
                                       NamedSharding(mesh, qw_spec)),
                scale=jax.device_put(node.scale,
                                     NamedSharding(mesh, sc_spec)),
                bias=None if node.bias is None else jax.device_put(
                    node.bias, NamedSharding(
                        mesh, _staged_spec(path + "/bias", node.bias)[0])))
            if node.bits == 4 and qw_part and node.pallas_ok:
                # GSPMD cannot partition the int4 pallas_call
                placed = dataclasses.replace(placed, pallas_ok=False)
            return placed
        spec, _ = _staged_spec(path, node)
        return jax.device_put(node, NamedSharding(mesh, spec))

    out["layers"] = jax.tree_util.tree_map_with_path(
        _place, staged_params["layers"],
        is_leaf=lambda n: isinstance(n, QuantizedLinear))
    for k, v in staged_params.items():
        if k != "layers":
            out[k] = jax.tree.map(lambda a: jax.device_put(a, repl), v)
    return out


class PipeKVCache(NamedTuple):
    """Stage-local KV cache: ``[S, L//S, M, mb, max_len, kv, d]``."""
    k: jnp.ndarray
    v: jnp.ndarray


@dataclasses.dataclass
class PipelineGenerator:
    """Stage-sharded prefill + token-ring decode over a ``pipe`` mesh.

    The public contract mirrors ``QwenVLGenerator`` (vlm/qwen.py) at the
    embeds level: the caller supplies microbatched sequence embeddings
    (text embeds with vision features already scattered in — see
    ``QwenVLGenerator.embed_sequence``) and receives token buffers with
    the same eos-trim semantics as the reference's ``generate()``
    (reference model_v.py:108-118).

    Constraints (asserted): ``n_micro == n_stages`` (the token ring is
    seamless exactly when M == S), layers divisible by stages, and
    ``max_len >= T + max_new + 1`` — the last cache row is a scratch slot
    that soaks up pipeline-bubble writes so they can never corrupt live
    rows. ``repetition_penalty`` works (pass ``prompt_ids``): the last
    stage — the only one that samples — keeps a per-microbatch [mb, V]
    presence table seeded from the prompt and updated with each recorded
    token, so the checkpoint's default sampling config (Qwen2.5-VL-
    Instruct sets penalty 1.05) runs under PP.
    """

    params: Dict[str, Any]       # staged + sharded (see from_params)
    cfg: QwenTextConfig
    mesh: Mesh
    eos_token_id: int
    max_len: int = 1536
    dtype: Any = jnp.bfloat16

    @classmethod
    def from_params(cls, text_params: Dict[str, Any], cfg: QwenTextConfig,
                    mesh: Mesh, eos_token_id: int, max_len: int = 1536,
                    dtype=jnp.bfloat16, tp_rules=None) -> "PipelineGenerator":
        """``tp_rules`` (e.g. ``qwen_param_rules()``) + a 2-D
        ``('pipe','model')`` mesh = tensor parallelism within each stage:
        the shard_map is manual over ``pipe`` only (``axis_names``), so
        GSPMD partitions the stage-local matmuls over ``model`` from the
        parameter shardings alone — PP composes with the TP rules without
        new collective code here (tests/test_pipeline_parallel.py)."""
        S = mesh.shape[PIPE_AXIS]
        staged = shard_staged(split_stages(text_params, S), mesh,
                              tp_rules=tp_rules)
        return cls(staged, cfg, mesh, eos_token_id, max_len, dtype)

    @property
    def n_stages(self) -> int:
        return self.mesh.shape[PIPE_AXIS]

    # -- jitted core ------------------------------------------------------

    @functools.cached_property
    def _run(self):
        cfg, S, max_len = self.cfg, self.n_stages, self.max_len
        mesh, dtype = self.mesh, self.dtype
        eos = self.eos_token_id

        def head_logits(params, y):
            """Final-norm + LM head on the last position of y."""
            h = rms_norm(params["final_norm"], y[:, -1:], cfg.rms_norm_eps)
            if cfg.tie_word_embeddings:
                w = params["embed_tokens"].astype(h.dtype).T
                return jnp.dot(h[:, 0], w,
                               preferred_element_type=jnp.float32)
            # fp {'kernel'} or QuantizedLinear (the untied int4 head of
            # the mixed decode preset) — same dispatch as single-chip
            return linear(params["lm_head"], h[:, 0],
                          out_dtype=jnp.float32)

        def stage_fn(params, embeds, cos, sin, pos_start, length0, pres0,
                     key, max_new, scfg):
            """Runs on every device; ``params['layers']`` is the local
            stage slice. embeds [M, mb, T, H]; cos/sin [M, mb, T, hd];
            pos_start [M] (first decode rope position per microbatch);
            length0 [] (shared prompt length T); pres0 [M, mb, V] bool
            prompt-token presence (repetition penalty) or [M, mb, 1]
            dummy when the penalty is off. Presence is read and updated
            ONLY at the last stage (the one that samples), so the other
            stages' replicated copies going stale is harmless."""
            layers = jax.tree.map(lambda a: a[0], params["layers"])
            stage = jax.lax.axis_index(PIPE_AXIS)
            M, mb, T, H = embeds.shape
            ring = [(i, (i + 1) % S) for i in range(S)]
            kv_shape = (cfg.num_layers // S, M, mb, max_len,
                        cfg.num_kv_heads, cfg.head_dim)
            ck0 = jnp.zeros(kv_shape, dtype)
            cv0 = jnp.zeros(kv_shape, dtype)

            def local_scan(act_in, cos_m, sin_m, mask, ck_m, cv_m, idx):
                def body(h, inp):
                    lp, k_l, v_l = inp
                    h, (nk, nv, _, _) = text_decoder_layer(
                        lp, h, cos_m, sin_m, mask, cfg,
                        (k_l, v_l, None, None), idx)
                    return h, (nk, nv)
                return jax.lax.scan(body, act_in, (layers, ck_m, cv_m))

            # ---- prefill: GPipe over M microbatches -----------------
            causal = jnp.tril(jnp.ones((T, T), bool))
            allowed = jnp.concatenate(
                [causal, jnp.zeros((T, max_len - T), bool)], axis=1)
            pmask = jnp.where(allowed[None, None], 0.0, _NEG)

            def prefill_tick(t, c):
                act, ck, cv, lastlog = c
                inject = embeds[jnp.clip(t, 0, M - 1)]
                act_in = jnp.where(stage == 0, inject, act)
                m = jnp.clip(t - stage, 0, M - 1)
                valid = (t >= stage) & (t - stage <= M - 1)
                ck_m = jax.lax.dynamic_index_in_dim(ck, m, 1, False)
                cv_m = jax.lax.dynamic_index_in_dim(cv, m, 1, False)
                y, (nk, nv) = local_scan(act_in, cos[m], sin[m], pmask,
                                         ck_m, cv_m, jnp.int32(0))
                # nk/nv are the current tokens' rows [L/S, mb, T, kv, d]
                # (text_decoder_layer's rows-only cache contract); gate
                # invalid bubble ticks to rewrite the existing rows.
                nk = jnp.where(valid, nk, ck_m[:, :, :T])
                nv = jnp.where(valid, nv, cv_m[:, :, :T])
                ck_m = jax.lax.dynamic_update_slice(ck_m, nk,
                                                    (0, 0, 0, 0, 0))
                cv_m = jax.lax.dynamic_update_slice(cv_m, nv,
                                                    (0, 0, 0, 0, 0))
                ck = jax.lax.dynamic_update_index_in_dim(ck, ck_m, m, 1)
                cv = jax.lax.dynamic_update_index_in_dim(cv, cv_m, m, 1)
                lg = head_logits(params, y)  # [mb, V] fp32
                upd = (stage == S - 1) & valid
                old = jax.lax.dynamic_index_in_dim(lastlog, m, 0, False)
                lastlog = jax.lax.dynamic_update_index_in_dim(
                    lastlog, jnp.where(upd, lg, old), m, 0)
                act = jax.lax.ppermute(y, PIPE_AXIS, ring)
                return act, ck, cv, lastlog

            V = params["embed_tokens"].shape[0]
            act0 = jnp.zeros((mb, T, H), dtype)
            log0 = jnp.zeros((M, mb, V), jnp.float32)
            act, ck, cv, lastlog = jax.lax.fori_loop(
                0, M + S - 1, prefill_tick, (act0, ck0, cv0, log0))

            # ---- sample token 0 at the last stage, ship to stage 0 --
            keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(
                jnp.arange(M))
            tok0 = jax.vmap(
                lambda lg, pr, k: sample_token(lg, pr, k, scfg)
            )(lastlog, pres0, keys)  # [M, mb]
            tok0 = jax.lax.ppermute(tok0, PIPE_AXIS, [(S - 1, 0)])

            # ---- decode: token ring, M == S -------------------------
            stops = jnp.asarray((eos,) + tuple(scfg.extra_eos), jnp.int32)

            def decode_tick(t, c):
                act, tok_carry, ck, cv, buf, done, n_out, pres = c
                m = jnp.mod(t - stage, S)
                k = (t - stage) // S
                valid = (t >= stage) & (k < max_new)
                # The token id rides the ring WITH its activation: stage 0
                # picks what to embed (tok0 for k == 0, else the token the
                # last stage sampled one tick ago); every other stage
                # forwards the incoming id so the last stage knows which
                # token produced the logits it is about to record.
                tok_in = jnp.where(
                    (stage == 0) & (k == 0),
                    jax.lax.dynamic_index_in_dim(tok0, m, 0, False),
                    tok_carry)  # [mb]
                emb = params["embed_tokens"][tok_in][:, None].astype(dtype)
                act_in = jnp.where(stage == 0, emb, act)
                pos = pos_start[m] + k
                dcos, dsin = mrope_cos_sin(
                    jnp.broadcast_to(pos, (3,))[:, None, None],
                    cfg.head_dim, cfg.rope_theta, cfg.mrope_section)
                length = length0 + k
                idx = jnp.where(valid, length, max_len - 1)
                cols = jnp.arange(max_len)
                dmask = jnp.where((cols <= length)[None, None, None],
                                  0.0, _NEG)
                ck_m = jax.lax.dynamic_index_in_dim(ck, m, 1, False)
                cv_m = jax.lax.dynamic_index_in_dim(cv, m, 1, False)
                y, (nk, nv) = local_scan(act_in, dcos, dsin, dmask,
                                         ck_m, cv_m, idx)
                # rows-only contract: write the single decode row at idx
                # (invalid ticks route to the max_len-1 scratch row via
                # idx above, same as the old full-cache behavior)
                ck_m = jax.lax.dynamic_update_slice(ck_m, nk,
                                                    (0, 0, idx, 0, 0))
                cv_m = jax.lax.dynamic_update_slice(cv_m, nv,
                                                    (0, 0, idx, 0, 0))
                ck = jax.lax.dynamic_update_index_in_dim(ck, ck_m, m, 1)
                cv = jax.lax.dynamic_update_index_in_dim(cv, cv_m, m, 1)
                lg = head_logits(params, y)  # [mb, V]
                # last-stage bookkeeping for (m, k) — same semantics as
                # the single-device loop body (vlm/qwen.py decode_loop)
                upd = (stage == S - 1) & valid
                k_safe = jnp.clip(k, 0, max_new - 1)
                done_m = jax.lax.dynamic_index_in_dim(done, m, 0, False)
                done_new = done_m | jnp.any(
                    tok_in[:, None] == stops[None, :], axis=1)
                buf_m = jax.lax.dynamic_index_in_dim(buf, m, 0, False)
                col = jnp.where(done_new, jnp.int32(eos), tok_in)
                old_col = jax.lax.dynamic_index_in_dim(
                    buf_m, k_safe, 1, False)
                buf_m = jax.lax.dynamic_update_index_in_dim(
                    buf_m, jnp.where(upd, col, old_col), k_safe, 1)
                buf = jax.lax.dynamic_update_index_in_dim(buf, buf_m, m, 0)
                n_m = jax.lax.dynamic_index_in_dim(n_out, m, 0, False)
                n_m = n_m + (upd & jnp.logical_not(done_new))
                n_out = jax.lax.dynamic_update_index_in_dim(n_out, n_m,
                                                            m, 0)
                done = jax.lax.dynamic_update_index_in_dim(
                    done, jnp.where(upd, done_new, done_m), m, 0)
                # presence: record the token just consumed BEFORE
                # sampling the next one — same order as the single-device
                # loop body (vlm/qwen.py decode_loop). Only the last
                # stage's copy matters; `upd` gates the write.
                pres_m = jax.lax.dynamic_index_in_dim(pres, m, 0, False)
                if scfg.needs_presence:
                    pres_upd = pres_m.at[jnp.arange(mb), tok_in].set(True)
                    pres_m = jnp.where(upd, pres_upd, pres_m)
                    pres = jax.lax.dynamic_update_index_in_dim(
                        pres, pres_m, m, 0)
                tok_next = sample_token(
                    lg, pres_m, jax.random.fold_in(key, M + t), scfg)
                # Last stage emits its freshly sampled token (bound for
                # stage 0); intermediate stages forward the id they used.
                tok_out = jnp.where(stage == S - 1, tok_next, tok_in)
                act = jax.lax.ppermute(y, PIPE_AXIS, ring)
                tok_carry = jax.lax.ppermute(tok_out, PIPE_AXIS, ring)
                return act, tok_carry, ck, cv, buf, done, n_out, pres

            buf0 = jnp.full((M, mb, max_new), eos, jnp.int32)
            state = (jnp.zeros((mb, 1, H), dtype),
                     jnp.zeros((mb,), jnp.int32),
                     ck, cv, buf0, jnp.zeros((M, mb), bool),
                     jnp.zeros((M, mb), jnp.int32), pres0)
            state = jax.lax.fori_loop(0, S * max_new + S - 1, decode_tick,
                                      state)
            buf, n_out = state[4], state[6]
            last = stage == S - 1
            buf = jax.lax.psum(jnp.where(last, buf, 0), PIPE_AXIS)
            n_out = jax.lax.psum(jnp.where(last, n_out, 0), PIPE_AXIS)
            return buf, n_out

        layer_specs = jax.tree.map(lambda _: P(PIPE_AXIS),
                                   self.params["layers"])
        param_specs = {k: (layer_specs if k == "layers"
                           else jax.tree.map(lambda _: P(), v))
                       for k, v in self.params.items()}

        @functools.partial(jax.jit, static_argnames=("max_new", "scfg"))
        def run(params, embeds, cos, sin, pos_start, length0, pres0, key,
                max_new, scfg):
            # manual ONLY over 'pipe': on a ('pipe','model') mesh the
            # model axis stays automatic, so GSPMD partitions the
            # stage-local matmuls from the TP parameter shardings
            fn = jax.shard_map(
                functools.partial(stage_fn, max_new=max_new, scfg=scfg),
                mesh=mesh,
                in_specs=(param_specs, P(), P(), P(), P(), P(), P(), P()),
                out_specs=(P(), P()),
                axis_names={PIPE_AXIS},
                check_vma=False)
            return fn(params, embeds, cos, sin, pos_start, length0,
                      pres0, key)

        return run

    # -- public API --------------------------------------------------------

    def generate_from_embeds(self, embeds, position_ids, pos_start,
                             max_new_tokens: int = 200,
                             sampling: Optional[SamplingConfig] = None,
                             seed: int = 0, prompt_ids=None):
        """embeds [M, mb, T, H] (M == n_stages), position_ids [3, M, mb, T],
        pos_start [M] = first decode rope position (T + rope delta) per
        microbatch. Returns (buf [M, mb, max_new], n_out [M, mb]) with the
        reference's eos-trim semantics; row (m, b)'s generation is
        ``buf[m, b, :n_out[m, b]]``.

        ``prompt_ids`` [M, mb, T] int: required when
        ``sampling.repetition_penalty != 1`` — it seeds the per-microbatch
        presence table the penalty consults (the checkpoint-default
        Qwen2.5-VL-Instruct config sets penalty 1.05, so PP now runs the
        shipped sampling config; the last stage maintains presence).
        """
        scfg = sampling or GREEDY
        M, mb, T, _ = embeds.shape
        if scfg.needs_presence:
            if prompt_ids is None:
                raise ValueError(
                    "repetition_penalty needs prompt_ids [M, mb, T] to "
                    "seed the presence table")
            pids = np.asarray(prompt_ids).reshape(M, mb, T)
            V = self.cfg.vocab_size
            pres0 = np.zeros((M, mb, V), bool)
            for m in range(M):
                for b in range(mb):
                    pres0[m, b, pids[m, b]] = True
            pres0 = jnp.asarray(pres0)
        else:
            pres0 = jnp.zeros((M, mb, 1), bool)
        if M != self.n_stages:
            raise ValueError(f"n_micro {M} != n_stages {self.n_stages} — "
                             "the token ring requires M == S")
        if T + max_new_tokens + 1 > self.max_len:
            raise ValueError(f"max_len {self.max_len} < T + max_new + 1 "
                             f"= {T + max_new_tokens + 1} (one scratch row "
                             "is reserved for pipeline bubbles)")
        pos = jnp.asarray(position_ids).reshape(3, M * mb, T)
        cos, sin = mrope_cos_sin(pos, self.cfg.head_dim,
                                 self.cfg.rope_theta, self.cfg.mrope_section)
        hd = cos.shape[-1]
        cos = cos.reshape(M, mb, T, hd)
        sin = sin.reshape(M, mb, T, hd)
        buf, n_out = self._run(self.params, jnp.asarray(embeds, self.dtype),
                               cos, sin,
                               jnp.asarray(pos_start, jnp.int32),
                               jnp.int32(T), pres0,
                               jax.random.PRNGKey(seed),
                               max_new_tokens, scfg)
        return np.asarray(buf), np.asarray(n_out)

    def generate_text(self, prompt_ids, max_new_tokens: int = 200,
                      sampling: Optional[SamplingConfig] = None,
                      seed: int = 0):
        """Text-only convenience: ``prompt_ids`` [M, mb, T] int32 ->
        list of M*mb token lists (eos-trimmed, microbatch-major)."""
        ids = jnp.asarray(prompt_ids)
        M, mb, T = ids.shape
        embeds = self.params["embed_tokens"][ids].astype(self.dtype)
        pos = jnp.broadcast_to(jnp.arange(T)[None, None], (M, mb, T))
        pos3 = jnp.broadcast_to(pos[None], (3, M, mb, T))
        pos_start = jnp.full((M,), T, jnp.int32)
        buf, n_out = self.generate_from_embeds(
            embeds, pos3, pos_start, max_new_tokens, sampling, seed,
            prompt_ids=prompt_ids)
        return [buf[m, b, :n_out[m, b]].tolist()
                for m in range(M) for b in range(mb)]
