"""CLIP text tokenization without network or torch dependencies.

The reference tokenizes via ``CLIPProcessor`` (dataset.py:152-159: pad to
max_length=77, truncate). This module provides:

- :class:`CLIPBPETokenizer` — a from-scratch implementation of CLIP's
  lowercased byte-level BPE (vocab 49408, ``</w>`` word suffix), loading
  HF-format ``vocab.json`` + ``merges.txt`` from disk. Token-exact with the
  HF tokenizer for ASCII inputs (the regex uses ``re``-module
  approximations of the original ``\\p{L}``/``\\p{N}`` classes).
- :class:`HashTokenizer` — a deterministic hermetic fallback (word-hash
  into the vocab range) for tests and vocab-less environments. NOT
  CLIP-compatible; same padding contract.
- :func:`get_tokenizer` — picks the best available backend.

Both emit fixed-shape ``(input_ids, attention_mask)`` of length 77 —
static shapes for jit (SURVEY.md §7 "pad-and-mask designs everywhere").
"""

from __future__ import annotations

import functools
import gzip
import json
import os
import re
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import numpy as np

from vlm_clip_tpu.core.config import (CLIP_BOS_TOKEN_ID, CLIP_EOS_TOKEN_ID,
                                      CLIP_MAX_TEXT_LEN)

_WORD_PAT = re.compile(
    r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d"
    r"|[^\W\d_]+|\d|[^\s\w]+",
    re.IGNORECASE,
)
_WS_PAT = re.compile(r"\s+")


@functools.lru_cache(maxsize=1)
def bytes_to_unicode() -> Dict[int, str]:
    """GPT-2-style reversible byte <-> printable-unicode map."""
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("\xa1"), ord("\xac") + 1))
          + list(range(ord("\xae"), ord("\xff") + 1)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, map(chr, cs)))


def _get_pairs(word: Tuple[str, ...]) -> set:
    return {(word[i], word[i + 1]) for i in range(len(word) - 1)}


class BaseTokenizer:
    """Shared padding/batching contract."""

    bos_id: int
    eos_id: int
    pad_id: int

    def encode(self, text: str) -> List[int]:  # pragma: no cover - abstract
        raise NotImplementedError

    def __call__(self, texts, max_length: int = CLIP_MAX_TEXT_LEN,
                 ) -> Tuple[np.ndarray, np.ndarray]:
        """Batch-tokenize to fixed [B, max_length] ids + attention mask.

        Matches the reference processor contract: bos + tokens + eos,
        truncated to max_length (eos always kept), padded with pad_id,
        mask 1 on real tokens.
        """
        if isinstance(texts, str):
            texts = [texts]
        B = len(texts)
        ids = np.full((B, max_length), self.pad_id, dtype=np.int32)
        mask = np.zeros((B, max_length), dtype=np.int32)
        for i, t in enumerate(texts):
            toks = [self.bos_id] + self.encode(t) + [self.eos_id]
            if len(toks) > max_length:
                toks = toks[:max_length - 1] + [self.eos_id]
            ids[i, :len(toks)] = toks
            mask[i, :len(toks)] = 1
        return ids, mask


class CLIPBPETokenizer(BaseTokenizer):
    """CLIP's lowercased byte-level BPE, loaded from vocab files on disk."""

    def __init__(self, vocab: Dict[str, int],
                 merges: Sequence[Tuple[str, str]]):
        self.encoder = vocab
        self.bpe_ranks = {tuple(m): i for i, m in enumerate(merges)}
        self.byte_encoder = bytes_to_unicode()
        self.bos_id = vocab.get("<|startoftext|>", CLIP_BOS_TOKEN_ID)
        self.eos_id = vocab.get("<|endoftext|>", CLIP_EOS_TOKEN_ID)
        self.pad_id = self.eos_id  # HF CLIPTokenizer pads with endoftext
        self._cache: Dict[str, List[str]] = {}

    # -- loading -----------------------------------------------------------
    @classmethod
    def from_files(cls, vocab_json: str, merges_txt: str) -> "CLIPBPETokenizer":
        with open(vocab_json, encoding="utf-8") as f:
            vocab = json.load(f)
        with open(merges_txt, encoding="utf-8") as f:
            lines = f.read().split("\n")
        merges = [tuple(l.split()) for l in lines
                  if l and not l.startswith("#version") and len(l.split()) == 2]
        return cls(vocab, merges)

    @classmethod
    def from_openai_gz(cls, bpe_path: str) -> "CLIPBPETokenizer":
        """Load the original openai ``bpe_simple_vocab_16e6.txt.gz``."""
        with gzip.open(bpe_path, "rt", encoding="utf-8") as f:
            merge_lines = f.read().split("\n")[1:48895]
        merges = [tuple(m.split()) for m in merge_lines]
        b2u = bytes_to_unicode()
        vocab_toks = list(b2u.values())
        vocab_toks += [v + "</w>" for v in vocab_toks]
        vocab_toks += ["".join(m) for m in merges]
        vocab_toks += ["<|startoftext|>", "<|endoftext|>"]
        return cls({t: i for i, t in enumerate(vocab_toks)}, merges)

    # -- bpe ---------------------------------------------------------------
    def _bpe(self, token: str) -> List[str]:
        if token in self._cache:
            return self._cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = _get_pairs(word)
        if not pairs:
            return [token + "</w>"]
        while True:
            bigram = min(pairs, key=lambda p: self.bpe_ranks.get(p, 1 << 31))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word: List[str] = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                except ValueError:
                    new_word.extend(word[i:])
                    break
                new_word.extend(word[i:j])
                i = j
                if i < len(word) - 1 and word[i] == first \
                        and word[i + 1] == second:
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = _get_pairs(word)
        out = list(word)
        self._cache[token] = out
        return out

    def encode(self, text: str) -> List[int]:
        text = _WS_PAT.sub(" ", text).strip().lower()
        ids: List[int] = []
        for tok in _WORD_PAT.findall(text):
            tok = "".join(self.byte_encoder[b] for b in tok.encode("utf-8"))
            ids.extend(self.encoder[t] for t in self._bpe(tok))
        return ids

    def decode(self, ids: Iterable[int]) -> str:
        decoder = getattr(self, "_decoder", None)
        if decoder is None:
            decoder = {v: k for k, v in self.encoder.items()}
            self._decoder = decoder
        byte_decoder = {c: b for b, c in bytes_to_unicode().items()}
        text = "".join(decoder.get(int(i), "") for i in ids
                       if int(i) not in (self.bos_id, self.eos_id))
        raw = bytearray(byte_decoder[c] for c in text if c in byte_decoder)
        return raw.decode("utf-8", errors="replace").replace("</w>", " ").strip()


class HashTokenizer(BaseTokenizer):
    """Deterministic hermetic fallback; NOT CLIP-vocabulary-compatible.

    Maps each lowercased word to a stable id in [1000, vocab_size-3).
    Keeps bos/eos semantics so models exercise the same code paths.
    """

    def __init__(self, vocab_size: int = 49408):
        self.vocab_size = vocab_size
        self.bos_id = CLIP_BOS_TOKEN_ID if vocab_size > CLIP_BOS_TOKEN_ID \
            else vocab_size - 2
        self.eos_id = CLIP_EOS_TOKEN_ID if vocab_size > CLIP_EOS_TOKEN_ID \
            else vocab_size - 1
        self.pad_id = self.eos_id

    def encode(self, text: str) -> List[int]:
        hi = min(self.bos_id, self.eos_id)
        lo = min(1000, hi // 2)
        words = _WS_PAT.sub(" ", text).strip().lower().split(" ")
        out = []
        for w in words:
            if not w:
                continue
            h = 2166136261
            for ch in w.encode("utf-8"):  # FNV-1a
                h = ((h ^ ch) * 16777619) & 0xFFFFFFFF
            out.append(lo + h % (hi - lo))
        return out


# Repo-local asset dir: `python -m vlm_clip_tpu.cli.install_tokenizer`
# materializes canonical vocab.json + merges.txt here from any source
# (openai bpe gz, HF model dir, or HF tokenizer.json). Probed first so
# one install makes every entry point token-exact.
ASSET_DIR = os.path.join(os.path.dirname(__file__), "assets", "clip_bpe")


def install_tokenizer_asset(source: str,
                            asset_dir: Optional[str] = None) -> str:
    """Materialize canonical CLIP vocab.json + merges.txt into the repo
    asset dir from ``source``: an openai ``bpe_simple_vocab_16e6.txt.gz``,
    an HF model/tokenizer directory, or a direct vocab.json path (with
    sibling merges.txt). Returns the asset dir. One-time; after this
    :func:`get_tokenizer` is exact with no arguments.
    """
    dest = asset_dir or ASSET_DIR
    os.makedirs(dest, exist_ok=True)
    if source.endswith(".gz"):
        tok = CLIPBPETokenizer.from_openai_gz(source)
        merges = sorted(tok.bpe_ranks, key=tok.bpe_ranks.get)
        with open(os.path.join(dest, "vocab.json"), "w",
                  encoding="utf-8") as f:
            json.dump(tok.encoder, f, ensure_ascii=False)
        with open(os.path.join(dest, "merges.txt"), "w",
                  encoding="utf-8") as f:
            f.write("#version: 0.2\n")
            f.write("\n".join(" ".join(m) for m in merges))
        return dest
    if os.path.isdir(source):
        vj = os.path.join(source, "vocab.json")
        mt = os.path.join(source, "merges.txt")
        if not (os.path.isfile(vj) and os.path.isfile(mt)):
            raise FileNotFoundError(
                f"{source} has no vocab.json + merges.txt")
    elif source.endswith("vocab.json"):
        vj = source
        mt = os.path.join(os.path.dirname(source), "merges.txt")
    else:
        raise ValueError(f"unrecognized tokenizer source: {source}")
    import shutil
    shutil.copy(vj, os.path.join(dest, "vocab.json"))
    shutil.copy(mt, os.path.join(dest, "merges.txt"))
    return dest


def get_tokenizer(vocab_json: Optional[str] = None,
                  merges_txt: Optional[str] = None,
                  vocab_size: int = 49408) -> BaseTokenizer:
    """Best available tokenizer: real BPE if vocab files exist, else hash.

    Probe order: explicit files -> repo asset dir (see
    :func:`install_tokenizer_asset`) -> HF cache. Falls back to
    :class:`HashTokenizer` with a WARNING — hash ids are NOT in CLIP's
    vocabulary, so zero-shot logits from real weights would be garbage
    (the reference encodes real prompts, model_t.py:85-101).
    """
    if vocab_json and merges_txt and os.path.exists(vocab_json) \
            and os.path.exists(merges_txt):
        return CLIPBPETokenizer.from_files(vocab_json, merges_txt)
    asset_v = os.path.join(ASSET_DIR, "vocab.json")
    asset_m = os.path.join(ASSET_DIR, "merges.txt")
    if os.path.exists(asset_v) and os.path.exists(asset_m):
        return CLIPBPETokenizer.from_files(asset_v, asset_m)
    hub = os.path.expanduser(
        os.environ.get("HF_HOME", "~/.cache/huggingface"))
    if os.path.isdir(hub):
        for root, _dirs, files in os.walk(hub):
            if "vocab.json" in files and "merges.txt" in files \
                    and "clip" in root.lower():
                return CLIPBPETokenizer.from_files(
                    os.path.join(root, "vocab.json"),
                    os.path.join(root, "merges.txt"))
    import logging
    logging.getLogger("vlm_clip_tpu").warning(
        "No CLIP BPE vocab found (checked args, %s, HF cache) — falling "
        "back to HashTokenizer, which is NOT CLIP-vocabulary-compatible. "
        "Real-weight zero-shot/text results will be meaningless. Install "
        "the asset once with `python -m vlm_clip_tpu.cli.install_tokenizer "
        "<vocab source>`.", ASSET_DIR)
    return HashTokenizer(vocab_size)
