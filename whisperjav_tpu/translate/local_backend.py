"""TPU-native local translation backend.

Role parity with the reference's llama-cpp local backend
(reference: whisperjav/translate/local_backend.py — a 2.4k-LoC
llama.cpp/CUDA server wrapper running GGUF models on the GPU): here the
local LLM runs directly on the accelerator through the same JAX Qwen3
LM implementation the ASR stack uses (models/qwen/model.py), so local
subtitle translation needs no llama.cpp, no GGUF conversion, and no
separate server process. Any local Qwen3-family instruct checkpoint
(e.g. Qwen3-1.7B/4B-Instruct) slots in via the HF converter.

Prompt-length bucketing keeps XLA compiles bounded: prompts pad to the
next multiple of ``prompt_bucket`` tokens, so each bucket compiles once
and is reused for every batch of that size class.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from whisperjav_tpu.utils.logger import logger

_CHAT_PREFIX = "<|im_start|>user\n"
_CHAT_SUFFIX = "<|im_end|>\n<|im_start|>assistant\n"


def cap_batch_size_for_context(max_batch_size: int, n_ctx: int) -> int:
    """Cap subtitle lines per prompt to the LM context window (reference:
    translate/core.py:7-60 — ~500 tokens/line worst case + ~2500 fixed
    overhead for instructions/protocol/retry margin)."""
    overhead, per_line = 2500, 500
    usable = max(n_ctx - overhead, per_line)
    return max(1, min(max_batch_size, usable // per_line))


class TpuLocalBackend:
    """Callable translation backend: prompt string → response string.

    Plugs into ``translate_srt(call_fn=...)`` — the service keeps its
    numbered-line protocol, batching, and resume; this class only owns
    tokenization + on-device generation.
    """

    def __init__(self, checkpoint: Optional[str] = None,
                 params=None, cfg=None, tokenizer=None,
                 max_new_tokens: int = 2048,
                 temperature: float = 0.0,
                 repetition_penalty: float = 1.05,
                 prompt_bucket: int = 256):
        if params is None:
            if checkpoint is None:
                raise ValueError(
                    "TpuLocalBackend needs a local checkpoint directory "
                    "(--translate-model <dir>) or injected params")
            from whisperjav_tpu.models.qwen.convert import load_lm
            cfg, params = load_lm(checkpoint)
            logger.info("tpu-local translation: loaded %s (%d layers, "
                        "d=%d)", cfg.name, cfg.n_layers, cfg.d_model)
        self.cfg = cfg
        import os
        if os.environ.get("WJAV_FUSE_QKV", "1") != "0":
            from whisperjav_tpu.models.qwen.model import fuse_lm_qkv
            params = fuse_lm_qkv(params)
        self.params = params
        if tokenizer is None and checkpoint is not None:
            from whisperjav_tpu.models.qwen.tokenizer import (
                QwenTokenizer, find_tokenizer_files,
            )
            src = find_tokenizer_files(checkpoint)
            tokenizer = QwenTokenizer(src) if src else None
        self.tokenizer = tokenizer
        if self.tokenizer is None:
            raise ValueError("TpuLocalBackend needs a tokenizer "
                             "(tokenizer.json next to the weights)")
        self.max_new_tokens = max_new_tokens
        self.temperature = temperature
        self.repetition_penalty = repetition_penalty
        self.prompt_bucket = prompt_bucket

    @property
    def context_window(self) -> int:
        return 32_768   # Qwen3 instruct native window

    def _encode_chat(self, prompt: str) -> list:
        """Wrap in the Qwen chat template when the real tokenizer is
        present (im_start/im_end markers are ordinary vocab strings for
        the BPE, so plain encode handles them)."""
        return self.tokenizer.encode(_CHAT_PREFIX + prompt + _CHAT_SUFFIX)

    def __call__(self, prompt: str) -> str:
        import jax.numpy as jnp
        from whisperjav_tpu.models.qwen.model import generate_text
        ids = self._encode_chat(prompt)
        n = len(ids)
        bucket = ((n + self.prompt_bucket - 1)
                  // self.prompt_bucket) * self.prompt_bucket
        buf = np.full((1, bucket), self.cfg.eos_id, np.int32)
        buf[0, :n] = ids
        res = generate_text(self.params, self.cfg, jnp.asarray(buf),
                            jnp.asarray([n], jnp.int32),
                            max_new=self.max_new_tokens,
                            repetition_penalty=self.repetition_penalty,
                            temperature=self.temperature)
        toks = np.asarray(res.tokens)[0]
        length = int(np.asarray(res.length)[0])
        return self.tokenizer.decode([int(t) for t in toks[:length]])
