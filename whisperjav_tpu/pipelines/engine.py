"""TranscriptionEngine: the pjit-compiled audio→tokens device program.

This is the replacement for the reference's per-scene
``whisper_model.transcribe`` calls into CTranslate2 (reference:
whisperjav/modules/faster_whisper_pro_asr.py:819-894): one compiled XLA
program runs log-mel → encoder → KV-cached decode for a whole
fixed-shape window batch, data-parallel sharded over the mesh. The
temperature-fallback ladder re-runs the SAME executable (temperature is a
traced scalar), replacing only failed rows host-side — no recompiles, no
generator churn.
"""

from __future__ import annotations

import zlib
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from whisperjav_tpu.models.whisper.config import WhisperConfig
from whisperjav_tpu.models.whisper.decode import (
    DecodeOptions, DecodeResult, DecodedSegment, decode_greedy,
    extract_segments,
)
from whisperjav_tpu.models.whisper.model import Params, encode
from whisperjav_tpu.models.whisper.tokenizer import WhisperTokenizer
from whisperjav_tpu.ops.mel import N_SAMPLES, log_mel_spectrogram
from whisperjav_tpu.parallel.batching import Window, WindowBatch, batch_windows
from whisperjav_tpu.utils.logger import logger


@dataclass
class QualityThresholds:
    """Defensive decoding gates (reference sensitivity presets carry these;
    whisperjav/config/components/asr/faster_whisper.py:236-356)."""
    logprob_threshold: float = -1.0
    no_speech_threshold: float = 0.6
    compression_ratio_threshold: float = 2.4
    temperatures: Tuple[float, ...] = (0.0, 0.2, 0.4, 0.6, 0.8, 1.0)


# Encoder-frame buckets for cross-KV slicing: decoding reads the full
# cross-attention K/V every token, so a 6 s VAD group decoded against a
# 30 s window wastes 4x of the dominant HBM stream attending to padding.
# Batches are duration-sorted (parallel/batching.py), so slicing encoder
# output to the smallest bucket covering the longest window in the batch
# is usually tight. One decode executable compiles per bucket.
CROSS_KV_BUCKETS = (448, 960, 1500)
FRAMES_PER_SECOND = 50   # whisper encoder frames


class TranscriptionEngine:
    """Batched, sharded Whisper inference with temperature fallback."""

    def __init__(
        self,
        config: WhisperConfig,
        params: Params,
        options: DecodeOptions = DecodeOptions(),
        thresholds: QualityThresholds = QualityThresholds(),
        batch_size: int = 8,
        mesh: Optional[Mesh] = None,
        tokenizer: Optional[WhisperTokenizer] = None,
        compute_dtype=jnp.bfloat16,
        prompt_tokens: Tuple[int, ...] = (),
        word_timestamps: bool = False,
        int8_weights: bool = False,
        vocab_subset=None,   # kept text-token ids (< eot), full-vocab space
    ):
        self.config = config
        self.options = options
        self.thresholds = thresholds
        self.batch_size = batch_size
        self.mesh = mesh
        self.word_timestamps = word_timestamps
        self.tokenizer = tokenizer or WhisperTokenizer(config)
        self.compute_dtype = compute_dtype
        # vocab-sliced decoding (models/whisper/vocab_subset.py): decode
        # in subset id space against a sliced lm head; map emitted
        # tokens back to full-vocab ids on-device so every downstream
        # consumer (gates, tokenizer, word alignment) sees full ids
        self._vocab = None
        if vocab_subset is not None:
            from whisperjav_tpu.models.whisper.vocab_subset import (
                VocabSubset,
            )
            self._vocab = VocabSubset(config, vocab_subset)
            options = self._vocab.remap_options(options)
            self.options = options
            if prompt_tokens:
                sub_prompt = self._vocab.to_subset(prompt_tokens)
                if len(sub_prompt) != len(prompt_tokens):
                    logger.warning(
                        "vocab slice: %d prompt token(s) outside the "
                        "subset were dropped",
                        len(prompt_tokens) - len(sub_prompt))
                prompt_tokens = sub_prompt
        # Weight preparation (dtype cast + optional int8 quantization) is
        # ONE jitted program: per-leaf eager dispatch pays a tunnel round
        # trip per op, and inspecting dtypes via np.asarray() downloaded
        # every weight through the ~37 MB/s tunnel (~400 s for large-v2).
        # jnp.issubdtype on the abstract dtype transfers nothing.
        import os
        fuse_qkv = os.environ.get("WJAV_FUSE_QKV", "1") != "0"

        sub_ids = (jnp.asarray(self._vocab.sub_ids)
                   if self._vocab is not None else None)

        def _prepare(tree):
            def cast(x):
                if jnp.issubdtype(x.dtype, jnp.floating):
                    return x.astype(compute_dtype)
                return x

            tree = jax.tree.map(cast, tree)
            if sub_ids is not None:
                # slice the tied embedding/lm-head rows BEFORE any
                # quantization so lm_head_q is built at subset size
                dec = dict(tree["decoder"])
                dec["tok_emb"] = dec["tok_emb"][sub_ids]
                tree = {**tree, "decoder": dec}
            if fuse_qkv:
                # one (d, 3d) q/k/v matmul per decoder layer per step
                # instead of three kernels — bitwise identical
                # (quant.py:fuse_qkv_weights); WJAV_FUSE_QKV=0 = A/B off
                from whisperjav_tpu.models.whisper.quant import (
                    fuse_qkv_weights,
                )
                tree = fuse_qkv_weights(tree)
            if int8_weights:
                from whisperjav_tpu.models.whisper.quant import (
                    quantize_decoder_weights,
                )
                tree = quantize_decoder_weights(tree)
            return tree

        self.params = jax.jit(_prepare)(params)

        config_ = config
        options_ = options

        # Encoder and decoder compile as SEPARATE programs: fusing them into
        # one jit lets XLA's scheduler spill the encoder activations into
        # the decode while_loop's live set, which costs ~2x decode
        # throughput on large models (measured on v5e).
        def _encode(params, audio):
            if audio.dtype == jnp.int16:
                # audio ships to the device as int16 (the WAV-native
                # dtype): halves the dominant host->device stream
                # (B x 480000 samples) vs float32 — through a ~37 MB/s
                # tunnel that is ~1.7 s/batch at B=64. Dequant is free
                # on-device (fused into the mel framing matmul).
                audio = audio.astype(jnp.float32) * (1.0 / 32768.0)
            mel = log_mel_spectrogram(audio, n_mels=config_.n_mels)
            return encode(params, config_, mel.astype(compute_dtype))

        prompt_ = tuple(prompt_tokens)
        dec_config_ = (self._vocab.config if self._vocab is not None
                       else config)

        def _to_full(result):
            if sub_ids is None:
                return result
            return result._replace(tokens=sub_ids[result.tokens])

        def _decode(params, xa, temperature, rng, opts):
            return _to_full(decode_greedy(params, dec_config_, xa, opts,
                                          prompt=prompt_,
                                          temperature=temperature, rng=rng))

        def _decode_beam(params, xa, opts):
            from whisperjav_tpu.models.whisper.decode import decode_beam
            return _to_full(decode_beam(params, dec_config_, xa, opts,
                                        prompt=prompt_))

        if mesh is not None:
            repl = NamedSharding(mesh, P())
            bsh = NamedSharding(mesh, P("data"))
            self.params = jax.device_put(self.params, repl)
            out_sh = DecodeResult(bsh, bsh, bsh, bsh, bsh)
            self._encode_fn = jax.jit(_encode, in_shardings=(repl, bsh),
                                      out_shardings=bsh)
            self._decode_fn = jax.jit(
                _decode, in_shardings=(repl, bsh, repl, repl),
                out_shardings=out_sh, static_argnums=(4,))
            self._decode_beam_fn = jax.jit(
                _decode_beam, in_shardings=(repl, bsh), out_shardings=out_sh,
                static_argnums=(2,),
            ) if options.beam_size > 1 else None
        else:
            self._encode_fn = jax.jit(_encode)
            self._decode_fn = jax.jit(_decode, static_argnums=(4,))
            self._decode_beam_fn = (jax.jit(_decode_beam, static_argnums=(2,))
                                    if options.beam_size > 1 else None)

    # ------------------------------------------------------------------
    def decode_batch(self, audio: np.ndarray,
                     temperature: float = 0.0,
                     seed: int = 0,
                     device_audio: Optional[jax.Array] = None,
                     ) -> DecodeResult:
        """audio (B, N_SAMPLES) float32 → DecodeResult (device).

        Beam search is used for the deterministic first pass (t=0) when the
        preset requests beams; the temperature-fallback ladder samples via
        the greedy program — same split faster-whisper makes between beam
        and best-of sampling. ``device_audio``: pre-uploaded array from
        :meth:`upload_audio` (skips the host→device transfer here).
        """
        assert audio.shape[1] == N_SAMPLES
        xa = self._encode_fn(
            self.params,
            device_audio if device_audio is not None
            else self.upload_audio(audio))
        return self.decode_encoded(xa, temperature, seed)

    def encode_batch(self, audio=None, device_audio: Optional[jax.Array] = None,
                     max_duration: Optional[float] = None) -> jax.Array:
        """Dispatch the encoder program (async) and bucket-slice its output.

        Returns a lazy device array — callers can dispatch this for batch
        i+1 while batch i's decode is still draining (encode-ahead
        pipelining, :meth:`transcribe_windows`). ``max_duration`` picks
        the cross-KV bucket (CROSS_KV_BUCKETS) covering the longest
        window so the decode streams no padding frames.
        """
        xa = self._encode_fn(
            self.params,
            device_audio if device_audio is not None
            else self.upload_audio(audio))
        if max_duration is not None:
            need = int(np.ceil(max_duration * FRAMES_PER_SECOND)) + 8
            bucket = next((b for b in CROSS_KV_BUCKETS if b >= need),
                          CROSS_KV_BUCKETS[-1])
            if bucket < xa.shape[1]:
                xa = xa[:, :bucket]
        return xa

    def upload_audio(self, audio) -> jax.Array:
        """float32 [-1, 1] host audio → int16 on the device (async).

        int16 is the WAV-native dtype, so the round-trip is lossless for
        real inputs; synthetic float inputs lose <1e-4 amplitude
        resolution, far below the mel log floor. ``jax.device_put``
        returns immediately — callers can kick off the NEXT batch's
        upload before blocking on the current batch's decode, hiding the
        host→device stream behind compute (double buffering)."""
        if isinstance(audio, jax.Array):
            return audio
        if audio.dtype != np.int16:
            audio = (np.clip(np.asarray(audio), -1.0, 1.0)
                     * 32767.0).astype(np.int16)
        if self.mesh is not None:
            sh = NamedSharding(self.mesh, P("data"))
            return jax.device_put(audio, sh)
        return jax.device_put(audio)

    def decode_encoded(self, xa, temperature: float = 0.0,
                       seed: int = 0) -> DecodeResult:
        """Decode already-encoded audio (lets the fallback ladder reuse
        one encoder pass). The token budget scales with the encoder-state
        length: a 448-frame (≤9 s) bucket never needs the full 30 s
        budget, cutting short-window decode ~35%."""
        import dataclasses
        budget = min(self.options.max_new_tokens, xa.shape[1] // 4 + 32)
        opts = (self.options if budget == self.options.max_new_tokens
                else dataclasses.replace(self.options,
                                         max_new_tokens=budget))
        if temperature == 0.0 and self._decode_beam_fn is not None:
            return self._decode_beam_fn(self.params, xa, opts)
        result = self._decode_fn(self.params, xa,
                                 jnp.float32(temperature),
                                 jax.random.PRNGKey(seed), opts)
        # best_of (faster-whisper): on sampled rungs draw N independent
        # samples (same compiled program, fresh rng) and keep the best row
        # by avg logprob. Shapes/shardings are unchanged → no recompile.
        n_best = opts.best_of if temperature > 0.0 else 1
        if n_best > 1:
            best = DecodeResult(*[np.asarray(x) for x in result])
            for i in range(1, n_best):
                cand = self._decode_fn(self.params, xa,
                                       jnp.float32(temperature),
                                       jax.random.PRNGKey(seed + 7919 * i),
                                       opts)
                cand = DecodeResult(*[np.asarray(x) for x in cand])
                win = cand.avg_logprob > best.avg_logprob
                best = DecodeResult(
                    np.where(win[:, None], cand.tokens, best.tokens),
                    np.where(win, cand.length, best.length),
                    np.where(win, cand.sum_logprob, best.sum_logprob),
                    np.where(win, cand.avg_logprob, best.avg_logprob),
                    best.no_speech_prob)
            return best
        return result

    # ------------------------------------------------------------------
    def _compression_ratio(self, token_ids: Sequence[int]) -> float:
        """zlib compression ratio; uses real text when a tokenizer is
        available, token bytes otherwise (same monotonic signal)."""
        text_ids = [t for t in token_ids
                    if t < self.config.eot]
        if not text_ids:
            return 0.0
        if self.tokenizer.is_real:
            data = self.tokenizer.decode(text_ids).encode("utf-8")
        else:
            data = np.asarray(text_ids, np.int32).tobytes()
        if len(data) == 0:
            return 0.0
        return len(data) / len(zlib.compress(data))

    def _row_needs_fallback(self, tokens: np.ndarray, avg_lp: float,
                            no_speech: float = 0.0) -> bool:
        th = self.thresholds
        # whisper rule: confident silence is NOT retried — the window will
        # be skipped by the no-speech gate, and retrying it only invites a
        # high-temperature hallucination that sneaks past that gate
        if no_speech > th.no_speech_threshold:
            return False
        if avg_lp < th.logprob_threshold:
            return True
        if self._compression_ratio(tokens) > th.compression_ratio_threshold:
            return True
        return False

    # ------------------------------------------------------------------
    def transcribe_batch(self, batch: WindowBatch, seed: int = 0,
                         device_audio: Optional[jax.Array] = None,
                         device_xa: Optional[jax.Array] = None,
                         on_decode_dispatched=None,
                         trace: Optional[dict] = None,
                         defer_pool: Optional[list] = None,
                         ) -> List[List[DecodedSegment]]:
        """Decode one padded batch with the temperature fallback ladder.

        Returns per-valid-window segment lists (window-relative times),
        already filtered by the no-speech × logprob gate.
        ``device_audio``: a pre-uploaded array from :meth:`upload_audio`
        (double-buffering path). ``device_xa``: already-encoded (and
        bucket-sliced) encoder states from :meth:`encode_batch` — skips
        the encoder here (encode-ahead pipelining).
        ``on_decode_dispatched``: zero-arg callable invoked after the
        first-rung decode program is dispatched but before its tokens
        are drained — :meth:`transcribe_windows` uses it to enqueue
        batch i+1's encode so the chip rolls straight from decode(i)
        into encode(i+1) while the host drains and post-processes.
        """
        import time as _time
        th = self.thresholds
        temps = th.temperatures
        t0 = _time.time()
        max_dur = max((w.duration for w in batch.windows), default=30.0)
        xa = (device_xa if device_xa is not None
              else self.encode_batch(batch.audio, device_audio=device_audio,
                                     max_duration=max_dur))
        t_enc = _time.time()
        result = self.decode_encoded(xa, temps[0], seed)
        t_disp = _time.time()
        if on_decode_dispatched is not None:
            on_decode_dispatched()
        t_ahead = _time.time()
        if trace is not None:
            trace.update(encode_s=t_enc - t0, dispatch_s=t_disp - t_enc,
                         ahead_s=t_ahead - t_disp)
        return self.finish_batch(batch, xa, result, seed, trace=trace,
                                 defer_pool=defer_pool)

    # ------------------------------------------------------------------
    def finish_batch(self, batch: WindowBatch, xa, result: DecodeResult,
                     seed: int = 0, trace: Optional[dict] = None,
                     defer_pool: Optional[list] = None,
                     ) -> List[List[DecodedSegment]]:
        """Drain a dispatched first-rung decode, run the temperature
        ladder on failed rows, extract segments. Split out of
        :meth:`transcribe_batch` so the decode-ahead loop
        (:meth:`transcribe_windows`) can dispatch batch i+1's encode AND
        decode before blocking here on batch i's tokens.

        ``defer_pool``: when given, rows failing the rung-1 quality gates
        are NOT retried inline (the reference ladder re-decodes the whole
        batch per rung, `faster_whisper.py:236-356` semantics) — they are
        appended to the pool as pending records and their slot in the
        returned list is ``None``. :meth:`transcribe_windows` re-packs
        the pool into dedicated retry batches at the END of the file, so
        at a realistic failure rate (a few % of rows) the ladder costs
        one extra decode execution per ~batch_size failed rows instead of
        one whole-batch re-decode per batch that contains any failed row
        (at 5%/row and B=32, 81% of batches contain ≥1 failure)."""
        import time as _time
        th = self.thresholds
        temps = th.temperatures
        t_ahead = _time.time()
        tokens = np.array(result.tokens)         # writable host copies
        avg_lp = np.array(result.avg_logprob)
        no_speech = np.array(result.no_speech_prob)
        if trace is not None:
            # the drain carries the decode's actual device compute on the
            # tunnel backend (block_until_ready does not reliably block)
            trace.update(drain_s=_time.time() - t_ahead,
                         bucket=int(xa.shape[1]), rows=int(xa.shape[0]),
                         rungs=1)

        # temperature fallback: re-decode whole batch at higher temperature,
        # adopt replacements only for rows that failed quality gates. The
        # ladder bails early when a retry stops improving mean logprob —
        # bounding the cost on pathological audio where no temperature can
        # pass the gates (the reference ladder has no such bound and decodes
        # every rung).
        prev_mean = float(np.mean(avg_lp[:batch.n_valid])) \
            if batch.n_valid else 0.0
        t_ladder0 = _time.time()
        # WJAV_GATE_FAIL_PCT=<float>: bench-only gate-outcome injection.
        # Random-init weights fail EVERY content gate (ladder saturates)
        # while the rung-1 clamp models zero failures; neither is the
        # production profile. This draws a deterministic ~N% of rows as
        # rung-1 failures (one retry each), so ladder cost can be
        # measured at a realistic retry rate (VERDICT r4 #5; reference
        # ladder semantics: faster_whisper.py:236-356).
        import os as _os
        inject_pct = float(_os.environ.get("WJAV_GATE_FAIL_PCT", "0") or 0)

        def _rung1_failed() -> list:
            if inject_pct > 0:
                return [b for b in range(batch.n_valid)
                        if np.random.default_rng(
                            (seed, b)).random() < inject_pct / 100.0]
            return [b for b in range(batch.n_valid)
                    if self._row_needs_fallback(tokens[b], avg_lp[b],
                                                no_speech[b])]

        deferred_rows: set = set()
        if defer_pool is not None and len(temps) > 1:
            for b in _rung1_failed():
                defer_pool.append({
                    "window": batch.windows[b],
                    "tokens": np.array(tokens[b]),
                    "avg_lp": float(avg_lp[b]),
                    "no_speech": float(no_speech[b]),
                    "injected": inject_pct > 0,
                })
                deferred_rows.add(b)
            temps = temps[:1]           # inline ladder skipped entirely
        for t_i, temp in enumerate(temps[1:], start=1):
            if t_i == 1:
                failed = _rung1_failed()
            elif inject_pct > 0:
                failed = []      # injected failures retry exactly once
            else:
                failed = [b for b in range(batch.n_valid)
                          if self._row_needs_fallback(tokens[b], avg_lp[b],
                                                      no_speech[b])]
            if not failed:
                break
            logger.debug("temperature fallback t=%.1f for %d/%d rows",
                         temp, len(failed), batch.n_valid)
            retry = self.decode_encoded(xa, temp, seed + t_i)
            r_tokens = np.asarray(retry.tokens)
            r_avg = np.asarray(retry.avg_logprob)
            improved = False
            for b in failed:
                if r_avg[b] > avg_lp[b]:
                    tokens[b] = r_tokens[b]
                    avg_lp[b] = r_avg[b]
                    improved = True
            mean_now = float(np.mean(avg_lp[:batch.n_valid]))
            if trace is not None:
                trace["rungs"] = t_i + 1
            if not improved or mean_now < prev_mean + 0.02:
                break
            prev_mean = mean_now
        if trace is not None:
            trace["ladder_s"] = _time.time() - t_ladder0
            t_extract0 = _time.time()

        out: List[List[DecodedSegment]] = []
        for b in range(batch.n_valid):
            w = batch.windows[b]
            if b in deferred_rows:
                out.append(None)        # resolved in _retry_deferred
                continue
            # no-speech gate: whisper convention — skip only when BOTH the
            # no-speech prob is high and the decode is low-confidence
            if (no_speech[b] > th.no_speech_threshold
                    and avg_lp[b] < th.logprob_threshold):
                out.append([])
                continue
            segs = extract_segments(
                tokens[b], self.config, self.options,
                window_duration=w.duration,
                avg_logprob=float(avg_lp[b]),
                no_speech_prob=float(no_speech[b]))
            for s in segs:
                s.text = self.tokenizer.decode(s.tokens)
            out.append(segs)

        if trace is not None:
            trace["extract_s"] = _time.time() - t_extract0
        if self.word_timestamps:
            self._refine_with_word_alignment(xa, tokens, batch, out)
        return out

    # ------------------------------------------------------------------
    def _refine_with_word_alignment(self, xa, tokens, batch, out) -> None:
        """Tighten segment boundaries using cross-attention word spans.

        One teacher-forced pass per valid row; each segment's start/end
        snaps to its first/last word span when the spans fall inside the
        segment's timestamp-token bounds ±0.5 s (attention alignment
        refines, never relocates)."""
        from whisperjav_tpu.models.whisper.word_align import word_timestamps
        align_config, align_tok = self.config, self.tokenizer
        if self._vocab is not None:
            # the teacher-forced pass embeds via the SLICED table, so it
            # needs subset-space ids + the sliced config; word text still
            # decodes from full ids through the adapter
            from whisperjav_tpu.models.whisper.vocab_subset import (
                SubsetTokenizerAdapter,
            )
            align_config = self._vocab.config
            align_tok = SubsetTokenizerAdapter(self._vocab, self.tokenizer)
        for b in range(batch.n_valid):
            segs = out[b]
            if not segs:
                continue
            w = batch.windows[b]
            row = tokens[b]
            if self._vocab is not None:
                row = np.asarray(self._vocab.to_subset(row), np.int32)
            spans = word_timestamps(
                self.params, align_config, xa[b:b + 1], row,
                tokenizer=align_tok, audio_duration=w.duration)
            if not spans:
                continue
            si = 0
            for seg in segs:
                n = len(seg.tokens)
                seg_spans = spans[si: si + n]
                si += n
                if not seg_spans:
                    continue
                new_start = seg_spans[0].start
                new_end = seg_spans[-1].end
                if abs(new_start - seg.start) <= 0.5:
                    seg.start = new_start
                if abs(new_end - seg.end) <= 0.5:
                    seg.end = max(new_end, seg.start + 0.05)

    # ------------------------------------------------------------------
    def _retry_deferred(self, pool: list, seed: int,
                        ) -> List[Tuple[Window, List[DecodedSegment]]]:
        """Run the temperature ladder over the file-wide deferred-failure
        pool (see :meth:`finish_batch`). Per-row semantics match the
        inline ladder: each rung decodes the still-failing rows at
        ``temperatures[t_i]``, a row adopts the retry iff its avg logprob
        improved, a row exits when it passes the gates, and the ladder
        bails when a rung improves nothing. Rows are re-encoded in packed
        retry batches — encoder cost is ~15% of a decode, and it keeps
        zero extra encoder state resident across the main loop."""
        import time as _time
        th = self.thresholds
        temps = th.temperatures
        t0 = _time.time()
        active = list(pool)
        rungs_run = 0
        for t_i, temp in enumerate(temps[1:], start=1):
            if not active:
                break
            rungs_run = t_i
            by_id = {id(rec["window"]): rec for rec in active}
            improved_any = False
            for rb in batch_windows([rec["window"] for rec in active],
                                    self.batch_size):
                max_dur = max((w.duration for w in rb.windows),
                              default=30.0)
                xa = self.encode_batch(rb.audio, max_duration=max_dur)
                res = self.decode_encoded(xa, temp, seed + 7919 * t_i)
                r_tokens = np.asarray(res.tokens)
                r_avg = np.asarray(res.avg_logprob)
                for b in range(rb.n_valid):
                    rec = by_id[id(rb.windows[b])]
                    if r_avg[b] > rec["avg_lp"]:
                        rec["tokens"] = np.array(r_tokens[b])
                        rec["avg_lp"] = float(r_avg[b])
                        improved_any = True
            still = []
            for rec in active:
                if rec.pop("injected", False):
                    continue             # injected failures retry once
                if self._row_needs_fallback(rec["tokens"], rec["avg_lp"],
                                            rec["no_speech"]):
                    still.append(rec)
            active = still
            if not improved_any:
                break

        out: List[Tuple[Window, List[DecodedSegment]]] = []
        segs_by_id: dict = {}
        for rec in pool:
            w = rec["window"]
            if (rec["no_speech"] > th.no_speech_threshold
                    and rec["avg_lp"] < th.logprob_threshold):
                out.append((w, []))
                continue
            segs = extract_segments(
                rec["tokens"], self.config, self.options,
                window_duration=w.duration,
                avg_logprob=rec["avg_lp"],
                no_speech_prob=rec["no_speech"])
            for s in segs:
                s.text = self.tokenizer.decode(s.tokens)
            out.append((w, segs))
            segs_by_id[id(w)] = segs

        if self.word_timestamps and segs_by_id:
            # one refinement pass per retry batch with freshly-encoded xa;
            # rows are padded to a common token length with EOT (ignored
            # by the teacher-forced alignment pass beyond the row's EOT)
            for rb in batch_windows([rec["window"] for rec in pool],
                                    self.batch_size):
                recs = {id(rec["window"]): rec for rec in pool}
                max_dur = max((w.duration for w in rb.windows),
                              default=30.0)
                xa = self.encode_batch(rb.audio, max_duration=max_dur)
                t_len = max(len(recs[id(w)]["tokens"])
                            for w in rb.windows)
                tok = np.full((rb.batch_size, t_len), self.config.eot,
                              np.int32)
                for b, w in enumerate(rb.windows):
                    row = recs[id(w)]["tokens"]
                    tok[b, :len(row)] = row
                row_out = [segs_by_id.get(id(w), [])
                           for w in rb.windows]
                self._refine_with_word_alignment(xa, tok, rb, row_out)

        if pool:
            wall = _time.time() - t0
            logger.info("deferred retry: %d row(s), %d rung(s), %.1fs",
                        len(pool), rungs_run, wall)
            if getattr(self, "batch_trace", None):
                self.batch_trace.append({
                    "retry_rows": len(pool), "rungs": rungs_run + 1,
                    "ladder_s": wall, "batch_s": wall})
        return out

    # ------------------------------------------------------------------
    def _decode_ahead_bytes(self) -> int:
        """Worst-case resident bytes for ONE in-flight decode execution:
        cross-KV + self-KV cache + encoder states (weights are shared).
        Used to gate decode-ahead — two executions must fit HBM with
        headroom for XLA temporaries (large-v2/B=64 measured OOM with
        two resident decodes, ADR-002 round 3)."""
        c = self.config
        rows = self.batch_size * max(self.options.beam_size, 1)
        bucket = CROSS_KV_BUCKETS[-1]
        kv_byte = 1 if self.options.cross_kv_int8 else 2
        cross = 2 * c.n_text_layer * rows * bucket * c.n_text_state * kv_byte
        budget = self.options.max_new_tokens + 8
        self_kv = 2 * c.n_text_layer * rows * budget * c.n_text_state * 2
        xa = self.batch_size * bucket * c.n_audio_state * 2
        return cross + self_kv + xa

    # decode-ahead is worth enabling only when two decode footprints
    # leave generous HBM headroom for weights + HLO temporaries (the
    # temps alone measured 5-8 GB at large-v2/B=64)
    DECODE_AHEAD_BUDGET_BYTES = 5 * 1024 ** 3

    def _decode_ahead_enabled(self) -> bool:
        import os
        mode = os.environ.get("WJAV_DECODE_AHEAD", "auto")
        if mode == "0":
            return False
        if mode == "1":
            return True
        return 2 * self._decode_ahead_bytes() < self.DECODE_AHEAD_BUDGET_BYTES

    def transcribe_windows(
        self, windows: Sequence[Window], seed: int = 0,
    ) -> List[Tuple[Window, List[DecodedSegment]]]:
        """Decode an arbitrary window list in fixed-shape batches.

        Two pipelining levers (both async dispatches, ADR-002):

        - batch i+1's host→device audio upload is dispatched before
          batch i's decode is drained, so the transfer streams behind
          compute (double buffering — the transfer is the
          second-largest cost on tunneled hosts);
        - batch i+1's ENCODE is dispatched right after batch i's decode
          program (via ``on_decode_dispatched``), before the host
          drains tokens — the chip rolls from decode(i) straight into
          encode(i+1) while the host blocks on the tunnel drain and
          then runs segment extraction / tokenization, instead of
          idling for a host round-trip per batch. Disable with
          ``WJAV_ENCODE_AHEAD=0`` (A/B knob; also the fallback if the
          extra resident encoder output ever OOMs a config)."""
        import os
        import time as _time
        ahead_on = os.environ.get("WJAV_ENCODE_AHEAD", "1") != "0"
        trace_on = os.environ.get("WJAV_TRACE_BATCHES", "0") != "0"
        defer_on = (os.environ.get("WJAV_DEFER_RETRY", "1") != "0"
                    and len(self.thresholds.temperatures) > 1)
        pool: Optional[list] = [] if defer_on else None
        self.batch_trace: List[dict] = []
        results: List[Tuple[Window, List[DecodedSegment]]] = []
        batches = list(batch_windows(windows, self.batch_size))
        t_up0 = _time.time()
        dev = self.upload_audio(batches[0].audio) if batches else None
        # upload_s attribution: batch i's row reports the time spent
        # uploading batch i's OWN audio — batch 0 pays it synchronously
        # here; later batches' uploads were dispatched during batch i-1
        # (double buffering), so each iteration carries its upload wall
        # forward into the NEXT trace row.
        pending_upload_s = _time.time() - t_up0

        def _record(trace: Optional[dict], batch: WindowBatch,
                    t_b0: float, bi: int) -> None:
            if trace is None:
                return
            trace["batch_s"] = _time.time() - t_b0
            trace["audio_s"] = round(
                sum(w.duration for w in batch.windows), 1)
            self.batch_trace.append(trace)
            logger.info(
                "batch %d/%d: %.1fs (upload %.2f enc %.2f disp %.2f "
                "ahead %.2f drain %.2f ladder %.2f extract %.2f) "
                "rungs=%d bucket=%d rows=%d audio=%.0fs",
                bi + 1, len(batches), trace["batch_s"],
                trace["upload_s"], trace["encode_s"],
                trace["dispatch_s"], trace["ahead_s"], trace["drain_s"],
                trace.get("ladder_s", 0.0), trace.get("extract_s", 0.0),
                trace["rungs"], trace["bucket"], trace["rows"],
                trace["audio_s"])

        if ahead_on and len(batches) > 1 and self._decode_ahead_enabled():
            # decode-ahead: dispatch encode(i)+decode(i), upload audio
            # i+1, THEN drain batch i-1 — the host's drain (tunnel
            # round-trip) + ladder + segment extraction for i-1 all run
            # while the chip executes decode(i), so the device never
            # waits on the host between batches. Requires two decode
            # footprints resident in HBM (the guard above). Outputs are
            # bit-identical to the sequential path: each batch's decode
            # consumes only its own xa/seed (tests/test_encode_ahead.py).
            temps0 = self.thresholds.temperatures[0]
            prev = None     # (batch, xa, result, seed_i, trace, t_b0, bi)
            for bi, batch in enumerate(batches):
                t_b0 = _time.time()
                trace = {} if trace_on else None
                max_dur = max((w.duration for w in batch.windows),
                              default=30.0)
                xa_i = self.encode_batch(batch.audio, device_audio=dev,
                                         max_duration=max_dur)
                t_enc = _time.time()
                res_i = self.decode_encoded(xa_i, temps0, seed + bi * 131)
                t_disp = _time.time()
                nxt = (self.upload_audio(batches[bi + 1].audio)
                       if bi + 1 < len(batches) else None)
                t_upload = _time.time() - t_disp
                if trace is not None:
                    trace.update(upload_s=pending_upload_s,
                                 encode_s=t_enc - t_b0,
                                 dispatch_s=t_disp - t_enc, ahead_s=0.0)
                if prev is not None:
                    p_batch, p_xa, p_res, p_seed, p_trace, p_t0, p_bi = prev
                    segs = self.finish_batch(p_batch, p_xa, p_res, p_seed,
                                             trace=p_trace, defer_pool=pool)
                    _record(p_trace, p_batch, p_t0, p_bi)
                    results.extend(
                        (w, s) for w, s in zip(p_batch.windows, segs)
                        if s is not None)
                prev = (batch, xa_i, res_i, seed + bi * 131, trace,
                        t_b0, bi)
                dev = nxt
                pending_upload_s = t_upload
            if prev is not None:
                p_batch, p_xa, p_res, p_seed, p_trace, p_t0, p_bi = prev
                segs = self.finish_batch(p_batch, p_xa, p_res, p_seed,
                                         trace=p_trace, defer_pool=pool)
                _record(p_trace, p_batch, p_t0, p_bi)
                results.extend((w, s) for w, s in zip(p_batch.windows, segs)
                               if s is not None)
            if pool:
                results.extend(self._retry_deferred(pool, seed))
            results.sort(key=lambda p: (p[0].scene_idx, p[0].group_idx))
            return results

        xa = None
        for bi, batch in enumerate(batches):
            t_b0 = _time.time()
            nxt = (self.upload_audio(batches[bi + 1].audio)
                   if bi + 1 < len(batches) else None)
            t_upload = _time.time() - t_b0
            nxt_holder = {}

            def _encode_ahead(nxt=nxt, bi=bi, holder=nxt_holder):
                if nxt is not None:
                    nxt_batch = batches[bi + 1]
                    holder["xa"] = self.encode_batch(
                        device_audio=nxt,
                        max_duration=max((w.duration
                                          for w in nxt_batch.windows),
                                         default=30.0))

            trace = {} if trace_on else None
            segs = self.transcribe_batch(
                batch, seed=seed + bi * 131, device_audio=dev,
                device_xa=xa,
                on_decode_dispatched=_encode_ahead if ahead_on else None,
                trace=trace, defer_pool=pool)
            if trace is not None:
                trace["upload_s"] = pending_upload_s
            _record(trace, batch, t_b0, bi)
            results.extend((w, s) for w, s in zip(batch.windows, segs)
                           if s is not None)
            dev = nxt
            xa = nxt_holder.get("xa")
            pending_upload_s = t_upload
        if pool:
            results.extend(self._retry_deferred(pool, seed))
        results.sort(key=lambda p: (p[0].scene_idx, p[0].group_idx))
        return results
