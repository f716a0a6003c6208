"""Batched Whisper decoding on TPU: greedy/sampled + timestamp rules.

Re-creates the decoding semantics the reference gets from
faster-whisper/CTranslate2 (reference: whisperjav/modules/
faster_whisper_pro_asr.py:819-894 consumes segments with logprob /
no-speech / timestamp outputs) as a single fixed-shape ``lax.while_loop``
under jit:

- the whole batch decodes in lockstep with per-row ``finished`` freezing —
  no dynamic shapes, no host round-trips inside the loop;
- Whisper's logit rules (suppress-tokens, suppress-blank, timestamp
  pairing/monotonicity, max-initial-timestamp, the sum-of-timestamp-
  probability force rule) are implemented as vectorized masks;
- sampling uses ``argmax(logits + T * gumbel)`` so temperature 0 is exact
  greedy and the fallback ladder re-uses one compiled program;
- repetition penalty (CTranslate2-style: applied to every previously
  generated token) is a scatter over the token buffer.

Outputs per row: generated tokens, summed/averaged logprob, length, and
the no-speech probability read at the SOT position — everything the
host-side segment filter gate consumes.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from whisperjav_tpu.models.whisper.config import (
    WhisperConfig, language_token,
)
from whisperjav_tpu.models.whisper.model import (
    CrossKV, KVCache, Params, decode_step, precompute_cross_kv,
)
from whisperjav_tpu.models.whisper.tokenizer import DEFAULT_NONSPEECH_TOKENS

_BLANK_TOKEN = 220  # GPT-2 BPE " " token; suppressed at the first step


@dataclass(frozen=True)
class DecodeOptions:
    """Static decoding configuration (hashable: participates in jit keys)."""
    task: str = "transcribe"
    language: str = "ja"
    max_new_tokens: int = 224
    with_timestamps: bool = True
    max_initial_timestamp: float = 1.0
    suppress_blank: bool = True
    suppress_tokens: Tuple[int, ...] = DEFAULT_NONSPEECH_TOKENS
    # id of the GPT-2 BPE " " token in the DECODING id space; differs
    # from 220 only under a sliced vocab (vocab_subset.py remaps it)
    blank_token: int = _BLANK_TOKEN
    repetition_penalty: float = 1.0
    # ban tokens completing an already-seen n-gram (0 = off; the
    # reference presets all run 3 — faster_whisper.py:265,305,345)
    no_repeat_ngram_size: int = 0
    beam_size: int = 1
    # beam patience (Kasai et al. 2020; the CTranslate2/faster-whisper
    # option every sensitivity preset tunes — reference:
    # config/components/asr/faster_whisper.py:242,282,322): search runs
    # until ceil(beam_size*patience) hypotheses have FINISHED; finished
    # hypotheses leave the beam (into a pool) so their slots keep
    # exploring instead of freezing on the first EOT.
    patience: float = 1.0
    # number of independent samples on the temperature>0 fallback rungs;
    # the best row by avg logprob wins (faster-whisper best_of)
    best_of: int = 1
    length_penalty: float = 1.0
    ts_precision: float = 0.02
    # int8-quantize cross-attention K/V per (layer,batch,head): halves the
    # dominant per-token HBM stream at negligible quality cost
    cross_kv_int8: bool = False
    # int4 cross-KV (wins over int8): quarters the stream via XLA-native
    # s4; coarser ±7-level grid — opt-in, A/B before production use
    cross_kv_int4: bool = False
    # statically drop the per-step gumbel draw (B×V threefry) — exact for
    # temperature 0; the sampled ladder rungs must keep the shared
    # argmax(logits + T·gumbel) program. Profiler ablation + greedy lever.
    assume_greedy: bool = False


class DecodeResult(NamedTuple):
    tokens: jax.Array        # (B, max_new) generated ids, eot-padded
    length: jax.Array        # (B,) count of generated tokens before eot
    sum_logprob: jax.Array   # (B,)
    avg_logprob: jax.Array   # (B,)  sum / (length + 1), whisper convention
    no_speech_prob: jax.Array  # (B,)


def initial_tokens(config: WhisperConfig, options: DecodeOptions,
                   prompt: Sequence[int] = ()) -> np.ndarray:
    """SOT sequence: [prev-prompt] + [sot, lang, task] (+ no_timestamps)."""
    toks = [config.sot_prev, *prompt] if prompt else []
    toks += [config.sot, language_token(config, options.language),
             config.transcribe if options.task == "transcribe" else config.translate]
    if not options.with_timestamps:
        toks.append(config.no_timestamps)
    return np.asarray(toks, np.int32)


def _static_suppress_mask(config: WhisperConfig,
                          options: DecodeOptions) -> np.ndarray:
    """(V,) additive mask of always-suppressed ids (specials + non-speech)."""
    mask = np.zeros((config.n_vocab,), np.float32)
    for t in options.suppress_tokens:
        if 0 <= t < config.n_vocab:
            mask[t] = -np.inf
    # every special token between eot (exclusive) and timestamp_begin:
    # sot, language tags, task tags, no_timestamps, no_speech, sot_prev
    mask[config.eot + 1: config.timestamp_begin] = -np.inf
    if not options.with_timestamps:
        mask[config.timestamp_begin:] = -np.inf
    return mask


class _State(NamedTuple):
    step: jax.Array
    tokens: jax.Array        # (B, total_len)
    cache: KVCache
    cur_logits: jax.Array    # (B, V) logits for the next position
    sum_lp: jax.Array
    length: jax.Array
    finished: jax.Array
    last_was_ts: jax.Array
    penult_was_ts: jax.Array
    max_ts: jax.Array        # (B,) highest emitted timestamp id
    rng: jax.Array
    # (B, V) bool: token ids emitted so far (repetition-penalty
    # membership). Carried INCREMENTALLY — one (B, V) one-hot OR per
    # step — instead of rebuilding membership from the token buffer,
    # which is a (B, total_len, V) broadcast-compare every step
    # (~560M bool lanes at B=24 large-v2). (B, 1) dummy when the
    # penalty is off.
    seen: jax.Array


def _apply_logit_rules(logits, state, config: WhisperConfig,
                       options: DecodeOptions, static_mask, prompt_len):
    """All Whisper logit filters, vectorized over the batch."""
    b, v = logits.shape
    logits = logits + static_mask[None, :]
    is_first = state.step == 0

    if options.suppress_blank:
        first_mask = jnp.zeros((v,), jnp.float32)
        first_mask = first_mask.at[options.blank_token].set(-jnp.inf)
        first_mask = first_mask.at[config.eot].set(-jnp.inf)
        logits = jnp.where(is_first, logits + first_mask[None, :], logits)

    if options.repetition_penalty != 1.0:
        # CTranslate2-style: penalize every already-generated token id.
        # Membership mask built as a broadcast-compare reduction, NOT a
        # scatter — TPU lowers (B, V) scatters to a serial loop costing
        # several ms/step (measured ~11% RTF for the same-shaped n-gram
        # scatter; ADR-002), while the compare+any fuses on the VPU.
        penalty = options.repetition_penalty
        idx = jax.lax.broadcasted_iota(jnp.int32, (b, v), 1)
        seen = state.seen & (idx != config.eot)
        penalized = jnp.where(logits > 0, logits / penalty, logits * penalty)
        logits = jnp.where(seen, penalized, logits)

    if options.no_repeat_ngram_size > 0:
        # CTranslate2/HF no_repeat_ngram rule (reference preset value 3
        # for every sensitivity, faster_whisper.py:265,305,345): ban any
        # token that would complete an n-gram already present in the
        # sequence. Vectorized: compare every window start j against the
        # current (n-1)-token suffix and scatter-ban the token at j+n-1.
        n = options.no_repeat_ngram_size
        tl = state.tokens.shape[1]
        cur = prompt_len + state.step           # next write position
        suf = jax.lax.dynamic_slice(
            state.tokens, (0, cur - (n - 1)), (b, n - 1))
        nwin = tl - n + 1
        match = jnp.ones((b, nwin), jnp.bool_)
        for i in range(n - 1):
            match &= state.tokens[:, i:i + nwin] == suf[:, i:i + 1]
        win = jnp.arange(nwin)
        match &= win[None, :] <= cur - n        # window fully in the past
        completions = state.tokens[:, n - 1:n - 1 + nwin]
        # scatter-free ban mask (see repetition-penalty note above):
        # broadcast-compare + any fuses on the VPU; the equivalent
        # (B, V) scatter costs ~11% whole-decode RTF on TPU
        idx = jax.lax.broadcasted_iota(jnp.int32, (b, v), 1)
        banned = jnp.any((completions[:, :, None] == idx[:, None, :])
                         & match[:, :, None], axis=1)
        banned &= idx != config.eot             # EOT stays legal
        logits = jnp.where(banned, -jnp.inf, logits)

    if options.with_timestamps:
        ts_begin = config.timestamp_begin
        idx = jax.lax.broadcasted_iota(jnp.int32, (b, v), 1)
        is_ts = idx >= ts_begin
        neg = jnp.float32(-jnp.inf)

        # pairing (whisper ApplyTimestampRules): after "text <ts>" the pair
        # must close (only timestamps/EOT may follow); after "<ts> <ts>"
        # (closed pair) another timestamp may not immediately open.
        # penult_was_ts initializes True (a 1-token sequence counts as
        # penultimate-timestamp in the reference rule), so the token right
        # after the opening timestamp is allowed to be text.
        lone_ts = state.last_was_ts & ~state.penult_was_ts
        closed_ts = state.last_was_ts & state.penult_was_ts
        sup_pair = jnp.where(
            lone_ts[:, None] & ~is_ts & (idx != config.eot), neg, 0.0)
        sup_closed = jnp.where(closed_ts[:, None] & is_ts, neg, 0.0)

        # monotonic: the next OPENING timestamp must be strictly greater
        # than the last seen one (suppress idx <= max_ts); when the pair is
        # still open (lone_ts), the closing timestamp may equal it
        # (suppress only idx < max_ts)
        strict = ~lone_ts
        mono_bound = state.max_ts + strict.astype(jnp.int32)
        sup_mono = jnp.where(is_ts & (idx < mono_bound[:, None]), neg, 0.0)
        # the monotonic rule only applies once a timestamp exists; step 0
        # forces one, so every later step qualifies (<|0.00|> stays legal
        # at the first position)
        sup_mono = jnp.where(is_first, 0.0, sup_mono)
        logits = logits + sup_pair + sup_closed + sup_mono

        # first sampled position must BE a timestamp, bounded by
        # max_initial_timestamp (whisper forces logits[:tb] = -inf there)
        max_init = ts_begin + int(round(
            options.max_initial_timestamp / options.ts_precision))
        sup_init = jnp.where(~is_ts | (idx > max_init), neg, 0.0)
        logits = jnp.where(is_first, logits + sup_init, logits)

        # force-timestamp rule: if P(any timestamp) > max P(text token),
        # sample must be a timestamp
        lp = jax.nn.log_softmax(logits, axis=-1)
        ts_lse = jax.nn.logsumexp(jnp.where(is_ts, lp, neg), axis=-1)
        max_text = jnp.max(jnp.where(is_ts, neg, lp), axis=-1)
        force_ts = ts_lse > max_text
        logits = jnp.where(force_ts[:, None] & ~is_ts, neg, logits)

    return logits


@functools.partial(
    jax.jit,
    static_argnames=("config", "options", "prompt_len"))
def _greedy_loop(params: Params, config: WhisperConfig,
                 options: DecodeOptions, tokens_init: jax.Array,
                 prompt_len: int, cross: CrossKV, cache: KVCache,
                 prefill_logits: jax.Array, sot_logits: jax.Array,
                 temperature: jax.Array, rng: jax.Array,
                 stop_at: Optional[jax.Array] = None) -> DecodeResult:
    b = tokens_init.shape[0]
    max_new = options.max_new_tokens
    # traced step bound (≤ max_new): lets the profiler time two budgets
    # with ONE executable (same cache size, same compile), so the
    # seconds-per-step slope isn't contaminated by shape differences
    if stop_at is None:
        stop_at = jnp.int32(max_new)
    static_mask = jnp.asarray(_static_suppress_mask(config, options))
    no_speech_prob = jax.nn.softmax(sot_logits, axis=-1)[:, config.no_speech]

    state = _State(
        step=jnp.int32(0),
        tokens=tokens_init,
        cache=cache,
        cur_logits=prefill_logits,
        sum_lp=jnp.zeros((b,), jnp.float32),
        length=jnp.zeros((b,), jnp.int32),
        finished=jnp.zeros((b,), jnp.bool_),
        last_was_ts=jnp.zeros((b,), jnp.bool_),
        # True at start: a 1-token sequence counts as penultimate-timestamp
        # in whisper's pairing rule (see _apply_logit_rules)
        penult_was_ts=jnp.ones((b,), jnp.bool_),
        max_ts=jnp.full((b,), config.timestamp_begin, jnp.int32),
        rng=rng,
        seen=jnp.zeros(
            (b, config.n_vocab if options.repetition_penalty != 1.0 else 1),
            jnp.bool_),
    )

    def cond(s: _State):
        return (s.step < stop_at) & ~jnp.all(s.finished)

    def body(s: _State) -> _State:
        logits = _apply_logit_rules(s.cur_logits, s, config, options,
                                    static_mask, prompt_len)
        if options.assume_greedy:
            rng = s.rng
            token = jnp.argmax(logits, axis=-1)
        else:
            rng, sub = jax.random.split(s.rng)
            gumbel = jax.random.gumbel(sub, logits.shape, jnp.float32)
            token = jnp.argmax(logits + temperature * gumbel, axis=-1)
        token = jnp.where(s.finished, config.eot, token).astype(jnp.int32)

        lp = jax.nn.log_softmax(logits, axis=-1)
        tok_lp = jnp.take_along_axis(lp, token[:, None], axis=-1)[:, 0]
        sum_lp = s.sum_lp + jnp.where(s.finished, 0.0, tok_lp)
        is_eot = token == config.eot
        length = s.length + jnp.where(s.finished | is_eot, 0, 1)
        finished = s.finished | is_eot

        pos = prompt_len + s.step
        tokens = jax.lax.dynamic_update_slice(
            s.tokens, token[:, None], (0, pos))

        is_ts = token >= config.timestamp_begin
        max_ts = jnp.where(is_ts, jnp.maximum(s.max_ts, token), s.max_ts)

        if options.repetition_penalty != 1.0:
            vid = jax.lax.broadcasted_iota(
                jnp.int32, (b, config.n_vocab), 1)
            seen = s.seen | (vid == token[:, None])
        else:
            seen = s.seen

        next_logits, cache = decode_step(
            params, config, token[:, None], pos, s.cache, cross)

        return _State(
            step=s.step + 1, tokens=tokens, cache=cache,
            cur_logits=next_logits[:, 0], sum_lp=sum_lp, length=length,
            finished=finished,
            last_was_ts=jnp.where(s.finished, s.last_was_ts, is_ts),
            penult_was_ts=jnp.where(s.finished, s.penult_was_ts,
                                    s.last_was_ts),
            max_ts=max_ts, rng=rng, seen=seen,
        )

    final = jax.lax.while_loop(cond, body, state)
    gen = jax.lax.dynamic_slice_in_dim(final.tokens, prompt_len, max_new, 1)
    # replace anything at/after first eot with eot padding
    first_eot = jnp.argmax(gen == config.eot, axis=1)
    has_eot = jnp.any(gen == config.eot, axis=1)
    cut = jnp.where(has_eot, first_eot, max_new)
    mask = jax.lax.broadcasted_iota(jnp.int32, gen.shape, 1) >= cut[:, None]
    gen = jnp.where(mask, config.eot, gen)
    avg_lp = final.sum_lp / (final.length.astype(jnp.float32) + 1.0)
    return DecodeResult(gen, final.length, final.sum_lp, avg_lp,
                        no_speech_prob)


def decode_greedy(
    params: Params,
    config: WhisperConfig,
    xa: jax.Array,                       # (B, T_audio, d) encoder states
    options: DecodeOptions = DecodeOptions(),
    prompt: Sequence[int] = (),
    temperature: float = 0.0,
    rng: Optional[jax.Array] = None,
    stop_at: Optional[int] = None,
) -> DecodeResult:
    """Greedy/temperature-sampled batched decode of encoded audio.

    ``stop_at`` (traced, ≤ max_new_tokens) bounds the step count without
    recompiling — profiling/attribution use only.
    """
    b = xa.shape[0]
    init = initial_tokens(config, options, prompt)
    prompt_len = len(init)
    # position of SOT in init: after the optional [sot_prev, *prompt] prefix;
    # the suffix is [sot, lang, task] plus no_timestamps when disabled
    sot_pos = prompt_len - (3 if options.with_timestamps else 4)

    total_len = prompt_len + options.max_new_tokens
    tokens = jnp.zeros((b, total_len), jnp.int32)
    tokens = tokens.at[:, :prompt_len].set(jnp.asarray(init)[None, :])

    cross = precompute_cross_kv(params, config, xa,
                                int8=options.cross_kv_int8,
                                int4=options.cross_kv_int4)
    cache = KVCache.zeros(config, b, total_len,
                          params["decoder"]["tok_emb"].dtype)
    prefill, cache = decode_step(
        params, config, jnp.broadcast_to(jnp.asarray(init)[None, :],
                                         (b, prompt_len)),
        0, cache, cross)
    sot_logits = prefill[:, sot_pos]
    last_logits = prefill[:, -1]

    if rng is None:
        rng = jax.random.PRNGKey(0)
    return _greedy_loop(params, config, options, tokens, prompt_len, cross,
                        cache, last_logits, sot_logits,
                        jnp.float32(temperature), rng,
                        None if stop_at is None else jnp.int32(stop_at))


# ---------------------------------------------------------------------------
# host-side segment extraction
# ---------------------------------------------------------------------------

@dataclass
class DecodedSegment:
    start: float           # seconds, relative to window start
    end: float
    tokens: list
    text: str = ""
    avg_logprob: float = 0.0
    no_speech_prob: float = 0.0


def extract_segments(
    token_ids: np.ndarray,
    config: WhisperConfig,
    options: DecodeOptions,
    window_duration: float,
    avg_logprob: float = 0.0,
    no_speech_prob: float = 0.0,
) -> list:
    """Split one row of generated ids into timestamped segments (host-side).

    Token stream shape: ``<|t0|> text <|t1|> <|t2|> text <|t3|> … eot``.
    A trailing open segment (no closing timestamp) is clamped to the window
    duration — same convention the reference relies on for stitching offsets
    (whisperjav/modules/faster_whisper_pro_asr.py:1024-1031 adds scene
    offsets to these per-window times).
    """
    ts_begin = config.timestamp_begin
    prec = options.ts_precision
    ids = [int(t) for t in token_ids]
    segments: list = []
    cur_tokens: list = []
    cur_start: Optional[float] = None

    for tid in ids:
        if tid == config.eot:
            break
        if tid >= ts_begin:
            t = (tid - ts_begin) * prec
            if cur_start is None:
                cur_start = t
            elif cur_tokens:
                segments.append(DecodedSegment(
                    start=cur_start, end=min(t, window_duration),
                    tokens=cur_tokens, avg_logprob=avg_logprob,
                    no_speech_prob=no_speech_prob))
                cur_tokens = []
                cur_start = None
        else:
            if cur_start is None:
                cur_start = 0.0
            cur_tokens.append(tid)

    if cur_tokens:
        segments.append(DecodedSegment(
            start=cur_start or 0.0, end=window_duration,
            tokens=cur_tokens, avg_logprob=avg_logprob,
            no_speech_prob=no_speech_prob))
    return segments


# ---------------------------------------------------------------------------
# beam search
# ---------------------------------------------------------------------------

class _BeamState(NamedTuple):
    step: jax.Array
    tokens: jax.Array        # (B*k, total_len) live beams (never finished)
    cache: KVCache           # (L, B*k, T, H, hd)
    cur_logits: jax.Array    # (B*k, V)
    cum_lp: jax.Array        # (B, k) cumulative logprob per live beam
    length: jax.Array        # (B*k,)
    last_was_ts: jax.Array
    penult_was_ts: jax.Array
    max_ts: jax.Array
    # (B*k, V) incremental repetition-penalty membership (see _State.seen);
    # reordered by beam-parent gather alongside the caches
    seen: jax.Array
    # finished-hypothesis pool (patience semantics): (B, n_fin, …)
    pool_tokens: jax.Array
    pool_score: jax.Array    # length-normalized, -inf = empty slot
    pool_sum_lp: jax.Array
    pool_len: jax.Array


def _length_norm(length: jax.Array, alpha: float) -> jax.Array:
    """GNMT length penalty ((5+len)/6)^alpha — the CTranslate2 convention
    behind faster-whisper's length_penalty option."""
    return jnp.power((5.0 + length.astype(jnp.float32)) / 6.0, alpha)


@functools.partial(jax.jit, static_argnames=("config", "options",
                                             "prompt_len"))
def _beam_loop(params: Params, config: WhisperConfig, options: DecodeOptions,
               tokens_init: jax.Array, prompt_len: int, cross: CrossKV,
               cache: KVCache, prefill_logits: jax.Array,
               sot_logits: jax.Array) -> DecodeResult:
    """Patience-aware beam search (Kasai et al. 2020 / CTranslate2).

    Live beams NEVER freeze: a candidate ending in EOT moves to a
    per-row finished pool of ceil(k·patience) slots and its beam slot
    takes the next-best live continuation. The loop stops when every
    row's pool is full (or at max_new_tokens); the winner is the best
    length-normalized pooled hypothesis, falling back to the best live
    beam for rows that never finished.
    """
    k = options.beam_size
    bk = tokens_init.shape[0]
    b = bk // k
    v = config.n_vocab
    max_new = options.max_new_tokens
    total_len = tokens_init.shape[1]
    n_fin = max(k, int(np.ceil(k * options.patience)))
    static_mask = jnp.asarray(_static_suppress_mask(config, options))
    no_speech_prob = jax.nn.softmax(
        sot_logits.reshape(b, k, v)[:, 0], axis=-1)[:, config.no_speech]

    # symmetry breaking: only beam 0 is live initially
    cum0 = jnp.tile(jnp.asarray([0.0] + [-1e30] * (k - 1), jnp.float32)[None],
                    (b, 1))
    state = _BeamState(
        step=jnp.int32(0), tokens=tokens_init, cache=cache,
        cur_logits=prefill_logits, cum_lp=cum0,
        length=jnp.zeros((bk,), jnp.int32),
        last_was_ts=jnp.zeros((bk,), jnp.bool_),
        penult_was_ts=jnp.ones((bk,), jnp.bool_),
        max_ts=jnp.full((bk,), config.timestamp_begin, jnp.int32),
        seen=jnp.zeros(
            (bk, v if options.repetition_penalty != 1.0 else 1),
            jnp.bool_),
        pool_tokens=jnp.zeros((b, n_fin, total_len), jnp.int32),
        pool_score=jnp.full((b, n_fin), -jnp.inf, jnp.float32),
        pool_sum_lp=jnp.zeros((b, n_fin), jnp.float32),
        pool_len=jnp.zeros((b, n_fin), jnp.int32),
    )

    def cond(s: _BeamState):
        pool_full = jnp.all(s.pool_score > -1e29, axis=1)   # (B,)
        return (s.step < max_new) & ~jnp.all(pool_full)

    def body(s: _BeamState) -> _BeamState:
        # rules need a _State-compatible view for the shared filter fn
        pseudo = _State(step=s.step, tokens=s.tokens, cache=s.cache,
                        cur_logits=s.cur_logits, sum_lp=None, length=s.length,
                        finished=jnp.zeros((bk,), jnp.bool_),
                        last_was_ts=s.last_was_ts,
                        penult_was_ts=s.penult_was_ts, max_ts=s.max_ts,
                        rng=None, seen=s.seen)
        logits = _apply_logit_rules(s.cur_logits, pseudo, config, options,
                                    static_mask, prompt_len)
        lp = jax.nn.log_softmax(logits, axis=-1)          # (B*k, V)
        total = s.cum_lp.reshape(bk, 1) + lp              # (B*k, V)

        # top 2k candidates per row: each source beam contributes at most
        # one EOT candidate, so at least k of the 2k are live continuations
        scores2k, flat_idx = jax.lax.top_k(total.reshape(b, k * v), 2 * k)
        beam_src = flat_idx // v                          # (B, 2k)
        token2k = (flat_idx % v).astype(jnp.int32)        # (B, 2k)
        is_eot = token2k == config.eot
        pos = prompt_len + s.step

        # --- finished candidates → pool (length-normalized insertion) ---
        src_len = jnp.take_along_axis(s.length.reshape(b, k), beam_src,
                                      axis=1)              # (B, 2k)
        cand_norm = scores2k / _length_norm(src_len, options.length_penalty)
        cand_norm = jnp.where(is_eot, cand_norm, -jnp.inf)
        # candidate token buffers: source beam tokens + EOT at pos
        gidx2k = jnp.arange(b)[:, None] * k + beam_src     # (B, 2k)
        cand_tokens = jnp.take(s.tokens, gidx2k.reshape(-1), axis=0
                               ).reshape(b, 2 * k, total_len)
        eot_col = jnp.full((b, 2 * k, 1), config.eot, jnp.int32)
        cand_tokens = jax.lax.dynamic_update_slice(
            cand_tokens, eot_col, (0, 0, pos))

        all_scores = jnp.concatenate([s.pool_score, cand_norm], axis=1)
        all_tokens = jnp.concatenate([s.pool_tokens, cand_tokens], axis=1)
        all_sum = jnp.concatenate(
            [s.pool_sum_lp, scores2k], axis=1)
        all_len = jnp.concatenate([s.pool_len, src_len], axis=1)
        top_scores, top_idx = jax.lax.top_k(all_scores, n_fin)
        pool_tokens = jnp.take_along_axis(all_tokens, top_idx[..., None],
                                          axis=1)
        pool_sum_lp = jnp.take_along_axis(all_sum, top_idx, axis=1)
        pool_len = jnp.take_along_axis(all_len, top_idx, axis=1)

        # --- live continuations: best k non-EOT candidates ---
        live_scores = jnp.where(is_eot, -jnp.inf, scores2k)
        sel_scores, sel = jax.lax.top_k(live_scores, k)    # (B, k) of [0,2k)
        live_src = jnp.take_along_axis(beam_src, sel, axis=1)
        live_tok = jnp.take_along_axis(token2k, sel, axis=1)

        gidx = (jnp.arange(b)[:, None] * k + live_src).reshape(bk)
        tokens = jnp.take(s.tokens, gidx, axis=0)
        # self-cache reorder is the beam loop's biggest per-step HBM cost
        # (full read+write of (2, L, B·k, T, d)); when the selection is the
        # identity permutation — beams kept their own slots, a common
        # steady state — lax.cond skips it at runtime entirely
        ident = jnp.all(live_src == jnp.arange(k)[None, :])
        cache_ = jax.lax.cond(
            ident,
            lambda c: c,
            lambda c: KVCache(jnp.take(c.k, gidx, axis=1),
                              jnp.take(c.v, gidx, axis=1)),
            s.cache)
        length = jnp.take(s.length, gidx) + 1
        last_was_ts = jnp.take(s.last_was_ts, gidx)
        max_ts = jnp.take(s.max_ts, gidx)

        tok_flat = live_tok.reshape(bk)
        tokens = jax.lax.dynamic_update_slice(tokens, tok_flat[:, None],
                                              (0, pos))
        is_ts = tok_flat >= config.timestamp_begin
        new_max_ts = jnp.where(is_ts, jnp.maximum(max_ts, tok_flat), max_ts)

        if options.repetition_penalty != 1.0:
            vid = jax.lax.broadcasted_iota(jnp.int32, (bk, v), 1)
            seen = jnp.take(s.seen, gidx, axis=0) | (
                vid == tok_flat[:, None])
        else:
            seen = s.seen

        next_logits, cache_ = decode_step(
            params, config, tok_flat[:, None], pos, cache_, cross)

        return _BeamState(
            step=s.step + 1, tokens=tokens, cache=cache_,
            cur_logits=next_logits[:, 0], cum_lp=sel_scores,
            length=length,
            last_was_ts=is_ts, penult_was_ts=last_was_ts,
            max_ts=new_max_ts, seen=seen,
            pool_tokens=pool_tokens, pool_score=top_scores,
            pool_sum_lp=pool_sum_lp, pool_len=pool_len,
        )

    final = jax.lax.while_loop(cond, body, state)

    # winner: best pooled hypothesis; rows with an empty pool fall back to
    # the best live beam (ran out of steps before finishing)
    best_pool = jnp.argmax(final.pool_score, axis=1)       # (B,)
    pool_has = jnp.any(final.pool_score > -1e29, axis=1)
    pool_tok = jnp.take_along_axis(
        final.pool_tokens, best_pool[:, None, None], axis=1)[:, 0]
    pool_sum = jnp.take_along_axis(final.pool_sum_lp, best_pool[:, None],
                                   axis=1)[:, 0]
    pool_len = jnp.take_along_axis(final.pool_len, best_pool[:, None],
                                   axis=1)[:, 0]

    live_norm = final.cum_lp / _length_norm(
        final.length.reshape(b, k), options.length_penalty)
    best_live = jnp.argmax(live_norm, axis=1)
    sel = jnp.arange(b) * k + best_live
    live_tok = jnp.take(final.tokens, sel, axis=0)
    live_sum = jnp.take(final.cum_lp.reshape(bk), sel)
    live_len = jnp.take(final.length, sel)

    tokens = jnp.where(pool_has[:, None], pool_tok, live_tok)
    sum_lp = jnp.where(pool_has, pool_sum, live_sum)
    length = jnp.where(pool_has, pool_len, live_len)

    gen = jax.lax.dynamic_slice_in_dim(tokens, prompt_len, max_new, 1)
    first_eot = jnp.argmax(gen == config.eot, axis=1)
    has_eot = jnp.any(gen == config.eot, axis=1)
    cut = jnp.where(has_eot, first_eot, max_new)
    mask = jax.lax.broadcasted_iota(jnp.int32, gen.shape, 1) >= cut[:, None]
    gen = jnp.where(mask, config.eot, gen)
    avg_lp = sum_lp / (length.astype(jnp.float32) + 1.0)
    return DecodeResult(gen, length, sum_lp, avg_lp, no_speech_prob)


def decode_beam(
    params: Params,
    config: WhisperConfig,
    xa: jax.Array,
    options: DecodeOptions = DecodeOptions(beam_size=2),
    prompt: Sequence[int] = (),
) -> DecodeResult:
    """Batched beam-search decode (lockstep beams, fixed shapes).

    Beams run in the batch dimension (B*k rows) so the same compiled
    encoder/decoder kernels serve greedy and beam; finished beams keep
    emitting EOT at zero cost until all beams in all rows finish. Final
    selection uses GNMT length-penalty normalization — the semantics the
    reference's presets assume of CTranslate2 (beam 2-3, length_penalty 1).
    """
    k = options.beam_size
    if k <= 1:
        return decode_greedy(params, config, xa, options, prompt)
    b = xa.shape[0]
    init = initial_tokens(config, options, prompt)
    prompt_len = len(init)
    sot_pos = prompt_len - (3 if options.with_timestamps else 4)
    total_len = prompt_len + options.max_new_tokens

    # All k beams of a row attend the SAME audio, so cross-KV is computed
    # ONCE per row (not per beam) and the beams fold into the query-time
    # axis inside cross_attention (model.py) — 1/k the dominant decode
    # HBM stream and 1/k the cross-KV residency vs the naive repeat.
    # WJAV_BEAM_SHARED_CROSS=0 restores the repeat layout for A/B.
    import os
    shared = os.environ.get("WJAV_BEAM_SHARED_CROSS", "1") != "0"
    xa_k = xa if shared else jnp.repeat(xa, k, axis=0)
    cross = precompute_cross_kv(params, config, xa_k,
                                int8=options.cross_kv_int8,
                                int4=options.cross_kv_int4)
    tokens = jnp.zeros((b * k, total_len), jnp.int32)
    tokens = tokens.at[:, :prompt_len].set(jnp.asarray(init)[None, :])
    cache = KVCache.zeros(config, b * k, total_len,
                          params["decoder"]["tok_emb"].dtype)
    prefill, cache = decode_step(
        params, config,
        jnp.broadcast_to(jnp.asarray(init)[None, :], (b * k, prompt_len)),
        0, cache, cross)
    return _beam_loop(params, config, options, tokens, prompt_len, cross,
                      cache, prefill[:, -1], prefill[:, sot_pos])
