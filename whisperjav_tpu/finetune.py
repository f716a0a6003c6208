"""``whisperjav-finetune`` — fine-tune Whisper on (WAV, SRT) pairs.

The reference is inference-only; a production TPU framework closes the
loop: subtitles you corrected by hand become training data for the next
run. This CLI builds teacher-forced examples straight from media + SRT
(the same timestamp-token grammar the decoder emits — reference
semantics: whisper's ``<|t|> text <|t|>`` segments), shards the train
step over a ("data", "model") mesh (parallel/train.py), and persists
orbax checkpoints loadable by ``--checkpoint`` everywhere else.

TPU-shaped by construction: fixed (B, n_mels, 3000) mel windows, fixed
token length, one compiled step, data-parallel batch sharding over ICI.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path
from typing import Iterator, List, Optional, Tuple

import numpy as np

from whisperjav_tpu.utils.logger import logger

WINDOW_S = 30.0


# ---------------------------------------------------------------------------
# dataset: (wav, srt) pairs → fixed-shape teacher-forced examples
# ---------------------------------------------------------------------------

def discover_pairs(data_dir: Path) -> List[Tuple[Path, Path]]:
    """WAV files with a sibling SRT (any of `x.srt`, `x.ja.srt`,
    `x.ja.whisperjav.srt`)."""
    pairs = []
    for wav in sorted(data_dir.rglob("*.wav")):
        for cand in (wav.with_suffix(".srt"),
                     wav.with_suffix(".ja.srt"),
                     wav.with_name(wav.stem + ".ja.whisperjav.srt")):
            if cand.exists():
                pairs.append((wav, cand))
                break
    return pairs


def build_examples(
    wav_path: Path,
    srt_path: Path,
    tokenizer,
    config,
    max_tokens: int,
    language: str = "ja",
) -> Iterator[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Yield (audio_window f32 (N,), tokens i32 (max_tokens,),
    loss_mask f32 (max_tokens,)) per 30 s window containing cues.

    Token layout per window — exactly what decode emits (sot, lang,
    task, then ``<|ts|> text <|ts|>`` per cue, eot); loss is masked to
    everything AFTER the task token so the model is not trained to
    predict its own prompt.
    """
    from whisperjav_tpu.models.whisper.config import language_token
    from whisperjav_tpu.modules.audio_extraction import AudioExtractor
    from whisperjav_tpu.modules.audio_io import WHISPER_SAMPLE_RATE
    from whisperjav_tpu.modules.srt import load_srt

    audio, duration = AudioExtractor(WHISPER_SAMPLE_RATE).extract(wav_path)
    subs = load_srt(srt_path)
    sr = WHISPER_SAMPLE_RATE
    n_win = int(np.ceil(duration / WINDOW_S))
    ts_begin = config.timestamp_begin
    precision = 0.02

    for w in range(n_win):
        w0 = w * WINDOW_S
        w1 = w0 + WINDOW_S
        cues = [s for s in subs if s.start < w1 and s.end > w0
                and s.text.strip()]
        if not cues:
            continue
        toks: List[int] = [config.sot,
                           language_token(config, language),
                           config.transcribe]
        prompt_len = len(toks)
        ok = True
        for s in cues:
            t0 = int(round(max(s.start - w0, 0.0) / precision))
            t1 = int(round(min(s.end - w0, WINDOW_S) / precision))
            text_ids = tokenizer.encode(s.text.strip())
            if len(toks) + len(text_ids) + 3 > max_tokens:
                ok = False
                break
            toks.append(ts_begin + t0)
            toks.extend(text_ids)
            toks.append(ts_begin + min(t1, 1500))
        if not ok and len(toks) <= prompt_len:
            continue
        toks.append(config.eot)
        buf = np.full((max_tokens,), config.eot, np.int32)
        buf[:len(toks)] = toks
        mask = np.zeros((max_tokens,), np.float32)
        mask[prompt_len:len(toks)] = 1.0   # train on ts/text/eot only
        a0 = int(w0 * sr)
        clip = audio[a0:a0 + int(WINDOW_S * sr)]
        win = np.zeros((int(WINDOW_S * sr),), np.float32)
        win[:len(clip)] = clip
        yield win, buf, mask


def batch_examples(examples, batch_size: int, n_mels: int):
    """Group examples into fixed (B, n_mels, 3000) mel + token batches.
    The final partial batch pads with repeats so shapes never vary."""
    import jax.numpy as jnp
    from whisperjav_tpu.ops.mel import log_mel_spectrogram

    buf: List[Tuple[np.ndarray, np.ndarray, np.ndarray]] = []
    for ex in examples:
        buf.append(ex)
        if len(buf) == batch_size:
            yield _finalize(buf, n_mels, log_mel_spectrogram, jnp)
            buf = []
    if buf:
        while len(buf) < batch_size:      # repeat-pad the tail
            buf.append(buf[len(buf) % max(len(buf), 1)])
        yield _finalize(buf, n_mels, log_mel_spectrogram, jnp)


def _finalize(buf, n_mels, log_mel_spectrogram, jnp):
    audio = np.stack([b[0] for b in buf])
    mel = np.asarray(log_mel_spectrogram(jnp.asarray(audio),
                                         n_mels=n_mels))
    tokens = np.stack([b[1] for b in buf])
    mask = np.stack([b[2] for b in buf])
    return mel, tokens, mask


# ---------------------------------------------------------------------------
# CLI
# ---------------------------------------------------------------------------

def main(argv: Optional[List[str]] = None) -> int:
    from whisperjav_tpu.utils.jax_cache import (
        enable_persistent_compilation_cache,
    )
    enable_persistent_compilation_cache()
    p = argparse.ArgumentParser(
        prog="whisperjav-finetune",
        description="fine-tune Whisper on corrected (WAV, SRT) pairs")
    p.add_argument("--data", required=True,
                   help="directory of WAV files with sibling SRTs")
    p.add_argument("--model", default="tiny",
                   help="whisper size to fine-tune")
    p.add_argument("--checkpoint", default=None,
                   help="initial weights (local HF dir or orbax dir)")
    p.add_argument("--output-dir", default="./finetuned")
    p.add_argument("--steps", type=int, default=100,
                   help="max optimizer steps (epochs repeat the data)")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--max-tokens", type=int, default=448)
    p.add_argument("--lr", type=float, default=1e-5)
    p.add_argument("--weight-decay", type=float, default=0.01)
    p.add_argument("--tp", type=int, default=None,
                   help="tensor-parallel degree (default: devices<=4 → 1)")
    p.add_argument("--save-every", type=int, default=50)
    p.add_argument("--language", default="ja")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from whisperjav_tpu.models.whisper.tokenizer import (
        WhisperTokenizer, find_tokenizer_files,
    )
    from whisperjav_tpu.parallel.train import (
        build_sharded_train_step, make_optimizer, make_train_mesh,
    )
    from whisperjav_tpu.pipelines.factory import load_model
    from whisperjav_tpu.utils.checkpoint import save_checkpoint

    data_dir = Path(args.data)
    pairs = discover_pairs(data_dir)
    if not pairs:
        logger.error("no (wav, srt) pairs under %s", data_dir)
        return 1
    logger.info("found %d (wav, srt) pair(s)", len(pairs))

    config, params = load_model(args.model, args.checkpoint,
                                dtype=jnp.float32)
    tokenizer = WhisperTokenizer(config,
                                 find_tokenizer_files(args.checkpoint))
    if not tokenizer.is_real:
        logger.warning("no real tokenizer found — token ids use the "
                       "fallback hash (plumbing/testing only)")

    n_dev = jax.device_count()
    mesh = make_train_mesh(n_dev, tp=args.tp)
    logger.info("mesh %s over %d device(s)", mesh.devices.shape, n_dev)
    dp = int(mesh.devices.shape[0])
    if args.batch_size % dp:
        padded = ((args.batch_size + dp - 1) // dp) * dp
        logger.info("batch %d → %d (data-parallel axis %d)",
                    args.batch_size, padded, dp)
        args.batch_size = padded
    optimizer = make_optimizer(args.lr, args.weight_decay)
    init_fn, step_fn = build_sharded_train_step(config, mesh, optimizer)
    state = init_fn(params)

    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    losses: List[float] = []
    t0 = time.time()
    step = 0
    while step < args.steps:
        def examples():
            for wav, srt in pairs:
                yield from build_examples(wav, srt, tokenizer, config,
                                          args.max_tokens, args.language)
        saw_batch = False
        for mel, tokens, mask in batch_examples(examples(),
                                                args.batch_size,
                                                config.n_mels):
            saw_batch = True
            state, loss = step_fn(state, mel, tokens, mask)
            losses.append(float(loss))
            step += 1
            if step % 10 == 0 or step == args.steps:
                logger.info("step %d/%d  loss %.4f", step, args.steps,
                            losses[-1])
            if args.save_every and step % args.save_every == 0:
                _save(state, out_dir, config, losses, step, save_checkpoint)
            if step >= args.steps:
                break
        if not saw_batch:
            logger.error("dataset produced no training windows")
            return 1
    path = _save(state, out_dir, config, losses, step, save_checkpoint)
    logger.info("fine-tune done: %d steps in %.1fs → %s",
                step, time.time() - t0, path)
    return 0


def _save(state, out_dir: Path, config, losses, step, save_checkpoint):
    import jax
    host_params = jax.tree.map(lambda x: np.asarray(x), state.params)
    return save_checkpoint(
        out_dir / f"step_{step:06d}", host_params,
        metadata={"model": config.name, "step": step,
                  "loss": losses[-1] if losses else None,
                  "loss_history_tail": losses[-20:]})


if __name__ == "__main__":
    sys.exit(main())
