"""Fine-tuning training step with data + tensor parallel sharding.

The reference is inference-only (SURVEY.md §5: no model checkpointing),
but a production TPU framework ships fine-tuning: this module provides a
pjit training step over a ("data", "model") mesh using the GSPMD recipe —
annotate parameter/batch shardings with NamedSharding, let XLA insert the
collectives over ICI.

Sharding layout (stacked-layer param tree from models/whisper/model.py):
- attention QKV and MLP up-projections: output features sharded on
  "model" (column parallel);
- attention output and MLP down-projections: input features sharded on
  "model" (row parallel) — XLA inserts the psum;
- embeddings sharded on the feature axis; everything small replicated;
- batch (mel, tokens) sharded on "data".
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from whisperjav_tpu.models.whisper.config import WhisperConfig
from whisperjav_tpu.models.whisper.model import Params, forward


# ---------------------------------------------------------------------------
# sharding rules
# ---------------------------------------------------------------------------

def _block_specs(cross: bool) -> Dict[str, P]:
    specs = {
        "ln1_s": P(), "ln1_b": P(),
        "wq": P(None, None, "model"), "bq": P(None, "model"),
        "wk": P(None, None, "model"),
        "wv": P(None, None, "model"), "bv": P(None, "model"),
        "wo": P(None, "model", None), "bo": P(),
        "ln2_s": P(), "ln2_b": P(),
        "w1": P(None, None, "model"), "b1": P(None, "model"),
        "w2": P(None, "model", None), "b2": P(),
    }
    if cross:
        specs.update({
            "lnx_s": P(), "lnx_b": P(),
            "cwq": P(None, None, "model"), "cbq": P(None, "model"),
            "cwk": P(None, None, "model"),
            "cwv": P(None, None, "model"), "cbv": P(None, "model"),
            "cwo": P(None, "model", None), "cbo": P(),
        })
    return specs


def param_partition_specs() -> Dict[str, Any]:
    """PartitionSpec tree matching the (unquantized) whisper param tree."""
    return {
        "encoder": {
            "conv1_w": P(), "conv1_b": P(),
            "conv2_w": P(), "conv2_b": P(),
            "pos": P(),
            "blocks": _block_specs(cross=False),
            "ln_s": P(), "ln_b": P(),
        },
        "decoder": {
            "tok_emb": P(None, "model"),
            "pos_emb": P(),
            "blocks": _block_specs(cross=True),
            "ln_s": P(), "ln_b": P(),
        },
    }


def make_train_mesh(n_devices: int, tp: Optional[int] = None) -> Mesh:
    """(data, model) mesh; tp defaults to 2 when divisible, else 1."""
    if tp is None:
        tp = 2 if n_devices % 2 == 0 and n_devices >= 2 else 1
    dp = n_devices // tp
    devices = np.asarray(jax.devices()[:n_devices]).reshape(dp, tp)
    return Mesh(devices, ("data", "model"))


# ---------------------------------------------------------------------------
# training step
# ---------------------------------------------------------------------------

class TrainState(NamedTuple):
    params: Params
    opt_state: Any
    step: jax.Array


def make_optimizer(lr: float = 1e-5, weight_decay: float = 0.01):
    return optax.adamw(lr, weight_decay=weight_decay)


def loss_fn(params: Params, config: WhisperConfig, mel: jax.Array,
            tokens: jax.Array, loss_mask: jax.Array) -> jax.Array:
    """Teacher-forced next-token cross-entropy (masked)."""
    logits = forward(params, config, mel, tokens[:, :-1])
    targets = tokens[:, 1:]
    mask = loss_mask[:, 1:].astype(jnp.float32)
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(lp, targets[..., None], axis=-1)[..., 0]
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def build_sharded_train_step(
    config: WhisperConfig,
    mesh: Mesh,
    optimizer=None,
):
    """Returns (init_fn, step_fn) with shardings baked in.

    init_fn(params) -> TrainState (device_put with param specs)
    step_fn(state, mel, tokens, loss_mask) -> (state, loss)
    """
    if optimizer is None:
        optimizer = make_optimizer()

    pspecs = param_partition_specs()
    param_sh = jax.tree.map(lambda s: NamedSharding(mesh, s), pspecs,
                            is_leaf=lambda x: isinstance(x, P))
    batch_sh = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())

    def init_fn(params: Params) -> TrainState:
        params = jax.device_put(params, param_sh)
        opt_state = optimizer.init(params)
        return TrainState(params, opt_state, jnp.int32(0))

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step_fn(state: TrainState, mel, tokens, loss_mask):
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params, config, mel, tokens, loss_mask)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    def run_step(state, mel, tokens, loss_mask):
        mel = jax.device_put(jnp.asarray(mel), batch_sh)
        tokens = jax.device_put(jnp.asarray(tokens), batch_sh)
        loss_mask = jax.device_put(jnp.asarray(loss_mask), batch_sh)
        return step_fn(state, mel, tokens, loss_mask)

    return init_fn, run_step
