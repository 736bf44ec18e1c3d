"""Training step: CTC loss + optimizer, sharded over the (data, model) mesh.

No reference analog (training lives in an external repo there); built so
fine-tuning, freeze_layers-style transfer learning, and the multi-chip
dryrun have a real training path. The step jits end-to-end: spectrograms
are expected precomputed (B, 1, F, T) — the data pipeline shards rows over
the 'data' axis, parameters carry TP shardings from parallel.sharding.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..models import deepspeech as ds
from ..models.config import DeepSpeechConfig
from .ctc import mean_ctc_loss


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def _train_rnn_impl(config: DeepSpeechConfig) -> str:
    """Recurrence engine for TRAINING forwards.

    "auto" — every recurrence family's Mosaic kernels are differentiable
    (custom-VJP backward walks in ops/pallas_gru.py: gru_bwd_scan,
    lstm_bwd_scan, rnn_tanh_bwd_scan; gradient parity vs lax.scan pinned
    in tests/test_pallas_grad.py), so training rides the same
    speed-of-light recurrences as inference on TPU backends and the
    lax.scan path elsewhere.
    """
    del config
    return "auto"


def make_optimizer(
    learning_rate: float = 3e-4,
    weight_decay: float = 0.0,
    anneal: float | None = None,
    steps_per_epoch: int | None = None,
):
    """Adam/AdamW, optionally with the DeepSpeech2-style per-epoch LR
    anneal (lr /= anneal after each epoch — the schedule the reference's
    external training repo uses; pass e.g. anneal=1.1 with the dataset's
    steps_per_epoch)."""
    lr = learning_rate
    if anneal is not None:
        if not steps_per_epoch:
            raise ValueError("anneal needs steps_per_epoch")
        lr = optax.exponential_decay(
            learning_rate, steps_per_epoch, 1.0 / anneal, staircase=True
        )
    if weight_decay:
        return optax.adamw(lr, weight_decay=weight_decay)
    return optax.adam(lr)


def init_train_state(config: DeepSpeechConfig, optimizer, seed: int = 0) -> TrainState:
    params = ds.init_params(config, seed=seed)
    return TrainState(
        params=params, opt_state=optimizer.init(params), step=jnp.zeros((), jnp.int32)
    )


def loss_fn(
    params,
    config: DeepSpeechConfig,
    spect: jnp.ndarray,
    frame_lengths: jnp.ndarray,
    labels: jnp.ndarray,
    label_lengths: jnp.ndarray,
):
    logits, out_lengths = ds.forward(
        params, config, spect, frame_lengths, softmax=False,
        rnn_impl=_train_rnn_impl(config),
    )
    return mean_ctc_loss(
        logits, out_lengths, labels, label_lengths, blank_id=config.blank_index
    )


def make_train_step(config: DeepSpeechConfig, optimizer, frozen_mask=None):
    """Build a jittable train step.

    ``frozen_mask``: optional pytree of bools (True = frozen) implementing
    the reference's freeze_layers capability (model.py:553-597) as gradient
    masking.
    """

    def train_step(state: TrainState, spect, frame_lengths, labels, label_lengths):
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params, config, spect, frame_lengths, labels, label_lengths
        )
        if frozen_mask is not None:
            grads = jax.tree_util.tree_map(
                lambda g, m: jnp.zeros_like(g) if m else g, grads, frozen_mask
            )
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    return train_step


def _resolve_mixed_precision(mixed_precision) -> bool:
    """"auto" -> bf16 matmuls on TPU backends, f32 elsewhere (this XLA CPU
    build cannot execute bf16 dots; same platform rule as the engine's
    compute_dtype, engine.py)."""
    if mixed_precision == "auto":
        return jax.devices()[0].platform in ("tpu", "axon")
    return bool(mixed_precision)


def make_wave_train_step(
    config: DeepSpeechConfig,
    optimizer,
    frozen_mask=None,
    augment: dict | bool | None = None,
    mixed_precision: bool | str = "auto",
    remat: bool = True,
):
    """Train step from PADDED WAVEFORMS — the data-pipeline entry point.

    One jitted program: device STFT (ops/stft.py batched matmul-DFT) ->
    optional SpecAugment (train/augment.py) -> forward -> row-weighted CTC
    mean -> optimizer update. Row weights (train/data.py Batch.row_weights)
    zero out the padding rows a partial trailing batch carries, so every
    batch shape is full and shardable over the 'data' axis.

    ``augment``: None/False disables; True uses SpecAugment defaults; a
    dict passes through as spec_augment kwargs. The PRNG key argument is
    consumed only when augmentation is on (trace-time branch).

    ``mixed_precision``: run the fwd/bwd matmuls in bfloat16 (params stay
    float32 masters for the optimizer; the cast is inside the autodiff so
    gradients cast back). "auto" = on for TPU backends. ``remat``:
    checkpoint each RNN layer so the backward recomputes activations
    instead of storing (T, D, B, 3H) gate tensors — together these took
    the flagship train step from 14 % to the committed figure of the v5e
    roofline (benchmarks/train_throughput.json).
    """
    from ..features.spectrogram import AudioParser
    from ..ops import stft as stft_ops
    from .augment import spec_augment
    from .ctc import ctc_loss

    parser = AudioParser(config.audio_conf)
    aug_kwargs = augment if isinstance(augment, dict) else {}
    use_bf16 = _resolve_mixed_precision(mixed_precision)

    def train_step(
        state: TrainState,
        waves,
        wave_lengths,
        labels,
        label_lengths,
        row_weights,
        rng=None,
    ):
        def loss_of(params):
            spect, frame_lens = stft_ops.batched_log_spectrogram(
                waves.astype(jnp.float32),
                wave_lengths,
                parser.n_fft,
                parser.hop_length,
                parser.window,
            )
            if augment:
                spect = spec_augment(rng, spect, frame_lens, **aug_kwargs)
            if use_bf16:
                cast = ds.cast_matmul_weights(params)
                # conv weights stay f32: lax.conv's VJP pairs the f32
                # cotangent (preferred_element_type output) with the
                # kernel and requires matching dtypes; the conv stack is
                # <20 % of fwd FLOPs, the GRU matmuls are the win
                cast["conv"] = params["conv"]
                params = cast
            logits, out_lens = ds.forward(
                params, config, spect[:, None, :, :], frame_lens,
                softmax=False, rnn_impl=_train_rnn_impl(config),
                rnn_remat=remat,
            )
            nll = ctc_loss(
                logits, out_lens, labels, label_lengths,
                blank_id=config.blank_index,
            )
            per = nll / jnp.maximum(label_lengths, 1)
            w = row_weights.astype(per.dtype)
            return jnp.sum(per * w) / jnp.maximum(jnp.sum(w), 1e-6)

        loss, grads = jax.value_and_grad(loss_of)(state.params)
        if frozen_mask is not None:
            grads = jax.tree_util.tree_map(
                lambda g, m: jnp.zeros_like(g) if m else g, grads, frozen_mask
            )
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    return train_step


def freeze_mask(params, number_to_freeze: int, config: DeepSpeechConfig):
    """Bool pytree freezing the first N layers (conv first, then RNN layers),
    mirroring reference freeze_layers semantics (model.py:553-597)."""
    from ..errors import FreezingMoreLayersThanExist

    if number_to_freeze > config.conv_layers + config.rnn_layers:
        raise FreezingMoreLayersThanExist(
            "You are trying to freeze more layers than exist in the model"
        )
    counter = 0
    mask = jax.tree_util.tree_map(lambda _: False, params)
    for i in range(len(params["conv"])):
        frozen = counter < number_to_freeze
        mask["conv"][i] = jax.tree_util.tree_map(lambda _: frozen, params["conv"][i])
        counter += 1
    for k in range(len(params["rnns"])):
        frozen = counter < number_to_freeze
        mask["rnns"][k] = jax.tree_util.tree_map(lambda _: frozen, params["rnns"][k])
        counter += 1
    return mask
