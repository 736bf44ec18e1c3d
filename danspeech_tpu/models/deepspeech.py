"""DeepSpeech2 acoustic model as a parameter pytree + pure functions.

TPU-native re-design of danspeech/deepspeech/model.py: no module objects, no
mutable state — ``forward(params, config, spect, lengths)`` is a pure
function the caller jits/pjits. Batch semantics (masking, bidirectional sum
merge, softmax-in-eval) are pinned to the reference:

- conv stack: model.py:357-396 (+ MaskConv :50-81)
- RNN stack:  model.py:398-406 (BatchRNN :96-122, bidirectional *sum*)
- lookahead:  model.py:407-411, :125-153 (uni-directional models only)
- head:       model.py:413-421 (SequenceWise BN -> Linear, no bias) with
              softmax at inference (InferenceBatchSoftmax :84-93)
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import conv as conv_ops
from ..ops import rnn as rnn_ops
from ..ops.conv import (
    BatchNormParams,
    ConvParams,
    LinearParams,
    LookaheadParams,
)
from .config import CONV_SPECS, DeepSpeechConfig

Params = dict[str, Any]

_RNN_GATES = {"gru": 3, "lstm": 4, "rnn": 1}
_RNN_WEIGHTS_CLS = {
    "gru": rnn_ops.GRUWeights,
    "lstm": rnn_ops.LSTMWeights,
    "rnn": rnn_ops.RNNWeights,
}


# ---------------------------------------------------------------------------
# Initialization
# ---------------------------------------------------------------------------


def init_params(
    config: DeepSpeechConfig, seed: int = 0, dtype=jnp.float32
) -> Params:
    """Random parameters with torch-default initializers.

    Conv/Linear use kaiming-uniform-style bounds, RNNs uniform
    ±1/sqrt(hidden) — matching what the reference graphs start from so
    randomly-initialized parity tests are in-distribution.
    """
    rng = np.random.default_rng(seed)

    def uniform(shape, bound):
        return jnp.asarray(
            rng.uniform(-bound, bound, size=shape).astype(np.float32), dtype=dtype
        )

    convs = []
    for spec in CONV_SPECS[: config.conv_layers]:
        kf, kt = spec["kernel"]
        fan_in = spec["in"] * kf * kt
        bound = 1.0 / math.sqrt(fan_in)
        convs.append(
            ConvParams(
                weight=uniform((spec["out"], spec["in"], kf, kt), math.sqrt(6.0 / fan_in) / math.sqrt(2.0)),
                bias=uniform((spec["out"],), bound),
                bn_gamma=jnp.ones((spec["out"],), dtype),
                bn_beta=jnp.zeros((spec["out"],), dtype),
                bn_mean=jnp.zeros((spec["out"],), dtype),
                bn_var=jnp.ones((spec["out"],), dtype),
            )
        )

    gates = _RNN_GATES[config.rnn_type]
    wcls = _RNN_WEIGHTS_CLS[config.rnn_type]
    hidden = config.rnn_hidden_size
    bound = 1.0 / math.sqrt(hidden)

    def rnn_dir(input_size):
        return wcls(
            w_ih=uniform((input_size, gates * hidden), bound),
            w_hh=uniform((hidden, gates * hidden), bound),
            b_ih=uniform((gates * hidden,), bound),
            b_hh=uniform((gates * hidden,), bound),
        )

    rnns = []
    in_size = config.rnn_input_size
    for layer in range(config.rnn_layers):
        entry = {
            "bn": (
                BatchNormParams(
                    gamma=jnp.ones((in_size,), dtype),
                    beta=jnp.zeros((in_size,), dtype),
                    mean=jnp.zeros((in_size,), dtype),
                    var=jnp.ones((in_size,), dtype),
                )
                if layer > 0
                else None
            ),
            "fwd": rnn_dir(in_size),
            "bwd": rnn_dir(in_size) if config.bidirectional else None,
        }
        rnns.append(entry)
        in_size = hidden

    look = None
    if not config.bidirectional:
        look = LookaheadParams(
            weight=uniform((hidden, config.context), 1.0 / math.sqrt(config.context))
        )

    params: Params = {
        "conv": convs,
        "rnns": rnns,
        "lookahead": look,
        "fc_bn": BatchNormParams(
            gamma=jnp.ones((hidden,), dtype),
            beta=jnp.zeros((hidden,), dtype),
            mean=jnp.zeros((hidden,), dtype),
            var=jnp.ones((hidden,), dtype),
        ),
        "fc": LinearParams(
            weight=uniform((config.num_classes, hidden), 1.0 / math.sqrt(hidden)),
            bias=None,
        ),
    }
    return params


def num_params(params: Params) -> int:
    """Total parameter count (reference get_param_size, model.py:652-666)."""
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))


def cast_matmul_weights(params: Params, dtype=jnp.bfloat16) -> Params:
    """Cast the large matmul weights (RNN w_ih/w_hh, conv kernels, FC) to
    ``dtype`` for MXU-rate inference; biases and BatchNorm statistics stay
    float32 (the RNN scan accumulates in float32 regardless, ops/rnn.py).

    The flagship's recurrent weights are the HBM-bandwidth hot spot: 9
    layers x 2 directions x (1200, 3600) is 311 MB in f32 streamed every
    scan step unless resident in VMEM — bf16 halves both the traffic and
    the residency footprint.
    """

    def cast_rnn(w):
        if w is None:
            return None
        return type(w)(
            w_ih=w.w_ih.astype(dtype),
            w_hh=w.w_hh.astype(dtype),
            b_ih=w.b_ih,
            b_hh=w.b_hh,
        )

    out: Params = dict(params)
    out["conv"] = [
        c._replace(weight=c.weight.astype(dtype)) for c in params["conv"]
    ]
    out["rnns"] = [
        {
            "bn": e["bn"],
            "fwd": cast_rnn(e["fwd"]),
            "bwd": cast_rnn(e["bwd"]),
        }
        for e in params["rnns"]
    ]
    out["fc"] = params["fc"]._replace(weight=params["fc"].weight.astype(dtype))
    return out


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def get_seq_lens(config: DeepSpeechConfig, input_lengths: jnp.ndarray) -> jnp.ndarray:
    """Output frame counts after the conv stack (model.py:540-551)."""
    lengths = input_lengths
    for spec in CONV_SPECS[: config.conv_layers]:
        _, kt = spec["kernel"]
        _, st = spec["stride"]
        _, pt = spec["padding"]
        lengths = conv_ops.conv_out_length(lengths, kt, st, pt)
    return lengths


def conv_stack(
    params: Params,
    config: DeepSpeechConfig,
    x: jnp.ndarray,
    out_lengths: jnp.ndarray,
    folded: bool = True,
) -> jnp.ndarray:
    """Masked conv stack on (N, 1, F, T) -> (N, C, F', T')."""
    for p, spec in zip(params["conv"], CONV_SPECS[: config.conv_layers]):
        x = conv_ops.conv_block(
            x, p, out_lengths, spec["stride"], spec["padding"], folded=folded
        )
    return x


def _apply_rnn_layer(config, entry, x, lengths, impl: str = "auto"):
    if entry["bn"] is not None:
        scale, shift = entry["bn"].scale_shift()
        x = x * scale + shift
    if config.rnn_type == "gru":
        out, _ = rnn_ops.gru_layer(
            x, lengths, entry["fwd"], entry["bwd"], impl=impl
        )
        return out
    if config.rnn_type == "lstm":
        return rnn_ops.lstm_layer(
            x, lengths, entry["fwd"], entry["bwd"], impl=impl
        )
    return rnn_ops.rnn_tanh_layer(
        x, lengths, entry["fwd"], entry["bwd"], impl=impl
    )


def head(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    """BN -> Linear(num_classes, no bias) on (T, B, H) -> (T, B, C)."""
    scale, shift = params["fc_bn"].scale_shift()
    x = x * scale + shift
    w = params["fc"].weight
    return jnp.dot(
        x.astype(w.dtype), w.T, preferred_element_type=jnp.float32
    )


def forward(
    params: Params,
    config: DeepSpeechConfig,
    x: jnp.ndarray,
    input_lengths: jnp.ndarray,
    softmax: bool = True,
    rnn_impl: str = "auto",
    rnn_remat: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Full batch forward: (N, 1, F, T) spectrograms -> (N, T', C) probs.

    Mirrors DeepSpeech.forward (model.py:496-515); ``softmax=False`` returns
    logits for training (InferenceBatchSoftmax is identity in train mode).
    ``rnn_impl``: recurrence engine per ops/rnn.py:_resolve_impl. The GRU
    Mosaic kernels are differentiable (custom-VJP backward walk,
    ops/pallas_gru.py:gru_bwd_scan), so training uses "auto" for GRU;
    LSTM/vanilla Mosaic kernels have no VJP and train via "xla"
    (train/step.py:_train_rnn_impl). ``rnn_remat``: checkpoint each RNN
    layer so the
    backward pass recomputes its activations instead of storing the
    (T, D, B, 3H) gate tensors — the HBM lever that lets training batches
    fill the MXU's 128-row tile (train/step.py).
    """
    out_lengths = get_seq_lens(config, input_lengths)
    x = conv_stack(params, config, x, out_lengths)

    n, c, f, t = x.shape
    x = x.reshape(n, c * f, t)  # collapse feature dim (model.py:501-502)
    x = jnp.transpose(x, (2, 0, 1))  # TxNxH

    apply_layer = _apply_rnn_layer
    if rnn_remat:
        def apply_layer(config, entry, x, lengths, impl="auto"):
            return jax.checkpoint(
                lambda e, xx, ll: _apply_rnn_layer(config, e, xx, ll, impl)
            )(entry, x, lengths)

    for entry in params["rnns"]:
        x = apply_layer(config, entry, x, out_lengths, impl=rnn_impl)

    if not config.bidirectional:
        x = conv_ops.hardtanh(conv_ops.lookahead(x, params["lookahead"]))

    x = head(params, x)
    x = jnp.transpose(x, (1, 0, 2))  # NxTxC
    if softmax:
        x = jax.nn.softmax(x, axis=-1)
    return x, out_lengths
