"""Streaming (chunked, stateful) forward pass.

Replicates the reference streaming twin exactly — MaskConvStream
(model.py:156-201), BatchRNNStream (:204-237), LookaheadStream (:240-284) —
as a pure function threading a device-resident state pytree through jitted
chunk steps, instead of Python-object mutation. Semantics preserved
faithfully, including the reference's quirks:

- each chunk's convs still apply their own (20, 5) zero padding in time on
  top of the manual first/last 5-pad and the 10-column left-context caches,
- the first chunk produces no output (the lookahead layer buffers it),
- only 2-conv streaming models are supported (the reference's
  streaming_init hard-codes the 2-conv RNN input size, model.py:477-484).

The state lives in HBM between chunk steps; nothing round-trips to host.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..errors import ConvError
from ..ops import conv as conv_ops
from ..ops import rnn as rnn_ops
from .config import CONV_SPECS, DeepSpeechConfig
from .deepspeech import Params, head


class StreamState(NamedTuple):
    """Carried streaming state (all device arrays; None before first use)."""

    left_1: jnp.ndarray | None  # last 10 time-cols of conv1's input
    left_2: jnp.ndarray | None  # last 10 time-cols of conv2's input
    hiddens: tuple  # per-RNN-layer (B, H) hidden states
    la_buffer: jnp.ndarray | None  # lookahead frame buffer (T_buf, B, H)


def init_stream_state(config: DeepSpeechConfig, batch: int = 1, dtype=jnp.float32) -> StreamState:
    return StreamState(
        left_1=None,
        left_2=None,
        hiddens=tuple(
            jnp.zeros((batch, config.rnn_hidden_size), dtype)
            for _ in range(config.rnn_layers)
        ),
        la_buffer=None,
    )


def _stream_conv(params: Params, x: jnp.ndarray, state: StreamState, is_first: bool, is_last: bool):
    """The two conv blocks with manual edge padding + left-context caches."""
    spec1, spec2 = CONV_SPECS[0], CONV_SPECS[1]
    new_left_1 = state.left_1
    new_left_2 = state.left_2

    def assemble(x, left_cache):
        """Reference order (model.py:177-197): edge pad (left *elif* right —
        a first-and-last chunk only pads left), then prepend the 10-col
        cache, then snapshot the new cache."""
        if is_first:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (5, 0)))
        elif is_last:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 5)))
        if not is_first:
            x = jnp.concatenate([left_cache, x], axis=3)
        new_cache = None if is_last else x[:, :, :, -10:]
        return x, new_cache

    x, new_left_1 = assemble(x, state.left_1)
    if is_last:
        new_left_1 = state.left_1
    p1 = params["conv"][0]
    w, b = conv_ops.fold_bn_into_conv(p1)
    x = conv_ops.hardtanh(conv_ops.conv2d(x, w, b, spec1["stride"], spec1["padding"]))

    x, new_left_2 = assemble(x, state.left_2)
    if is_last:
        new_left_2 = state.left_2
    p2 = params["conv"][1]
    w, b = conv_ops.fold_bn_into_conv(p2)
    x = conv_ops.hardtanh(conv_ops.conv2d(x, w, b, spec2["stride"], spec2["padding"]))

    return x, new_left_1, new_left_2


def _stream_lookahead(params: Params, x: jnp.ndarray, state: StreamState, is_first: bool, is_last: bool):
    """LookaheadStream: buffer one chunk of frames, emit delayed output."""
    la = params["lookahead"]
    context = la.weight.shape[1]

    if is_first or state.la_buffer is None:
        # First chunk only fills the buffer; dummy output (model.py:255-259).
        return None, x

    out_in = jnp.concatenate([state.la_buffer, x], axis=0)
    new_buffer = x[-(context - 1) :, :, :]

    if is_last:
        out_in = jnp.pad(out_in, ((0, context - 1), (0, 0), (0, 0)))
    # depthwise conv over time, no padding: out_len = L - context + 1
    t_out = out_in.shape[0] - context + 1
    stacked = jnp.stack([out_in[k : k + t_out] for k in range(context)])
    out = jnp.einsum("ctbh,hc->tbh", stacked, la.weight, preferred_element_type=jnp.float32)
    out = conv_ops.hardtanh(out)
    return out, new_buffer


def streaming_step(
    params: Params,
    config: DeepSpeechConfig,
    x: jnp.ndarray,
    state: StreamState,
    is_first: bool,
    is_last: bool,
):
    """One chunk through conv -> RNN stack -> lookahead -> head.

    x is (1, 1, F, T_chunk). Returns (probs (1, T_out, C) or None, state').
    ``is_first``/``is_last`` are static — the engine compiles one variant per
    flag combination (reference streaming_forward, model.py:517-537).
    """
    if config.conv_layers != 2:
        raise ConvError(
            "Streaming inference supports 2-conv models only (reference "
            "streaming_init hard-codes the 2-conv RNN input size)"
        )

    x, left_1, left_2 = _stream_conv(params, x, state, is_first, is_last)

    n, c, f, t = x.shape
    x = x.reshape(n, c * f, t)
    x = jnp.transpose(x, (2, 0, 1))  # (T, B, H)

    new_hiddens = []
    for entry, h0 in zip(params["rnns"], state.hiddens):
        if entry["bn"] is not None:
            scale, shift = entry["bn"].scale_shift()
            x = x * scale + shift
        x, h_last = rnn_ops.gru_layer_streaming(x, entry["fwd"], h0)
        new_hiddens.append(h_last)

    out, la_buffer = _stream_lookahead(params, x, state, is_first, is_last)

    if is_last:
        # stream epoch over: reset recurrent + conv + lookahead state
        new_state = init_stream_state(config, batch=n, dtype=x.dtype)
    else:
        new_state = StreamState(
            left_1=left_1,
            left_2=left_2,
            hiddens=tuple(new_hiddens),
            la_buffer=la_buffer,
        )

    if out is None:
        return None, new_state

    probs = head(params, out)
    probs = jnp.transpose(probs, (1, 0, 2))
    probs = jax.nn.softmax(probs, axis=-1)
    return probs, new_state
