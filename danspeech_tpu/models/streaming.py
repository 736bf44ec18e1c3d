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


# ---------------------------------------------------------------------------
# Masked (fixed-shape) streaming: bucketed chunk lengths, bounded compiles
# ---------------------------------------------------------------------------


class StreamStateM(NamedTuple):
    """Fixed-shape streaming state for the masked chunk step.

    Unlike :class:`StreamState` (whose array shapes follow each chunk's
    exact frame count, recompiling per novel length), every array here has
    a static shape: caches are always 10 columns, the lookahead buffer is a
    fixed-capacity ring with a valid-length scalar. The engine pads chunks
    to CHUNK_BUCKET multiples and passes the true frame count as a traced
    scalar — compilations are bounded by the bucket count, not the chunk
    length distribution.
    """

    left_1: jnp.ndarray  # (1, 1, F, 10) conv1 input cache
    left_2: jnp.ndarray  # (1, C1, F1, 10) conv2 input cache
    hiddens: tuple  # per-RNN-layer (B, H) hidden states
    la_buffer: jnp.ndarray  # (cap, B, H) lookahead frame buffer
    buf_len: jnp.ndarray  # () int32 valid frames in la_buffer


# headroom the engine must leave between a chunk's valid frames and its
# padded width: 5 cols of is_last edge padding at each conv + slack so
# every conv output's valid region fits the physical array
CHUNK_HEADROOM = 12


def conv1_out_frames(t: int) -> int:
    """Physical conv1 output columns for a t-column input (stride 2)."""
    return (t + 2 * CONV_SPECS[0]["padding"][1] - CONV_SPECS[0]["kernel"][1]) // 2 + 1


def phys_rnn_frames(tp_spect: int, is_first: bool) -> int:
    """Physical RNN frame count of a masked chunk step for a padded
    spectrogram width ``tp_spect`` (conv2 preserves length; the caches/edge
    pads add static columns)."""
    t1_in = tp_spect + (5 if is_first else 10 + 5)
    t1 = conv1_out_frames(t1_in)
    t2_in = t1 + (5 if is_first else 10 + 5)
    return t2_in


def init_stream_state_masked(
    config: DeepSpeechConfig, buf_cap: int, batch: int = 1, dtype=jnp.float32
) -> StreamStateM:
    # the lookahead buffer must hold at least context-1 frames — a tiny
    # first chunk would otherwise size it below that and the drain slice
    # jnp.zeros((cap - (context-1), ...)) traces with a negative dim
    if not config.bidirectional:
        buf_cap = max(buf_cap, config.context - 1)
    f1 = (config.n_freq + 2 * CONV_SPECS[0]["padding"][0] - CONV_SPECS[0]["kernel"][0]) // 2 + 1
    return StreamStateM(
        left_1=jnp.zeros((batch, 1, config.n_freq, 10), dtype),
        left_2=jnp.zeros((batch, 32, f1, 10), dtype),
        hiddens=tuple(
            jnp.zeros((batch, config.rnn_hidden_size), jnp.float32)
            for _ in range(config.rnn_layers)
        ),
        la_buffer=jnp.zeros((buf_cap, batch, config.rnn_hidden_size), jnp.float32),
        buf_len=jnp.zeros((), jnp.int32),
    )


def _mask_cols(x: jnp.ndarray, valid) -> jnp.ndarray:
    """Zero the time columns at index >= valid (last axis)."""
    t = x.shape[-1]
    return jnp.where(jnp.arange(t) < valid, x, jnp.zeros((), x.dtype))


def _assemble_masked(x, valid, cache, is_first, is_last):
    """Masked twin of the reference MaskConvStream edge-pad + cache logic
    (model.py:177-197): x is (B, C, F, Tp) with zeros at columns >= valid.

    Returns (assembled x, new valid count, new 10-col cache). The is_last
    right-pad needs no data movement — the zeros are already in place, the
    valid count just grows (the physical array gets 5 extra zero columns so
    the region always fits).
    """
    if is_first:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (5, 0)))
        valid = valid + 5
    elif is_last:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 5)))
        valid = valid + 5
    if not is_first:
        x = jnp.concatenate([cache, x], axis=3)
        valid = valid + 10
    if is_last:
        new_cache = cache
    else:
        new_cache = jax.lax.dynamic_slice_in_dim(x, valid - 10, 10, axis=3)
    return x, valid, new_cache


def _stream_conv_masked(params, x, valid, state, is_first, is_last):
    spec1, spec2 = CONV_SPECS[0], CONV_SPECS[1]

    x, valid, new_left_1 = _assemble_masked(
        x, valid, state.left_1, is_first, is_last
    )
    p1 = params["conv"][0]
    w, b = conv_ops.fold_bn_into_conv(p1)
    x = conv_ops.hardtanh(conv_ops.conv2d(x, w, b, spec1["stride"], spec1["padding"]))
    valid = (valid - 1) // 2 + 1  # stride-2 time downsample
    # columns past valid saw only zeros but BN+hardtanh made them nonzero —
    # zero them like the batch MaskConv so conv2's window sees the same
    # values as the exact-shape path's zero padding
    x = _mask_cols(x, valid)

    x, valid, new_left_2 = _assemble_masked(
        x, valid, state.left_2, is_first, is_last
    )
    p2 = params["conv"][1]
    w, b = conv_ops.fold_bn_into_conv(p2)
    x = conv_ops.hardtanh(conv_ops.conv2d(x, w, b, spec2["stride"], spec2["padding"]))
    # conv2 preserves the time length (kernel 11, pad 5, stride 1)
    x = _mask_cols(x, valid)
    return x, valid, new_left_1, new_left_2


def _stream_lookahead_masked(params, x, valid, state, is_first, is_last):
    """Masked LookaheadStream: fixed-capacity frame buffer + length scalar.

    x is (Tp, B, H) with rows >= valid zeroed. Returns
    (out (T_out_phys, B, H) or None, out_len, new_buffer, new_buf_len).
    """
    la = params["lookahead"]
    context = la.weight.shape[1]
    cap, (tp, batch, hidden) = state.la_buffer.shape[0], x.shape

    if is_first:
        # reference buffers the whole first chunk (model.py:255-259)
        if tp >= cap:
            new_buffer = x[:cap]
        else:
            new_buffer = jnp.concatenate(
                [x, jnp.zeros((cap - tp, batch, hidden), x.dtype)], axis=0
            )
        return None, jnp.zeros((), jnp.int32), new_buffer, valid

    buf_len = state.buf_len
    pad_tail = context - 1 if is_last else 0
    combined = jnp.zeros((cap + tp + pad_tail, batch, hidden), x.dtype)
    combined = combined.at[:cap].set(state.la_buffer)
    combined = jax.lax.dynamic_update_slice(combined, x, (buf_len, 0, 0))
    total_valid = buf_len + valid

    t_out = combined.shape[0] - context + 1
    stacked = jnp.stack([combined[k : k + t_out] for k in range(context)])
    out = jnp.einsum(
        "ctbh,hc->tbh", stacked, la.weight, preferred_element_type=jnp.float32
    )
    out = conv_ops.hardtanh(out)
    out_len = total_valid if is_last else jnp.maximum(
        total_valid - (context - 1), 0
    )

    # next buffer: last context-1 valid frames of x (fewer when the chunk
    # is shorter, like the reference's shrinking buffer)
    start = jnp.maximum(valid - (context - 1), 0)
    frames = jax.lax.dynamic_slice(x, (start, 0, 0), (context - 1, batch, hidden))
    new_buf_len = jnp.minimum(valid, context - 1)
    frames = jnp.where(
        jnp.arange(context - 1)[:, None, None] < new_buf_len, frames, 0.0
    )
    new_buffer = jnp.concatenate(
        [frames, jnp.zeros((cap - (context - 1), batch, hidden), x.dtype)], axis=0
    )
    return out, out_len, new_buffer, new_buf_len


def streaming_step_masked(
    params: Params,
    config: DeepSpeechConfig,
    x: jnp.ndarray,
    t_valid,
    state: StreamStateM,
    is_first: bool,
    is_last: bool,
):
    """Fixed-shape twin of :func:`streaming_step`.

    x is (1, 1, F, Tp) zero-padded to a bucketed width Tp with ``t_valid``
    real columns (Tp - t_valid >= CHUNK_HEADROOM). Returns
    (probs (1, T_out_phys, C) or None, out_len, state') — the caller slices
    probs[:, :out_len]. Numerically identical to the exact-shape path
    (pinned in tests/test_streaming_masked.py) while compiling once per
    (bucket, flags) instead of once per chunk length.
    """
    if config.conv_layers != 2:
        raise ConvError(
            "Streaming inference supports 2-conv models only (reference "
            "streaming_init hard-codes the 2-conv RNN input size)"
        )
    valid = jnp.asarray(t_valid, jnp.int32)

    x, valid, left_1, left_2 = _stream_conv_masked(
        params, x, valid, state, is_first, is_last
    )

    n, c, f, t = x.shape
    x = x.reshape(n, c * f, t)
    x = jnp.transpose(x, (2, 0, 1))  # (T, B, H)

    new_hiddens = []
    for entry, h0 in zip(params["rnns"], state.hiddens):
        if entry["bn"] is not None:
            scale, shift = entry["bn"].scale_shift()
            x = x * scale + shift
        x, h_last = rnn_ops.gru_layer_streaming(x, entry["fwd"], h0, t_valid=valid)
        new_hiddens.append(h_last)

    out, out_len, la_buffer, buf_len = _stream_lookahead_masked(
        params, x, valid, state, is_first, is_last
    )

    if is_last:
        new_state = init_stream_state_masked(
            config, buf_cap=state.la_buffer.shape[0], batch=n
        )
    else:
        new_state = StreamStateM(
            left_1=left_1,
            left_2=left_2,
            hiddens=tuple(new_hiddens),
            la_buffer=la_buffer,
            buf_len=buf_len,
        )

    if out is None:
        return None, out_len, new_state

    probs = head(params, out)
    probs = jnp.transpose(probs, (1, 0, 2))
    probs = jax.nn.softmax(probs, axis=-1)
    return probs, out_len, new_state
