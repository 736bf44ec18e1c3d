"""Sequence/context parallelism: time-sharding one long utterance over chips.

The reference handles long audio by VAD-segmenting it into utterances
(Recognizer.py:439-497, video_transcribe_simulation.py:100-143) and by
stateful chunking in time on one device (model.py:156-284). This module is
the SPMD generalization promised in SURVEY §2.5 (SP/CP row): the time axis
of a single very long utterance is sharded over a 1-D ring of chips, and

- the **conv stack** runs fully parallel with per-layer halo exchange of the
  kernel's time context between ring neighbours (``ppermute``) — the SPMD
  form of the reference's MaskConvStream left-context cache
  (model.py:169-201);
- the **uni-directional GRU stack** (streaming models) runs as a
  *wavefront pipeline* over the (layer, time-shard) diagonal: at global step
  ``s`` chip ``c`` runs layer ``s - c`` on its own chunk and hands the final
  hidden state to chip ``c+1`` over ICI — ``L + n - 1`` chunk-steps instead
  of ``L * n``, i.e. pipeline-parallelism and sequence-parallelism in one
  schedule (speedup ``L*n/(L+n-1)``, ~3.3x for 5 layers on 8 chips);
- the **bidirectional GRU stack** cannot pipeline across layers (the
  per-layer sum-merge of two opposite-direction scans is a barrier), so each
  layer runs as a two-direction ring: the input projection ``x @ w_ih`` for
  both directions is computed once per chip (n-way parallel — half the
  layer's FLOPs), then the inherently sequential recurrence walks the ring
  in both directions at once. Wall-clock of the recurrence stays the
  sequential lower bound, but activation memory per chip is ``T/n`` — this
  is the *memory*-scaling path for utterances too long for one chip's HBM.

The hidden-state handoff is the ``ppermute`` ring hand-off of (conv overlap,
h0) described in SURVEY §5 "Long-context". Boundary chips receive zeros from
the non-wrapping permutation, which exactly reproduces the global zero
padding of the convs and the zero initial RNN state.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.config import CONV_SPECS, DeepSpeechConfig
from ..ops import conv as conv_ops
from ..ops import stft as stft_ops
from ..models import deepspeech as ds
from .mesh import DATA_AXIS


def _shard_map(fn, mesh, in_specs, out_specs):
    try:
        from jax import shard_map

        return shard_map(
            fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_vma=False
        )
    except (ImportError, TypeError):  # older jax
        from jax.experimental.shard_map import shard_map

        return shard_map(
            fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_rep=False
        )


# ---------------------------------------------------------------------------
# Halo exchange
# ---------------------------------------------------------------------------


def halo_exchange(x: jnp.ndarray, halo: int, axis_name: str, n: int) -> jnp.ndarray:
    """Concatenate ring-neighbour context onto the (last) time axis.

    Receives the previous chip's last ``halo`` columns and the next chip's
    first ``halo`` columns. The first/last chips receive zeros (a
    non-wrapping ppermute delivers zeros to un-targeted devices), matching
    the global zero padding of the conv stack.
    """
    if halo > x.shape[-1]:
        raise ValueError(
            f"conv halo {halo} exceeds local chunk {x.shape[-1]}; use fewer "
            "time shards for this utterance length"
        )
    left = jax.lax.ppermute(
        x[..., -halo:], axis_name, [(i, i + 1) for i in range(n - 1)]
    )
    right = jax.lax.ppermute(
        x[..., :halo], axis_name, [(i + 1, i) for i in range(n - 1)]
    )
    return jnp.concatenate([left, x, right], axis=-1)


# ---------------------------------------------------------------------------
# Conv stack (halo-parallel)
# ---------------------------------------------------------------------------


def _conv_block_halo(x, p, spec, lengths, t_offset, axis_name, n):
    """One masked conv block over a time shard.

    Exchanges a time halo of ``pad_t`` columns, then convolves VALID in time
    (the halo plays the role of the global padding / neighbour context) and
    SAME-style in frequency. Output time length is ``T_local // stride_t``.
    """
    pf, pt = spec["padding"]
    sf, st = spec["stride"]
    x = halo_exchange(x, pt, axis_name, n)
    w, b = conv_ops.fold_bn_into_conv(p)
    out = jax.lax.conv_general_dilated(
        x.astype(w.dtype),
        w,
        window_strides=(sf, st),
        padding=[(pf, pf), (0, 0)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.float32,
    )
    out = out + b[None, :, None, None].astype(jnp.float32)
    out = conv_ops.hardtanh(out)
    # global time mask at this block's output resolution
    t_local = out.shape[-1]
    t_global = t_offset + jnp.arange(t_local)
    mask = (t_global[None, :] < lengths[:, None]).astype(out.dtype)
    return out * mask[:, None, None, :]


def conv_stack_time_sharded(params, config, x_local, out_lengths, axis_name, n):
    """Masked conv stack on a local (B, 1, F, T/n) shard -> (B, C, F', T'/n).

    ``out_lengths`` are the *global* post-stack frame counts
    (ds.get_seq_lens); masking uses each chip's global frame offset.
    Requires the local time length to be even (stride-2 conv1 alignment).
    """
    c_idx = jax.lax.axis_index(axis_name)
    t_out_local = x_local.shape[-1] // 2  # conv1 halves T; conv2/3 preserve it
    t_offset = c_idx * t_out_local
    for p, spec in zip(params["conv"], CONV_SPECS[: config.conv_layers]):
        x_local = _conv_block_halo(
            x_local, p, spec, out_lengths, t_offset, axis_name, n
        )
    return x_local


# ---------------------------------------------------------------------------
# GRU recurrence over the ring
# ---------------------------------------------------------------------------


def _gru_scan_masked(gx, mask, w_hh, b_hh, h0):
    """lax.scan GRU recurrence over (T, ..., 3H) precomputed inputs.

    ``mask`` is (T, ...) broadcastable over the batch dims; h freezes and
    outputs are zeroed past each row's global length (torch packed-sequence
    semantics, ops/rnn.py).
    """
    mm_dtype = w_hh.dtype

    def step(h, inputs):
        gx_t, m_t = inputs
        gh = (
            jnp.matmul(h.astype(mm_dtype), w_hh, preferred_element_type=jnp.float32)
            + b_hh.astype(jnp.float32)
        )
        gx_r, gx_z, gx_n = jnp.split(gx_t, 3, axis=-1)
        gh_r, gh_z, gh_n = jnp.split(gh, 3, axis=-1)
        r = jax.nn.sigmoid(gx_r + gh_r)
        z = jax.nn.sigmoid(gx_z + gh_z)
        nn_ = jnp.tanh(gx_n + r * gh_n)
        h_new = (1.0 - z) * nn_ + z * h
        m = m_t[..., None]
        h_next = m * h_new + (1.0 - m) * h
        return h_next, h_new * m

    return jax.lax.scan(step, h0, (gx, mask))


def _stack_uni_layers(params, config, h_max):
    """Stack the uni-directional GRU layers into uniform (L, ...) pytrees.

    Layer 0 has a different input width (rnn_input_size) and no input BN;
    its w_ih is zero-padded to ``h_max`` rows and its BN is the identity so
    one ``dynamic_index_in_dim`` per wavefront step selects any layer.
    """
    hidden = config.rnn_hidden_size
    w_ih, w_hh, b_ih, b_hh, scales, shifts = [], [], [], [], [], []
    for layer, entry in enumerate(params["rnns"]):
        w = entry["fwd"]
        wi = w.w_ih
        if wi.shape[0] < h_max:
            wi = jnp.pad(wi, ((0, h_max - wi.shape[0]), (0, 0)))
        w_ih.append(wi)
        w_hh.append(w.w_hh)
        b_ih.append(w.b_ih)
        b_hh.append(w.b_hh)
        if entry["bn"] is not None:
            sc, sh = entry["bn"].scale_shift()
        else:
            sc = jnp.ones((wi.shape[0] if layer == 0 else hidden,), jnp.float32)
            sh = jnp.zeros_like(sc)
        if sc.shape[0] < h_max:
            sc = jnp.pad(sc, (0, h_max - sc.shape[0]))
            sh = jnp.pad(sh, (0, h_max - sh.shape[0]))
        scales.append(sc)
        shifts.append(sh)
    return (
        jnp.stack(w_ih),
        jnp.stack(w_hh),
        jnp.stack(b_ih),
        jnp.stack(b_hh),
        jnp.stack(scales),
        jnp.stack(shifts),
    )


def gru_stack_wavefront(params, config, x_local, mask_local, axis_name, n):
    """Uni-directional stacked GRU as a (layer x time-shard) wavefront.

    x_local is this chip's chunk (T_local, B, rnn_input_size); mask_local is
    (T_local, B) global-length validity. At step ``s`` chip ``c`` runs layer
    ``s - c`` and ppermutes its final hidden state to chip ``c+1`` —
    ``L + n - 1`` steps total; chip 0's incoming state is always zeros (ring
    boundary = sequence start).
    """
    hidden = config.rnn_hidden_size
    n_layers = config.rnn_layers
    h_max = max(config.rnn_input_size, hidden)
    w_ih, w_hh, b_ih, b_hh, scales, shifts = _stack_uni_layers(params, config, h_max)
    mm_dtype = w_ih.dtype

    t_local, batch, in_size = x_local.shape
    x_buf = jnp.pad(x_local.astype(jnp.float32), ((0, 0), (0, 0), (0, h_max - in_size)))
    c_idx = jax.lax.axis_index(axis_name)
    fwd_perm = [(i, i + 1) for i in range(n - 1)]

    def step(s, carry):
        x_buf, h_in = carry
        layer = s - c_idx
        active = (layer >= 0) & (layer < n_layers)
        li = jnp.clip(layer, 0, n_layers - 1)
        wi = jax.lax.dynamic_index_in_dim(w_ih, li, keepdims=False)
        wh = jax.lax.dynamic_index_in_dim(w_hh, li, keepdims=False)
        bi = jax.lax.dynamic_index_in_dim(b_ih, li, keepdims=False)
        bh = jax.lax.dynamic_index_in_dim(b_hh, li, keepdims=False)
        sc = jax.lax.dynamic_index_in_dim(scales, li, keepdims=False)
        sh = jax.lax.dynamic_index_in_dim(shifts, li, keepdims=False)

        xb = x_buf * sc + sh
        gx = (
            jnp.matmul(xb.astype(mm_dtype), wi, preferred_element_type=jnp.float32)
            + bi.astype(jnp.float32)
        )
        h_last, out = _gru_scan_masked(gx, mask_local, wh, bh, h_in)
        out_padded = jnp.pad(out, ((0, 0), (0, 0), (0, h_max - hidden)))
        x_buf = jnp.where(active, out_padded, x_buf)
        # hand the final hidden state to the next chip; it consumes it at
        # step s+1 for the same layer. Chip 0 receives zeros — correct h0.
        h_in = jax.lax.ppermute(h_last, axis_name, fwd_perm)
        return x_buf, h_in

    h0 = jnp.zeros((batch, hidden), jnp.float32)
    x_buf, _ = jax.lax.fori_loop(0, n_layers + n - 1, step, (x_buf, h0))
    return x_buf[..., :hidden]


def gru_stack_ring_bidi(params, config, x_local, mask_local, axis_name, n):
    """Bidirectional stacked GRU over a two-direction ring, layer by layer.

    Per layer: both directions' input projections run once per chip (n-way
    parallel), then the sequential recurrence walks the ring forward and
    backward simultaneously — chip ``k`` is fwd-active at ring step ``k``
    and bwd-active at step ``n-1-k``; hidden states hop neighbours via
    ppermute. The per-layer sum-merge (model.py:120-121) is a barrier, so
    layers do not pipeline; the win is n-x activation memory and n-x on all
    non-recurrent FLOPs.
    """
    hidden = config.rnn_hidden_size
    c_idx = jax.lax.axis_index(axis_name)
    fwd_perm = [(i, i + 1) for i in range(n - 1)]
    bwd_perm = [(i + 1, i) for i in range(n - 1)]
    t_local, batch, _ = x_local.shape

    x = x_local.astype(jnp.float32)
    mask_rev = mask_local[::-1]

    for entry in params["rnns"]:
        if entry["bn"] is not None:
            sc, sh = entry["bn"].scale_shift()
            x = x * sc + sh
        fw, bw = entry["fwd"], entry["bwd"]
        mm_dtype = fw.w_ih.dtype
        # n-way-parallel input projections; bwd consumes reversed local time
        # (ring step order supplies the reversed chip order).
        gx_f = (
            jnp.matmul(x.astype(mm_dtype), fw.w_ih, preferred_element_type=jnp.float32)
            + fw.b_ih.astype(jnp.float32)
        )
        gx_b = (
            jnp.matmul(
                x[::-1].astype(mm_dtype), bw.w_ih, preferred_element_type=jnp.float32
            )
            + bw.b_ih.astype(jnp.float32)
        )
        gx = jnp.stack([gx_f, gx_b], axis=1)  # (T, D, B, 3H)
        m = jnp.stack([mask_local, mask_rev], axis=1)  # (T, D, B)
        w_hh = jnp.stack([fw.w_hh, bw.w_hh])  # (D, H, 3H)
        b_hh = jnp.stack([fw.b_hh, bw.b_hh])[:, None, :]  # (D, 1, 3H)

        def ring_step(k, carry):
            h, out_f, out_b = carry  # h: (D, B, H)
            h_last, out = _gru_scan_masked(gx, m, w_hh, b_hh, h)
            out_f = jnp.where(k == c_idx, out[:, 0], out_f)
            out_b = jnp.where(k == (n - 1 - c_idx), out[:, 1], out_b)
            h_next = jnp.stack(
                [
                    jax.lax.ppermute(h_last[0], axis_name, fwd_perm),
                    jax.lax.ppermute(h_last[1], axis_name, bwd_perm),
                ]
            )
            return h_next, out_f, out_b

        h0 = jnp.zeros((2, batch, hidden), jnp.float32)
        out0 = jnp.zeros((t_local, batch, hidden), jnp.float32)
        _, out_f, out_b = jax.lax.fori_loop(0, n, ring_step, (h0, out0, out0))
        x = out_f + out_b[::-1]  # restore bwd time order; sum merge
    return x


def lookahead_time_sharded(x_local, p, axis_name, n):
    """Lookahead conv over future context with a right-halo exchange.

    x_local is (T_local, B, H); the last chip's missing future frames are
    zeros (= the reference's right padding, model.py:143-148).
    """
    t_local = x_local.shape[0]
    context = p.weight.shape[1]
    # The future context may span several ring neighbours when chunks are
    # short: hop h delivers chip c+h's chunk (boundary chips receive zeros,
    # which the last chip's right padding requires anyway).
    bwd_perm = [(i + 1, i) for i in range(n - 1)]
    parts, src, needed = [x_local], x_local, context - 1
    while needed > 0:
        src = jax.lax.ppermute(src, axis_name, bwd_perm)
        take = min(t_local, needed)
        parts.append(src[:take])
        needed -= take
    x_ext = jnp.concatenate(parts, axis=0)
    stacked = jnp.stack([x_ext[k : k + t_local] for k in range(context)])
    return jnp.einsum(
        "ctbh,hc->tbh", stacked, p.weight, preferred_element_type=jnp.float32
    )


# ---------------------------------------------------------------------------
# End-to-end time-sharded forward
# ---------------------------------------------------------------------------


def _forward_local(params, x_local, input_lengths, *, config, axis_name, n):
    """shard_map body: local spectrogram shard -> local prob shard."""
    out_lengths = ds.get_seq_lens(config, input_lengths)
    x = conv_stack_time_sharded(params, config, x_local, out_lengths, axis_name, n)

    b, c, f, t = x.shape
    x = x.reshape(b, c * f, t)
    x = jnp.transpose(x, (2, 0, 1))  # (T_local, B, H)

    c_idx = jax.lax.axis_index(axis_name)
    t_global = c_idx * t + jnp.arange(t)
    mask = (t_global[:, None] < out_lengths[None, :]).astype(jnp.float32)

    if config.bidirectional:
        x = gru_stack_ring_bidi(params, config, x, mask, axis_name, n)
    else:
        x = gru_stack_wavefront(params, config, x, mask, axis_name, n)
        x = conv_ops.hardtanh(
            lookahead_time_sharded(x, params["lookahead"], axis_name, n)
        )

    x = ds.head(params, x)
    x = jnp.transpose(x, (1, 0, 2))  # (B, T_local, C)
    return jax.nn.softmax(x, axis=-1), out_lengths


_JIT_CACHE: dict = {}


def _get_forward(config: DeepSpeechConfig, mesh: Mesh, axis: str):
    key = (repr(sorted(config.to_dict().items(), key=repr)), mesh, axis)
    fn = _JIT_CACHE.get(key)
    if fn is None:
        n = mesh.shape[axis]
        fn = jax.jit(
            _shard_map(
                functools.partial(
                    _forward_local, config=config, axis_name=axis, n=n
                ),
                mesh,
                in_specs=(P(), P(None, None, None, axis), P()),
                out_specs=(P(None, axis, None), P()),
            )
        )
        _JIT_CACHE[key] = fn
    return fn


def time_sharded_forward(
    params,
    config: DeepSpeechConfig,
    spect: jnp.ndarray,
    input_lengths: jnp.ndarray,
    mesh: Mesh,
    axis: str = DATA_AXIS,
):
    """Run the acoustic model with the time axis sharded over ``mesh[axis]``.

    spect is (B, 1, F, T) with T divisible by 2 * mesh.shape[axis] (use
    :func:`pad_time_for_mesh`). Returns (probs (B, T', C) sharded over T',
    out_lengths replicated) — the same contract as ds.forward, so greedy
    decoding composes unchanged.
    """
    n = mesh.shape[axis]
    if spect.shape[-1] % (2 * n):
        raise ValueError(
            f"time length {spect.shape[-1]} must be divisible by 2*{n}"
        )
    return _get_forward(config, mesh, axis)(params, spect, input_lengths)


def pad_time_for_mesh(spect: np.ndarray, n: int) -> np.ndarray:
    """Zero-pad (B, 1, F, T) on T up to a multiple of 2n (conv1 stride x n
    shards). Padding is masked out by the global length downstream."""
    t = spect.shape[-1]
    t_pad = -(-t // (2 * n)) * (2 * n)
    if t_pad == t:
        return spect
    return np.pad(spect, ((0, 0), (0, 0), (0, 0), (0, t_pad - t)))


def transcribe_long_form(model, waveform: np.ndarray, mesh: Mesh, decoder=None):
    """Transcribe one long utterance with the time axis sharded over chips.

    Waveform -> (device) STFT log-spectrogram -> time-sharded forward ->
    greedy decode. This is the long-form path of SURVEY §2.5: a single
    utterance too long (or too slow) for one chip rides the whole ring.
    """
    from ..features.spectrogram import SpectrogramAudioParser
    from ..decode.greedy import GreedyDecoder

    n = mesh.shape[DATA_AXIS]
    parser = SpectrogramAudioParser(model.audio_conf)
    wav = jnp.asarray(waveform, jnp.float32)
    spect, frame_len = stft_ops.batched_log_spectrogram(
        wav[None, :],
        jnp.asarray([len(waveform)], jnp.int32),
        parser.n_fft,
        parser.hop_length,
        parser.window,
        normalize=parser.normalize,
    )
    spect = pad_time_for_mesh(np.asarray(spect)[:, None, :, :], n)
    probs, out_lens = time_sharded_forward(
        model.params, model.config, jnp.asarray(spect), frame_len, mesh
    )
    decoder = decoder or GreedyDecoder(model.labels)
    decoded, _ = decoder.decode(np.asarray(probs), np.asarray(out_lens))
    return decoded[0][0]
