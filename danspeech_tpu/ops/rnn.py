"""GRU / LSTM / vanilla-RNN recurrences as jit-friendly scans.

TPU-first replacement for the cuDNN RNN kernels the reference leans on
(model.py:96-122 BatchRNN, :204-237 BatchRNNStream). Design:

- The input projection for *all* timesteps is one large (T·B, I) x (I, 3H)
  matmul that runs on the MXU before the scan starts — the scan body only
  does the (B, H) x (H, 3H) recurrent matmul plus elementwise gates.
- Bidirectional layers stack both directions into a single scan with a
  leading direction axis (the backward direction consumes the
  length-aware-reversed sequence), so one scan drives 2x batch.
- Sequence-length masking reproduces torch pack_padded_sequence semantics:
  outputs past a row's length are zeros and its hidden state freezes at the
  last valid step.

Weight convention: ``w_ih`` is (I, G·H), ``w_hh`` is (H, G·H) — transposed
from torch's (G·H, I) so matmuls need no transposes at runtime. Gate order
matches torch: GRU (r, z, n), LSTM (i, f, g, o).
"""

from __future__ import annotations

import functools

from typing import NamedTuple

import jax
import jax.numpy as jnp


class GRUWeights(NamedTuple):
    """One direction of one GRU layer."""

    w_ih: jnp.ndarray  # (I, 3H)
    w_hh: jnp.ndarray  # (H, 3H)
    b_ih: jnp.ndarray  # (3H,)
    b_hh: jnp.ndarray  # (3H,)


def _gru_cell(h, gx, w_hh, b_hh):
    """One GRU step. ``gx`` = x @ w_ih + b_ih, precomputed.

    Torch GRU semantics (gate order r, z, n; note the recurrent bias b_hn
    sits *inside* the reset gate product).
    """
    hidden = h.shape[-1]
    gh = jnp.dot(h, w_hh, preferred_element_type=jnp.float32) + b_hh
    gx_r, gx_z, gx_n = jnp.split(gx, 3, axis=-1)
    gh_r, gh_z, gh_n = jnp.split(gh, 3, axis=-1)
    r = jax.nn.sigmoid(gx_r + gh_r)
    z = jax.nn.sigmoid(gx_z + gh_z)
    n = jnp.tanh(gx_n + r * gh_n)
    del hidden
    return (1.0 - z) * n + z * h


def _reverse_valid(x: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
    """Reverse each row's valid prefix in time: out[t] = x[len-1-t] for t<len.

    Positions t >= len are left as-is (they are masked downstream). x is
    (T, B, ...), lengths (B,).
    """
    t_max = x.shape[0]
    t_idx = jnp.arange(t_max)[:, None]  # (T, 1)
    rev = lengths[None, :] - 1 - t_idx  # (T, B)
    idx = jnp.where(rev >= 0, rev, t_idx)
    return jnp.take_along_axis(
        x, idx.reshape(t_max, -1, *([1] * (x.ndim - 2))).astype(jnp.int32), axis=0
    )


def gru_layer(
    x: jnp.ndarray,
    lengths: jnp.ndarray,
    fwd: GRUWeights,
    bwd: GRUWeights | None = None,
    h0: jnp.ndarray | None = None,
    sum_directions: bool = True,
    impl: str = "auto",
):
    """Run one (optionally bidirectional) GRU layer over (T, B, I).

    Returns (outputs, h_last):
      outputs — (T, B, H) with directions summed (reference BatchRNN
                model.py:120-121) or (T, B, 2H) concatenated if
                ``sum_directions=False``;
      h_last  — (D, B, H) final hidden state per direction, matching packed
                semantics (the last *valid* step of each row).

    ``impl`` selects the recurrence engine: "pallas" (Mosaic grid kernel,
    ops/pallas_gru.py), "xla" (lax.scan), or "auto" (pallas on TPU
    backends, xla elsewhere).
    """
    impl = _resolve_impl(impl)
    if impl == "pallas":
        return _gru_layer_pallas(x, lengths, fwd, bwd, h0, sum_directions)
    t_max, batch, _ = x.shape
    hidden = fwd.w_hh.shape[0]
    directions = [fwd] if bwd is None else [fwd, bwd]
    ndir = len(directions)

    # Stack direction inputs: forward sees x, backward sees valid-reversed x.
    if ndir == 2:
        x_stack = jnp.stack([x, _reverse_valid(x, lengths)], axis=1)  # (T, D, B, I)
    else:
        x_stack = x[:, None]

    w_ih = jnp.stack([d.w_ih for d in directions])  # (D, I, 3H)
    w_hh = jnp.stack([d.w_hh for d in directions])  # (D, H, 3H)
    b_ih = jnp.stack([d.b_ih for d in directions])  # (D, 3H)
    b_hh = jnp.stack([d.b_hh for d in directions])

    # Matmul operands follow the weights' dtype (bfloat16 weights -> bf16 MXU
    # inputs at 2x rate and half the HBM weight traffic); gates, biases and
    # the carried hidden state stay float32 via preferred_element_type.
    mm_dtype = fwd.w_ih.dtype

    # Big MXU matmul up front: all timesteps, all directions.
    gx = (
        jnp.einsum(
            "tdbi,dik->tdbk",
            x_stack.astype(mm_dtype),
            w_ih,
            preferred_element_type=jnp.float32,
        )
        + b_ih[None, :, None, :].astype(jnp.float32)
    )

    if h0 is None:
        h0 = jnp.zeros((ndir, batch, hidden), dtype=jnp.float32)
    else:
        h0 = h0.astype(jnp.float32)

    mask = (jnp.arange(t_max)[:, None] < lengths[None, :]).astype(jnp.float32)

    def step(h, inputs):
        gx_t, m_t = inputs  # (D, B, 3H), (B,)
        gh = (
            jnp.einsum(
                "dbh,dhk->dbk",
                h.astype(mm_dtype),
                w_hh,
                preferred_element_type=jnp.float32,
            )
            + b_hh[:, None, :].astype(jnp.float32)
        )
        gx_r, gx_z, gx_n = jnp.split(gx_t, 3, axis=-1)
        gh_r, gh_z, gh_n = jnp.split(gh, 3, axis=-1)
        r = jax.nn.sigmoid(gx_r + gh_r)
        z = jax.nn.sigmoid(gx_z + gh_z)
        n = jnp.tanh(gx_n + r * gh_n)
        h_new = (1.0 - z) * n + z * h
        m = m_t[None, :, None]
        h_next = m * h_new + (1.0 - m) * h  # freeze past row length
        return h_next, h_new * m  # padded outputs are zero

    h_last, out = jax.lax.scan(step, h0, (gx, mask))
    # out: (T, D, B, H)

    if ndir == 2:
        out_f = out[:, 0]
        out_b = _reverse_valid(out[:, 1], lengths)  # restore time order
        merged = out_f + out_b if sum_directions else jnp.concatenate([out_f, out_b], -1)
    else:
        merged = out[:, 0]
    return merged, h_last


def _gru_layer_pallas(
    x: jnp.ndarray,
    lengths: jnp.ndarray,
    fwd: GRUWeights,
    bwd: GRUWeights | None,
    h0: jnp.ndarray | None,
    sum_directions: bool,
):
    """Pallas-kernel GRU layer. Bidirectional layers run FULLY fused —
    input projection and both recurrence chains in one Mosaic grid
    (gru_scan_bidi_fused): the projection matmuls for time-block i+1 are
    independent MXU work overlapping the cell chain of block i, and the
    (T, B, 3H) gx tensors never reach HBM. Falls back to the split
    einsum + gru_scan_bidi when the four weight matrices exceed the VMEM
    budget. Matches the lax.scan path bit-for-bit in masking/merge
    semantics (tests/test_pallas_gru.py pin the two against each other).

    The common inference/training shapes (h0 zeros; bidirectional-sum or
    unidirectional) route through custom-VJP wrappers, so ``impl="pallas"``
    is DIFFERENTIABLE: the backward is the Mosaic walk in
    pallas_gru.gru_bwd_scan (gradient parity vs the lax.scan path pinned
    in tests/test_pallas_grad.py). Carried-h0 (streaming) and concat-merge
    calls keep the forward-only path."""
    from .pallas_gru import gru_scan, gru_scan_bidi, gru_scan_bidi_fused

    if h0 is None:
        if bwd is not None and sum_directions:
            return _pallas_gru_bidi_sum(x, lengths, fwd, bwd)
        if bwd is None:
            return _pallas_gru_uni(x, lengths, fwd)

    t_max, batch, d_in = x.shape
    hidden = fwd.w_hh.shape[0]
    mm_dtype = fwd.w_ih.dtype
    from .pallas_gru import backend_supports_mosaic

    interpret = not backend_supports_mosaic()

    if h0 is None:
        h0_f = h0_b = jnp.zeros((batch, hidden), jnp.float32)
    else:
        h0_f = h0[0].astype(jnp.float32)
        h0_b = h0[-1].astype(jnp.float32)

    if bwd is None:
        # bias-free projection straight to the stream dtype (b_ih is added
        # in-kernel): skips a full f32 write+read pass over (T, B, 3H) —
        # measured slower than the whole recurrence kernel when present
        gx = jnp.einsum("tbi,ik->tbk", x.astype(mm_dtype), fwd.w_ih)
        out_f, hl_f = gru_scan(
            gx, lengths, fwd.w_hh, fwd.b_hh, h0_f,
            reverse=False, interpret=interpret, b_ih=fwd.b_ih,
        )
        return out_f.astype(jnp.float32), hl_f[None]

    # VMEM-resident weights of the fused kernel: both directions' w_ih and
    # w_hh plus double-buffered x/gx blocks must fit the per-core budget
    wbytes = 2 * (d_in + hidden) * 3 * hidden * jnp.dtype(mm_dtype).itemsize
    if wbytes <= 72 * 1024 * 1024:
        out_f, out_b, hl_f, hl_b = gru_scan_bidi_fused(
            x.astype(mm_dtype), lengths,
            fwd.w_ih, bwd.w_ih, fwd.w_hh, bwd.w_hh,
            fwd.b_ih, bwd.b_ih, fwd.b_hh, bwd.b_hh,
            h0_f, h0_b, interpret=interpret,
        )
        out_f = out_f.astype(jnp.float32)
        out_b = out_b.astype(jnp.float32)
        merged = (
            out_f + out_b
            if sum_directions
            else jnp.concatenate([out_f, out_b], -1)
        )
        return merged, jnp.stack([hl_f, hl_b])

    # one MXU matmul feeds both chains: (T·B, I) x (I, 6H), bias-free (the
    # kernel adds b_ih), output in the stream dtype directly
    w_ih2 = jnp.concatenate([fwd.w_ih, bwd.w_ih], axis=1)
    gx2 = jnp.einsum("tbi,ik->tbk", x.astype(mm_dtype), w_ih2)
    g3 = 3 * hidden
    out_f, out_b, hl_f, hl_b = gru_scan_bidi(
        gx2[..., :g3], gx2[..., g3:], lengths,
        fwd.w_hh, bwd.w_hh, fwd.b_hh, bwd.b_hh, h0_f, h0_b,
        interpret=interpret, b_ih_f=fwd.b_ih, b_ih_b=bwd.b_ih,
    )
    out_f = out_f.astype(jnp.float32)
    out_b = out_b.astype(jnp.float32)
    merged = (
        out_f + out_b if sum_directions else jnp.concatenate([out_f, out_b], -1)
    )
    return merged, jnp.stack([hl_f, hl_b])


def _pallas_bidi_raw(x, lengths, fwd: GRUWeights, bwd: GRUWeights):
    """Pallas bidirectional forward returning per-direction streams (the
    fused path when the four weight matrices fit VMEM, else the split
    projection + gru_scan_bidi) — shared by the inference dispatch and the
    custom-VJP training path, which keeps out_f/out_b as residuals."""
    from .pallas_gru import (
        backend_supports_mosaic,
        gru_scan_bidi,
        gru_scan_bidi_fused,
    )

    t_max, batch, d_in = x.shape
    hidden = fwd.w_hh.shape[0]
    mm_dtype = fwd.w_ih.dtype
    interpret = not backend_supports_mosaic()
    h0 = jnp.zeros((batch, hidden), jnp.float32)

    wbytes = 2 * (d_in + hidden) * 3 * hidden * jnp.dtype(mm_dtype).itemsize
    if wbytes <= 72 * 1024 * 1024:
        return gru_scan_bidi_fused(
            x.astype(mm_dtype), lengths,
            fwd.w_ih, bwd.w_ih, fwd.w_hh, bwd.w_hh,
            fwd.b_ih, bwd.b_ih, fwd.b_hh, bwd.b_hh,
            h0, h0, interpret=interpret,
        )
    w_ih2 = jnp.concatenate([fwd.w_ih, bwd.w_ih], axis=1)
    gx2 = jnp.einsum("tbi,ik->tbk", x.astype(mm_dtype), w_ih2)
    g3 = 3 * hidden
    return gru_scan_bidi(
        gx2[..., :g3], gx2[..., g3:], lengths,
        fwd.w_hh, bwd.w_hh, fwd.b_hh, bwd.b_hh, h0, h0,
        interpret=interpret, b_ih_f=fwd.b_ih, b_ih_b=bwd.b_ih,
    )


def _gru_dir_grads(x, lengths, w: GRUWeights, out_dir, dout, dh_last,
                   chain_reverse: bool, interpret: bool):
    """Gradients for ONE direction: runs the Mosaic backward walk
    (pallas_gru.gru_bwd_scan) over recomputed projections, then assembles
    the weight/bias/input gradients with batched MXU einsums."""
    from .pallas_gru import gru_bwd_scan

    t_max, batch, _ = x.shape
    hidden = w.w_hh.shape[0]
    mm_dtype = w.w_ih.dtype
    seq = out_dir.dtype

    # bias-free projection, recomputed (cheaper than saving (T, B, 3H))
    gx = jnp.einsum("tbi,ik->tbk", x.astype(mm_dtype), w.w_ih)
    if chain_reverse:
        # reverse-time chain: state before step t = state after step t+1;
        # its h0 (zeros) applies at the chain start t = T-1
        hprev = jnp.concatenate(
            [out_dir[1:], jnp.zeros((1, batch, hidden), seq)], axis=0
        )
    else:
        hprev = jnp.concatenate(
            [jnp.zeros((1, batch, hidden), seq), out_dir[:-1]], axis=0
        )
    dgx, dghn, dh0 = gru_bwd_scan(
        gx, hprev, dout, lengths, w.w_hh, w.b_hh, w.b_ih, dh_last,
        # traversal runs opposite the chain's recurrence order
        reverse=not chain_reverse, interpret=interpret,
    )
    del dh0  # h0 is fixed at zeros on this path

    dgh = jnp.concatenate([dgx[..., : 2 * hidden], dghn], axis=-1)
    dw_hh = jnp.einsum(
        "tbh,tbg->hg", hprev.astype(mm_dtype), dgh.astype(mm_dtype),
        preferred_element_type=jnp.float32,
    )
    dw_ih = jnp.einsum(
        "tbi,tbg->ig", x.astype(mm_dtype), dgx.astype(mm_dtype),
        preferred_element_type=jnp.float32,
    )
    dx = jnp.einsum(
        "tbg,ig->tbi", dgx.astype(mm_dtype), w.w_ih,
        preferred_element_type=jnp.float32,
    )
    grads = GRUWeights(
        w_ih=dw_ih.astype(w.w_ih.dtype),
        w_hh=dw_hh.astype(w.w_hh.dtype),
        b_ih=dgx.sum(axis=(0, 1)).astype(w.b_ih.dtype),
        b_hh=dgh.sum(axis=(0, 1)).astype(w.b_hh.dtype),
    )
    return dx, grads


def _float0_like(a):
    import numpy as _np

    return _np.zeros(a.shape, dtype=jax.dtypes.float0)


@jax.custom_vjp
def _pallas_gru_bidi_sum(x, lengths, fwd: GRUWeights, bwd: GRUWeights):
    out_f, out_b, hl_f, hl_b = _pallas_bidi_raw(x, lengths, fwd, bwd)
    return (
        out_f.astype(jnp.float32) + out_b.astype(jnp.float32),
        jnp.stack([hl_f, hl_b]),
    )


def _pallas_gru_bidi_sum_fwd(x, lengths, fwd, bwd):
    out_f, out_b, hl_f, hl_b = _pallas_bidi_raw(x, lengths, fwd, bwd)
    out = out_f.astype(jnp.float32) + out_b.astype(jnp.float32)
    return (out, jnp.stack([hl_f, hl_b])), (x, lengths, fwd, bwd, out_f, out_b)


def _pallas_gru_bidi_sum_bwd(res, ct):
    from .pallas_gru import backend_supports_mosaic

    x, lengths, fwd, bwd, out_f, out_b = res
    d_out, d_hl = ct
    interpret = not backend_supports_mosaic()
    dx_f, dfwd = _gru_dir_grads(
        x, lengths, fwd, out_f, d_out, d_hl[0],
        chain_reverse=False, interpret=interpret,
    )
    dx_b, dbwd = _gru_dir_grads(
        x, lengths, bwd, out_b, d_out, d_hl[1],
        chain_reverse=True, interpret=interpret,
    )
    return (
        (dx_f + dx_b).astype(x.dtype),
        _float0_like(lengths),
        dfwd,
        dbwd,
    )


_pallas_gru_bidi_sum.defvjp(_pallas_gru_bidi_sum_fwd, _pallas_gru_bidi_sum_bwd)


@jax.custom_vjp
def _pallas_gru_uni(x, lengths, fwd: GRUWeights):
    from .pallas_gru import backend_supports_mosaic, gru_scan

    batch = x.shape[1]
    hidden = fwd.w_hh.shape[0]
    mm_dtype = fwd.w_ih.dtype
    gx = jnp.einsum("tbi,ik->tbk", x.astype(mm_dtype), fwd.w_ih)
    out, hl = gru_scan(
        gx, lengths, fwd.w_hh, fwd.b_hh,
        jnp.zeros((batch, hidden), jnp.float32),
        reverse=False, interpret=not backend_supports_mosaic(),
        b_ih=fwd.b_ih,
    )
    return out.astype(jnp.float32), hl[None]


def _pallas_gru_uni_fwd(x, lengths, fwd):
    out, hl = _pallas_gru_uni(x, lengths, fwd)
    return (out, hl), (x, lengths, fwd, out)


def _pallas_gru_uni_bwd(res, ct):
    from .pallas_gru import backend_supports_mosaic

    x, lengths, fwd, out = res
    d_out, d_hl = ct
    seq_out = out.astype(fwd.w_ih.dtype)
    dx, dfwd = _gru_dir_grads(
        x, lengths, fwd, seq_out, d_out, d_hl[0],
        chain_reverse=False, interpret=not backend_supports_mosaic(),
    )
    return dx.astype(x.dtype), _float0_like(lengths), dfwd


_pallas_gru_uni.defvjp(_pallas_gru_uni_fwd, _pallas_gru_uni_bwd)


def gru_layer_streaming(
    x: jnp.ndarray,
    weights: GRUWeights,
    h0: jnp.ndarray,
    t_valid=None,
    impl: str = "auto",
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Unidirectional GRU chunk step with carried hidden state.

    Used by the streaming path (reference BatchRNNStream model.py:219-237):
    hidden state threads across chunk calls. x is (T, B, I), h0 is (B, H).
    Returns ((T, B, H), h_last).

    ``t_valid`` (traced scalar) masks a zero-padded chunk: the hidden state
    freezes and outputs are zeroed past the first ``t_valid`` steps, so the
    engine can bucket chunk lengths to a few compiled shapes
    (engine.CHUNK_BUCKET) instead of recompiling per chunk. ``impl`` picks
    the recurrence engine like :func:`gru_layer` — on TPU backends the
    Mosaic kernel (ops/pallas_gru.py) runs the latency-critical B=1 chunk
    recurrence with weights and the carried h resident in VMEM.
    """
    t_max, batch, _ = x.shape
    mm_dtype = weights.w_ih.dtype

    impl = _resolve_impl(impl)

    if t_valid is None:
        lengths = jnp.full((batch,), t_max, jnp.int32)
    else:
        lengths = jnp.broadcast_to(
            jnp.asarray(t_valid, jnp.int32), (batch,)
        )

    if impl == "pallas":
        from .pallas_gru import backend_supports_mosaic, gru_scan

        # bias-free projection in the stream dtype; b_ih added in-kernel
        gx = jnp.einsum("tbi,ik->tbk", x.astype(mm_dtype), weights.w_ih)
        out, h_last = gru_scan(
            gx,
            lengths,
            weights.w_hh,
            weights.b_hh,
            h0.astype(jnp.float32),
            reverse=False,
            interpret=not backend_supports_mosaic(),
            b_ih=weights.b_ih,
        )
        return out.astype(jnp.float32), h_last

    gx = (
        jnp.einsum(
            "tbi,ik->tbk",
            x.astype(mm_dtype),
            weights.w_ih,
            preferred_element_type=jnp.float32,
        )
        + weights.b_ih.astype(jnp.float32)
    )

    if t_valid is None:
        # unmasked fast path: no freeze bookkeeping
        def step(h, gx_t):
            h_new = _gru_cell(h, gx_t, weights.w_hh, weights.b_hh)
            return h_new, h_new

        h_last, out = jax.lax.scan(step, h0, gx)
        return out, h_last

    mask = (jnp.arange(t_max)[:, None] < lengths[None, :]).astype(jnp.float32)

    def step(h, inputs):
        gx_t, m_t = inputs
        h_new = _gru_cell(h, gx_t, weights.w_hh, weights.b_hh)
        m = m_t[:, None]
        return m * h_new + (1.0 - m) * h, h_new * m

    h_last, out = jax.lax.scan(step, h0, (gx, mask))
    return out, h_last


class LSTMWeights(NamedTuple):
    w_ih: jnp.ndarray  # (I, 4H)
    w_hh: jnp.ndarray  # (H, 4H)
    b_ih: jnp.ndarray  # (4H,)
    b_hh: jnp.ndarray  # (4H,)


def _lstm_project(x, wts: LSTMWeights):
    mm_dtype = wts.w_ih.dtype
    return (
        jnp.einsum(
            "tbi,ik->tbk", x.astype(mm_dtype), wts.w_ih,
            preferred_element_type=jnp.float32,
        )
        + wts.b_ih.astype(jnp.float32)
    ).astype(mm_dtype)


def _shift_chain(seq, chain_reverse: bool):
    """State-before-step-t stream in natural time: the chain's previous
    state is seq[t-1] for the forward chain (zeros at t=0) and seq[t+1]
    for the reverse-time chain (zeros at t=T-1) — zeros because these
    layers always start from h0=c0=0."""
    zero = jnp.zeros_like(seq[:1])
    if chain_reverse:
        return jnp.concatenate([seq[1:], zero], axis=0)
    return jnp.concatenate([zero, seq[:-1]], axis=0)


def _lstm_dir_grads(x, lengths, w: LSTMWeights, out_dir, c_dir, dout,
                    chain_reverse: bool, interpret: bool):
    from .pallas_gru import lstm_bwd_scan

    mm = w.w_ih.dtype
    gx = _lstm_project(x, w)
    hprev = _shift_chain(out_dir, chain_reverse)
    cprev = _shift_chain(c_dir, chain_reverse)
    dg4, _dh0, _dc0 = lstm_bwd_scan(
        gx, hprev, cprev, dout, lengths, w.w_hh, w.b_hh,
        reverse=not chain_reverse, interpret=interpret,
    )
    dw_hh = jnp.einsum(
        "tbh,tbg->hg", hprev.astype(mm), dg4.astype(mm),
        preferred_element_type=jnp.float32,
    )
    dw_ih = jnp.einsum(
        "tbi,tbg->ig", x.astype(mm), dg4.astype(mm),
        preferred_element_type=jnp.float32,
    )
    db = dg4.sum(axis=(0, 1))
    dx = jnp.einsum(
        "tbg,ig->tbi", dg4.astype(mm), w.w_ih,
        preferred_element_type=jnp.float32,
    )
    # b_ih and b_hh enter the gates additively -> identical gradients
    return dx, LSTMWeights(
        w_ih=dw_ih.astype(w.w_ih.dtype),
        w_hh=dw_hh.astype(w.w_hh.dtype),
        b_ih=db.astype(w.b_ih.dtype),
        b_hh=db.astype(w.b_hh.dtype),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _pallas_lstm(x, lengths, fwd, bwd, sum_directions):
    from .pallas_gru import backend_supports_mosaic, lstm_scan

    interpret = not backend_supports_mosaic()
    batch = x.shape[1]
    hidden = fwd.w_hh.shape[0]
    h0 = jnp.zeros((batch, hidden), jnp.float32)
    c0 = jnp.zeros((batch, hidden), jnp.float32)
    out_f, _, _ = lstm_scan(
        _lstm_project(x, fwd), lengths, fwd.w_hh, fwd.b_hh, h0, c0,
        reverse=False, interpret=interpret,
    )
    out_f = out_f.astype(jnp.float32)
    if bwd is None:
        return out_f
    out_b, _, _ = lstm_scan(
        _lstm_project(x, bwd), lengths, bwd.w_hh, bwd.b_hh, h0, c0,
        reverse=True, interpret=interpret,
    )
    out_b = out_b.astype(jnp.float32)
    return (
        out_f + out_b
        if sum_directions
        else jnp.concatenate([out_f, out_b], -1)
    )


def _pallas_lstm_fwd(x, lengths, fwd, bwd, sum_directions):
    from .pallas_gru import backend_supports_mosaic, lstm_scan_with_cell

    interpret = not backend_supports_mosaic()
    batch = x.shape[1]
    hidden = fwd.w_hh.shape[0]
    h0 = jnp.zeros((batch, hidden), jnp.float32)
    c0 = jnp.zeros((batch, hidden), jnp.float32)
    out_f, c_f, _, _ = lstm_scan_with_cell(
        _lstm_project(x, fwd), lengths, fwd.w_hh, fwd.b_hh, h0, c0,
        reverse=False, interpret=interpret,
    )
    if bwd is None:
        return out_f.astype(jnp.float32), (x, lengths, fwd, None, out_f, c_f, None, None)
    out_b, c_b, _, _ = lstm_scan_with_cell(
        _lstm_project(x, bwd), lengths, bwd.w_hh, bwd.b_hh, h0, c0,
        reverse=True, interpret=interpret,
    )
    merged = (
        out_f.astype(jnp.float32) + out_b.astype(jnp.float32)
        if sum_directions
        else jnp.concatenate(
            [out_f.astype(jnp.float32), out_b.astype(jnp.float32)], -1
        )
    )
    return merged, (x, lengths, fwd, bwd, out_f, c_f, out_b, c_b)


def _pallas_lstm_bwd(sum_directions, res, d_out):
    from .pallas_gru import backend_supports_mosaic

    x, lengths, fwd, bwd, out_f, c_f, out_b, c_b = res
    interpret = not backend_supports_mosaic()
    hidden = fwd.w_hh.shape[0]
    if bwd is None:
        dx, dfwd = _lstm_dir_grads(
            x, lengths, fwd, out_f, c_f, d_out,
            chain_reverse=False, interpret=interpret,
        )
        return dx.astype(x.dtype), _float0_like(lengths), dfwd, None
    if sum_directions:
        dout_f = dout_b = d_out
    else:
        dout_f, dout_b = d_out[..., :hidden], d_out[..., hidden:]
    dx_f, dfwd = _lstm_dir_grads(
        x, lengths, fwd, out_f, c_f, dout_f,
        chain_reverse=False, interpret=interpret,
    )
    dx_b, dbwd = _lstm_dir_grads(
        x, lengths, bwd, out_b, c_b, dout_b,
        chain_reverse=True, interpret=interpret,
    )
    return (
        (dx_f + dx_b).astype(x.dtype),
        _float0_like(lengths),
        dfwd,
        dbwd,
    )


_pallas_lstm.defvjp(_pallas_lstm_fwd, _pallas_lstm_bwd)


def _resolve_impl(impl: str) -> str:
    """"auto" -> DANSPEECH_TPU_GRU_IMPL env override -> pallas on Mosaic
    backends, xla elsewhere. The ONE dispatch rule for every rnn layer
    entry point (was duplicated inline; code-review r4)."""
    if impl == "auto":
        import os

        impl = os.environ.get("DANSPEECH_TPU_GRU_IMPL", "auto")
    if impl == "auto":
        from .pallas_gru import backend_supports_mosaic

        impl = "pallas" if backend_supports_mosaic() else "xla"
    return impl


def lstm_layer(
    x: jnp.ndarray,
    lengths: jnp.ndarray,
    fwd: LSTMWeights,
    bwd: LSTMWeights | None = None,
    sum_directions: bool = True,
    impl: str = "auto",
):
    """Bidirectional-capable LSTM layer (torch gate order i, f, g, o).

    Supports the reference's ``rnn_type='lstm'`` checkpoints
    (model.py:14-18 supported_rnns). ``impl`` dispatches like
    :func:`gru_layer`: the Mosaic kernel (ops/pallas_gru.lstm_scan) on TPU
    backends, lax.scan elsewhere. The pallas path is differentiable via
    the custom-VJP Mosaic backward (pallas_gru.lstm_bwd_scan).
    """
    if _resolve_impl(impl) == "pallas":
        return _pallas_lstm(x, lengths, fwd, bwd, sum_directions)
    t_max, batch, _ = x.shape
    hidden = fwd.w_hh.shape[0]
    directions = [fwd] if bwd is None else [fwd, bwd]
    ndir = len(directions)

    if ndir == 2:
        x_stack = jnp.stack([x, _reverse_valid(x, lengths)], axis=1)
    else:
        x_stack = x[:, None]

    w_ih = jnp.stack([d.w_ih for d in directions])
    w_hh = jnp.stack([d.w_hh for d in directions])
    b_ih = jnp.stack([d.b_ih for d in directions])
    b_hh = jnp.stack([d.b_hh for d in directions])

    gx = (
        jnp.einsum(
            "tdbi,dik->tdbk", x_stack, w_ih, preferred_element_type=jnp.float32
        )
        + b_ih[None, :, None, :]
    )
    h0 = jnp.zeros((ndir, batch, hidden), dtype=x.dtype)
    c0 = jnp.zeros((ndir, batch, hidden), dtype=x.dtype)
    mask = (jnp.arange(t_max)[:, None] < lengths[None, :]).astype(x.dtype)

    def step(carry, inputs):
        h, c = carry
        gx_t, m_t = inputs
        gh = (
            jnp.einsum("dbh,dhk->dbk", h, w_hh, preferred_element_type=jnp.float32)
            + b_hh[:, None, :]
        )
        gi, gf, gg, go = jnp.split(gx_t + gh, 4, axis=-1)
        i = jax.nn.sigmoid(gi)
        f = jax.nn.sigmoid(gf)
        g = jnp.tanh(gg)
        o = jax.nn.sigmoid(go)
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        m = m_t[None, :, None]
        return (m * h_new + (1 - m) * h, m * c_new + (1 - m) * c), h_new * m

    (_, _), out = jax.lax.scan(step, (h0, c0), (gx, mask))
    if ndir == 2:
        out_f = out[:, 0]
        out_b = _reverse_valid(out[:, 1], lengths)
        return (out_f + out_b) if sum_directions else jnp.concatenate([out_f, out_b], -1)
    return out[:, 0]


class RNNWeights(NamedTuple):
    w_ih: jnp.ndarray  # (I, H)
    w_hh: jnp.ndarray  # (H, H)
    b_ih: jnp.ndarray  # (H,)
    b_hh: jnp.ndarray  # (H,)


def _rnn_project(x, wts: "RNNWeights"):
    mm_dtype = wts.w_ih.dtype
    return (
        jnp.einsum(
            "tbi,ik->tbk", x.astype(mm_dtype), wts.w_ih,
            preferred_element_type=jnp.float32,
        )
        + (wts.b_ih + wts.b_hh).astype(jnp.float32)
    ).astype(mm_dtype)


def _rnn_dir_grads(x, lengths, w: "RNNWeights", out_dir, dout,
                   chain_reverse: bool, interpret: bool):
    from .pallas_gru import rnn_tanh_bwd_scan

    mm = w.w_ih.dtype
    dpre, _dh0 = rnn_tanh_bwd_scan(
        out_dir, dout, lengths, w.w_hh,
        reverse=not chain_reverse, interpret=interpret,
    )
    hprev = _shift_chain(out_dir, chain_reverse)
    dw_hh = jnp.einsum(
        "tbh,tbg->hg", hprev.astype(mm), dpre.astype(mm),
        preferred_element_type=jnp.float32,
    )
    dw_ih = jnp.einsum(
        "tbi,tbg->ig", x.astype(mm), dpre.astype(mm),
        preferred_element_type=jnp.float32,
    )
    db = dpre.sum(axis=(0, 1))
    dx = jnp.einsum(
        "tbg,ig->tbi", dpre.astype(mm), w.w_ih,
        preferred_element_type=jnp.float32,
    )
    return dx, RNNWeights(
        w_ih=dw_ih.astype(w.w_ih.dtype),
        w_hh=dw_hh.astype(w.w_hh.dtype),
        b_ih=db.astype(w.b_ih.dtype),
        b_hh=db.astype(w.b_hh.dtype),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _pallas_rnn_tanh(x, lengths, fwd, bwd, sum_directions):
    from .pallas_gru import backend_supports_mosaic, rnn_tanh_scan

    interpret = not backend_supports_mosaic()
    out_f, _ = rnn_tanh_scan(
        _rnn_project(x, fwd), lengths, fwd.w_hh,
        reverse=False, interpret=interpret,
    )
    out_f = out_f.astype(jnp.float32)
    if bwd is None:
        return out_f
    out_b, _ = rnn_tanh_scan(
        _rnn_project(x, bwd), lengths, bwd.w_hh,
        reverse=True, interpret=interpret,
    )
    out_b = out_b.astype(jnp.float32)
    return (
        out_f + out_b
        if sum_directions
        else jnp.concatenate([out_f, out_b], -1)
    )


def _pallas_rnn_tanh_fwd(x, lengths, fwd, bwd, sum_directions):
    from .pallas_gru import backend_supports_mosaic, rnn_tanh_scan

    interpret = not backend_supports_mosaic()
    out_f, _ = rnn_tanh_scan(
        _rnn_project(x, fwd), lengths, fwd.w_hh,
        reverse=False, interpret=interpret,
    )
    if bwd is None:
        return out_f.astype(jnp.float32), (x, lengths, fwd, None, out_f, None)
    out_b, _ = rnn_tanh_scan(
        _rnn_project(x, bwd), lengths, bwd.w_hh,
        reverse=True, interpret=interpret,
    )
    merged = (
        out_f.astype(jnp.float32) + out_b.astype(jnp.float32)
        if sum_directions
        else jnp.concatenate(
            [out_f.astype(jnp.float32), out_b.astype(jnp.float32)], -1
        )
    )
    return merged, (x, lengths, fwd, bwd, out_f, out_b)


def _pallas_rnn_tanh_bwd(sum_directions, res, d_out):
    from .pallas_gru import backend_supports_mosaic

    x, lengths, fwd, bwd, out_f, out_b = res
    interpret = not backend_supports_mosaic()
    hidden = fwd.w_hh.shape[0]
    if bwd is None:
        dx, dfwd = _rnn_dir_grads(
            x, lengths, fwd, out_f, d_out,
            chain_reverse=False, interpret=interpret,
        )
        return dx.astype(x.dtype), _float0_like(lengths), dfwd, None
    if sum_directions:
        dout_f = dout_b = d_out
    else:
        dout_f, dout_b = d_out[..., :hidden], d_out[..., hidden:]
    dx_f, dfwd = _rnn_dir_grads(
        x, lengths, fwd, out_f, dout_f,
        chain_reverse=False, interpret=interpret,
    )
    dx_b, dbwd = _rnn_dir_grads(
        x, lengths, bwd, out_b, dout_b,
        chain_reverse=True, interpret=interpret,
    )
    return (
        (dx_f + dx_b).astype(x.dtype),
        _float0_like(lengths),
        dfwd,
        dbwd,
    )


_pallas_rnn_tanh.defvjp(_pallas_rnn_tanh_fwd, _pallas_rnn_tanh_bwd)


def rnn_tanh_layer(
    x: jnp.ndarray,
    lengths: jnp.ndarray,
    fwd: RNNWeights,
    bwd: RNNWeights | None = None,
    sum_directions: bool = True,
    impl: str = "auto",
):
    """Vanilla tanh RNN layer (reference ``rnn_type='rnn'``). ``impl``
    dispatches like :func:`gru_layer` (Mosaic kernel on TPU backends);
    the pallas path is differentiable via the custom-VJP Mosaic backward
    (pallas_gru.rnn_tanh_bwd_scan)."""
    if _resolve_impl(impl) == "pallas":
        return _pallas_rnn_tanh(x, lengths, fwd, bwd, sum_directions)
    t_max, batch, _ = x.shape
    hidden = fwd.w_hh.shape[0]
    directions = [fwd] if bwd is None else [fwd, bwd]
    ndir = len(directions)
    if ndir == 2:
        x_stack = jnp.stack([x, _reverse_valid(x, lengths)], axis=1)
    else:
        x_stack = x[:, None]
    w_ih = jnp.stack([d.w_ih for d in directions])
    w_hh = jnp.stack([d.w_hh for d in directions])
    b = jnp.stack([d.b_ih + d.b_hh for d in directions])
    gx = jnp.einsum("tdbi,dik->tdbk", x_stack, w_ih, preferred_element_type=jnp.float32)
    h0 = jnp.zeros((ndir, batch, hidden), dtype=x.dtype)
    mask = (jnp.arange(t_max)[:, None] < lengths[None, :]).astype(x.dtype)

    def step(h, inputs):
        gx_t, m_t = inputs
        gh = jnp.einsum("dbh,dhk->dbk", h, w_hh, preferred_element_type=jnp.float32)
        h_new = jnp.tanh(gx_t + gh + b[:, None, :])
        m = m_t[None, :, None]
        return m * h_new + (1 - m) * h, h_new * m

    _, out = jax.lax.scan(step, h0, (gx, mask))
    if ndir == 2:
        out_f = out[:, 0]
        out_b = _reverse_valid(out[:, 1], lengths)
        return (out_f + out_b) if sum_directions else jnp.concatenate([out_f, out_b], -1)
    return out[:, 0]
