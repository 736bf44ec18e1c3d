"""Pallas TPU GRU scan kernel.

The TPU-native replacement for the cuDNN GRU kernels the reference leans on
through torch (reference model.py:96-122 BatchRNN; SURVEY §2.2 N1). The
input projection (all timesteps) stays a big XLA einsum on the MXU; this
kernel implements only the sequential recurrence, which is where
lax.scan leaves performance on the table:

- the recurrent weights live in VMEM for the whole sequence (constant
  BlockSpec index map -> loaded from HBM exactly once, vs. the XLA scan
  re-fetching when both directions' fp32 weights exceed VMEM);
- per-timestep gx/out blocks are streamed with Mosaic's automatic double
  buffering, so the HBM traffic of the carried state is zero and the
  per-step overhead is a grid step, not an XLA while-loop iteration;
- the backward direction runs the *same* kernel with time-reversed index
  maps: padded rows (t >= length) are masked to keep h frozen at h0 until
  the row's valid region starts, which reproduces
  torch pack_padded_sequence semantics without materializing a
  valid-prefix-reversed copy of the sequence.

Gate math matches torch GRU (gate order r, z, n; recurrent bias inside the
reset product) in float32, with the two matmuls in the weights' dtype
(bfloat16 weights -> full MXU rate).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gru_step_kernel(
    gx_ref,  # (U, B, 3H) gx dtype — x @ w_ih (bias-free) for U timesteps
    len_ref,  # (B, 1) int32 — sequence lengths
    whh_ref,  # (H, 3H) weights dtype
    bhh_ref,  # (1, 3H) float32
    bih_ref,  # (1, 3H) float32 — added to gx in-kernel (NOT merged into
    #            bhh: torch keeps b_hh_n inside the reset product and
    #            b_ih_n outside), so the projection einsum writes bf16
    #            directly with no f32 bias pass over the (T, B, 3H) tensor
    h0_ref,  # (B, H) float32
    out_ref,  # (U, B, H) float32
    hlast_ref,  # (B, H) float32
    h_scr,  # (B, H) float32 VMEM scratch — the carried hidden state
    *,
    hidden: int,
    reverse: bool,
    unroll: int,
):
    i = pl.program_id(0)
    n_blocks = pl.num_programs(0)
    # element offset of this block in the (padded) time axis
    block = (n_blocks - 1 - i) if reverse else i
    base = block * unroll

    @pl.when(i == 0)
    def _():
        h_scr[:] = h0_ref[:]

    h = h_scr[:]
    lengths = len_ref[:]
    for k in range(unroll):  # static unroll: U cells per grid step
        kk = (unroll - 1 - k) if reverse else k
        t = base + kk
        gh = (
            jnp.dot(
                h.astype(whh_ref.dtype), whh_ref[:],
                preferred_element_type=jnp.float32,
            )
            + bhh_ref[:]
        )
        gx = gx_ref[kk].astype(jnp.float32) + bih_ref[:]  # bf16 stream
        r = jax.nn.sigmoid(gx[:, :hidden] + gh[:, :hidden])
        z = jax.nn.sigmoid(
            gx[:, hidden : 2 * hidden] + gh[:, hidden : 2 * hidden]
        )
        n = jnp.tanh(gx[:, 2 * hidden :] + r * gh[:, 2 * hidden :])
        h_new = (1.0 - z) * n + z * h

        m = (lengths > t).astype(jnp.float32)  # (B, 1)
        h = m * h_new + (1.0 - m) * h
        # padded positions emit exact zeros
        out_ref[kk] = (h_new * m).astype(out_ref.dtype)

    h_scr[:] = h

    @pl.when(i == n_blocks - 1)
    def _():
        hlast_ref[:] = h


def _gru_bidi_step_kernel(
    gxf_ref,  # (U, B, 3H) — fwd input projection (bias-free), natural time
    gxb_ref,  # (U, B, 3H) — bwd input projection (bias-free), natural time
    len_ref,  # (B, 1) int32
    whf_ref,  # (H, 3H)
    whb_ref,  # (H, 3H)
    bhf_ref,  # (1, 3H)
    bhb_ref,  # (1, 3H)
    bif_ref,  # (1, 3H) float32 — b_ih added in-kernel (see _gru_step_kernel)
    bib_ref,  # (1, 3H) float32
    h0f_ref,  # (B, H)
    h0b_ref,  # (B, H)
    outf_ref,  # (U, B, H)
    outb_ref,  # (U, B, H)
    hlf_ref,  # (B, H)
    hlb_ref,  # (B, H)
    hf_scr,  # (B, H) VMEM
    hb_scr,  # (B, H) VMEM
    *,
    hidden: int,
    unroll: int,
):
    """Both directions of one GRU layer in a single grid pass.

    Grid step i advances the forward chain through time block i and the
    backward chain through block n-1-i (the BlockSpec index maps deliver
    the right slices). Interleaving the two independent recurrences gives
    Mosaic two MXU matmuls per cell step whose gate (VPU) phases overlap
    the other chain's matmul — measurably faster than two sequential
    single-direction kernel launches.
    """
    i = pl.program_id(0)
    n_blocks = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        hf_scr[:] = h0f_ref[:]
        hb_scr[:] = h0b_ref[:]

    h_f = hf_scr[:]
    h_b = hb_scr[:]
    lengths = len_ref[:]
    base_f = i * unroll
    base_b = (n_blocks - 1 - i) * unroll

    def cell(h, gx, wh_ref, bh_ref, bi_ref, t):
        gx = gx.astype(jnp.float32) + bi_ref[:]
        gh = (
            jnp.dot(h.astype(wh_ref.dtype), wh_ref[:], preferred_element_type=jnp.float32)
            + bh_ref[:]
        )
        r = jax.nn.sigmoid(gx[:, :hidden] + gh[:, :hidden])
        z = jax.nn.sigmoid(gx[:, hidden : 2 * hidden] + gh[:, hidden : 2 * hidden])
        n = jnp.tanh(gx[:, 2 * hidden :] + r * gh[:, 2 * hidden :])
        h_new = (1.0 - z) * n + z * h
        m = (lengths > t).astype(jnp.float32)
        return m * h_new + (1.0 - m) * h, h_new * m

    for k in range(unroll):
        kb = unroll - 1 - k  # backward chain walks its block in reverse
        h_f, out_f = cell(h_f, gxf_ref[k], whf_ref, bhf_ref, bif_ref, base_f + k)
        h_b, out_b = cell(h_b, gxb_ref[kb], whb_ref, bhb_ref, bib_ref, base_b + kb)
        outf_ref[k] = out_f.astype(outf_ref.dtype)
        outb_ref[kb] = out_b.astype(outb_ref.dtype)

    hf_scr[:] = h_f
    hb_scr[:] = h_b

    @pl.when(i == n_blocks - 1)
    def _():
        hlf_ref[:] = h_f
        hlb_ref[:] = h_b


@functools.partial(jax.jit, static_argnames=("interpret", "unroll"))
def gru_scan_bidi(
    gx_f: jnp.ndarray,  # (T, B, 3H) float32
    gx_b: jnp.ndarray,  # (T, B, 3H) float32
    lengths: jnp.ndarray,  # (B,) int32
    w_hh_f: jnp.ndarray,
    w_hh_b: jnp.ndarray,
    b_hh_f: jnp.ndarray,
    b_hh_b: jnp.ndarray,
    h0_f: jnp.ndarray,
    h0_b: jnp.ndarray,
    interpret: bool = False,
    unroll: int = 1,
    b_ih_f: jnp.ndarray | None = None,
    b_ih_b: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused bidirectional GRU recurrence: both chains in one grid.

    Returns (out_f, out_b, h_last_f, h_last_b) with the same per-direction
    semantics as :func:`gru_scan` (masking freezes h and zeroes outputs past
    each row's length; the backward chain consumes natural-time gx through
    reversed index maps, so no reversed copy is materialized).

    ``b_ih_*``, when given, are added to gx inside the kernel — the caller
    then feeds a *bias-free* bf16 projection, skipping a whole f32
    read+write pass over the (T, B, 3H) tensors (the projection einsum was
    measured slower than this entire kernel because of that pass).
    """
    t_max, batch, g3 = gx_f.shape
    hidden = w_hh_f.shape[0]
    assert g3 == 3 * hidden
    # Sequence tensors stream in the caller's dtype: bfloat16 gx/out halves
    # the dominant HBM traffic of the whole RNN stack (gates still add in
    # float32 inside the kernel; the carried h and h_last stay float32).
    seq_dtype = gx_f.dtype

    unroll = max(1, min(unroll, t_max))
    t_pad = -(-t_max // unroll) * unroll
    if t_pad != t_max:
        pad = ((0, t_pad - t_max), (0, 0), (0, 0))
        gx_f = jnp.pad(gx_f, pad)
        gx_b = jnp.pad(gx_b, pad)
    n_blocks = t_pad // unroll

    fwd_ix = lambda i: (i, 0, 0)  # noqa: E731
    bwd_ix = lambda i: (n_blocks - 1 - i, 0, 0)  # noqa: E731
    const2 = lambda i: (0, 0)  # noqa: E731

    out_f, out_b, hl_f, hl_b = pl.pallas_call(
        functools.partial(_gru_bidi_step_kernel, hidden=hidden, unroll=unroll),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((unroll, batch, 3 * hidden), fwd_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((unroll, batch, 3 * hidden), bwd_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((batch, 1), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, 3 * hidden), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, 3 * hidden), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * hidden), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * hidden), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * hidden), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * hidden), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((batch, hidden), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((batch, hidden), const2, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((unroll, batch, hidden), fwd_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((unroll, batch, hidden), bwd_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((batch, hidden), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((batch, hidden), const2, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((t_pad, batch, hidden), seq_dtype),
            jax.ShapeDtypeStruct((t_pad, batch, hidden), seq_dtype),
            jax.ShapeDtypeStruct((batch, hidden), jnp.float32),
            jax.ShapeDtypeStruct((batch, hidden), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((batch, hidden), jnp.float32),
            pltpu.VMEM((batch, hidden), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * t_pad * batch * hidden * 3 * hidden,
            bytes_accessed=(
                gx_f.size * 2 * seq_dtype.itemsize
                + (w_hh_f.size + w_hh_b.size) * w_hh_f.dtype.itemsize
                + t_pad * batch * hidden * 2 * seq_dtype.itemsize
            ),
            transcendentals=2 * 3 * t_pad * batch * hidden,
        ),
    )(
        gx_f,
        gx_b,
        lengths.astype(jnp.int32).reshape(batch, 1),
        w_hh_f,
        w_hh_b,
        b_hh_f.astype(jnp.float32).reshape(1, 3 * hidden),
        b_hh_b.astype(jnp.float32).reshape(1, 3 * hidden),
        (jnp.zeros((3 * hidden,)) if b_ih_f is None else b_ih_f)
        .astype(jnp.float32)
        .reshape(1, 3 * hidden),
        (jnp.zeros((3 * hidden,)) if b_ih_b is None else b_ih_b)
        .astype(jnp.float32)
        .reshape(1, 3 * hidden),
        h0_f.astype(jnp.float32),
        h0_b.astype(jnp.float32),
    )
    return out_f[:t_max], out_b[:t_max], hl_f, hl_b


def _gru_bidi_fused_kernel(
    xf_ref,  # (U, B, D) stream dtype — raw layer input, block min(i, nb-1)
    xb_ref,  # (U, B, D) — block max(nb-1-i, 0)
    len_ref,  # (B, 1) int32
    wif_ref,  # (D, 3H) weights dtype — forward w_ih (VMEM-resident)
    wib_ref,  # (D, 3H) — backward w_ih
    whf_ref,  # (H, 3H)
    whb_ref,  # (H, 3H)
    bhf_ref,  # (1, 3H) float32
    bhb_ref,  # (1, 3H) float32
    bif_ref,  # (1, 3H) float32 — b_ih added at gx consumption
    bib_ref,  # (1, 3H) float32
    h0f_ref,  # (B, H) float32
    h0b_ref,  # (B, H) float32
    outf_ref,  # (U, B, H) — block max(i-1, 0)
    outb_ref,  # (U, B, H) — block min(nb-i, nb-1)
    hlf_ref,  # (B, H)
    hlb_ref,  # (B, H)
    hf_scr,  # (B, H) f32 VMEM
    hb_scr,  # (B, H) f32 VMEM
    gxf_scr,  # (2, U, B, 3H) f32 VMEM — double-buffered fwd projection
    gxb_scr,  # (2, U, B, 3H) f32 VMEM
    *,
    hidden: int,
    unroll: int,
    n_blocks: int,
):
    """Projection + recurrence of a bidirectional GRU layer in ONE grid.

    Grid step i projects time-block i (fwd) / nb-1-i (bwd) — a pair of
    (U*B, D) x (D, 3H) MXU matmuls with NO dependence on the carried
    state — and runs the recurrence cells of the blocks projected at step
    i-1 out of VMEM scratch (grid = nb + 1 steps; step 0 only primes, step
    nb only recurs). gx never exists in HBM: the layer input streams in at
    D instead of 2 x 3H(write)+3H(read) per direction, and the projection
    matmuls are independent MXU work the scheduler can overlap with the
    cell chain's VPU gate phases — the round-2 bottleneck
    (VERDICT r2 item 4, the 58%-of-roofline recurrence).
    """
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        hf_scr[:] = h0f_ref[:]
        hb_scr[:] = h0b_ref[:]

    # ---- project the blocks the NEXT step consumes -----------------------
    slot = jax.lax.rem(i, 2)

    @pl.when(i < n_blocks)
    def _():
        u, b, d = xf_ref.shape
        xf = xf_ref[:].reshape(u * b, d)
        xb = xb_ref[:].reshape(u * b, d)
        gxf_scr[slot] = jnp.dot(
            xf, wif_ref[:], preferred_element_type=jnp.float32
        ).reshape(u, b, 3 * hidden)
        gxb_scr[slot] = jnp.dot(
            xb, wib_ref[:], preferred_element_type=jnp.float32
        ).reshape(u, b, 3 * hidden)

    # ---- recurrence over the blocks projected last step ------------------
    @pl.when(i > 0)
    def _():
        use = jax.lax.rem(i + 1, 2)  # the slot written at step i-1
        h_f = hf_scr[:]
        h_b = hb_scr[:]
        lengths = len_ref[:]
        base_f = (i - 1) * unroll
        base_b = (n_blocks - i) * unroll

        def gh_of(h, wh_ref, bh_ref):
            return (
                jnp.dot(
                    h.astype(wh_ref.dtype), wh_ref[:],
                    preferred_element_type=jnp.float32,
                )
                + bh_ref[:]
            )

        def gates(h, gx, gh, t):
            r = jax.nn.sigmoid(gx[:, :hidden] + gh[:, :hidden])
            z = jax.nn.sigmoid(
                gx[:, hidden : 2 * hidden] + gh[:, hidden : 2 * hidden]
            )
            n = jnp.tanh(gx[:, 2 * hidden :] + r * gh[:, 2 * hidden :])
            h_new = (1.0 - z) * n + z * h
            m = (lengths > t).astype(jnp.float32)
            return m * h_new + (1.0 - m) * h, h_new * m

        # both directions' gh matmuls issue back to back so the second
        # MXU matmul overlaps the first chain's VPU gate phase (the two
        # chains are independent within a time step)
        for k in range(unroll):
            kb = unroll - 1 - k
            ghf = gh_of(h_f, whf_ref, bhf_ref)
            ghb = gh_of(h_b, whb_ref, bhb_ref)
            h_f, out_f = gates(
                h_f, gxf_scr[use, k] + bif_ref[:], ghf, base_f + k
            )
            h_b, out_b = gates(
                h_b, gxb_scr[use, kb] + bib_ref[:], ghb, base_b + kb
            )
            outf_ref[k] = out_f.astype(outf_ref.dtype)
            outb_ref[kb] = out_b.astype(outb_ref.dtype)

        hf_scr[:] = h_f
        hb_scr[:] = h_b

        @pl.when(i == n_blocks)
        def _():
            hlf_ref[:] = h_f
            hlb_ref[:] = h_b


@functools.partial(jax.jit, static_argnames=("interpret", "unroll"))
def gru_scan_bidi_fused(
    x: jnp.ndarray,  # (T, B, D) — raw layer input (stream dtype, e.g. bf16)
    lengths: jnp.ndarray,  # (B,) int32
    w_ih_f: jnp.ndarray,  # (D, 3H)
    w_ih_b: jnp.ndarray,
    w_hh_f: jnp.ndarray,  # (H, 3H)
    w_hh_b: jnp.ndarray,
    b_ih_f: jnp.ndarray,  # (3H,)
    b_ih_b: jnp.ndarray,
    b_hh_f: jnp.ndarray,
    b_hh_b: jnp.ndarray,
    h0_f: jnp.ndarray,  # (B, H) float32
    h0_b: jnp.ndarray,
    interpret: bool = False,
    unroll: int = 1,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fully fused bidirectional GRU layer: input projection AND both
    recurrence chains in one Mosaic grid (see _gru_bidi_fused_kernel).

    Same contract as :func:`gru_scan_bidi` but takes the raw layer input
    instead of precomputed projections — no (T, B, 3H) gx tensors ever
    reach HBM.
    """
    t_max, batch, d_in = x.shape
    hidden = w_hh_f.shape[0]
    seq_dtype = x.dtype

    unroll = max(1, min(unroll, t_max))
    t_pad = -(-t_max // unroll) * unroll
    if t_pad != t_max:
        x = jnp.pad(x, ((0, t_pad - t_max), (0, 0), (0, 0)))
    nb = t_pad // unroll

    # step i projects fwd block i / bwd block nb-1-i (clamped at the prime
    # and drain steps), recurs blocks i-1 / nb-i
    xf_ix = lambda i: (jnp.minimum(i, nb - 1), 0, 0)  # noqa: E731
    xb_ix = lambda i: (jnp.maximum(nb - 1 - i, 0), 0, 0)  # noqa: E731
    outf_ix = lambda i: (jnp.maximum(i - 1, 0), 0, 0)  # noqa: E731
    outb_ix = lambda i: (jnp.minimum(nb - i, nb - 1), 0, 0)  # noqa: E731
    const2 = lambda i: (0, 0)  # noqa: E731

    g3 = 3 * hidden
    out_f, out_b, hl_f, hl_b = pl.pallas_call(
        functools.partial(
            _gru_bidi_fused_kernel, hidden=hidden, unroll=unroll, n_blocks=nb
        ),
        grid=(nb + 1,),
        in_specs=[
            pl.BlockSpec((unroll, batch, d_in), xf_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((unroll, batch, d_in), xb_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((batch, 1), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((d_in, g3), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((d_in, g3), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, g3), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, g3), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g3), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g3), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g3), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g3), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((batch, hidden), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((batch, hidden), const2, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((unroll, batch, hidden), outf_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((unroll, batch, hidden), outb_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((batch, hidden), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((batch, hidden), const2, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((t_pad, batch, hidden), seq_dtype),
            jax.ShapeDtypeStruct((t_pad, batch, hidden), seq_dtype),
            jax.ShapeDtypeStruct((batch, hidden), jnp.float32),
            jax.ShapeDtypeStruct((batch, hidden), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((batch, hidden), jnp.float32),
            pltpu.VMEM((batch, hidden), jnp.float32),
            pltpu.VMEM((2, unroll, batch, g3), jnp.float32),
            pltpu.VMEM((2, unroll, batch, g3), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * t_pad * batch * (d_in + hidden) * g3,
            bytes_accessed=(
                x.size * 2 * seq_dtype.itemsize
                + (w_ih_f.size + w_ih_b.size + w_hh_f.size + w_hh_b.size)
                * w_hh_f.dtype.itemsize
                + t_pad * batch * hidden * 2 * seq_dtype.itemsize
            ),
            transcendentals=2 * 3 * t_pad * batch * hidden,
        ),
    )(
        x,
        x,
        lengths.astype(jnp.int32).reshape(batch, 1),
        w_ih_f,
        w_ih_b,
        w_hh_f,
        w_hh_b,
        b_hh_f.astype(jnp.float32).reshape(1, g3),
        b_hh_b.astype(jnp.float32).reshape(1, g3),
        b_ih_f.astype(jnp.float32).reshape(1, g3),
        b_ih_b.astype(jnp.float32).reshape(1, g3),
        h0_f.astype(jnp.float32),
        h0_b.astype(jnp.float32),
    )
    return out_f[:t_max], out_b[:t_max], hl_f, hl_b


def _lstm_step_kernel(
    gx_ref,  # (U, B, 4H) — x @ w_ih + b_ih
    len_ref,  # (B, 1) int32
    whh_ref,  # (H, 4H)
    bhh_ref,  # (1, 4H) float32
    h0_ref,  # (B, H) float32
    c0_ref,  # (B, H) float32
    out_ref,  # (U, B, H)
    hlast_ref,  # (B, H)
    clast_ref,  # (B, H)
    h_scr,  # (B, H) VMEM
    c_scr,  # (B, H) VMEM
    *,
    hidden: int,
    reverse: bool,
    unroll: int,
):
    """LSTM twin of _gru_step_kernel (torch gate order i, f, g, o)."""
    i = pl.program_id(0)
    n_blocks = pl.num_programs(0)
    block = (n_blocks - 1 - i) if reverse else i
    base = block * unroll

    @pl.when(i == 0)
    def _():
        h_scr[:] = h0_ref[:]
        c_scr[:] = c0_ref[:]

    h = h_scr[:]
    c = c_scr[:]
    lengths = len_ref[:]
    for k in range(unroll):
        kk = (unroll - 1 - k) if reverse else k
        t = base + kk
        gh = (
            jnp.dot(
                h.astype(whh_ref.dtype), whh_ref[:],
                preferred_element_type=jnp.float32,
            )
            + bhh_ref[:]
        )
        g = gx_ref[kk].astype(jnp.float32) + gh
        gi = jax.nn.sigmoid(g[:, :hidden])
        gf = jax.nn.sigmoid(g[:, hidden : 2 * hidden])
        gg = jnp.tanh(g[:, 2 * hidden : 3 * hidden])
        go = jax.nn.sigmoid(g[:, 3 * hidden :])
        c_new = gf * c + gi * gg
        h_new = go * jnp.tanh(c_new)

        m = (lengths > t).astype(jnp.float32)
        h = m * h_new + (1.0 - m) * h
        c = m * c_new + (1.0 - m) * c
        out_ref[kk] = (h_new * m).astype(out_ref.dtype)

    h_scr[:] = h
    c_scr[:] = c

    @pl.when(i == n_blocks - 1)
    def _():
        hlast_ref[:] = h
        clast_ref[:] = c


@functools.partial(jax.jit, static_argnames=("reverse", "interpret", "unroll"))
def lstm_scan(
    gx: jnp.ndarray,  # (T, B, 4H) — precomputed input projection
    lengths: jnp.ndarray,  # (B,) int32
    w_hh: jnp.ndarray,  # (H, 4H)
    b_hh: jnp.ndarray,  # (4H,)
    h0: jnp.ndarray,  # (B, H) float32
    c0: jnp.ndarray,  # (B, H) float32
    reverse: bool = False,
    interpret: bool = False,
    unroll: int = 1,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """LSTM recurrence in the Mosaic grid (same design as gru_scan: weights
    VMEM-resident, h/c carried in scratch, bf16 gx/out streaming, packed
    masking). Covers the reference's ``rnn_type='lstm'`` checkpoints
    (model.py:14-18 supported_rnns) at kernel speed rather than lax.scan.

    Returns (out, h_last, c_last).
    """
    t_max, batch, g4 = gx.shape
    hidden = w_hh.shape[0]
    assert g4 == 4 * hidden
    seq_dtype = gx.dtype

    unroll = max(1, min(unroll, t_max))
    t_pad = -(-t_max // unroll) * unroll
    if t_pad != t_max:
        gx = jnp.pad(gx, ((0, t_pad - t_max), (0, 0), (0, 0)))
    n_blocks = t_pad // unroll

    time_ix = (
        (lambda i: (n_blocks - 1 - i, 0, 0)) if reverse else (lambda i: (i, 0, 0))
    )
    const2 = lambda i: (0, 0)  # noqa: E731

    out, h_last, c_last = pl.pallas_call(
        functools.partial(
            _lstm_step_kernel, hidden=hidden, reverse=reverse, unroll=unroll
        ),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((unroll, batch, 4 * hidden), time_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((batch, 1), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, 4 * hidden), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * hidden), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((batch, hidden), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((batch, hidden), const2, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((unroll, batch, hidden), time_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((batch, hidden), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((batch, hidden), const2, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((t_pad, batch, hidden), seq_dtype),
            jax.ShapeDtypeStruct((batch, hidden), jnp.float32),
            jax.ShapeDtypeStruct((batch, hidden), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((batch, hidden), jnp.float32),
            pltpu.VMEM((batch, hidden), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * t_pad * batch * hidden * 4 * hidden,
            bytes_accessed=(
                gx.size * seq_dtype.itemsize
                + w_hh.size * w_hh.dtype.itemsize
                + t_pad * batch * hidden * seq_dtype.itemsize
            ),
            transcendentals=5 * t_pad * batch * hidden,
        ),
    )(
        gx,
        lengths.astype(jnp.int32).reshape(batch, 1),
        w_hh,
        b_hh.astype(jnp.float32).reshape(1, 4 * hidden),
        h0.astype(jnp.float32),
        c0.astype(jnp.float32),
    )
    return out[:t_max], h_last, c_last


def _rnn_tanh_step_kernel(
    gx_ref,  # (U, B, H)
    len_ref,  # (B, 1)
    whh_ref,  # (H, H)
    out_ref,  # (U, B, H)
    hlast_ref,  # (B, H)
    h_scr,  # (B, H)
    *,
    reverse: bool,
    unroll: int,
):
    """Vanilla tanh RNN recurrence (bias pre-added into gx by the caller)."""
    i = pl.program_id(0)
    n_blocks = pl.num_programs(0)
    block = (n_blocks - 1 - i) if reverse else i
    base = block * unroll

    @pl.when(i == 0)
    def _():
        h_scr[:] = jnp.zeros_like(h_scr)

    h = h_scr[:]
    lengths = len_ref[:]
    for k in range(unroll):
        kk = (unroll - 1 - k) if reverse else k
        t = base + kk
        gh = jnp.dot(
            h.astype(whh_ref.dtype), whh_ref[:],
            preferred_element_type=jnp.float32,
        )
        h_new = jnp.tanh(gx_ref[kk].astype(jnp.float32) + gh)
        m = (lengths > t).astype(jnp.float32)
        h = m * h_new + (1.0 - m) * h
        out_ref[kk] = (h_new * m).astype(out_ref.dtype)

    h_scr[:] = h

    @pl.when(i == n_blocks - 1)
    def _():
        hlast_ref[:] = h


@functools.partial(jax.jit, static_argnames=("reverse", "interpret", "unroll"))
def rnn_tanh_scan(
    gx: jnp.ndarray,  # (T, B, H) — x @ w_ih + b_ih + b_hh
    lengths: jnp.ndarray,
    w_hh: jnp.ndarray,  # (H, H)
    reverse: bool = False,
    interpret: bool = False,
    unroll: int = 1,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Vanilla tanh RNN recurrence in the Mosaic grid (``rnn_type='rnn'``)."""
    t_max, batch, hidden = gx.shape
    assert hidden == w_hh.shape[0]
    seq_dtype = gx.dtype

    unroll = max(1, min(unroll, t_max))
    t_pad = -(-t_max // unroll) * unroll
    if t_pad != t_max:
        gx = jnp.pad(gx, ((0, t_pad - t_max), (0, 0), (0, 0)))
    n_blocks = t_pad // unroll

    time_ix = (
        (lambda i: (n_blocks - 1 - i, 0, 0)) if reverse else (lambda i: (i, 0, 0))
    )
    const2 = lambda i: (0, 0)  # noqa: E731

    out, h_last = pl.pallas_call(
        functools.partial(_rnn_tanh_step_kernel, reverse=reverse, unroll=unroll),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((unroll, batch, hidden), time_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((batch, 1), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, hidden), const2, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((unroll, batch, hidden), time_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((batch, hidden), const2, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((t_pad, batch, hidden), seq_dtype),
            jax.ShapeDtypeStruct((batch, hidden), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((batch, hidden), jnp.float32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(
        gx,
        lengths.astype(jnp.int32).reshape(batch, 1),
        w_hh,
    )
    return out[:t_max], h_last


def backend_supports_mosaic() -> bool:
    """True when the default backend compiles Pallas TPU kernels natively."""
    try:
        platform = jax.devices()[0].platform
    except Exception:
        return False
    return platform in ("tpu", "axon")


@functools.partial(jax.jit, static_argnames=("reverse", "interpret", "unroll"))
def gru_scan(
    gx: jnp.ndarray,  # (T, B, 3H) float32 — precomputed input projection
    lengths: jnp.ndarray,  # (B,) int32
    w_hh: jnp.ndarray,  # (H, 3H)
    b_hh: jnp.ndarray,  # (3H,)
    h0: jnp.ndarray,  # (B, H) float32
    reverse: bool = False,
    interpret: bool = False,
    unroll: int = 1,
    b_ih: jnp.ndarray | None = None,  # added to gx in-kernel when given
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Run the GRU recurrence over precomputed gates.

    Returns (out, h_last): out is (T, B, H) float32 in natural time order
    with positions past each row's length zeroed; h_last is the hidden
    state after the last grid step (for ``reverse=False`` this is the
    packed-semantics final state; for ``reverse=True`` it is the state at
    t=0, matching torch's bidirectional h_n for the backward direction).

    ``unroll`` cells run per grid step (static inner loop); the time axis
    is zero-padded up to a multiple internally (masking keeps padded steps
    state-neutral, and for the reverse direction the padded tail is where
    every row is already past its length, so it contributes nothing before
    the valid region). Measured on v5e (T=401, B=104, H=1200, bf16):
    unroll=1 is fastest (2.4 ms — Mosaic's per-block double buffering
    overlaps best with single-step compute; larger unrolls serialize DMA
    and compute within the block and run ~2x slower). Default 1.
    """
    t_max, batch, g3 = gx.shape
    hidden = w_hh.shape[0]
    assert g3 == 3 * hidden
    seq_dtype = gx.dtype  # bf16 gx/out stream at half HBM cost (gates f32)

    unroll = max(1, min(unroll, t_max))
    t_pad = -(-t_max // unroll) * unroll
    if t_pad != t_max:
        gx = jnp.pad(gx, ((0, t_pad - t_max), (0, 0), (0, 0)))
    n_blocks = t_pad // unroll

    time_ix = (
        (lambda i: (n_blocks - 1 - i, 0, 0)) if reverse else (lambda i: (i, 0, 0))
    )

    out, h_last = pl.pallas_call(
        functools.partial(
            _gru_step_kernel, hidden=hidden, reverse=reverse, unroll=unroll
        ),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((unroll, batch, 3 * hidden), time_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((batch, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, 3 * hidden), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * hidden), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * hidden), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((batch, hidden), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((unroll, batch, hidden), time_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((batch, hidden), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((t_pad, batch, hidden), seq_dtype),
            jax.ShapeDtypeStruct((batch, hidden), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((batch, hidden), jnp.float32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),  # sequential: h carried in scratch
            # weights + double-buffered U-step gx/out blocks exceed the 16 MB
            # default scoped limit; v5e has 128 MB of VMEM
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * t_pad * batch * hidden * 3 * hidden,
            bytes_accessed=(
                gx.size * seq_dtype.itemsize + w_hh.size * w_hh.dtype.itemsize
                + t_pad * batch * hidden * seq_dtype.itemsize
            ),
            transcendentals=3 * t_pad * batch * hidden,
        ),
    )(
        gx,
        lengths.astype(jnp.int32).reshape(batch, 1),
        w_hh,
        b_hh.astype(jnp.float32).reshape(1, 3 * hidden),
        (jnp.zeros((3 * hidden,)) if b_ih is None else b_ih)
        .astype(jnp.float32)
        .reshape(1, 3 * hidden),
        h0.astype(jnp.float32),
    )
    return out[:t_max], h_last


# ---------------------------------------------------------------------------
# Backward (training) kernel
# ---------------------------------------------------------------------------
#
# The forward kernels above have no VJP, which forced training onto the XLA
# lax.scan recurrence (train/step.py rnn_impl="xla" — measured ~20 % of the
# bf16 roofline at the best batch, benchmarks/train_throughput.json). This
# kernel is the Mosaic backward: it walks the chain in reverse, recomputes
# the gates from the streamed bias-free projection gx and the h_{t-1} stream
# (= the forward's out sequence shifted by one step in chain order, h0 at
# the chain start), carries dL/dh in VMEM scratch, and streams out the
# gate-preactivation gradients. The weight/bias/input gradients then fall
# out of three big XLA einsums over those streams (MXU work, no recurrence):
#
#   dgh   = [dgx_r, dgx_z, dghn]
#   dW_hh = sum_t h_{t-1}^T dgh_t          dW_ih = x^T dgx
#   db_hh = sum dgh                        db_ih = sum dgx
#   dx    = dgx @ W_ih^T
#
# Masking mirrors the forward exactly: every gate gradient carries the
# row's (length > t) factor, so padded steps contribute only the dL/dh
# pass-through — which is also what routes a dL/dh_last cotangent back to
# each row's true final step.


def _gru_bwd_kernel(
    gx_ref,  # (U, B, 3H) seq dtype — bias-free input projection stream
    hprev_ref,  # (U, B, H) seq dtype — h before step t (chain order)
    dout_ref,  # (U, B, H) float32 — dL/d out_t
    len_ref,  # (B, 1) int32
    whh_ref,  # (H, 3H) weights dtype — for the gate recompute
    whht_ref,  # (3H, H) weights dtype — pre-transposed for the dh backprop
    #            (contracting the lane dim of whh in-kernel would transpose
    #            every step; one host-side transpose keeps both matmuls on
    #            natural layouts)
    bhh_ref,  # (1, 3H) float32
    bih_ref,  # (1, 3H) float32
    dhl_ref,  # (B, H) float32 — dL/dh_last (chain-final state)
    dgx_ref,  # (U, B, 3H) float32 out — d(pre-activations) wrt gx
    dghn_ref,  # (U, B, H) float32 out — n-part of dgh (r/z parts == dgx's)
    dh0_ref,  # (B, H) float32 out — dL/dh0 (chain-initial state)
    dh_scr,  # (B, H) float32 VMEM — carried dL/dh
    *,
    hidden: int,
    reverse: bool,
    unroll: int,
):
    """One grid step of the GRU backward walk.

    ``reverse=True`` walks time blocks n-1..0 (the backward pass OF THE
    FORWARD chain); ``reverse=False`` walks 0..n-1 (the backward pass of
    the reverse-time chain, whose recurrence ran T-1..0). The streams are
    all in NATURAL time order; the index maps deliver the right blocks.
    """
    i = pl.program_id(0)
    n_blocks = pl.num_programs(0)
    block = (n_blocks - 1 - i) if reverse else i
    base = block * unroll

    @pl.when(i == 0)
    def _():
        dh_scr[:] = dhl_ref[:]

    dh = dh_scr[:]
    lengths = len_ref[:]
    for k in range(unroll):
        # traversal within the block runs opposite the chain's time order
        kk = (unroll - 1 - k) if reverse else k
        t = base + kk
        m = (lengths > t).astype(jnp.float32)  # (B, 1)

        # recompute the forward gates of step t
        hprev = hprev_ref[kk].astype(jnp.float32)
        gx = gx_ref[kk].astype(jnp.float32) + bih_ref[:]
        gh = (
            jnp.dot(
                hprev.astype(whh_ref.dtype), whh_ref[:],
                preferred_element_type=jnp.float32,
            )
            + bhh_ref[:]
        )
        r = jax.nn.sigmoid(gx[:, :hidden] + gh[:, :hidden])
        z = jax.nn.sigmoid(
            gx[:, hidden : 2 * hidden] + gh[:, hidden : 2 * hidden]
        )
        ghn = gh[:, 2 * hidden :]
        n = jnp.tanh(gx[:, 2 * hidden :] + r * ghn)

        # h_t = m*h_new + (1-m)*h_{t-1}; out_t = m*h_new
        dhnew = m * (dh + dout_ref[kk].astype(jnp.float32))
        dn = dhnew * (1.0 - z)
        dz = dhnew * (hprev - n)
        dpre_n = dn * (1.0 - n * n)
        dr = dpre_n * ghn
        dpre_r = dr * r * (1.0 - r)
        dpre_z = dz * z * (1.0 - z)
        dghn = dpre_n * r

        dgx_ref[kk] = jnp.concatenate([dpre_r, dpre_z, dpre_n], axis=-1)
        dghn_ref[kk] = dghn

        # dL/dh_{t-1}: the z-gated carry, the recurrent-matmul backprop,
        # and the masked pass-through
        dgh = jnp.concatenate([dpre_r, dpre_z, dghn], axis=-1)
        dh = (
            dhnew * z
            + jnp.dot(
                dgh.astype(whht_ref.dtype),
                whht_ref[:],
                preferred_element_type=jnp.float32,
            )
            + (1.0 - m) * dh
        )

    dh_scr[:] = dh

    @pl.when(i == n_blocks - 1)
    def _():
        dh0_ref[:] = dh


@functools.partial(
    jax.jit, static_argnames=("reverse", "interpret", "unroll")
)
def gru_bwd_scan(
    gx: jnp.ndarray,  # (T, B, 3H) — bias-free projection (seq dtype)
    hprev: jnp.ndarray,  # (T, B, H) — h before each step, chain order
    dout: jnp.ndarray,  # (T, B, H) float32
    lengths: jnp.ndarray,  # (B,) int32
    w_hh: jnp.ndarray,  # (H, 3H)
    b_hh: jnp.ndarray,  # (3H,)
    b_ih: jnp.ndarray,  # (3H,)
    dh_last: jnp.ndarray,  # (B, H) float32
    reverse: bool = True,
    interpret: bool = False,
    unroll: int = 1,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Backward recurrence walk -> (dgx (T,B,3H) f32, dghn (T,B,H) f32,
    dh0 (B,H) f32).

    ``reverse=True`` for the forward chain's backward (traversal T-1..0);
    ``reverse=False`` for the reverse-time chain's backward (0..T-1).
    """
    t_max, batch, g3 = gx.shape
    hidden = w_hh.shape[0]
    assert g3 == 3 * hidden

    unroll = max(1, min(unroll, t_max))
    t_pad = -(-t_max // unroll) * unroll
    if t_pad != t_max:
        pad3 = ((0, t_pad - t_max), (0, 0), (0, 0))
        gx = jnp.pad(gx, pad3)
        hprev = jnp.pad(hprev, pad3[:2] + ((0, 0),))
        dout = jnp.pad(dout, pad3[:2] + ((0, 0),))
    n_blocks = t_pad // unroll

    time_ix = (
        (lambda i: (n_blocks - 1 - i, 0, 0)) if reverse else (lambda i: (i, 0, 0))
    )
    const2 = lambda i: (0, 0)  # noqa: E731

    dgx, dghn, dh0 = pl.pallas_call(
        functools.partial(
            _gru_bwd_kernel, hidden=hidden, reverse=reverse, unroll=unroll
        ),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((unroll, batch, 3 * hidden), time_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((unroll, batch, hidden), time_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((unroll, batch, hidden), time_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((batch, 1), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, 3 * hidden), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * hidden, hidden), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * hidden), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * hidden), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((batch, hidden), const2, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((unroll, batch, 3 * hidden), time_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((unroll, batch, hidden), time_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((batch, hidden), const2, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((t_pad, batch, 3 * hidden), jnp.float32),
            jax.ShapeDtypeStruct((t_pad, batch, hidden), jnp.float32),
            jax.ShapeDtypeStruct((batch, hidden), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((batch, hidden), jnp.float32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            # two (B,H)x(H,3H)-class matmuls per step
            flops=2 * 2 * t_pad * batch * hidden * 3 * hidden,
            bytes_accessed=(
                gx.size * gx.dtype.itemsize
                + hprev.size * hprev.dtype.itemsize
                + dout.size * 4
                + w_hh.size * w_hh.dtype.itemsize
                + t_pad * batch * 4 * hidden * 4
            ),
            transcendentals=3 * t_pad * batch * hidden,
        ),
    )(
        gx,
        hprev,
        dout.astype(jnp.float32),
        lengths.astype(jnp.int32).reshape(batch, 1),
        w_hh,
        w_hh.T,
        b_hh.astype(jnp.float32).reshape(1, 3 * hidden),
        b_ih.astype(jnp.float32).reshape(1, 3 * hidden),
        dh_last.astype(jnp.float32),
    )
    return dgx[:t_max], dghn[:t_max], dh0


def _lstm_step_kernel_cell(
    gx_ref, len_ref, whh_ref, bhh_ref, h0_ref, c0_ref,
    out_ref, cout_ref, hlast_ref, clast_ref, h_scr, c_scr,
    *, hidden: int, reverse: bool, unroll: int,
):
    """_lstm_step_kernel that ALSO streams the cell sequence (masked c_new)
    — the residual the training backward walk needs (lstm_bwd_scan)."""
    i = pl.program_id(0)
    n_blocks = pl.num_programs(0)
    block = (n_blocks - 1 - i) if reverse else i
    base = block * unroll

    @pl.when(i == 0)
    def _():
        h_scr[:] = h0_ref[:]
        c_scr[:] = c0_ref[:]

    h = h_scr[:]
    c = c_scr[:]
    lengths = len_ref[:]
    for k in range(unroll):
        kk = (unroll - 1 - k) if reverse else k
        t = base + kk
        gh = (
            jnp.dot(
                h.astype(whh_ref.dtype), whh_ref[:],
                preferred_element_type=jnp.float32,
            )
            + bhh_ref[:]
        )
        g = gx_ref[kk].astype(jnp.float32) + gh
        gi = jax.nn.sigmoid(g[:, :hidden])
        gf = jax.nn.sigmoid(g[:, hidden : 2 * hidden])
        gg = jnp.tanh(g[:, 2 * hidden : 3 * hidden])
        go = jax.nn.sigmoid(g[:, 3 * hidden :])
        c_new = gf * c + gi * gg
        h_new = go * jnp.tanh(c_new)

        m = (lengths > t).astype(jnp.float32)
        h = m * h_new + (1.0 - m) * h
        c = m * c_new + (1.0 - m) * c
        out_ref[kk] = (h_new * m).astype(out_ref.dtype)
        cout_ref[kk] = (c_new * m).astype(cout_ref.dtype)

    h_scr[:] = h
    c_scr[:] = c

    @pl.when(i == n_blocks - 1)
    def _():
        hlast_ref[:] = h
        clast_ref[:] = c


@functools.partial(jax.jit, static_argnames=("reverse", "interpret", "unroll"))
def lstm_scan_with_cell(
    gx, lengths, w_hh, b_hh, h0, c0,
    reverse: bool = False, interpret: bool = False, unroll: int = 1,
):
    """lstm_scan variant returning (out, c_seq, h_last, c_last) — the cell
    sequence is the extra residual the custom-VJP backward consumes."""
    t_max, batch, g4 = gx.shape
    hidden = w_hh.shape[0]
    assert g4 == 4 * hidden
    seq_dtype = gx.dtype

    unroll = max(1, min(unroll, t_max))
    t_pad = -(-t_max // unroll) * unroll
    if t_pad != t_max:
        gx = jnp.pad(gx, ((0, t_pad - t_max), (0, 0), (0, 0)))
    n_blocks = t_pad // unroll

    time_ix = (
        (lambda i: (n_blocks - 1 - i, 0, 0)) if reverse else (lambda i: (i, 0, 0))
    )
    const2 = lambda i: (0, 0)  # noqa: E731

    out, cseq, h_last, c_last = pl.pallas_call(
        functools.partial(
            _lstm_step_kernel_cell, hidden=hidden, reverse=reverse,
            unroll=unroll,
        ),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((unroll, batch, 4 * hidden), time_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((batch, 1), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, 4 * hidden), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * hidden), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((batch, hidden), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((batch, hidden), const2, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((unroll, batch, hidden), time_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((unroll, batch, hidden), time_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((batch, hidden), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((batch, hidden), const2, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((t_pad, batch, hidden), seq_dtype),
            jax.ShapeDtypeStruct((t_pad, batch, hidden), seq_dtype),
            jax.ShapeDtypeStruct((batch, hidden), jnp.float32),
            jax.ShapeDtypeStruct((batch, hidden), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((batch, hidden), jnp.float32),
            pltpu.VMEM((batch, hidden), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(
        gx,
        lengths.astype(jnp.int32).reshape(batch, 1),
        w_hh,
        b_hh.astype(jnp.float32).reshape(1, 4 * hidden),
        h0.astype(jnp.float32),
        c0.astype(jnp.float32),
    )
    return out[:t_max], cseq[:t_max], h_last, c_last


def _lstm_bwd_kernel(
    gx_ref,  # (U, B, 4H) seq dtype — projection stream (b_ih included)
    hprev_ref,  # (U, B, H) — h before step t (chain order)
    cprev_ref,  # (U, B, H) — c before step t (chain order)
    dout_ref,  # (U, B, H) float32
    len_ref,  # (B, 1)
    whh_ref,  # (H, 4H) — gate recompute
    whht_ref,  # (4H, H) — dh backprop
    bhh_ref,  # (1, 4H) float32
    dg4_ref,  # (U, B, 4H) float32 out — gate pre-activation grads
    dh0_ref,  # (B, H) float32 out
    dc0_ref,  # (B, H) float32 out
    dh_scr,  # (B, H) float32 VMEM
    dc_scr,  # (B, H) float32 VMEM
    *,
    hidden: int,
    reverse: bool,
    unroll: int,
):
    """LSTM backward walk (torch gate order i, f, g, o). dg4 equals BOTH
    the gx gradient and the gh gradient (the two enter additively), so the
    weight/bias/input grads all reduce over this one stream."""
    i = pl.program_id(0)
    n_blocks = pl.num_programs(0)
    block = (n_blocks - 1 - i) if reverse else i
    base = block * unroll

    @pl.when(i == 0)
    def _():
        dh_scr[:] = jnp.zeros_like(dh_scr)
        dc_scr[:] = jnp.zeros_like(dc_scr)

    dh = dh_scr[:]
    dc = dc_scr[:]
    lengths = len_ref[:]
    for k in range(unroll):
        kk = (unroll - 1 - k) if reverse else k
        t = base + kk
        m = (lengths > t).astype(jnp.float32)

        hprev = hprev_ref[kk].astype(jnp.float32)
        cprev = cprev_ref[kk].astype(jnp.float32)
        g = (
            gx_ref[kk].astype(jnp.float32)
            + jnp.dot(
                hprev.astype(whh_ref.dtype), whh_ref[:],
                preferred_element_type=jnp.float32,
            )
            + bhh_ref[:]
        )
        gi = jax.nn.sigmoid(g[:, :hidden])
        gf = jax.nn.sigmoid(g[:, hidden : 2 * hidden])
        gg = jnp.tanh(g[:, 2 * hidden : 3 * hidden])
        go = jax.nn.sigmoid(g[:, 3 * hidden :])
        c_new = gf * cprev + gi * gg
        tanh_c = jnp.tanh(c_new)

        dhnew = m * (dh + dout_ref[kk].astype(jnp.float32))
        do = dhnew * tanh_c
        dc_new = dhnew * go * (1.0 - tanh_c * tanh_c) + m * dc
        di = dc_new * gg
        df = dc_new * cprev
        dg = dc_new * gi
        dpre_i = di * gi * (1.0 - gi)
        dpre_f = df * gf * (1.0 - gf)
        dpre_g = dg * (1.0 - gg * gg)
        dpre_o = do * go * (1.0 - go)
        dg4 = jnp.concatenate([dpre_i, dpre_f, dpre_g, dpre_o], axis=-1)
        dg4_ref[kk] = dg4

        dh = (
            jnp.dot(
                dg4.astype(whht_ref.dtype), whht_ref[:],
                preferred_element_type=jnp.float32,
            )
            + (1.0 - m) * dh
        )
        dc = dc_new * gf + (1.0 - m) * dc

    dh_scr[:] = dh
    dc_scr[:] = dc

    @pl.when(i == n_blocks - 1)
    def _():
        dh0_ref[:] = dh
        dc0_ref[:] = dc


@functools.partial(jax.jit, static_argnames=("reverse", "interpret", "unroll"))
def lstm_bwd_scan(
    gx, hprev, cprev, dout, lengths, w_hh, b_hh,
    reverse: bool = True, interpret: bool = False, unroll: int = 1,
):
    """LSTM backward walk -> (dg4 (T,B,4H) f32, dh0, dc0). ``reverse``
    follows gru_bwd_scan's convention (traversal order, opposite the
    chain's recurrence order)."""
    t_max, batch, g4 = gx.shape
    hidden = w_hh.shape[0]
    assert g4 == 4 * hidden

    unroll = max(1, min(unroll, t_max))
    t_pad = -(-t_max // unroll) * unroll
    if t_pad != t_max:
        pad = ((0, t_pad - t_max), (0, 0), (0, 0))
        gx = jnp.pad(gx, pad)
        hprev = jnp.pad(hprev, pad[:2] + ((0, 0),))
        cprev = jnp.pad(cprev, pad[:2] + ((0, 0),))
        dout = jnp.pad(dout, pad[:2] + ((0, 0),))
    n_blocks = t_pad // unroll

    time_ix = (
        (lambda i: (n_blocks - 1 - i, 0, 0)) if reverse else (lambda i: (i, 0, 0))
    )
    const2 = lambda i: (0, 0)  # noqa: E731

    dg4, dh0, dc0 = pl.pallas_call(
        functools.partial(
            _lstm_bwd_kernel, hidden=hidden, reverse=reverse, unroll=unroll
        ),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((unroll, batch, 4 * hidden), time_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((unroll, batch, hidden), time_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((unroll, batch, hidden), time_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((unroll, batch, hidden), time_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((batch, 1), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, 4 * hidden), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * hidden, hidden), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * hidden), const2, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((unroll, batch, 4 * hidden), time_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((batch, hidden), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((batch, hidden), const2, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((t_pad, batch, 4 * hidden), jnp.float32),
            jax.ShapeDtypeStruct((batch, hidden), jnp.float32),
            jax.ShapeDtypeStruct((batch, hidden), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((batch, hidden), jnp.float32),
            pltpu.VMEM((batch, hidden), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(
        gx,
        hprev,
        cprev,
        dout.astype(jnp.float32),
        lengths.astype(jnp.int32).reshape(batch, 1),
        w_hh,
        w_hh.T,
        b_hh.astype(jnp.float32).reshape(1, 4 * hidden),
    )
    return dg4[:t_max], dh0, dc0


def _rnn_tanh_bwd_kernel(
    out_ref,  # (U, B, H) seq dtype — forward outputs (h_new * m)
    dout_ref,  # (U, B, H) float32
    len_ref,  # (B, 1)
    whht_ref,  # (H, H) — transposed recurrent weights
    dpre_ref,  # (U, B, H) float32 out — pre-activation grads
    dh0_ref,  # (B, H) float32 out
    dh_scr,  # (B, H) float32 VMEM
    *,
    hidden: int,
    reverse: bool,
    unroll: int,
):
    """Vanilla tanh RNN backward walk: h_new is read straight off the out
    stream (no gate recompute needed — tanh' = 1 - h_new^2)."""
    i = pl.program_id(0)
    n_blocks = pl.num_programs(0)
    block = (n_blocks - 1 - i) if reverse else i
    base = block * unroll

    @pl.when(i == 0)
    def _():
        dh_scr[:] = jnp.zeros_like(dh_scr)

    dh = dh_scr[:]
    lengths = len_ref[:]
    for k in range(unroll):
        kk = (unroll - 1 - k) if reverse else k
        t = base + kk
        m = (lengths > t).astype(jnp.float32)
        h_new = out_ref[kk].astype(jnp.float32)
        dhnew = m * (dh + dout_ref[kk].astype(jnp.float32))
        dpre = dhnew * (1.0 - h_new * h_new)
        dpre_ref[kk] = dpre
        dh = (
            jnp.dot(
                dpre.astype(whht_ref.dtype), whht_ref[:],
                preferred_element_type=jnp.float32,
            )
            + (1.0 - m) * dh
        )

    dh_scr[:] = dh

    @pl.when(i == n_blocks - 1)
    def _():
        dh0_ref[:] = dh


@functools.partial(jax.jit, static_argnames=("reverse", "interpret", "unroll"))
def rnn_tanh_bwd_scan(
    out, dout, lengths, w_hh,
    reverse: bool = True, interpret: bool = False, unroll: int = 1,
):
    """Vanilla RNN backward walk -> (dpre (T,B,H) f32, dh0)."""
    t_max, batch, hidden = out.shape

    unroll = max(1, min(unroll, t_max))
    t_pad = -(-t_max // unroll) * unroll
    if t_pad != t_max:
        pad = ((0, t_pad - t_max), (0, 0), (0, 0))
        out = jnp.pad(out, pad)
        dout = jnp.pad(dout, pad)
    n_blocks = t_pad // unroll

    time_ix = (
        (lambda i: (n_blocks - 1 - i, 0, 0)) if reverse else (lambda i: (i, 0, 0))
    )
    const2 = lambda i: (0, 0)  # noqa: E731

    dpre, dh0 = pl.pallas_call(
        functools.partial(
            _rnn_tanh_bwd_kernel, hidden=hidden, reverse=reverse,
            unroll=unroll,
        ),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((unroll, batch, hidden), time_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((unroll, batch, hidden), time_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((batch, 1), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, hidden), const2, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((unroll, batch, hidden), time_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((batch, hidden), const2, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((t_pad, batch, hidden), jnp.float32),
            jax.ShapeDtypeStruct((batch, hidden), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((batch, hidden), jnp.float32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(
        out,
        dout.astype(jnp.float32),
        lengths.astype(jnp.int32).reshape(batch, 1),
        w_hh.T,
    )
    return dpre[:t_max], dh0
