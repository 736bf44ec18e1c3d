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
    gx_ref,  # (1, B, 3H) float32 — x @ w_ih + b_ih at this timestep
    len_ref,  # (B, 1) int32 — sequence lengths
    whh_ref,  # (H, 3H) weights dtype
    bhh_ref,  # (1, 3H) float32
    h0_ref,  # (B, H) float32
    out_ref,  # (1, B, H) float32
    hlast_ref,  # (B, H) float32
    h_scr,  # (B, H) float32 VMEM scratch — the carried hidden state
    *,
    hidden: int,
    reverse: bool,
):
    i = pl.program_id(0)
    t_max = pl.num_programs(0)
    t = (t_max - 1 - i) if reverse else i

    @pl.when(i == 0)
    def _():
        h_scr[:] = h0_ref[:]

    h = h_scr[:]
    gh = (
        jnp.dot(
            h.astype(whh_ref.dtype), whh_ref[:],
            preferred_element_type=jnp.float32,
        )
        + bhh_ref[:]
    )
    gx = gx_ref[0]
    r = jax.nn.sigmoid(gx[:, :hidden] + gh[:, :hidden])
    z = jax.nn.sigmoid(gx[:, hidden : 2 * hidden] + gh[:, hidden : 2 * hidden])
    n = jnp.tanh(gx[:, 2 * hidden :] + r * gh[:, 2 * hidden :])
    h_new = (1.0 - z) * n + z * h

    m = (len_ref[:] > t).astype(jnp.float32)  # (B, 1)
    h_next = m * h_new + (1.0 - m) * h
    h_scr[:] = h_next
    out_ref[0] = h_new * m  # padded positions emit exact zeros

    @pl.when(i == t_max - 1)
    def _():
        hlast_ref[:] = h_next


def backend_supports_mosaic() -> bool:
    """True when the default backend compiles Pallas TPU kernels natively."""
    try:
        platform = jax.devices()[0].platform
    except Exception:
        return False
    return platform in ("tpu", "axon")


@functools.partial(jax.jit, static_argnames=("reverse", "interpret"))
def gru_scan(
    gx: jnp.ndarray,  # (T, B, 3H) float32 — precomputed input projection
    lengths: jnp.ndarray,  # (B,) int32
    w_hh: jnp.ndarray,  # (H, 3H)
    b_hh: jnp.ndarray,  # (3H,)
    h0: jnp.ndarray,  # (B, H) float32
    reverse: bool = False,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Run the GRU recurrence over precomputed gates.

    Returns (out, h_last): out is (T, B, H) float32 in natural time order
    with positions past each row's length zeroed; h_last is the hidden
    state after the last grid step (for ``reverse=False`` this is the
    packed-semantics final state; for ``reverse=True`` it is the state at
    t=0, matching torch's bidirectional h_n for the backward direction).
    """
    t_max, batch, g3 = gx.shape
    hidden = w_hh.shape[0]
    assert g3 == 3 * hidden

    time_ix = (lambda t: (t_max - 1 - t, 0, 0)) if reverse else (lambda t: (t, 0, 0))

    out, h_last = pl.pallas_call(
        functools.partial(_gru_step_kernel, hidden=hidden, reverse=reverse),
        grid=(t_max,),
        in_specs=[
            pl.BlockSpec((1, batch, 3 * hidden), time_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((batch, 1), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, 3 * hidden), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * hidden), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((batch, hidden), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, batch, hidden), time_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((batch, hidden), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((t_max, batch, hidden), jnp.float32),
            jax.ShapeDtypeStruct((batch, hidden), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((batch, hidden), jnp.float32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),  # sequential: h carried in scratch
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * t_max * batch * hidden * 3 * hidden,
            bytes_accessed=(
                gx.size * 4 + w_hh.size * w_hh.dtype.itemsize
                + t_max * batch * hidden * 4
            ),
            transcendentals=3 * t_max * batch * hidden,
        ),
    )(
        gx.astype(jnp.float32),
        lengths.astype(jnp.int32).reshape(batch, 1),
        w_hh,
        b_hh.astype(jnp.float32).reshape(1, 3 * hidden),
        h0.astype(jnp.float32),
    )
    return out, h_last
