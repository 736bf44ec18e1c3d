"""Pallas GRU scan kernel vs the lax.scan reference path.

Runs in interpreter mode on the CPU mesh (conftest forces cpu); the Mosaic
compile path is exercised on real TPU by bench.py and the driver checks.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from danspeech_tpu.ops import rnn as rnn_ops


def make_weights(rng, i, h, dtype=np.float32):
    def u(shape):
        return jnp.asarray(rng.uniform(-0.2, 0.2, size=shape).astype(dtype))

    return rnn_ops.GRUWeights(
        w_ih=u((i, 3 * h)), w_hh=u((h, 3 * h)), b_ih=u((3 * h,)), b_hh=u((3 * h,))
    )


@pytest.mark.parametrize("bidi", [False, True])
def test_pallas_matches_scan(bidi):
    rng = np.random.default_rng(0)
    t, b, i, h = 17, 5, 12, 16
    x = jnp.asarray(rng.normal(size=(t, b, i)).astype(np.float32))
    lengths = jnp.asarray(np.array([17, 13, 9, 17, 1], np.int32))
    fwd = make_weights(rng, i, h)
    bwd = make_weights(rng, i, h) if bidi else None

    out_ref, hl_ref = rnn_ops.gru_layer(x, lengths, fwd, bwd, impl="xla")
    out_pl, hl_pl = rnn_ops.gru_layer(x, lengths, fwd, bwd, impl="pallas")

    np.testing.assert_allclose(out_pl, out_ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(hl_pl, hl_ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("bidi", [False, True])
def test_pallas_bf16_streaming_close_to_f32(bidi):
    """bfloat16 weights stream gx/out in bf16 through the kernel (half the
    HBM traffic); gate math stays f32, so results track the f32 XLA path
    within bf16 rounding."""
    rng = np.random.default_rng(3)
    t, b, i, h = 17, 5, 12, 16
    x = jnp.asarray(rng.normal(size=(t, b, i)).astype(np.float32))
    lengths = jnp.asarray(np.array([17, 13, 9, 17, 1], np.int32))
    fwd32 = make_weights(rng, i, h)
    bwd32 = make_weights(rng, i, h) if bidi else None
    cast = lambda w: rnn_ops.GRUWeights(  # noqa: E731
        w_ih=w.w_ih.astype(jnp.bfloat16),
        w_hh=w.w_hh.astype(jnp.bfloat16),
        b_ih=w.b_ih,
        b_hh=w.b_hh,
    )
    fwd16 = cast(fwd32)
    bwd16 = cast(bwd32) if bidi else None

    out_ref, hl_ref = rnn_ops.gru_layer(x, lengths, fwd32, bwd32, impl="xla")
    out_pl, hl_pl = rnn_ops.gru_layer(x, lengths, fwd16, bwd16, impl="pallas")

    assert out_pl.dtype == jnp.float32  # caller-facing dtype is unchanged
    np.testing.assert_allclose(out_pl, out_ref, rtol=0.05, atol=0.05)
    np.testing.assert_allclose(hl_pl, hl_ref, rtol=0.05, atol=0.05)
    # padding mask stays exact in bf16
    out = np.asarray(out_pl)
    for row, ln in enumerate([17, 13, 9, 17, 1]):
        assert np.all(out[ln:, row] == 0.0)


def test_pallas_masking_zeroes_padding():
    rng = np.random.default_rng(1)
    t, b, i, h = 11, 3, 8, 8
    x = jnp.asarray(rng.normal(size=(t, b, i)).astype(np.float32))
    lengths = jnp.asarray(np.array([11, 6, 2], np.int32))
    fwd = make_weights(rng, i, h)
    bwd = make_weights(rng, i, h)
    out, _ = rnn_ops.gru_layer(x, lengths, fwd, bwd, impl="pallas")
    out = np.asarray(out)
    for row, ln in enumerate([11, 6, 2]):
        assert np.all(out[ln:, row] == 0.0)
        assert np.any(out[ln - 1, row] != 0.0)


def test_pallas_carried_state():
    """Chunked calls with carried h must equal one full-length call
    (unidirectional streaming semantics)."""
    rng = np.random.default_rng(2)
    t, b, i, h = 12, 2, 8, 8
    x = jnp.asarray(rng.normal(size=(t, b, i)).astype(np.float32))
    lengths = jnp.asarray(np.array([t, t], np.int32))
    fwd = make_weights(rng, i, h)

    full, hl = rnn_ops.gru_layer(x, lengths, fwd, impl="pallas")

    half = t // 2
    l_half = jnp.asarray(np.array([half, half], np.int32))
    o1, h1 = rnn_ops.gru_layer(x[:half], l_half, fwd, impl="pallas")
    o2, h2 = rnn_ops.gru_layer(x[half:], l_half, fwd, h0=h1, impl="pallas")
    np.testing.assert_allclose(
        np.concatenate([o1, o2]), full, rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(h2, hl, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("unroll", [1, 4])
def test_fused_bidi_matches_split(unroll):
    """gru_scan_bidi_fused (projection in-kernel, lookahead grid) ==
    einsum + gru_scan_bidi, including a T not divisible by the unroll."""
    from danspeech_tpu.ops.pallas_gru import gru_scan_bidi, gru_scan_bidi_fused

    rng = np.random.default_rng(3)
    t, b, i, h = 19, 4, 24, 16
    x = jnp.asarray(rng.normal(size=(t, b, i)).astype(np.float32))
    lengths = jnp.asarray(np.array([19, 11, 6, 2], np.int32))
    fwd = make_weights(rng, i, h)
    bwd = make_weights(rng, i, h)
    h0 = jnp.zeros((b, h), jnp.float32)

    gx_f = jnp.einsum("tbi,ik->tbk", x, fwd.w_ih)
    gx_b = jnp.einsum("tbi,ik->tbk", x, bwd.w_ih)
    ref = gru_scan_bidi(
        gx_f, gx_b, lengths, fwd.w_hh, bwd.w_hh, fwd.b_hh, bwd.b_hh,
        h0, h0, interpret=True, b_ih_f=fwd.b_ih, b_ih_b=bwd.b_ih,
    )
    got = gru_scan_bidi_fused(
        x, lengths, fwd.w_ih, bwd.w_ih, fwd.w_hh, bwd.w_hh,
        fwd.b_ih, bwd.b_ih, fwd.b_hh, bwd.b_hh, h0, h0,
        interpret=True, unroll=unroll,
    )
    for a, r in zip(got, ref):
        np.testing.assert_allclose(a, r, rtol=1e-5, atol=1e-5)
