"""Gradient parity of the Mosaic GRU backward (pallas_gru.gru_bwd_scan +
custom-VJP wrappers in ops/rnn.py) against the lax.scan autodiff path.

Runs in interpreter mode on the CPU suite backend, like test_pallas_gru.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from danspeech_tpu.ops import rnn as rnn_ops


def make_weights(rng, d_in, hidden, scale=0.3):
    def mat(*shape):
        return jnp.asarray(rng.normal(size=shape).astype(np.float32) * scale)

    return rnn_ops.GRUWeights(
        w_ih=mat(d_in, 3 * hidden),
        w_hh=mat(hidden, 3 * hidden),
        b_ih=mat(3 * hidden),
        b_hh=mat(3 * hidden),
    )


def loss_through(impl, x, lengths, fwd, bwd, r_out, r_hl,
                 sum_directions=True):
    def f(x, fwd, bwd):
        out, hl = rnn_ops.gru_layer(
            x, lengths, fwd, bwd, sum_directions=sum_directions, impl=impl
        )
        return jnp.sum(out * r_out) + jnp.sum(hl * r_hl)

    return f


@pytest.mark.parametrize("lens", [[13, 13, 13], [13, 7, 4]])
def test_bidi_grads_match_xla(lens):
    rng = np.random.default_rng(0)
    t, b, d_in, hidden = 13, 3, 10, 8
    x = jnp.asarray(rng.normal(size=(t, b, d_in)).astype(np.float32))
    lengths = jnp.asarray(lens, jnp.int32)
    fwd = make_weights(rng, d_in, hidden)
    bwd = make_weights(rng, d_in, hidden)
    r_out = jnp.asarray(rng.normal(size=(t, b, hidden)).astype(np.float32))
    r_hl = jnp.asarray(rng.normal(size=(2, b, hidden)).astype(np.float32))

    g_ref = jax.grad(
        loss_through("xla", x, lengths, fwd, bwd, r_out, r_hl),
        argnums=(0, 1, 2),
    )(x, fwd, bwd)
    g_pal = jax.grad(
        loss_through("pallas", x, lengths, fwd, bwd, r_out, r_hl),
        argnums=(0, 1, 2),
    )(x, fwd, bwd)

    for ref, got in zip(jax.tree_util.tree_leaves(g_ref),
                        jax.tree_util.tree_leaves(g_pal)):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4
        )


def test_uni_grads_match_xla():
    rng = np.random.default_rng(1)
    t, b, d_in, hidden = 11, 2, 6, 8
    x = jnp.asarray(rng.normal(size=(t, b, d_in)).astype(np.float32))
    lengths = jnp.asarray([11, 5], jnp.int32)
    fwd = make_weights(rng, d_in, hidden)
    r_out = jnp.asarray(rng.normal(size=(t, b, hidden)).astype(np.float32))
    r_hl = jnp.asarray(rng.normal(size=(1, b, hidden)).astype(np.float32))

    def f(impl):
        def g(x, fwd):
            out, hl = rnn_ops.gru_layer(x, lengths, fwd, None, impl=impl)
            return jnp.sum(out * r_out) + jnp.sum(hl * r_hl)

        return g

    g_ref = jax.grad(f("xla"), argnums=(0, 1))(x, fwd)
    g_pal = jax.grad(f("pallas"), argnums=(0, 1))(x, fwd)
    for ref, got in zip(jax.tree_util.tree_leaves(g_ref),
                        jax.tree_util.tree_leaves(g_pal)):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4
        )


def test_pallas_forward_values_unchanged_by_vjp_wrapper():
    """The custom-VJP routing must not change forward values."""
    rng = np.random.default_rng(2)
    t, b, d_in, hidden = 9, 2, 5, 8
    x = jnp.asarray(rng.normal(size=(t, b, d_in)).astype(np.float32))
    lengths = jnp.asarray([9, 6], jnp.int32)
    fwd = make_weights(rng, d_in, hidden)
    bwd = make_weights(rng, d_in, hidden)
    out_x, hl_x = rnn_ops.gru_layer(x, lengths, fwd, bwd, impl="xla")
    out_p, hl_p = rnn_ops.gru_layer(x, lengths, fwd, bwd, impl="pallas")
    np.testing.assert_allclose(
        np.asarray(out_p), np.asarray(out_x), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(hl_p), np.asarray(hl_x), rtol=1e-5, atol=1e-5
    )


@pytest.mark.parametrize("sum_directions", [True, False])
def test_lstm_grads_match_xla(sum_directions):
    rng = np.random.default_rng(4)
    t, b, d_in, hidden = 12, 3, 7, 8
    x = jnp.asarray(rng.normal(size=(t, b, d_in)).astype(np.float32))
    lengths = jnp.asarray([12, 9, 5], jnp.int32)

    def lstm_w():
        return rnn_ops.LSTMWeights(
            w_ih=jnp.asarray(rng.normal(size=(d_in, 4 * hidden)).astype(np.float32) * 0.3),
            w_hh=jnp.asarray(rng.normal(size=(hidden, 4 * hidden)).astype(np.float32) * 0.3),
            b_ih=jnp.asarray(rng.normal(size=4 * hidden).astype(np.float32) * 0.3),
            b_hh=jnp.asarray(rng.normal(size=4 * hidden).astype(np.float32) * 0.3),
        )

    fwd, bwd = lstm_w(), lstm_w()
    width = hidden if sum_directions else 2 * hidden
    r_out = jnp.asarray(rng.normal(size=(t, b, width)).astype(np.float32))

    def f(impl):
        def g(x, fwd, bwd):
            out = rnn_ops.lstm_layer(
                x, lengths, fwd, bwd,
                sum_directions=sum_directions, impl=impl,
            )
            return jnp.sum(out * r_out)

        return g

    g_ref = jax.grad(f("xla"), argnums=(0, 1, 2))(x, fwd, bwd)
    g_pal = jax.grad(f("pallas"), argnums=(0, 1, 2))(x, fwd, bwd)
    for ref, got in zip(jax.tree_util.tree_leaves(g_ref),
                        jax.tree_util.tree_leaves(g_pal)):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4
        )


def test_rnn_tanh_grads_match_xla():
    rng = np.random.default_rng(5)
    t, b, d_in, hidden = 10, 2, 5, 8
    x = jnp.asarray(rng.normal(size=(t, b, d_in)).astype(np.float32))
    lengths = jnp.asarray([10, 6], jnp.int32)

    def rnn_w():
        return rnn_ops.RNNWeights(
            w_ih=jnp.asarray(rng.normal(size=(d_in, hidden)).astype(np.float32) * 0.3),
            w_hh=jnp.asarray(rng.normal(size=(hidden, hidden)).astype(np.float32) * 0.3),
            b_ih=jnp.asarray(rng.normal(size=hidden).astype(np.float32) * 0.3),
            b_hh=jnp.asarray(rng.normal(size=hidden).astype(np.float32) * 0.3),
        )

    fwd, bwd = rnn_w(), rnn_w()
    r_out = jnp.asarray(rng.normal(size=(t, b, hidden)).astype(np.float32))

    def f(impl):
        def g(x, fwd, bwd):
            out = rnn_ops.rnn_tanh_layer(x, lengths, fwd, bwd, impl=impl)
            return jnp.sum(out * r_out)

        return g

    g_ref = jax.grad(f("xla"), argnums=(0, 1, 2))(x, fwd, bwd)
    g_pal = jax.grad(f("pallas"), argnums=(0, 1, 2))(x, fwd, bwd)
    for ref, got in zip(jax.tree_util.tree_leaves(g_ref),
                        jax.tree_util.tree_leaves(g_pal)):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4
        )


def test_train_step_grads_pallas_vs_xla():
    """Full model loss gradients agree between the recurrence engines —
    the property that lets training run the Mosaic kernels on TPU."""
    from danspeech_tpu.models import deepspeech as ds
    from danspeech_tpu.models.config import DeepSpeechConfig
    from danspeech_tpu.train.ctc import mean_ctc_loss

    config = DeepSpeechConfig(
        model_name="grad-parity", rnn_hidden_size=16, rnn_layers=2,
        conv_layers=1,
    )
    params = ds.init_params(config, seed=0)
    rng = np.random.default_rng(3)
    spect = jnp.asarray(rng.normal(size=(2, 1, 161, 30)).astype(np.float32))
    frame_lens = jnp.asarray([30, 22], jnp.int32)
    labels = jnp.asarray(rng.integers(1, 33, (2, 5)).astype(np.int32))
    label_lens = jnp.asarray([5, 3], jnp.int32)

    def loss(params, impl):
        logits, out_lens = ds.forward(
            params, config, spect, frame_lens, softmax=False, rnn_impl=impl
        )
        return mean_ctc_loss(
            logits, out_lens, labels, label_lens, blank_id=0
        )

    g_ref = jax.grad(lambda p: loss(p, "xla"))(params)
    g_pal = jax.grad(lambda p: loss(p, "pallas"))(params)
    for ref, got in zip(jax.tree_util.tree_leaves(g_ref),
                        jax.tree_util.tree_leaves(g_pal)):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=5e-4, atol=5e-4
        )
