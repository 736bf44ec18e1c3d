"""CTC loss parity vs torch + training-step smoke tests."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from danspeech_tpu.models.config import DeepSpeechConfig
from danspeech_tpu.train.ctc import ctc_loss, mean_ctc_loss
from danspeech_tpu.train.step import (
    freeze_mask,
    init_train_state,
    make_optimizer,
    make_train_step,
)


def test_ctc_loss_matches_torch():
    rng = np.random.default_rng(0)
    b, t, c, n = 4, 30, 12, 8
    logits = rng.normal(size=(b, t, c)).astype(np.float32)
    logit_lens = np.array([30, 25, 22, 30])
    labels = rng.integers(1, c, size=(b, n)).astype(np.int32)
    label_lens = np.array([8, 5, 3, 1])
    # avoid adjacent repeats having pathological paths? CTC handles them; keep as-is

    ours = np.asarray(
        ctc_loss(
            jnp.asarray(logits),
            jnp.asarray(logit_lens),
            jnp.asarray(labels),
            jnp.asarray(label_lens),
            blank_id=0,
        )
    )

    ref = (
        F.ctc_loss(
            torch.tensor(logits).log_softmax(-1).transpose(0, 1),  # (T, B, C)
            torch.tensor(labels.astype(np.int64)),
            torch.tensor(logit_lens),
            torch.tensor(label_lens),
            blank=0,
            reduction="none",
        )
        .numpy()
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_ctc_loss_grad_finite():
    rng = np.random.default_rng(1)
    b, t, c, n = 2, 20, 8, 5
    logits = jnp.asarray(rng.normal(size=(b, t, c)).astype(np.float32))
    labels = jnp.asarray(rng.integers(1, c, size=(b, n)).astype(np.int32))

    def f(lg):
        return mean_ctc_loss(
            lg, jnp.array([20, 16]), labels, jnp.array([5, 3]), blank_id=0
        )

    g = jax.grad(f)(logits)
    assert np.isfinite(np.asarray(g)).all()


def test_train_step_reduces_loss():
    config = DeepSpeechConfig(
        model_name="train-smoke", rnn_hidden_size=32, rnn_layers=1, conv_layers=1
    )
    opt = make_optimizer(1e-3)
    state = init_train_state(config, opt, seed=0)
    step = jax.jit(make_train_step(config, opt))

    rng = np.random.default_rng(2)
    spect = jnp.asarray(rng.normal(size=(2, 1, 161, 40)).astype(np.float32))
    frame_lens = jnp.array([40, 32])
    labels = jnp.asarray(rng.integers(1, config.num_classes, size=(2, 6)).astype(np.int32))
    label_lens = jnp.array([6, 4])

    losses = []
    for _ in range(8):
        state, loss = step(state, spect, frame_lens, labels, label_lens)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert int(state.step) == 8


def test_freeze_mask_blocks_updates():
    config = DeepSpeechConfig(
        model_name="freeze-smoke", rnn_hidden_size=32, rnn_layers=2, conv_layers=1
    )
    opt = make_optimizer(1e-2)
    state = init_train_state(config, opt, seed=0)
    mask = freeze_mask(state.params, 2, config)  # conv + rnn layer 0 frozen
    step = jax.jit(make_train_step(config, opt, frozen_mask=mask))

    rng = np.random.default_rng(3)
    spect = jnp.asarray(rng.normal(size=(1, 1, 161, 30)).astype(np.float32))
    new_state, _ = step(
        state,
        spect,
        jnp.array([30]),
        jnp.asarray(rng.integers(1, 33, size=(1, 4)).astype(np.int32)),
        jnp.array([4]),
    )
    # frozen: conv block 0 and rnn layer 0 unchanged
    np.testing.assert_array_equal(
        np.asarray(new_state.params["conv"][0].weight),
        np.asarray(state.params["conv"][0].weight),
    )
    np.testing.assert_array_equal(
        np.asarray(new_state.params["rnns"][0]["fwd"].w_ih),
        np.asarray(state.params["rnns"][0]["fwd"].w_ih),
    )
    # trainable: rnn layer 1 and fc changed
    assert not np.allclose(
        np.asarray(new_state.params["rnns"][1]["fwd"].w_ih),
        np.asarray(state.params["rnns"][1]["fwd"].w_ih),
    )
    from danspeech_tpu.errors import FreezingMoreLayersThanExist

    with pytest.raises(FreezingMoreLayersThanExist):
        freeze_mask(state.params, 10, config)


def test_optimizer_anneal_schedule():
    """anneal=1.1 with steps_per_epoch halves... rather divides the LR by
    1.1 after each epoch boundary (staircase), like the reference
    training repo's per-epoch anneal."""
    import optax

    from danspeech_tpu.train.step import make_optimizer

    opt = make_optimizer(learning_rate=1e-3, anneal=1.1, steps_per_epoch=10)
    assert isinstance(opt, optax.GradientTransformation)
    sched = optax.exponential_decay(1e-3, 10, 1 / 1.1, staircase=True)
    assert np.isclose(sched(0), 1e-3)
    assert np.isclose(sched(9), 1e-3)
    assert np.isclose(sched(10), 1e-3 / 1.1)
    assert np.isclose(sched(25), 1e-3 / 1.1**2)

    with pytest.raises(ValueError, match="steps_per_epoch"):
        make_optimizer(anneal=1.1)
