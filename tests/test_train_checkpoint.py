"""Train-state checkpoint/resume round trip (orbax)."""

import numpy as np
import jax
import jax.numpy as jnp

from danspeech_tpu.models.config import DeepSpeechConfig
from danspeech_tpu.train.checkpoint import (
    latest_step,
    restore_train_state,
    save_train_state,
)
from danspeech_tpu.train.step import init_train_state, make_optimizer


def small_config():
    return DeepSpeechConfig(
        model_name="ckpt-test", rnn_hidden_size=32, rnn_layers=2, conv_layers=2
    )


def test_save_restore_roundtrip(tmp_path):
    opt = make_optimizer(1e-3)
    state = init_train_state(small_config(), opt, seed=0)

    save_train_state(str(tmp_path), state, step=7)
    save_train_state(str(tmp_path), state, step=12)
    assert latest_step(str(tmp_path)) == 12

    template = init_train_state(small_config(), opt, seed=1)  # different values
    restored, step = restore_train_state(str(tmp_path), template)
    assert step == 12

    for a, b in zip(
        jax.tree_util.tree_leaves(state), jax.tree_util.tree_leaves(restored)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_restore_specific_step(tmp_path):
    opt = make_optimizer(1e-3)
    s0 = init_train_state(small_config(), opt, seed=0)
    s1 = init_train_state(small_config(), opt, seed=1)
    save_train_state(str(tmp_path), s0, step=1)
    save_train_state(str(tmp_path), s1, step=2)

    restored, step = restore_train_state(str(tmp_path), s0, step=1)
    assert step == 1
    a = jax.tree_util.tree_leaves(s0)[2]
    b = jax.tree_util.tree_leaves(restored)[2]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
