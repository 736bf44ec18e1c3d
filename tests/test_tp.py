"""Explicit gate-aligned tensor parallelism (parallel/tp.py) vs the
single-device forward, on the CPU-simulated 8-device mesh.

VERDICT r1 item 3: the direction-parallel mode runs the Pallas recurrence
kernel (interpret branch on CPU) inside shard_map with TP-sharded weights;
the hidden-sharded mode checks the gate-aligned layout + one-all_gather-
per-step recurrence for 2- and 4-way sharding, bidirectional and
unidirectional (lookahead) models.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from danspeech_tpu.models import deepspeech as ds
from danspeech_tpu.models.config import DeepSpeechConfig
from danspeech_tpu.parallel.mesh import make_mesh
from danspeech_tpu.parallel.tp import pack_tp_params, tp_forward

from test_model_parity import make_inputs, randomize_bn


def _run_case(kw, n_model, mode, seed=0, atol=2e-5):
    config = DeepSpeechConfig(model_name=f"tp-{mode}-{n_model}", **kw)
    params = randomize_bn(ds.init_params(config, seed=seed), seed=seed + 1)
    x, lengths = make_inputs(config, batch=2, tmax=40)
    x, lengths = jnp.asarray(x), jnp.asarray(lengths)

    ref_probs, ref_lens = ds.forward(params, config, x, lengths)

    mesh = make_mesh(n_data=8 // n_model, n_model=n_model)
    tp_params = params if mode == "direction" else pack_tp_params(params, n_model)
    tp_probs, tp_lens = tp_forward(
        tp_params, config, x, lengths, mesh, axis="model", mode=mode
    )

    np.testing.assert_array_equal(np.asarray(tp_lens), np.asarray(ref_lens))
    ref_probs, tp_probs = np.asarray(ref_probs), np.asarray(tp_probs)
    for i, ln in enumerate(np.asarray(ref_lens)):
        np.testing.assert_allclose(
            tp_probs[i, :ln], ref_probs[i, :ln], atol=atol, rtol=1e-4
        )


def test_direction_parallel_pallas_bidi():
    """2-way direction parallelism: full local Pallas recurrences (the
    interpret branch on CPU) with one psum per layer."""
    _run_case(
        dict(rnn_hidden_size=64, rnn_layers=2, conv_layers=2, bidirectional=True),
        n_model=2,
        mode="direction",
    )


@pytest.mark.parametrize("n_model", [2, 4])
def test_hidden_sharded_bidi(n_model):
    _run_case(
        dict(rnn_hidden_size=64, rnn_layers=2, conv_layers=2, bidirectional=True),
        n_model=n_model,
        mode="hidden",
    )


def test_hidden_sharded_uni_lookahead():
    _run_case(
        dict(
            rnn_hidden_size=64,
            rnn_layers=2,
            conv_layers=2,
            bidirectional=False,
            context=20,
        ),
        n_model=4,
        mode="hidden",
    )


def test_auto_mode_picks_direction_for_2way_bidi():
    config = DeepSpeechConfig(
        model_name="tp-auto", rnn_hidden_size=64, rnn_layers=2, conv_layers=2
    )
    params = randomize_bn(ds.init_params(config, seed=3), seed=4)
    x, lengths = make_inputs(config, batch=2, tmax=30)
    mesh = make_mesh(n_data=4, n_model=2)
    probs, lens = tp_forward(
        params, config, jnp.asarray(x), jnp.asarray(lengths), mesh, axis="model"
    )
    ref, ref_lens = ds.forward(params, config, jnp.asarray(x), jnp.asarray(lengths))
    for i, ln in enumerate(np.asarray(ref_lens)):
        np.testing.assert_allclose(
            np.asarray(probs)[i, :ln], np.asarray(ref)[i, :ln], atol=2e-5, rtol=1e-4
        )
