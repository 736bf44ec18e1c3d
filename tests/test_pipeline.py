"""Pipeline-parallel inference (parallel/pipeline.py): layer stages on
separate devices, microbatched GPipe flow, exact equality with the
single-device engine.

Runs on the conftest-forced 8-device virtual CPU mesh; the reference has
no distributed layer at all (SURVEY §2.5).
"""

import numpy as np
import pytest

import jax

from danspeech_tpu.decode.greedy import GreedyDecoder
from danspeech_tpu.engine import DanSpeechRecognizer
from danspeech_tpu.models import DeepSpeechModel
from danspeech_tpu.models.config import DeepSpeechConfig
from danspeech_tpu.parallel.pipeline import (
    PipelinedTranscriber,
    partition_layers,
)

from test_model_parity import randomize_bn


def test_partition_layers_even_and_uneven():
    assert [list(r) for r in partition_layers(9, 3)] == [
        [0, 1, 2], [3, 4, 5], [6, 7, 8]
    ]
    parts = partition_layers(9, 4)
    assert [len(r) for r in parts] == [2, 3, 2, 2]  # extras to the middle
    assert [i for r in parts for i in r] == list(range(9))
    parts = partition_layers(5, 5)
    assert [len(r) for r in parts] == [1] * 5
    with pytest.raises(ValueError):
        partition_layers(3, 4)


@pytest.fixture(scope="module")
def model():
    config = DeepSpeechConfig(
        model_name="pp-test", rnn_hidden_size=64, rnn_layers=4, conv_layers=2
    )
    m = DeepSpeechModel.init_random(config, seed=17)
    m.params = randomize_bn(m.params, seed=18)
    return m


@pytest.fixture(scope="module")
def waves():
    rng = np.random.default_rng(5)
    return [
        (rng.normal(size=n) * 1500).astype(np.float32)
        for n in (9000, 15000, 12000, 16000, 8000, 14000, 11000)
    ]


def test_pipeline_matches_single_device(model, waves):
    eng = DanSpeechRecognizer(model_name=model)
    singles = eng.transcribe_batch(waves)

    pp = PipelinedTranscriber(model, n_stages=4, micro_batch=3)
    assert len({d.id for d in pp.devices}) == 4  # four distinct devices
    decoder = GreedyDecoder(labels=model.labels,
                            blank_index=model.labels.index("_"))
    out = pp.transcribe(waves, decoder)
    assert out == singles


def test_pipeline_stage_params_are_placed(model):
    pp = PipelinedTranscriber(model, n_stages=2, micro_batch=4)
    for s, piece in enumerate(pp._stage_params):
        leaves = jax.tree_util.tree_leaves(piece)
        assert all(
            list(leaf.devices())[0] == pp.devices[s] for leaf in leaves
        )
    # conv only on stage 0, head only on the last
    assert "conv" in pp._stage_params[0]
    assert "fc" in pp._stage_params[-1]
    assert "conv" not in pp._stage_params[-1]


def test_pipeline_unidirectional_lookahead(waves):
    config = DeepSpeechConfig(
        model_name="pp-uni", rnn_hidden_size=64, rnn_layers=3,
        conv_layers=2, bidirectional=False, context=20,
    )
    m = DeepSpeechModel.init_random(config, seed=21)
    m.params = randomize_bn(m.params, seed=22)
    eng = DanSpeechRecognizer(model_name=m)
    singles = eng.transcribe_batch(waves[:4])
    pp = PipelinedTranscriber(m, n_stages=3, micro_batch=2)
    decoder = GreedyDecoder(labels=m.labels, blank_index=m.labels.index("_"))
    assert pp.transcribe(waves[:4], decoder) == singles


def test_pipeline_remainder_microbatch_padded(model, waves):
    """The final microbatch pads to micro_batch rows (one compiled
    program per stage per shape) and pad rows are sliced off."""
    pp = PipelinedTranscriber(model, n_stages=2, micro_batch=4)
    probs, lens = pp.acoustic_probs(waves[:5])  # 4 + 1-row remainder
    assert probs.shape[0] == 5 and lens.shape[0] == 5
    probs7, lens7 = pp.acoustic_probs(waves)  # 4 + 3 remainder
    np.testing.assert_allclose(probs7[:5], probs, rtol=0, atol=1e-5)

    empty_p, empty_l = pp.acoustic_probs([])
    assert empty_p.shape[0] == 0 and empty_l.shape[0] == 0
