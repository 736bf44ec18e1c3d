"""Streaming chunk-step parity against a torch replica.

Rebuilds the reference streaming semantics (MaskConvStream model.py:156-201,
BatchRNNStream :204-237, LookaheadStream :240-284) with torch functional ops
and python-held state, then checks our jitted state-pytree step produces the
same outputs chunk-for-chunk — including the reference quirks (per-chunk
(20,5) conv padding on top of manual pads/caches, elif first/last padding,
first-chunk dummy output).
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from danspeech_tpu.models import deepspeech as ds
from danspeech_tpu.models.config import CONV_SPECS, DeepSpeechConfig
from danspeech_tpu.models.streaming import init_stream_state, streaming_step

from test_model_parity import randomize_bn, t


class TorchStreamingReplica:
    """Stateful reference-semantics streaming forward in torch (eval)."""

    def __init__(self, params, config):
        self.params = params
        self.config = config
        self.left_1 = None
        self.left_2 = None
        self.hidden = [None] * config.rnn_layers
        self.la_buffer = None

    def conv_block(self, x, p, spec):
        x = F.conv2d(x, t(p.weight), t(p.bias), stride=spec["stride"], padding=spec["padding"])
        x = F.batch_norm(x, t(p.bn_mean), t(p.bn_var), t(p.bn_gamma), t(p.bn_beta), False, 0.0, 1e-5)
        return F.hardtanh(x, 0, 20)

    def step(self, chunk, is_first, is_last):
        x = torch.tensor(chunk, dtype=torch.float32)[None, None]

        # conv1 (i == 0)
        if is_first:
            x = F.pad(x, (5, 0))
        elif is_last:
            x = F.pad(x, (0, 5))
        if not is_first:
            x = torch.cat([self.left_1, x], dim=3)
        if not is_last:
            self.left_1 = x[:, :, :, -10:]
        x = self.conv_block(x, self.params["conv"][0], CONV_SPECS[0])

        # conv2 (i == 3)
        if is_first:
            x = F.pad(x, (5, 0))
        elif is_last:
            x = F.pad(x, (0, 5))
        if not is_first:
            x = torch.cat([self.left_2, x], dim=3)
        if not is_last:
            self.left_2 = x[:, :, :, -10:]
        x = self.conv_block(x, self.params["conv"][1], CONV_SPECS[1])

        n, c, f, tt = x.shape
        x = x.view(n, c * f, tt).transpose(1, 2).transpose(0, 1).contiguous()

        for k, entry in enumerate(self.params["rnns"]):
            if entry["bn"] is not None:
                bn = entry["bn"]
                tlen, nb = x.shape[0], x.shape[1]
                flat = x.reshape(tlen * nb, -1)
                flat = F.batch_norm(flat, t(bn.mean), t(bn.var), t(bn.gamma), t(bn.beta), False, 0.0, 1e-5)
                x = flat.reshape(tlen, nb, -1)
            rnn = torch.nn.GRU(
                input_size=entry["fwd"].w_ih.shape[0],
                hidden_size=self.config.rnn_hidden_size,
                bias=True,
            )
            with torch.no_grad():
                rnn.weight_ih_l0.copy_(t(entry["fwd"].w_ih).T)
                rnn.weight_hh_l0.copy_(t(entry["fwd"].w_hh).T)
                rnn.bias_ih_l0.copy_(t(entry["fwd"].b_ih))
                rnn.bias_hh_l0.copy_(t(entry["fwd"].b_hh))
            rnn.eval()
            if self.hidden[k] is None:
                x, h = rnn(x)
            else:
                x, h = rnn(x, self.hidden[k])
            self.hidden[k] = h
            if is_last:
                self.hidden[k] = None

        # lookahead stream
        if self.la_buffer is None or is_first:
            self.la_buffer = x
            return None
        out = torch.cat([self.la_buffer, x], dim=0)
        context = self.config.context
        self.la_buffer = x[-(context - 1):, :, :]
        out = out.transpose(0, 1).transpose(1, 2)
        if is_last:
            out = F.pad(out, (0, context - 1))
        w = t(self.params["lookahead"].weight).unsqueeze(1)
        out = F.conv1d(out, w, groups=w.shape[0])
        out = out.transpose(1, 2).transpose(0, 1).contiguous()
        out = F.hardtanh(out, 0, 20)
        if is_last:
            self.la_buffer = None

        bn = self.params["fc_bn"]
        tlen, nb = out.shape[0], out.shape[1]
        flat = out.reshape(tlen * nb, -1)
        flat = F.batch_norm(flat, t(bn.mean), t(bn.var), t(bn.gamma), t(bn.beta), False, 0.0, 1e-5)
        flat = F.linear(flat, t(self.params["fc"].weight), None)
        out = flat.view(tlen, nb, -1).transpose(0, 1)
        return F.softmax(out, dim=-1).detach().numpy()


@pytest.fixture(scope="module")
def stream_model():
    config = DeepSpeechConfig(
        model_name="stream-test",
        rnn_type="gru",
        bidirectional=False,
        streaming_model=True,
        conv_layers=2,
        rnn_hidden_size=64,
        rnn_layers=2,
        context=20,
    )
    params = randomize_bn(ds.init_params(config, seed=21), seed=22)
    return config, params


def chunk_spectrograms(config, n_chunks=5, frames_per_chunk=41, seed=4):
    rng = np.random.default_rng(seed)
    return [
        rng.normal(size=(config.n_freq, frames_per_chunk)).astype(np.float32)
        for _ in range(n_chunks)
    ]


def test_streaming_matches_torch_replica(stream_model):
    config, params = stream_model
    chunks = chunk_spectrograms(config)
    replica = TorchStreamingReplica(params, config)
    state = init_stream_state(config)

    for i, chunk in enumerate(chunks):
        is_first = i == 0
        is_last = i == len(chunks) - 1
        ref = replica.step(chunk, is_first, is_last)
        ours, state = streaming_step(
            params, config, jnp.asarray(chunk)[None, None], state, is_first, is_last
        )
        if ref is None:
            assert ours is None
        else:
            np.testing.assert_allclose(
                np.asarray(ours), ref, atol=3e-5, rtol=1e-4
            )


def test_streaming_state_resets_after_last(stream_model):
    config, params = stream_model
    chunks = chunk_spectrograms(config, n_chunks=3)

    def run_epoch(state):
        outs = []
        for i, chunk in enumerate(chunks):
            out, state = streaming_step(
                params,
                config,
                jnp.asarray(chunk)[None, None],
                state,
                i == 0,
                i == len(chunks) - 1,
            )
            if out is not None:
                outs.append(np.asarray(out))
        return outs, state

    state = init_stream_state(config)
    first_epoch, state = run_epoch(state)
    second_epoch, _ = run_epoch(state)  # state was reset by is_last
    for a, b in zip(first_epoch, second_epoch):
        np.testing.assert_allclose(a, b, atol=1e-6)


def test_streaming_rejects_non_2conv(stream_model):
    from danspeech_tpu.errors import ConvError

    config = DeepSpeechConfig(conv_layers=3, bidirectional=False, streaming_model=True,
                              rnn_hidden_size=32, rnn_layers=1)
    params = ds.init_params(config)
    with pytest.raises(ConvError):
        streaming_step(
            params, config, jnp.zeros((1, 1, 161, 40)), init_stream_state(config), True, False
        )
