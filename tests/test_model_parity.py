"""Numerical parity of the acoustic model against torch.

The reference model (danspeech/deepspeech/model.py) is a torch graph; here we
rebuild the same computation with torch's own primitives (Conv2d/BatchNorm/
GRU/pack_padded_sequence) configured per SURVEY §2.3, load it with *our*
randomly-initialized parameters, and require elementwise agreement. This
pins conv semantics, eval BN, packed-sequence masking, bidirectional sum
merge, lookahead, and the softmax head without needing the (undownloadable)
pretrained checkpoints.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from danspeech_tpu.models.config import CONV_SPECS, DeepSpeechConfig
from danspeech_tpu.models import deepspeech as ds

torch.manual_seed(0)


def randomize_bn(params, seed=7):
    """Give BN layers non-trivial running stats so folding is actually tested."""
    rng = np.random.default_rng(seed)

    def rand_bn(bn):
        n = bn.gamma.shape[0]
        return type(bn)(
            gamma=jnp.asarray(rng.normal(1.0, 0.2, n).astype(np.float32)),
            beta=jnp.asarray(rng.normal(0.0, 0.2, n).astype(np.float32)),
            mean=jnp.asarray(rng.normal(0.0, 0.5, n).astype(np.float32)),
            var=jnp.asarray(rng.uniform(0.5, 2.0, n).astype(np.float32)),
        )

    params = dict(params)
    params["conv"] = [
        c._replace(
            bn_gamma=jnp.asarray(rng.normal(1.0, 0.2, c.bn_gamma.shape[0]).astype(np.float32)),
            bn_beta=jnp.asarray(rng.normal(0.0, 0.2, c.bn_gamma.shape[0]).astype(np.float32)),
            bn_mean=jnp.asarray(rng.normal(0.0, 0.5, c.bn_gamma.shape[0]).astype(np.float32)),
            bn_var=jnp.asarray(rng.uniform(0.5, 2.0, c.bn_gamma.shape[0]).astype(np.float32)),
        )
        for c in params["conv"]
    ]
    params["rnns"] = [
        {**e, "bn": rand_bn(e["bn"]) if e["bn"] is not None else None}
        for e in params["rnns"]
    ]
    params["fc_bn"] = rand_bn(params["fc_bn"])
    return params


def t(x):
    return torch.tensor(np.asarray(x), dtype=torch.float32)


def torch_rnn_layer(config, entry, x, lengths):
    """One BatchRNN layer via torch's cuDNN-semantics RNN + packed sequences."""
    if entry["bn"] is not None:
        bn = entry["bn"]
        tt, n = x.shape[0], x.shape[1]
        flat = x.reshape(tt * n, -1)
        flat = F.batch_norm(
            flat, t(bn.mean), t(bn.var), t(bn.gamma), t(bn.beta), False, 0.0, 1e-5
        )
        x = flat.reshape(tt, n, -1)

    cls = {"gru": torch.nn.GRU, "lstm": torch.nn.LSTM, "rnn": torch.nn.RNN}[
        config.rnn_type
    ]
    input_size = entry["fwd"].w_ih.shape[0]
    hidden = config.rnn_hidden_size
    mod = cls(
        input_size=input_size,
        hidden_size=hidden,
        bidirectional=config.bidirectional,
        bias=True,
    )
    with torch.no_grad():
        mod.weight_ih_l0.copy_(t(entry["fwd"].w_ih).T)
        mod.weight_hh_l0.copy_(t(entry["fwd"].w_hh).T)
        mod.bias_ih_l0.copy_(t(entry["fwd"].b_ih))
        mod.bias_hh_l0.copy_(t(entry["fwd"].b_hh))
        if config.bidirectional:
            mod.weight_ih_l0_reverse.copy_(t(entry["bwd"].w_ih).T)
            mod.weight_hh_l0_reverse.copy_(t(entry["bwd"].w_hh).T)
            mod.bias_ih_l0_reverse.copy_(t(entry["bwd"].b_ih))
            mod.bias_hh_l0_reverse.copy_(t(entry["bwd"].b_hh))
    mod.eval()
    packed = torch.nn.utils.rnn.pack_padded_sequence(x, lengths, enforce_sorted=False)
    out, _ = mod(packed)
    out, _ = torch.nn.utils.rnn.pad_packed_sequence(out)
    if config.bidirectional:
        tt, n = out.shape[0], out.shape[1]
        out = out.view(tt, n, 2, -1).sum(2)
    return out


def torch_forward(params, config, x, input_lengths):
    """Reference-architecture forward in torch (eval mode)."""
    lengths = input_lengths
    for spec in CONV_SPECS[: config.conv_layers]:
        _, kt = spec["kernel"]
        _, st = spec["stride"]
        _, pt = spec["padding"]
        lengths = [(l + 2 * pt - (kt - 1) - 1) // st + 1 for l in lengths]

    x = t(x)
    for p, spec in zip(params["conv"], CONV_SPECS[: config.conv_layers]):
        x = F.conv2d(x, t(p.weight), t(p.bias), stride=spec["stride"], padding=spec["padding"])
        x = F.batch_norm(
            x, t(p.bn_mean), t(p.bn_var), t(p.bn_gamma), t(p.bn_beta), False, 0.0, 1e-5
        )
        x = F.hardtanh(x, 0, 20)
        mask = torch.zeros_like(x, dtype=torch.bool)
        for i, ln in enumerate(lengths):
            if x.shape[3] - ln > 0:
                mask[i, :, :, ln:] = True
        x = x.masked_fill(mask, 0)

    n, c, f, tt = x.shape
    x = x.view(n, c * f, tt).transpose(1, 2).transpose(0, 1).contiguous()  # T,N,H

    for entry in params["rnns"]:
        x = torch_rnn_layer(config, entry, x, lengths)

    if not config.bidirectional:
        la = params["lookahead"]
        context = la.weight.shape[1]
        xx = x.transpose(0, 1).transpose(1, 2)  # N,H,T
        xx = F.pad(xx, (0, context - 1))
        w = t(la.weight).unsqueeze(1)  # (H,1,C)
        xx = F.conv1d(xx, w, groups=w.shape[0])
        x = xx.transpose(1, 2).transpose(0, 1).contiguous()
        x = F.hardtanh(x, 0, 20)

    bn = params["fc_bn"]
    tt, n = x.shape[0], x.shape[1]
    flat = x.reshape(tt * n, -1)
    flat = F.batch_norm(
        flat, t(bn.mean), t(bn.var), t(bn.gamma), t(bn.beta), False, 0.0, 1e-5
    )
    flat = F.linear(flat, t(params["fc"].weight), None)
    x = flat.view(tt, n, -1).transpose(0, 1)
    return F.softmax(x, dim=-1).detach().numpy(), lengths


def make_inputs(config, batch=2, tmax=50, seed=3):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(batch, 1, config.n_freq, tmax)).astype(np.float32)
    lengths = [tmax] + [tmax - 13 * i for i in range(1, batch)]
    # zero padding beyond each length as the parser would produce
    for i, ln in enumerate(lengths):
        x[i, :, :, ln:] = 0.0
    return x, lengths


CASES = [
    ("gru-bidi-2conv", dict(rnn_type="gru", bidirectional=True, conv_layers=2, rnn_hidden_size=96, rnn_layers=3)),
    ("gru-bidi-3conv", dict(rnn_type="gru", bidirectional=True, conv_layers=3, rnn_hidden_size=64, rnn_layers=2)),
    ("gru-bidi-1conv", dict(rnn_type="gru", bidirectional=True, conv_layers=1, rnn_hidden_size=64, rnn_layers=2)),
    ("gru-uni-lookahead", dict(rnn_type="gru", bidirectional=False, conv_layers=2, rnn_hidden_size=96, rnn_layers=3, context=20)),
    ("lstm-bidi", dict(rnn_type="lstm", bidirectional=True, conv_layers=2, rnn_hidden_size=64, rnn_layers=2)),
    ("rnn-bidi", dict(rnn_type="rnn", bidirectional=True, conv_layers=2, rnn_hidden_size=64, rnn_layers=2)),
]


@pytest.mark.parametrize("name,kw", CASES, ids=[c[0] for c in CASES])
def test_forward_matches_torch(name, kw):
    config = DeepSpeechConfig(model_name=name, **kw)
    params = randomize_bn(ds.init_params(config, seed=1))
    x, lengths = make_inputs(config)

    ref_probs, ref_lens = torch_forward(params, config, x, lengths)
    ours_probs, ours_lens = ds.forward(
        params, config, jnp.asarray(x), jnp.asarray(lengths)
    )
    ours_probs = np.asarray(ours_probs)

    np.testing.assert_array_equal(np.asarray(ours_lens), np.asarray(ref_lens))
    for i, ln in enumerate(ref_lens):
        np.testing.assert_allclose(
            ours_probs[i, :ln], ref_probs[i, :ln], atol=2e-5, rtol=1e-4
        )


def test_batch_invariance():
    """Same utterance alone or padded inside a batch gives the same output
    (the MaskConv + packed-sequence property the reference engineers for)."""
    config = DeepSpeechConfig(rnn_hidden_size=64, rnn_layers=2, conv_layers=2)
    params = randomize_bn(ds.init_params(config, seed=2))
    x, lengths = make_inputs(config, batch=3, tmax=60)

    batch_out, batch_lens = ds.forward(params, config, jnp.asarray(x), jnp.asarray(lengths))
    batch_out = np.asarray(batch_out)
    for i, ln in enumerate(lengths):
        solo = x[i : i + 1, :, :, :ln]
        solo_out, solo_lens = ds.forward(
            params, config, jnp.asarray(solo), jnp.asarray([ln])
        )
        out_len = int(np.asarray(solo_lens)[0])
        np.testing.assert_allclose(
            batch_out[i, :out_len], np.asarray(solo_out)[0], atol=1e-5
        )


def test_param_count_matches_torch_module_count():
    config = DeepSpeechConfig(rnn_hidden_size=64, rnn_layers=2, conv_layers=2)
    params = ds.init_params(config)
    n = ds.num_params(params)
    # torch equivalent: conv(2 blocks w/ bn) + 2 bidi GRU layers (1 pre-bn) + fc bn + fc
    expected = 0
    expected += 32 * 1 * 41 * 11 + 32 + 4 * 32  # conv1 + bn
    expected += 32 * 32 * 21 * 11 + 32 + 4 * 32  # conv2 + bn
    inp = config.rnn_input_size
    expected += 2 * (3 * 64 * inp + 3 * 64 * 64 + 2 * 3 * 64)  # layer1 fwd+bwd
    expected += 4 * inp if False else 0
    expected += 4 * 64  # pre-bn layer2
    expected += 2 * (3 * 64 * 64 + 3 * 64 * 64 + 2 * 3 * 64)  # layer2
    expected += 4 * 64  # fc bn
    expected += 33 * 64  # fc linear
    assert n == expected
