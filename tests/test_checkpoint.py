"""Checkpoint round-trip tests.

Builds a torch module tree whose state_dict uses the exact reference key
layout (conv.seq_module.N / rnns.k.rnn / rnns.k.batch_norm.module /
lookahead / fc.0.module — see SURVEY §2.3 serialization notes), saves it with
torch.save in both the zip and legacy formats, and verifies our torch-free
reader + key mapping reproduce the same forward outputs.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax.numpy as jnp

from danspeech_tpu.models import deepspeech as ds
from danspeech_tpu.models.checkpoint import (
    load_checkpoint,
    load_reference_checkpoint,
    save_checkpoint,
    state_dict_from_params,
)
from danspeech_tpu.models.config import CONV_SPECS, DeepSpeechConfig

from test_model_parity import make_inputs, randomize_bn, torch_forward


class _Wrap(nn.Module):
    """Bare module wrapper to reproduce reference attribute names."""

    def __init__(self, **children):
        super().__init__()
        for name, child in children.items():
            setattr(self, name, child)


def build_torch_tree(config: DeepSpeechConfig) -> nn.Module:
    """A torch module with the reference's state_dict key structure."""
    blocks = []
    for spec in CONV_SPECS[: config.conv_layers]:
        blocks += [
            nn.Conv2d(
                spec["in"], spec["out"], kernel_size=spec["kernel"],
                stride=spec["stride"], padding=spec["padding"],
            ),
            nn.BatchNorm2d(spec["out"]),
            nn.Hardtanh(0, 20),
        ]
    conv = _Wrap(seq_module=nn.Sequential(*blocks))

    rnn_cls = {"gru": nn.GRU, "lstm": nn.LSTM, "rnn": nn.RNN}[config.rnn_type]
    rnns = []
    in_size = config.rnn_input_size
    h = config.rnn_hidden_size
    for k in range(config.rnn_layers):
        entry = _Wrap(
            batch_norm=(
                _Wrap(module=nn.BatchNorm1d(in_size)) if k > 0 else None
            ),
            rnn=rnn_cls(
                input_size=in_size, hidden_size=h,
                bidirectional=config.bidirectional and not config.streaming_model,
                bias=True,
            ),
        )
        if k == 0:
            entry.batch_norm = None
        rnns.append(entry)
        in_size = h
    rnns_mod = nn.Sequential(*rnns)

    model = _Wrap(
        conv=conv,
        rnns=rnns_mod,
        fc=nn.Sequential(
            _Wrap(module=nn.Sequential(nn.BatchNorm1d(h), nn.Linear(h, config.num_classes, bias=False)))
        ),
    )
    if not config.bidirectional and not config.streaming_model:
        la_conv = nn.Conv1d(h, h, kernel_size=config.context, groups=h, bias=False)
        model.lookahead = nn.Sequential(_Wrap(conv=la_conv), nn.Hardtanh(0, 20))
    elif config.streaming_model:
        la_conv = nn.Conv1d(h, h, kernel_size=config.context, groups=h, bias=False)
        model.lookahead = _Wrap(conv=la_conv)
    return model


def make_package(config: DeepSpeechConfig, seed=0) -> dict:
    torch.manual_seed(seed)
    model = build_torch_tree(config)
    # randomize BN running stats so eval BN is non-trivial
    for m in model.modules():
        if isinstance(m, (nn.BatchNorm1d, nn.BatchNorm2d)):
            with torch.no_grad():
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 2.0)
                m.weight.normal_(1.0, 0.2)
                m.bias.normal_(0, 0.2)
    return {
        "model_name": config.model_name,
        "rnn_hidden_size": config.rnn_hidden_size,
        "rnn_layers": config.rnn_layers,
        "labels": config.labels,
        "audio_conf": config.audio_conf,
        "rnn_type": config.rnn_type,
        "bidirectional": config.bidirectional,
        "conv_layers": config.conv_layers,
        "context": config.context,
        "streaming_model": config.streaming_model,
        "state_dict": model.state_dict(),
    }


@pytest.mark.parametrize("zipfmt", [True, False], ids=["zip", "legacy"])
@pytest.mark.parametrize(
    "kw",
    [
        dict(rnn_type="gru", bidirectional=True, conv_layers=2, rnn_hidden_size=64, rnn_layers=2),
        dict(rnn_type="gru", bidirectional=False, conv_layers=2, rnn_hidden_size=64, rnn_layers=2),
    ],
    ids=["bidi", "uni"],
)
def test_reference_pth_roundtrip(tmp_path, zipfmt, kw):
    config = DeepSpeechConfig(model_name="ckpt-test", **kw)
    package = make_package(config)
    path = tmp_path / "model.pth"
    torch.save(package, str(path), _use_new_zipfile_serialization=zipfmt)

    loaded_config, params = load_reference_checkpoint(str(path))
    assert loaded_config.rnn_hidden_size == config.rnn_hidden_size
    assert loaded_config.labels == config.labels
    assert loaded_config.conv_layers == config.conv_layers

    x, lengths = make_inputs(config, batch=2, tmax=40)
    ref_probs, ref_lens = torch_forward(params, config, x, lengths)
    ours, ours_lens = ds.forward(params, loaded_config, jnp.asarray(x), jnp.asarray(lengths))
    for i, ln in enumerate(ref_lens):
        np.testing.assert_allclose(
            np.asarray(ours)[i, :ln], ref_probs[i, :ln], atol=2e-5, rtol=1e-4
        )


def test_native_checkpoint_roundtrip(tmp_path):
    config = DeepSpeechConfig(rnn_hidden_size=64, rnn_layers=2, conv_layers=2)
    params = randomize_bn(ds.init_params(config, seed=5))
    path = str(tmp_path / "model.dsz")
    save_checkpoint(path, config, params)
    config2, params2 = load_checkpoint(path)
    assert config2.to_dict() == config.to_dict()

    flat1 = state_dict_from_params(params, config)
    flat2 = state_dict_from_params(params2, config2)
    assert set(flat1) == set(flat2)
    for k in flat1:
        np.testing.assert_array_equal(flat1[k], flat2[k])


def test_torch_pickle_rejects_malicious_global(tmp_path):
    import pickle as _p

    path = tmp_path / "evil.pth"

    class Evil:
        def __reduce__(self):
            return (print, ("pwned",))

    torch.save({"state_dict": {}, "evil": Evil()}, str(path))
    from danspeech_tpu.models.torch_pickle import torch_load

    with pytest.raises(_p.UnpicklingError):
        torch_load(str(path))


def test_legacy_header_pickles_are_restricted(tmp_path):
    """Every pickle in a legacy-format stream goes through the restricted
    unpickler — a payload in the magic/protocol/sys_info/key_order
    pickles (before or after the object graph) must be rejected, not
    executed (code-review r4: these used plain pickle.load)."""
    import pickle as _p
    import io

    class Evil:
        def __reduce__(self):
            return (print, ("pwned",))

    # legacy stream whose FIRST pickle is the payload
    buf = io.BytesIO()
    _p.dump(Evil(), buf)
    (tmp_path / "evil_legacy.pth").write_bytes(buf.getvalue())

    from danspeech_tpu.models.torch_pickle import torch_load

    with pytest.raises((_p.UnpicklingError, ValueError)):
        torch_load(str(tmp_path / "evil_legacy.pth"))


def test_streaming_config_normalizes_bidirectional():
    """The reference's streaming twin is hard-coded uni-directional
    (model.py:211); a streaming config claiming bidirectional=True must
    normalize so forward/init_params/checkpoint predicates agree."""
    from danspeech_tpu.models.config import DeepSpeechConfig

    cfg = DeepSpeechConfig(
        model_name="s", rnn_hidden_size=32, rnn_layers=1, conv_layers=2,
        streaming_model=True, bidirectional=True, context=20,
    )
    assert cfg.bidirectional is False
    from danspeech_tpu.models import deepspeech as ds

    params = ds.init_params(cfg, seed=0)
    assert params["lookahead"] is not None
    assert params["rnns"][0]["bwd"] is None
