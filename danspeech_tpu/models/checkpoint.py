"""Checkpoint import/export.

Two formats:

1. **Reference .pth packages** (the DanSpeech zoo format, model.py:607-624):
   read torch-free via :mod:`danspeech_tpu.models.torch_pickle`, then the
   torch state_dict is mapped onto our parameter pytree (RNN weights
   transposed into matmul-friendly (I, G·H) layout).
2. **Native .dsz checkpoints**: a numpy .npz containing the same
   reference-style state_dict names plus a JSON config — so both formats
   funnel through one ``params_from_state_dict``.
"""

from __future__ import annotations

import io
import json
import zipfile

import jax.numpy as jnp
import numpy as np

from ..ops.conv import BatchNormParams, ConvParams, LinearParams, LookaheadParams
from ..ops.rnn import GRUWeights, LSTMWeights, RNNWeights
from .config import DeepSpeechConfig
from .deepspeech import Params
from .torch_pickle import torch_load

_WEIGHTS_CLS = {"gru": GRUWeights, "lstm": LSTMWeights, "rnn": RNNWeights}


def _j(x, dtype=jnp.float32):
    return jnp.asarray(np.asarray(x), dtype=dtype)


def params_from_state_dict(
    state_dict: dict, config: DeepSpeechConfig, dtype=jnp.float32
) -> Params:
    """Map a reference-style state_dict onto the parameter pytree.

    Key layout (reference model.py __init__): conv blocks live at
    ``conv.seq_module.{3i}`` (conv) and ``.{3i+1}`` (bn); RNN layer k at
    ``rnns.k.rnn.*`` with pre-BN at ``rnns.k.batch_norm.module.*`` for k>=1;
    lookahead at ``lookahead.0.conv.weight`` (batch) or
    ``lookahead.conv.weight`` (streaming); head at ``fc.0.module.{0,1}``.
    """
    sd = {k: np.asarray(v) for k, v in state_dict.items()}

    convs = []
    for i in range(config.conv_layers):
        base = f"conv.seq_module.{3 * i}"
        bn = f"conv.seq_module.{3 * i + 1}"
        convs.append(
            ConvParams(
                weight=_j(sd[f"{base}.weight"], dtype),
                bias=_j(sd[f"{base}.bias"], dtype),
                bn_gamma=_j(sd[f"{bn}.weight"], dtype),
                bn_beta=_j(sd[f"{bn}.bias"], dtype),
                bn_mean=_j(sd[f"{bn}.running_mean"], dtype),
                bn_var=_j(sd[f"{bn}.running_var"], dtype),
            )
        )

    wcls = _WEIGHTS_CLS[config.rnn_type]

    def rnn_dir(k: int, suffix: str):
        return wcls(
            w_ih=_j(sd[f"rnns.{k}.rnn.weight_ih_l0{suffix}"].T, dtype),
            w_hh=_j(sd[f"rnns.{k}.rnn.weight_hh_l0{suffix}"].T, dtype),
            b_ih=_j(sd[f"rnns.{k}.rnn.bias_ih_l0{suffix}"], dtype),
            b_hh=_j(sd[f"rnns.{k}.rnn.bias_hh_l0{suffix}"], dtype),
        )

    rnns = []
    for k in range(config.rnn_layers):
        bn_key = f"rnns.{k}.batch_norm.module"
        has_bn = f"{bn_key}.weight" in sd
        rnns.append(
            {
                "bn": (
                    BatchNormParams(
                        gamma=_j(sd[f"{bn_key}.weight"], dtype),
                        beta=_j(sd[f"{bn_key}.bias"], dtype),
                        mean=_j(sd[f"{bn_key}.running_mean"], dtype),
                        var=_j(sd[f"{bn_key}.running_var"], dtype),
                    )
                    if has_bn
                    else None
                ),
                "fwd": rnn_dir(k, ""),
                "bwd": (
                    rnn_dir(k, "_reverse")
                    if config.bidirectional and not config.streaming_model
                    else None
                ),
            }
        )

    look = None
    if not config.bidirectional or config.streaming_model:
        if "lookahead.0.conv.weight" in sd:
            w = sd["lookahead.0.conv.weight"]
        else:
            w = sd["lookahead.conv.weight"]
        look = LookaheadParams(weight=_j(w.reshape(w.shape[0], w.shape[-1]), dtype))

    return {
        "conv": convs,
        "rnns": rnns,
        "lookahead": look,
        "fc_bn": BatchNormParams(
            gamma=_j(sd["fc.0.module.0.weight"], dtype),
            beta=_j(sd["fc.0.module.0.bias"], dtype),
            mean=_j(sd["fc.0.module.0.running_mean"], dtype),
            var=_j(sd["fc.0.module.0.running_var"], dtype),
        ),
        "fc": LinearParams(weight=_j(sd["fc.0.module.1.weight"], dtype), bias=None),
    }


def state_dict_from_params(params: Params, config: DeepSpeechConfig) -> dict:
    """Inverse mapping: parameter pytree -> reference-style state_dict."""
    sd: dict[str, np.ndarray] = {}
    for i, c in enumerate(params["conv"]):
        base = f"conv.seq_module.{3 * i}"
        bn = f"conv.seq_module.{3 * i + 1}"
        sd[f"{base}.weight"] = np.asarray(c.weight)
        sd[f"{base}.bias"] = np.asarray(c.bias)
        sd[f"{bn}.weight"] = np.asarray(c.bn_gamma)
        sd[f"{bn}.bias"] = np.asarray(c.bn_beta)
        sd[f"{bn}.running_mean"] = np.asarray(c.bn_mean)
        sd[f"{bn}.running_var"] = np.asarray(c.bn_var)
    for k, entry in enumerate(params["rnns"]):
        if entry["bn"] is not None:
            bn_key = f"rnns.{k}.batch_norm.module"
            sd[f"{bn_key}.weight"] = np.asarray(entry["bn"].gamma)
            sd[f"{bn_key}.bias"] = np.asarray(entry["bn"].beta)
            sd[f"{bn_key}.running_mean"] = np.asarray(entry["bn"].mean)
            sd[f"{bn_key}.running_var"] = np.asarray(entry["bn"].var)
        for suffix, w in (("", entry["fwd"]), ("_reverse", entry["bwd"])):
            if w is None:
                continue
            sd[f"rnns.{k}.rnn.weight_ih_l0{suffix}"] = np.asarray(w.w_ih).T
            sd[f"rnns.{k}.rnn.weight_hh_l0{suffix}"] = np.asarray(w.w_hh).T
            sd[f"rnns.{k}.rnn.bias_ih_l0{suffix}"] = np.asarray(w.b_ih)
            sd[f"rnns.{k}.rnn.bias_hh_l0{suffix}"] = np.asarray(w.b_hh)
    if params["lookahead"] is not None:
        w = np.asarray(params["lookahead"].weight)
        key = "lookahead.conv.weight" if config.streaming_model else "lookahead.0.conv.weight"
        sd[key] = w.reshape(w.shape[0], 1, w.shape[1])
    sd["fc.0.module.0.weight"] = np.asarray(params["fc_bn"].gamma)
    sd["fc.0.module.0.bias"] = np.asarray(params["fc_bn"].beta)
    sd["fc.0.module.0.running_mean"] = np.asarray(params["fc_bn"].mean)
    sd["fc.0.module.0.running_var"] = np.asarray(params["fc_bn"].var)
    sd["fc.0.module.1.weight"] = np.asarray(params["fc"].weight)
    return sd


def config_from_package(package: dict) -> DeepSpeechConfig:
    """Build a config from the reference package metadata (model.py:607-617)."""
    labels = package["labels"]
    if isinstance(labels, (list, tuple)):
        labels = "".join(labels)
    return DeepSpeechConfig(
        model_name=str(package["model_name"]),
        rnn_hidden_size=int(package["rnn_hidden_size"]),
        rnn_layers=int(package["rnn_layers"]),
        labels=str(labels),
        audio_conf=dict(package["audio_conf"]),
        rnn_type=str(package["rnn_type"]),
        bidirectional=bool(package["bidirectional"]),
        conv_layers=int(package["conv_layers"]),
        context=int(package["context"]),
        streaming_model=bool(package["streaming_model"]),
    )


def load_reference_checkpoint(path) -> tuple[DeepSpeechConfig, Params]:
    """Load a DanSpeech zoo .pth package without torch."""
    package = torch_load(path)
    config = config_from_package(package)
    params = params_from_state_dict(package["state_dict"], config)
    return config, params


# ---------------------------------------------------------------------------
# Native format (.dsz): npz arrays + config.json inside one zip
# ---------------------------------------------------------------------------


def save_checkpoint(path: str, config: DeepSpeechConfig, params: Params) -> None:
    sd = state_dict_from_params(params, config)
    with zipfile.ZipFile(path, "w", zipfile.ZIP_STORED) as zf:
        zf.writestr("config.json", json.dumps(config.to_dict()))
        buf = io.BytesIO()
        np.savez(buf, **sd)
        zf.writestr("weights.npz", buf.getvalue())


def load_checkpoint(path: str) -> tuple[DeepSpeechConfig, Params]:
    with zipfile.ZipFile(path, "r") as zf:
        config = DeepSpeechConfig.from_dict(json.loads(zf.read("config.json")))
        with np.load(io.BytesIO(zf.read("weights.npz"))) as npz:
            sd = {k: npz[k] for k in npz.files}
    return config, params_from_state_dict(sd, config)
