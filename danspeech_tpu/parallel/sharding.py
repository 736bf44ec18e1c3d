"""GSPMD parameter sharding rules for the *training* path: DP replication
+ model-axis sharding of the gate-stacked RNN weights and FC head.

These specs shard the trailing G·H dimension contiguously and let XLA
propagate/reshard — adequate for the optimizer/memory-sharding use in
train/step.py and the multi-chip dryrun. For *inference* TP use
parallel/tp.py instead: it packs gate-ALIGNED layouts and places the
collectives explicitly via shard_map (one small all_gather per recurrence
step, or direction parallelism running whole local Pallas recurrences),
rather than hoping GSPMD does something sensible inside the scan.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.conv import BatchNormParams, ConvParams, LinearParams, LookaheadParams
from .mesh import MODEL_AXIS


def _rnn_dir_spec():
    # w_ih (I, GH): shard gate dim; w_hh (H, GH): shard gate dim; biases (GH,)
    return {
        "w_ih": P(None, MODEL_AXIS),
        "w_hh": P(None, MODEL_AXIS),
        "b_ih": P(MODEL_AXIS),
        "b_hh": P(MODEL_AXIS),
    }


def param_pspecs(params) -> dict:
    """PartitionSpec pytree matching a DeepSpeech parameter pytree."""

    def conv_spec(_):
        return ConvParams(
            weight=P(), bias=P(), bn_gamma=P(), bn_beta=P(), bn_mean=P(), bn_var=P()
        )

    def rnn_entry_spec(entry):
        d = _rnn_dir_spec()
        wcls = type(entry["fwd"])
        make = lambda: wcls(**{k: d[k] for k in wcls._fields})
        return {
            "bn": (
                BatchNormParams(gamma=P(), beta=P(), mean=P(), var=P())
                if entry["bn"] is not None
                else None
            ),
            "fwd": make(),
            "bwd": make() if entry["bwd"] is not None else None,
        }

    return {
        "conv": [conv_spec(c) for c in params["conv"]],
        "rnns": [rnn_entry_spec(e) for e in params["rnns"]],
        "lookahead": (
            LookaheadParams(weight=P(MODEL_AXIS, None))
            if params["lookahead"] is not None
            else None
        ),
        "fc_bn": BatchNormParams(
            gamma=P(MODEL_AXIS), beta=P(MODEL_AXIS), mean=P(MODEL_AXIS), var=P(MODEL_AXIS)
        ),
        "fc": LinearParams(weight=P(None, MODEL_AXIS), bias=None),
    }


def param_shardings(mesh: Mesh, params):
    """NamedSharding pytree for the parameters on the given mesh."""
    specs = param_pspecs(params)
    return jax.tree_util.tree_map(
        lambda spec: NamedSharding(mesh, spec),
        specs,
        is_leaf=lambda x: isinstance(x, P),
    )


def shard_params(mesh: Mesh, params):
    """Place a parameter pytree onto the mesh with TP shardings."""
    shardings = param_shardings(mesh, params)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
