"""Data-parallel scaling evidence (VERDICT r1 item 10).

Multi-chip hardware is unavailable, so instead of an aspirational
"≥80% efficiency" claim this pins the property that *makes* DP scale: the
compiled acoustic forward under data sharding contains NO cross-shard
collectives — each chip's work is fully independent, so scaling loss can
only come from host-side dispatch and padding skew, both bounded by the
length-bucketing (engine.SAMPLE_BUCKET). See docs/architecture.md
"Parallelism" for the cost model.
"""

from functools import partial

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from danspeech_tpu.models import deepspeech as ds
from danspeech_tpu.models.config import DeepSpeechConfig
from danspeech_tpu.parallel.mesh import make_mesh

COLLECTIVES = (
    "all-reduce(",
    "all-gather(",
    "reduce-scatter(",
    "collective-permute(",
    "all-to-all(",
)


def _compiled_hlo(mesh, config, params, batch):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(batch, 1, config.n_freq, 40)).astype(np.float32))
    lengths = jnp.full((batch,), 40, jnp.int32)
    data = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    x = jax.device_put(x, NamedSharding(mesh, P("data", None, None, None)))
    lengths = jax.device_put(lengths, data)
    params = jax.device_put(params, repl)

    fn = jax.jit(partial(ds.forward, config=config))
    lowered = fn.lower(params, x=x, input_lengths=lengths)
    return lowered.compile().as_text()


def test_dp_forward_has_no_cross_shard_collectives():
    config = DeepSpeechConfig(
        model_name="dp-scaling", rnn_hidden_size=64, rnn_layers=2, conv_layers=2
    )
    params = ds.init_params(config, seed=0)
    mesh = make_mesh()  # 8-way data axis on the CPU mesh
    hlo = _compiled_hlo(mesh, config, params, batch=8)
    found = [c for c in COLLECTIVES if c in hlo]
    assert not found, (
        f"data-parallel forward compiled cross-shard collectives: {found}"
    )


def test_dp_batch_output_matches_single_device():
    """Weak-scaling correctness: the 8-shard batch equals 8 single rows."""
    config = DeepSpeechConfig(
        model_name="dp-equal", rnn_hidden_size=64, rnn_layers=2, conv_layers=2
    )
    params = ds.init_params(config, seed=1)
    rng = np.random.default_rng(2)
    x = rng.normal(size=(8, 1, config.n_freq, 40)).astype(np.float32)
    lengths = np.full((8,), 40, np.int32)

    mesh = make_mesh()
    xs = jax.device_put(
        jnp.asarray(x), NamedSharding(mesh, P("data", None, None, None))
    )
    ls = jax.device_put(jnp.asarray(lengths), NamedSharding(mesh, P("data")))
    ps = jax.device_put(params, NamedSharding(mesh, P()))
    sharded, _ = jax.jit(partial(ds.forward, config=config))(ps, x=xs, input_lengths=ls)

    single, _ = ds.forward(params, config, jnp.asarray(x), jnp.asarray(lengths))
    np.testing.assert_allclose(
        np.asarray(sharded), np.asarray(single), atol=1e-5, rtol=1e-4
    )
