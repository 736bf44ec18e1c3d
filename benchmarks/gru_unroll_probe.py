"""Probe: fused bidi GRU kernel unroll sweep with bf16 gx/out streams.

bf16 streaming halved the per-block DMA, which shifts the unroll tradeoff
measured in pallas_gru.gru_scan's docstring (fp32, unroll=1 best). Dev tool.
"""

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from danspeech_tpu.ops.pallas_gru import gru_scan_bidi

T = int(os.environ.get("T", "401"))
B = int(os.environ.get("B", "128"))
H = int(os.environ.get("H", "1200"))
rng = np.random.default_rng(0)
gx_f = jnp.asarray(rng.normal(size=(T, B, 3 * H)).astype(np.float32)).astype(jnp.bfloat16)
gx_b = jnp.asarray(rng.normal(size=(T, B, 3 * H)).astype(np.float32)).astype(jnp.bfloat16)
w_f = jnp.asarray(rng.normal(size=(H, 3 * H)).astype(np.float32) * 0.02).astype(jnp.bfloat16)
w_b = jnp.asarray(rng.normal(size=(H, 3 * H)).astype(np.float32) * 0.02).astype(jnp.bfloat16)
b_f = jnp.zeros((3 * H,), jnp.float32)
b_b = jnp.zeros((3 * H,), jnp.float32)
h0 = jnp.zeros((B, H), jnp.float32)
lens = jnp.full((B,), T, jnp.int32)


def timeit(name, fn, iters=10):
    out = fn()
    _ = float(jax.tree_util.tree_leaves(out)[0][0, 0, 0])  # force completion
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    _ = float(jax.tree_util.tree_leaves(out)[0][0, 0, 0])
    print(f"{name:30s} {(time.perf_counter()-t0)/iters*1e3:8.2f} ms", flush=True)


for u in (1, 2, 4):
    fn = jax.jit(
        lambda u=u: gru_scan_bidi(
            gx_f, gx_b, lens, w_f, w_b, b_f, b_b, h0, h0, unroll=u
        )[0]
    )
    timeit(f"bidi bf16 unroll={u}", fn)
