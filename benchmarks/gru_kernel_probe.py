"""Probe: single-direction x2 vs fused bidirectional GRU kernel (dev tool)."""

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

from danspeech_tpu.ops.pallas_gru import gru_scan, gru_scan_bidi

T, B, H = 401, 104, 1200
rng = np.random.default_rng(0)
gx_f = jnp.asarray(rng.normal(size=(T, B, 3 * H)).astype(np.float32))
gx_b = jnp.asarray(rng.normal(size=(T, B, 3 * H)).astype(np.float32))
w_f = jnp.asarray(rng.normal(size=(H, 3 * H)).astype(np.float32) * 0.02).astype(jnp.bfloat16)
w_b = jnp.asarray(rng.normal(size=(H, 3 * H)).astype(np.float32) * 0.02).astype(jnp.bfloat16)
b_f = jnp.zeros((3 * H,), jnp.float32)
b_b = jnp.zeros((3 * H,), jnp.float32)
h0 = jnp.zeros((B, H), jnp.float32)
lens = jnp.full((B,), T, jnp.int32)


def timeit(name, fn, iters=10):
    out = fn()
    _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    print(f"{name:30s} {(time.perf_counter()-t0)/iters*1e3:8.2f} ms")


@jax.jit
def two_single():
    of, hf = gru_scan(gx_f, lens, w_f, b_f, h0, reverse=False)
    ob, hb = gru_scan(gx_b, lens, w_b, b_b, h0, reverse=True)
    return of + ob


@jax.jit
def fused():
    of, ob, hf, hb = gru_scan_bidi(gx_f, gx_b, lens, w_f, w_b, b_f, b_b, h0, h0)
    return of + ob


@jax.jit
def fused_u2():
    of, ob, hf, hb = gru_scan_bidi(
        gx_f, gx_b, lens, w_f, w_b, b_f, b_b, h0, h0, unroll=2
    )
    return of + ob


timeit("2x single-direction kernels", two_single)
timeit("fused bidi kernel", fused)
timeit("fused bidi kernel unroll=2", fused_u2)

# numerics check
a = np.asarray(two_single())
b = np.asarray(fused())
print("max abs diff:", float(np.abs(a - b).max()))
