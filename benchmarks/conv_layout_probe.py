"""Probe: conv stack layout/dtype variants on the real chip (dev tool)."""

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

B, F, T = 104, 161, 801
SPECS = [
    dict(i=1, o=32, k=(41, 11), s=(2, 2), p=(20, 5)),
    dict(i=32, o=32, k=(21, 11), s=(2, 1), p=(10, 5)),
    dict(i=32, o=96, k=(21, 11), s=(2, 1), p=(10, 5)),
]

rng = np.random.default_rng(0)
x0 = jnp.asarray(rng.normal(size=(B, 1, F, T)).astype(np.float32))
weights = [
    jnp.asarray(
        rng.normal(size=(s["o"], s["i"], *s["k"])).astype(np.float32) * 0.05
    )
    for s in SPECS
]


def timeit(name, fn, *args):
    out = fn(*args)
    _ = float(jnp.asarray(out).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(10):
        out = fn(*args)
    _ = float(jnp.asarray(out).ravel()[0])
    print(f"{name:34s} {(time.perf_counter()-t0)/10*1e3:8.2f} ms")


def stack_nchw(x, ws, dtype):
    for w, s in zip(ws, SPECS):
        x = jax.lax.conv_general_dilated(
            x.astype(dtype), w.astype(dtype),
            window_strides=s["s"],
            padding=[(s["p"][0], s["p"][0]), (s["p"][1], s["p"][1])],
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            preferred_element_type=jnp.float32,
        )
        x = jnp.clip(x, 0, 20)
    return x


def stack_nhwc(x, ws, dtype):
    x = jnp.transpose(x, (0, 2, 3, 1))  # NHWC
    for w, s in zip(ws, SPECS):
        wt = jnp.transpose(w, (2, 3, 1, 0))  # HWIO
        x = jax.lax.conv_general_dilated(
            x.astype(dtype), wt.astype(dtype),
            window_strides=s["s"],
            padding=[(s["p"][0], s["p"][0]), (s["p"][1], s["p"][1])],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        x = jnp.clip(x, 0, 20)
    return x


timeit("NCHW f32", jax.jit(lambda x, w: stack_nchw(x, w, jnp.float32)), x0, weights)
timeit("NCHW bf16", jax.jit(lambda x, w: stack_nchw(x, w, jnp.bfloat16)), x0, weights)
timeit("NHWC f32", jax.jit(lambda x, w: stack_nhwc(x, w, jnp.float32)), x0, weights)
timeit("NHWC bf16", jax.jit(lambda x, w: stack_nhwc(x, w, jnp.bfloat16)), x0, weights)


def per_layer_and_banded():
    """Per-conv-layer split + banded-matmul conv1 candidate."""
    from danspeech_tpu.ops.conv import conv2d, conv2d_banded_cin1

    xs = [x0]
    for w, s in zip(weights, SPECS):
        xs.append(
            jax.jit(
                lambda xx, ww, s=s: jax.lax.conv_general_dilated(
                    xx.astype(jnp.bfloat16), ww.astype(jnp.bfloat16),
                    window_strides=s["s"],
                    padding=[(s["p"][0], s["p"][0]), (s["p"][1], s["p"][1])],
                    dimension_numbers=("NCHW", "OIHW", "NCHW"),
                    preferred_element_type=jnp.float32,
                )
            )(xs[-1], w)
        )
    for i, (w, s) in enumerate(zip(weights, SPECS)):
        fn = jax.jit(
            lambda xx, ww, s=s: conv2d(
                xx.astype(jnp.float32), ww.astype(jnp.bfloat16), None, s["s"], s["p"]
            )
        )
        timeit(f"conv{i+1} direct bf16", fn, xs[i], w)
    fn_banded = jax.jit(
        lambda xx, ww: conv2d_banded_cin1(
            xx, ww.astype(jnp.bfloat16), None, SPECS[0]["s"], SPECS[0]["p"]
        )
    )
    timeit("conv1 banded-matmul bf16", fn_banded, x0, weights[0])


if os.environ.get("CONV_PROBE_SPLIT"):
    per_layer_and_banded()
