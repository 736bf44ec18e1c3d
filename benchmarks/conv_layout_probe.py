"""Probe: conv stack layout/dtype variants on the real chip.

Writes benchmarks/conv_layout_probe.json with the conv2/conv3 candidate
comparison (direct strided conv vs freq space-to-depth,
ops/conv.py:conv2d_s2d_freq) — the round-4 verdict item 7 evidence for
whichever layout conv_block dispatches.
"""

import json
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
    dt = (time.perf_counter() - t0) / 10 * 1e3
    print(f"{name:34s} {dt:8.2f} ms", flush=True)
    return dt


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


if os.environ.get("CONV_PROBE_LAYOUT"):
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


def conv23_candidates():
    """conv2/conv3 at the serving shape: direct strided vs freq s2d.

    Inputs match the flagship pipeline at B=128/8 s rows: conv1 output is
    (128, 32, 81, 401); conv2 output (128, 32, 41, 401) feeds conv3."""
    from danspeech_tpu.ops.conv import conv2d, conv2d_s2d_freq

    b = int(os.environ.get("B", "128"))
    x2 = jnp.asarray(rng.normal(size=(b, 32, 81, 401)).astype(np.float32))
    w2 = jnp.asarray(
        rng.normal(size=(32, 32, 21, 11)).astype(np.float32) * 0.05
    )
    x3 = jnp.asarray(rng.normal(size=(b, 32, 41, 401)).astype(np.float32))
    w3 = jnp.asarray(
        rng.normal(size=(96, 32, 21, 11)).astype(np.float32) * 0.05
    )

    rows = {}
    for name, x, w in (("conv2", x2, w2), ("conv3", x3, w3)):
        for variant, fn in (
            ("direct", conv2d),
            ("s2d_freq", conv2d_s2d_freq),
        ):
            for dtype in (jnp.bfloat16,):
                jitted = jax.jit(
                    lambda xx, ww, fn=fn, dtype=dtype: fn(
                        xx, ww.astype(dtype), None, (2, 1), (10, 5)
                    )
                )
                rows[f"{name}_{variant}_bf16"] = round(
                    timeit(f"{name} {variant} bf16", jitted, x, w), 3
                )

    out = {
        "setup": (
            f"B={b}, conv2 (128,32,81,401)x(32,32,21,11), "
            f"conv3 (128,32,41,401)x(96,32,21,11), stride (2,1), "
            "bf16 kernels / f32 accumulate, TPU v5e 1 chip, 10 iters (r5)"
        ),
        "ms": rows,
        "notes": (
            "conv_block dispatches whichever variant this probe measures "
            "faster for stride-(2,1) layers (ops/conv.py); parity pinned "
            "in tests/test_conv_banded.py."
        ),
    }
    print(json.dumps(out, indent=2))
    with open(
        os.path.join(REPO, "benchmarks", "conv_layout_probe.json"), "w"
    ) as f:
        json.dump(out, f, indent=2)


if os.environ.get("CONV_PROBE_23") or not os.environ.get("CONV_PROBE_SPLIT"):
    conv23_candidates()
