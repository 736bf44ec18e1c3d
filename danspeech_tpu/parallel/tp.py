"""Explicit tensor parallelism for the GRU stack via shard_map.

Round-1's TP relied on GSPMD auto-propagation over contiguous 3H-dim
shardings (parallel/sharding.py), which splits *across* gate boundaries
for most (H, n_model) combinations and leaves the compiler to reshard the
gate math. This module makes TP explicit and gate-aligned instead
(VERDICT r1 item 3, SURVEY §2.5 TP row):

- :func:`pack_tp_params` permutes every gate-stacked weight's 3H columns
  into shard-grouped order [r_s|z_s|n_s for s in shards], so slicing the
  last dim into n contiguous blocks is exactly "shard every gate's H dim";
- :func:`tp_forward` runs the post-conv stack inside one shard_map with
  two recurrence modes:

  * **direction-parallel** (bidirectional models on a 2-way model axis):
    each chip runs its direction's FULL Pallas recurrence
    (ops/pallas_gru.gru_scan) locally — the kernel meets TP-sharded
    weights with zero per-step communication; the bidirectional sum-merge
    is one psum per layer;
  * **hidden-sharded** (any n): each chip holds gate-aligned (H, 3H/n)
    recurrent weights, computes its h-slice's gates locally, and the new
    hidden state is reassembled with ONE small all_gather per step
    ((B, H/n) -> (B, H), 3x fewer bytes than psum-ing the 3H gate
    pre-activations). The recurrence itself is a lax.scan: a per-step
    cross-chip exchange cannot live inside a Pallas grid (the kernel owns
    the time loop; a pltpu remote-DMA ring is future work).

When TP pays (measured + modeled, benchmarks/tp_economics.json): the B=1
recurrent step is weight-streaming-bound (11.85 us measured on the
GPUStreamingRNN 5x2000 shape, ~100x off the flops bound), so sharding the
weights 1/n per chip buys a modeled 1.69x (n=2) to 1.94x (n=4) step
speedup before ICI hop latency catches up (1.37x at n=8) — i.e. TP is a
B=1-latency / VMEM-capacity tool with crossover n≈4. For
throughput-bound batch serving, DP (parallel/batch.py) is strictly better
(at large B the step is flops-bound and the same exchange costs many
times the sharded matmul).

The conv stack stays replicated (it is ~1% of FLOPs); the lookahead conv
is depthwise over H (h-sharded for free); the FC head contracts over H, so
each shard matmuls its h-slice and one psum produces the logits.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..models import deepspeech as ds
from ..ops import conv as conv_ops
from ..ops.rnn import GRUWeights, _reverse_valid
from .mesh import MODEL_AXIS


def _shard_map(mesh):
    try:
        from jax import shard_map

        return functools.partial(shard_map, mesh=mesh, check_vma=False)
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

        return functools.partial(shard_map, mesh=mesh, check_rep=False)


# ---------------------------------------------------------------------------
# Gate-aligned packing
# ---------------------------------------------------------------------------


def _permute_gate_cols(w, n: int, gates: int = 3):
    """Reorder a (..., gates*H) array's last dim from gate-major
    [r|z|n] to shard-major [r_0|z_0|n_0|r_1|z_1|n_1|...], so that a split
    into n contiguous blocks shards every gate's H dim evenly."""
    h = w.shape[-1] // gates
    if h % n:
        raise ValueError(f"hidden size {h} not divisible by {n} TP shards")
    hs = h // n
    # (..., gates, n, hs) -> (..., n, gates, hs)
    parts = w.reshape(*w.shape[:-1], gates, n, hs)
    parts = jnp.swapaxes(parts, -3, -2)
    return parts.reshape(*w.shape[:-1], gates * h)


def _pack_dir(wts: GRUWeights, n: int) -> GRUWeights:
    return GRUWeights(
        w_ih=_permute_gate_cols(wts.w_ih, n),
        w_hh=_permute_gate_cols(wts.w_hh, n),
        b_ih=_permute_gate_cols(wts.b_ih, n),
        b_hh=_permute_gate_cols(wts.b_hh, n),
    )


def pack_tp_params(params, n: int):
    """Permute every RNN layer's gate-stacked columns into shard-grouped
    order for an n-way model axis. Conv/BN/lookahead/FC stay as-is (their
    sharding needs no layout change). Idempotent-free: pack exactly once."""
    packed = dict(params)
    packed["rnns"] = [
        {
            "bn": e["bn"],
            "fwd": _pack_dir(e["fwd"], n),
            "bwd": _pack_dir(e["bwd"], n) if e["bwd"] is not None else None,
        }
        for e in params["rnns"]
    ]
    return packed


def tp_pspecs(params):
    """shard_map PartitionSpecs for a pack_tp_params-packed pytree."""

    def rnn_spec(entry):
        dir_spec = GRUWeights(
            w_ih=P(None, MODEL_AXIS),
            w_hh=P(None, MODEL_AXIS),
            b_ih=P(MODEL_AXIS),
            b_hh=P(MODEL_AXIS),
        )
        return {
            "bn": jax.tree_util.tree_map(lambda _: P(), entry["bn"])
            if entry["bn"] is not None
            else None,
            "fwd": dir_spec,
            "bwd": dir_spec if entry["bwd"] is not None else None,
        }

    return {
        "conv": jax.tree_util.tree_map(lambda _: P(), params["conv"]),
        "rnns": [rnn_spec(e) for e in params["rnns"]],
        "lookahead": (
            type(params["lookahead"])(weight=P(MODEL_AXIS, None))
            if params["lookahead"] is not None
            else None
        ),
        "fc_bn": jax.tree_util.tree_map(lambda _: P(MODEL_AXIS), params["fc_bn"]),
        "fc": type(params["fc"])(weight=P(None, MODEL_AXIS), bias=None),
    }


# ---------------------------------------------------------------------------
# Sharded recurrences (run inside shard_map)
# ---------------------------------------------------------------------------


def _gru_layer_hsharded(x, lengths, fwd_loc, bwd_loc, axis: str, n: int):
    """Gate-aligned hidden-sharded GRU layer body (local arrays).

    x (T, B, I) replicated; local weights (I|H, 3h) with h = H/n. Each step:
    local (B, H) x (H, 3h) matmul + gate math on the h-slice, then one
    all_gather reassembles h. Returns the layer output (T, B, H) replicated
    (directions summed).
    """
    t_max, batch, _ = x.shape
    hloc = fwd_loc.w_hh.shape[1] // 3
    hidden = fwd_loc.w_hh.shape[0]
    mm_dtype = fwd_loc.w_ih.dtype
    dirs = [fwd_loc] if bwd_loc is None else [fwd_loc, bwd_loc]
    ndir = len(dirs)

    if ndir == 2:
        x_stack = jnp.stack([x, _reverse_valid(x, lengths)], axis=1)
    else:
        x_stack = x[:, None]

    w_ih = jnp.stack([d.w_ih for d in dirs])  # (D, I, 3h)
    w_hh = jnp.stack([d.w_hh for d in dirs])  # (D, H, 3h)
    b_ih = jnp.stack([d.b_ih for d in dirs])
    b_hh = jnp.stack([d.b_hh for d in dirs])

    gx = (
        jnp.einsum(
            "tdbi,dik->tdbk",
            x_stack.astype(mm_dtype),
            w_ih,
            preferred_element_type=jnp.float32,
        )
        + b_ih[None, :, None, :].astype(jnp.float32)
    )
    mask = (jnp.arange(t_max)[:, None] < lengths[None, :]).astype(jnp.float32)
    h0 = jnp.zeros((ndir, batch, hidden), jnp.float32)
    shard = jax.lax.axis_index(axis)

    def step(h_full, inputs):
        gx_t, m_t = inputs  # (D, B, 3h), (B,)
        gh = (
            jnp.einsum(
                "dbh,dhk->dbk",
                h_full.astype(mm_dtype),
                w_hh,
                preferred_element_type=jnp.float32,
            )
            + b_hh[:, None, :].astype(jnp.float32)
        )
        gx_r, gx_z, gx_n = jnp.split(gx_t, 3, axis=-1)
        gh_r, gh_z, gh_n = jnp.split(gh, 3, axis=-1)
        r = jax.nn.sigmoid(gx_r + gh_r)
        z = jax.nn.sigmoid(gx_z + gh_z)
        nn = jnp.tanh(gx_n + r * gh_n)
        h_old_loc = jax.lax.dynamic_slice_in_dim(
            h_full, shard * hloc, hloc, axis=2
        )
        h_new_loc = (1.0 - z) * nn + z * h_old_loc  # (D, B, h)
        # ONE collective per step: reassemble h in natural order
        h_new = jax.lax.all_gather(h_new_loc, axis, axis=2, tiled=True)
        m = m_t[None, :, None]
        h_next = m * h_new + (1.0 - m) * h_full
        return h_next, h_new_loc * m

    _, out = jax.lax.scan(step, h0, (gx, mask))  # out (T, D, B, h)

    if ndir == 2:
        out_f = out[:, 0]
        out_b = _reverse_valid(out[:, 1], lengths)
        merged = out_f + out_b
    else:
        merged = out[:, 0]
    # replicate the layer output once per layer for the next w_ih
    return jax.lax.all_gather(merged, axis, axis=2, tiled=True)


def _gru_layer_dirsharded(x, lengths, fwd_loc, bwd_loc, axis: str):
    """Direction-parallel bidirectional GRU body for a 2-way model axis:
    shard 0 runs the forward chain, shard 1 the backward chain — each a
    complete local Pallas recurrence (gru_scan) on its direction's full
    (H, 3H) weights; the sum-merge is one psum per layer."""
    from ..ops.pallas_gru import backend_supports_mosaic, gru_scan

    t_max, batch, _ = x.shape
    mm_dtype = fwd_loc.w_ih.dtype
    shard = jax.lax.axis_index(axis)
    reverse = shard == 1

    # each chip got its direction's weights via the P('model', ...) spec on
    # the stacked (D=2, ...) arrays — the sharded leading axis arrives with
    # local size 1
    w_ih, w_hh = fwd_loc.w_ih[0], fwd_loc.w_hh[0]
    b_ih, b_hh = fwd_loc.b_ih[0], fwd_loc.b_hh[0]
    del bwd_loc

    # the backward chain consumes the valid-reversed sequence
    x_dir = jnp.where(reverse, _reverse_valid(x, lengths), x)
    gx = jnp.einsum("tbi,ik->tbk", x_dir.astype(mm_dtype), w_ih)
    h0 = jnp.zeros((batch, w_hh.shape[0]), jnp.float32)
    out, _ = gru_scan(
        gx, lengths, w_hh, b_hh, h0,
        reverse=False, interpret=not backend_supports_mosaic(), b_ih=b_ih,
    )
    out = out.astype(jnp.float32)
    out = jnp.where(reverse, _reverse_valid(out, lengths), out)
    # bidirectional sum-merge == one psum per layer
    return jax.lax.psum(out, axis)


# ---------------------------------------------------------------------------
# Full TP forward
# ---------------------------------------------------------------------------


def tp_forward(
    params,
    config,
    x: jnp.ndarray,
    input_lengths: jnp.ndarray,
    mesh: Mesh,
    axis: str = MODEL_AXIS,
    mode: str = "auto",
):
    """Tensor-parallel forward: (N, 1, F, T) -> (N, T', C) probs.

    ``params`` must be pre-packed with :func:`pack_tp_params` (except in
    direction mode, which uses the natural layout). ``mode``:

    - "direction" — bidirectional 2-way direction parallelism (full local
      Pallas recurrences, one psum per layer);
    - "hidden" — gate-aligned hidden sharding (one small all_gather per
      step);
    - "auto" — direction when bidirectional and the axis is 2-way, else
      hidden.

    Numerically identical to models.deepspeech.forward (pinned in
    tests/test_tp.py on the 8-CPU mesh through the pallas-interpret
    branch).
    """
    n = mesh.shape[axis]
    if mode == "auto":
        mode = "direction" if (config.bidirectional and n == 2) else "hidden"

    out_lengths = ds.get_seq_lens(config, input_lengths)
    x = ds.conv_stack(params, config, x, out_lengths)
    nb, c, f, t = x.shape
    x = jnp.transpose(x.reshape(nb, c * f, t), (2, 0, 1))  # (T, B, H)

    if mode == "direction":
        if not config.bidirectional or n != 2:
            raise ValueError("direction mode needs a bidirectional model on a 2-way axis")
        rnn_specs = [
            {
                "bn": jax.tree_util.tree_map(lambda _: P(), e["bn"])
                if e["bn"] is not None
                else None,
                # stacked (D=2, ...) arrays shard their direction axis
                "fwd": GRUWeights(
                    w_ih=P(MODEL_AXIS), w_hh=P(MODEL_AXIS),
                    b_ih=P(MODEL_AXIS), b_hh=P(MODEL_AXIS),
                ),
                "bwd": None,
            }
            for e in params["rnns"]
        ]
        rnn_params = [
            {
                "bn": e["bn"],
                # stack fwd/bwd on a leading axis; P('model') gives each
                # chip its direction's full weights
                "fwd": GRUWeights(
                    w_ih=jnp.stack([e["fwd"].w_ih, e["bwd"].w_ih]),
                    w_hh=jnp.stack([e["fwd"].w_hh, e["bwd"].w_hh]),
                    b_ih=jnp.stack([e["fwd"].b_ih, e["bwd"].b_ih]),
                    b_hh=jnp.stack([e["fwd"].b_hh, e["bwd"].b_hh]),
                ),
                "bwd": None,
            }
            for e in params["rnns"]
        ]
        layer_body = lambda xx, lens, fwd, bwd: _gru_layer_dirsharded(
            xx, lens, fwd, bwd, axis
        )
        head_specs = {
            "fc_bn": jax.tree_util.tree_map(lambda _: P(), params["fc_bn"]),
            "fc": type(params["fc"])(weight=P(), bias=None),
        }
        head_params = {"fc_bn": params["fc_bn"], "fc": params["fc"]}

        def head_body(xx, hp):
            return ds.head(hp, xx)

    else:
        full_specs = tp_pspecs(params)
        rnn_specs = full_specs["rnns"]
        rnn_params = params["rnns"]
        layer_body = lambda xx, lens, fwd, bwd: _gru_layer_hsharded(
            xx, lens, fwd, bwd, axis, n
        )
        head_specs = {"fc_bn": full_specs["fc_bn"], "fc": full_specs["fc"]}
        head_params = {"fc_bn": params["fc_bn"], "fc": params["fc"]}
        hloc = config.rnn_hidden_size // n

        def head_body(xx, hp):
            # xx arrives replicated (T, B, H); contract the local h-slice
            # and psum the class logits
            shard = jax.lax.axis_index(axis)
            x_loc = jax.lax.dynamic_slice_in_dim(xx, shard * hloc, hloc, axis=2)
            scale, shift = hp["fc_bn"].scale_shift()
            x_loc = x_loc * scale + shift
            w = hp["fc"].weight  # local (C, h)
            logits = jnp.dot(
                x_loc.astype(w.dtype), w.T, preferred_element_type=jnp.float32
            )
            return jax.lax.psum(logits, axis)

    if config.rnn_type != "gru":
        raise NotImplementedError("TP forward covers the GRU zoo models")

    smap = _shard_map(mesh)

    def body(xx, lens, rnns, hp, la):
        for entry in rnns:
            if entry["bn"] is not None:
                scale, shift = entry["bn"].scale_shift()
                xx = xx * scale + shift
            xx = layer_body(xx, lens, entry["fwd"], entry["bwd"])
        if not config.bidirectional:
            # depthwise over H: sharded for free on the local rows
            if mode == "hidden":
                shard = jax.lax.axis_index(axis)
                hloc_la = la.weight.shape[0]
                x_loc = jax.lax.dynamic_slice_in_dim(
                    xx, shard * hloc_la, hloc_la, axis=2
                )
                x_la = conv_ops.hardtanh(conv_ops.lookahead(x_loc, la))
                xx = jax.lax.all_gather(x_la, axis, axis=2, tiled=True)
            else:
                xx = conv_ops.hardtanh(conv_ops.lookahead(xx, la))
        logits = head_body(xx, hp)
        return logits

    la_params = params["lookahead"]
    la_specs = (
        type(la_params)(weight=P(MODEL_AXIS, None))
        if (la_params is not None and mode == "hidden")
        else jax.tree_util.tree_map(lambda _: P(), la_params)
    )

    logits = smap(
        body,
        in_specs=(P(), P(), rnn_specs, head_specs, la_specs),
        out_specs=P(),
    )(x, out_lengths, rnn_params, head_params, la_params)

    probs = jax.nn.softmax(jnp.transpose(logits, (1, 0, 2)), axis=-1)
    return probs, out_lengths
