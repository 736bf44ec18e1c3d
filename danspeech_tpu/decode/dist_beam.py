"""Cross-chip beam-parallel CTC search (SURVEY §2.5 "beam-search parallel").

Beams shard over the mesh's data axis: each chip builds the stay/extension
candidates (and probes the HBM-resident LM) for only its W/n-chip slice of
the beam front, the candidate score arrays are exchanged with
``jax.lax.all_gather`` over ICI, and every chip runs the identical global
parent-pointer merge + top-W selection (device_beam.ptr_merge_select) — so
the pruned beam state stays replicated and deterministic without a
designated leader chip.

LM fusion rides the same exchange: each chip probes the n-gram tables
(decode/device_lm.py) for its beam slice only, the per-beam word ids
travel in the same all_gather as the candidate scores, and the merged
front's LM state is rebuilt from the global (parent, char) pointers — so
the reference's ctcdecode+KenLM configuration
(/root/reference/danspeech/deepspeech/decoder.py:96-144) scales across
chips with cross-chip pruning (SURVEY §2.2 N2/N3 plan). The reference's
``cutoff_top_n`` per-frame class cut applies here too: the frame top-K is
computed from the replicated log-probs, so every chip expands the same K
classes and the exchange shrinks from W_local x C to W_local x K.

This complements the data-parallel route (batch rows sharded, see
parallel/batch.py): beam-parallel pays off when a single long utterance
must decode with a very wide beam; DP pays off for throughput. Both ride
the same candidate/merge kernels in decode/device_beam.py.

Runs on any mesh — validated on the CPU-simulated 8-device mesh in
tests/test_dist_beam.py against the single-device decoder.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from .device_beam import (
    init_front,
    ptr_merge_select,
    stay_ext_candidates,
)


def _sharded_search(lp, lengths, beam_width, blank, n_shards, axis,
                    lm=None, alpha=0.0, beta=0.0, space=-1,
                    cutoff_top_n=40):
    """shard_map body: lp is this chip's full (B, T, C) log-probs
    (replicated), beams are logically sharded — each chip builds
    candidates for its slice; the merged front stays replicated."""
    batch, t_max, num_classes = lp.shape
    w = beam_width
    w_local = w // n_shards
    shard = jax.lax.axis_index(axis)
    offset = shard * w_local

    front0 = init_front(batch, w)

    if lm is not None:
        from .device_lm import (
            boundary_scores,
            init_lm_state,
            reconstruct_lm_state,
        )

        lm_state0 = init_lm_state(batch, w, lm.order)
    else:
        lm_state0 = None

    use_topk = cutoff_top_n < num_classes
    gather = lambda a: jnp.concatenate(jax.lax.all_gather(a, axis), axis=1)

    def step(state, inputs):
        (pb, pnb, last, h1, h2, ph1, ph2), lm_state = state
        lp_t, t = inputs
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, offset, w_local, axis=1)

        if use_topk:
            # replicated input -> every chip computes the identical cut
            topk_vals, topk_cls = jax.lax.top_k(lp_t, cutoff_top_n)
        else:
            topk_vals = topk_cls = None

        if lm is not None:
            # probe the LM only for this chip's beam slice
            local_lm = tuple(
                jax.lax.dynamic_slice_in_dim(a, offset, w_local, axis=1)
                for a in lm_state
            )
            if use_topk:
                space_present = jnp.any(topk_cls == space)
                bscore, wid_local = jax.lax.cond(
                    space_present,
                    lambda: boundary_scores(lm, local_lm, alpha, beta),
                    lambda: (
                        jnp.zeros((batch, w_local), jnp.float32),
                        jnp.full((batch, w_local), -1, jnp.int32),
                    ),
                )
            else:
                bscore, wid_local = boundary_scores(lm, local_lm, alpha, beta)
        else:
            bscore = None
            wid_local = None

        # candidates for ONLY this chip's beam slice
        stay_pb_l, stay_pnb_l, ext_l = stay_ext_candidates(
            sl(pb), sl(pnb), sl(last), lp_t, blank,
            topk_vals=topk_vals, topk_cls=topk_cls,
            space=space, bscore=bscore,
        )
        # exchange candidate scores over ICI; shard order == global order,
        # so the reassembled arrays line up with the replicated front
        stay_pb = gather(stay_pb_l)
        stay_pnb = gather(stay_pnb_l)
        ext = gather(ext_l)
        # identical global merge on every chip keeps the front replicated
        front, (bk_parent, bk_char) = ptr_merge_select(
            stay_pb, stay_pnb, ext, last, h1, h2, ph1, ph2, w,
            topk_cls=topk_cls,
        )

        active = (t < lengths)[:, None]
        keep = lambda new, old: jnp.where(active, new, old)
        bk_parent = jnp.where(
            active, bk_parent, jnp.arange(w, dtype=jnp.int32)[None, :]
        )
        bk_char = jnp.where(
            active, bk_char, jnp.full((batch, w), -1, jnp.int32)
        )
        if lm is not None:
            # word ids ride the same exchange
            wid = gather(wid_local)
            lm_state = reconstruct_lm_state(
                lm_state, bk_parent, bk_char, wid, space
            )
        old = (pb, pnb, last, h1, h2, ph1, ph2)
        new_front = tuple(keep(n, o) for n, o in zip(front, old))
        return (new_front, lm_state), (bk_parent, bk_char)

    ((pb, pnb, last, *_), lm_state), (parents, chars) = jax.lax.scan(
        step,
        (front0, lm_state0),
        (jnp.transpose(lp, (1, 0, 2)), jnp.arange(t_max)),
    )
    if lm is not None:
        from .device_lm import final_scores

        extra = final_scores(lm, lm_state, last, alpha, beta, space)
    else:
        extra = jnp.zeros_like(pb)
    return pb, pnb, parents, chars, extra


def ctc_beam_search_beam_sharded(
    probs: jnp.ndarray,  # (B, T, C) softmax probabilities (replicated)
    lengths: jnp.ndarray,  # (B,)
    mesh: Mesh,
    axis: str = "data",
    beam_width: int = 64,
    blank: int = 0,
    lm=None,  # decode.device_lm.DeviceLM (replicated over the mesh)
    alpha: float = 0.0,
    beta: float = 0.0,
    space: int = -1,
    cutoff_top_n: int = 40,
):
    """Beam-sharded search over ``mesh``'s ``axis``.

    Returns (labels, times, lens, scores) exactly like
    :func:`device_beam.ctc_beam_search_device` — and, modulo pruning ties,
    the same values: the global merged front each step is identical to the
    single-device front.
    """
    try:
        from jax import shard_map

        smap = functools.partial(shard_map, check_vma=False)
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

        smap = functools.partial(shard_map, check_rep=False)

    n_shards = mesh.shape[axis]
    if beam_width % n_shards:
        raise ValueError(
            f"beam_width {beam_width} must divide over {n_shards} shards"
        )
    batch, t_max, _ = probs.shape
    log_probs = jnp.log(jnp.clip(probs, 1e-30, None)).astype(jnp.float32)

    body = functools.partial(
        _sharded_search,
        beam_width=beam_width,
        blank=blank,
        n_shards=n_shards,
        axis=axis,
        alpha=alpha,
        beta=beta,
        space=space,
        cutoff_top_n=cutoff_top_n,
    )
    if lm is not None:
        lm_specs = jax.tree_util.tree_map(lambda _: P(), lm)
        pb, pnb, parents, chars, extra = smap(
            lambda lp, lens, dlm: body(lp, lens, lm=dlm),
            mesh=mesh,
            in_specs=(P(), P(), lm_specs),
            out_specs=(P(), P(), P(), P(), P()),
        )(log_probs, lengths.astype(jnp.int32), lm)
    else:
        pb, pnb, parents, chars, extra = smap(
            body,
            mesh=mesh,
            in_specs=(P(), P()),
            out_specs=(P(), P(), P(), P(), P()),
        )(log_probs, lengths.astype(jnp.int32))

    from .device_beam import backtrack_beams

    return backtrack_beams(pb, pnb, parents, chars, t_max, extra_scores=extra)


class ShardedBeamDecoder:
    """Decoder-API wrapper over :func:`ctc_beam_search_beam_sharded`.

    Same (strings, offsets) contract as BeamCTCDecoder.decode / the
    DeviceBeamDecoder, with the beam front sharded over ``mesh``'s data
    axis; reachable from the public API via
    ``Recognizer.update_decoder(backend="sharded", mesh=...)``.
    """

    def __init__(
        self,
        labels: str,
        mesh: Mesh,
        axis: str = "data",
        beam_width: int = 64,
        blank_index: int = 0,
        lm=None,
        alpha: float = 0.0,
        beta: float = 0.0,
        cutoff_top_n: int = 40,
    ):
        self.labels = labels
        self.mesh = mesh
        self.axis = axis
        self.beam_width = beam_width
        self.blank_index = blank_index
        self.cutoff_top_n = cutoff_top_n
        self.space_index = labels.index(" ") if " " in labels else -1
        self.alpha = alpha
        self.beta = beta
        from .lm import coerce_device_lm

        self.lm = coerce_device_lm(lm, labels)

    supports_n_best = True

    def decode(self, probs, sizes=None, n_best: int | None = None):
        probs = jnp.asarray(probs)
        batch, t_max, _ = probs.shape
        sizes = (
            jnp.asarray(sizes, jnp.int32)
            if sizes is not None
            else jnp.full((batch,), t_max, jnp.int32)
        )
        labels, times, lens, scores = ctc_beam_search_beam_sharded(
            probs, sizes, self.mesh, axis=self.axis,
            beam_width=self.beam_width, blank=self.blank_index,
            lm=self.lm, alpha=self.alpha, beta=self.beta,
            space=self.space_index, cutoff_top_n=self.cutoff_top_n,
        )
        from .device_beam import reconstruct_beam_results

        return reconstruct_beam_results(
            labels, times, lens, self.labels, self.beam_width, n_best
        )
