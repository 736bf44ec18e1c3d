"""Cross-chip beam-parallel CTC search (SURVEY §2.5 "beam-search parallel").

Beams shard over the mesh's data axis: each chip expands only its W/n-chip
slice of the beam front (the W x C candidate construction and local sort
are the per-step cost), the candidate arrays are exchanged with
``jax.lax.all_gather`` over ICI, and every chip runs the identical global
merge + top-W prune — so the pruned beam state stays replicated and
deterministic without a designated leader chip.

LM fusion rides the same exchange: each chip probes the HBM-resident
n-gram tables (decode/device_lm.py) for its beam slice only, the per-beam
word ids travel in the same all_gather as the candidates, and the merged
front's LM state is rebuilt from the global (parent, char) pointers — so
the reference's ctcdecode+KenLM configuration
(/root/reference/danspeech/deepspeech/decoder.py:96-144) scales across
chips with cross-chip pruning (SURVEY §2.2 N2/N3 plan).

This complements the data-parallel route (batch rows sharded, see
parallel/batch.py): beam-parallel pays off when a single long utterance
must decode with a very wide beam; DP pays off for throughput. Both ride
the same expand/merge kernels in decode/device_beam.py.

Runs on any mesh — validated on the CPU-simulated 8-device mesh in
tests/test_dist_beam.py against the single-device decoder.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from .device_beam import (
    NEG_INF,
    expand_candidates,
    merge_top_w,
)


def _sharded_search(lp, lengths, beam_width, blank, n_shards, axis,
                    lm=None, alpha=0.0, beta=0.0, space=-1):
    """shard_map body: lp is this chip's full (B, T, C) log-probs (replicated),
    beams are logically sharded — each chip expands its slice."""
    batch, t_max, num_classes = lp.shape
    w = beam_width
    w_local = w // n_shards
    shard = jax.lax.axis_index(axis)
    offset = shard * w_local

    pb = jnp.full((batch, w), NEG_INF).at[:, 0].set(0.0)
    pnb = jnp.full((batch, w), NEG_INF)
    last = jnp.full((batch, w), -1, jnp.int32)
    h1 = jnp.zeros((batch, w), jnp.uint32)
    h2 = jnp.zeros((batch, w), jnp.uint32)

    if lm is not None:
        from .device_lm import (
            boundary_scores,
            init_lm_state,
            reconstruct_lm_state,
        )

        lm_state0 = init_lm_state(batch, w, lm.order)
    else:
        lm_state0 = None

    def step(state, inputs):
        pb, pnb, last, h1, h2, lm_state = state
        lp_t, t = inputs
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, offset, w_local, axis=1)

        if lm is not None:
            # probe the LM only for this chip's beam slice
            local_lm = tuple(
                jax.lax.dynamic_slice_in_dim(a, offset, w_local, axis=1)
                for a in lm_state
            )
            bscore, wid_local = boundary_scores(lm, local_lm, alpha, beta)
            ext_bonus = (
                jnp.zeros((batch, w_local, num_classes))
                .at[:, :, space]
                .set(bscore)
            )
        else:
            ext_bonus = None
            wid_local = None

        # expand ONLY this chip's beam slice; parents recorded globally
        cands = expand_candidates(
            sl(pb), sl(pnb), sl(last), sl(h1), sl(h2), lp_t, blank,
            parent_offset=offset, ext_bonus=ext_bonus,
        )
        # exchange candidate slices over ICI and merge the global front
        gathered = tuple(
            jnp.concatenate(
                jax.lax.all_gather(c, axis), axis=1
            )
            for c in cands
        )
        n_pb, n_pnb, n_h1, n_h2, bk_parent, bk_char = merge_top_w(
            gathered, w
        )
        active = (t < lengths)[:, None]
        keep = lambda new, old: jnp.where(active, new, old)
        bk_parent = jnp.where(
            active, bk_parent, jnp.arange(w, dtype=jnp.int32)[None, :]
        )
        bk_char = jnp.where(
            active, bk_char, jnp.full((batch, w), -1, jnp.int32)
        )
        # last rebuilt from (parent, char) against the replicated front
        n_last = jnp.where(
            bk_char >= 0, bk_char, jnp.take_along_axis(last, bk_parent, axis=1)
        )
        if lm is not None:
            # word ids ride the same exchange; shard order == global order
            wid = jnp.concatenate(
                jax.lax.all_gather(wid_local, axis), axis=1
            )
            lm_state = reconstruct_lm_state(
                lm_state, bk_parent, bk_char, wid, space
            )
        new_state = (
            keep(n_pb, pb), keep(n_pnb, pnb), n_last,
            keep(n_h1, h1), keep(n_h2, h2), lm_state,
        )
        return new_state, (bk_parent, bk_char)

    (pb, pnb, last, h1, h2, lm_state), (parents, chars) = jax.lax.scan(
        step,
        (pb, pnb, last, h1, h2, lm_state0),
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

    if lm is not None:
        body = functools.partial(
            _sharded_search,
            beam_width=beam_width,
            blank=blank,
            n_shards=n_shards,
            axis=axis,
            alpha=alpha,
            beta=beta,
            space=space,
        )
        lm_specs = jax.tree_util.tree_map(lambda _: P(), lm)
        pb, pnb, parents, chars, extra = smap(
            lambda lp, lens, dlm: body(lp, lens, lm=dlm),
            mesh=mesh,
            in_specs=(P(), P(), lm_specs),
            out_specs=(P(), P(), P(), P(), P()),
        )(log_probs, lengths.astype(jnp.int32), lm)
    else:
        body = functools.partial(
            _sharded_search,
            beam_width=beam_width,
            blank=blank,
            n_shards=n_shards,
            axis=axis,
        )
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
    ):
        self.labels = labels
        self.mesh = mesh
        self.axis = axis
        self.beam_width = beam_width
        self.blank_index = blank_index
        self.space_index = labels.index(" ") if " " in labels else -1
        self.alpha = alpha
        self.beta = beta
        if lm is not None:
            from .device_lm import DeviceLM, pack_device_lm

            if isinstance(lm, str):
                from .lm import load_lm

                lm = load_lm(lm)
            if not isinstance(lm, DeviceLM):
                lm = pack_device_lm(lm, labels)
        self.lm = lm

    supports_n_best = True

    def decode(self, probs, sizes=None, n_best: int | None = None):
        import numpy as np

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
            space=self.space_index,
        )
        top = self.beam_width if n_best is None else min(n_best, self.beam_width)
        labels, times = np.asarray(labels[:, :top]), np.asarray(times[:, :top])
        lens = np.asarray(lens[:, :top])
        all_strings, all_offsets = [], []
        for b in range(batch):
            strings, offsets = [], []
            for k in range(top):
                n = int(lens[b, k])
                strings.append(
                    "".join(self.labels[c] for c in labels[b, k, :n])
                )
                offsets.append(times[b, k, :n].astype(np.int32))
            all_strings.append(strings)
            all_offsets.append(offsets)
        return all_strings, all_offsets
