"""On-device (jit) vectorized CTC prefix beam search.

TPU-native counterpart of the host beam decoders (decode/beam.py Python
oracle and native/ctcbeam C++): the whole batch decodes in one XLA program
— no per-utterance host loop, no device->host probability transfer — so it
composes with pjit data parallelism (batch rows sharded over the mesh) and
keeps the TPU busy between acoustic batches.

Algorithm (frame-synchronous prefix beam search, reference ctcdecode
semantics, decoder.py:96-144), sort-free:

- beam state per (batch, beam): log_pb / log_pnb, last char, a pair of
  32-bit rolling prefix hashes (TPU has no native 64-bit ints; two
  independent multiplicative hashes make collisions vanishingly rare),
  and the hash pair of the beam's PARENT prefix (the prefix minus its
  last char);
- each step builds W stay candidates + W x C extension candidates.
  Duplicate prefixes can arise in exactly one pattern: the extension of
  beam j by char c equals beam i's prefix iff prefix_j == prefix_i[:-1]
  and c == last_i (two distinct stays are distinct prefixes; two distinct
  extensions ending in the same char come from distinct parents). So the
  merge is a W x W parent-hash match (one tiny MXU einsum) that folds
  ext(j, last_i) into stay(i) and kills the ext entry — no candidate
  sort, no segmented scan;
- after the fold all candidates are distinct, so top-W selection is a
  single ``lax.top_k`` over the flat (B, W*(C+1)) score array; the winning
  (parent, char) is recovered from index arithmetic and per-step
  bookkeeping is stored (T, B, W) for backtracking.

LM fusion runs on device too (SURVEY §2.2 N2/N3): pass a
decode.device_lm.DeviceLM and word-boundary scores are probed from
HBM-resident n-gram hash tables inside the scan step — see
decode/device_lm.py. This decoder is also the building block the
distributed (beam-sharded) pruning rides on (decode/dist_beam.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# plain numpy so importing this module never initializes the XLA backend
# (jax.distributed.initialize must run before any backend-touching call)
NEG_INF = np.float32(-1e30)

# multiplicative rolling-hash constants (odd, well-mixed 32-bit)
_H1_MUL = np.uint32(0x9E3779B1)
_H2_MUL = np.uint32(0x85EBCA77)

# hash-pair sentinels for dead beam slots: h1 = _DEAD_H1 with h2 = lane id
# keeps dead slots mutually distinct and (whp) distinct from any real
# prefix hash; _DEAD_PH1 marks "no parent" (the empty prefix and dead
# slots), which can never equal a front hash because no live front beam
# carries h1 = _DEAD_PH1.
_DEAD_H1 = np.uint32(0xFFFFFFFF)
_DEAD_PH1 = np.uint32(0xFFFFFFFE)


def _logaddexp(a, b):
    mx = jnp.maximum(a, b)
    mn = jnp.minimum(a, b)
    safe = jnp.where(mx > NEG_INF / 2, mx + jnp.log1p(jnp.exp(mn - mx)), NEG_INF)
    return safe


def init_front(batch: int, w: int):
    """Initial beam front: beam 0 is the live empty prefix, the rest are
    dead sentinel slots. Returns (pb, pnb, last, h1, h2, ph1, ph2)."""
    lane = jnp.arange(w, dtype=jnp.uint32)[None, :]
    pb = jnp.full((batch, w), NEG_INF).at[:, 0].set(0.0)
    pnb = jnp.full((batch, w), NEG_INF)
    last = jnp.full((batch, w), -1, jnp.int32)
    h1 = jnp.full((batch, w), _DEAD_H1, jnp.uint32).at[:, 0].set(0)
    h2 = jnp.broadcast_to(lane, (batch, w)).at[:, 0].set(0)
    ph1 = jnp.full((batch, w), _DEAD_PH1, jnp.uint32)
    ph2 = jnp.broadcast_to(lane, (batch, w))
    return pb, pnb, last, h1, h2, ph1, ph2


def stay_ext_candidates(pb, pnb, last, lp_t, blank, topk_vals=None,
                        topk_cls=None, space=-1, bscore=None):
    """Build the step's candidates for a (slice of the) beam front.

    Returns (stay_pb, stay_pnb, ext) with ext of shape (B, W, K) where the
    class axis is the full C classes, or — when topk_vals/topk_cls (B, K)
    from ``lax.top_k`` over the frame's log-probs are given — the
    reference's ``cutoff_top_n`` per-frame class cut (ctcdecode
    decoder.py:96-100) with only the K most probable classes expanded.
    Under the cut the stay path also only contributes where blank / the
    last char survive the frame cut (the oracle cuts EVERY class).
    ``bscore`` (B, W), if given, is the LM word-boundary bonus added where
    the expanded class is ``space``.
    """
    num_classes = lp_t.shape[-1]
    total = _logaddexp(pb, pnb)  # (B, W)

    lp_blank = lp_t[:, blank][:, None]  # (B, 1)
    lp_last = jnp.take_along_axis(
        lp_t, jnp.clip(last, 0, num_classes - 1), axis=-1
    )  # (B, W)

    if topk_cls is not None:
        blank_in = jnp.any(topk_cls == blank, axis=-1)[:, None]  # (B, 1)
        last_in = jnp.any(
            topk_cls[:, None, :] == last[:, :, None], axis=-1
        )  # (B, W)
        stay_pb = jnp.where(blank_in, total + lp_blank, NEG_INF)
        stay_pnb = jnp.where(last_in & (last >= 0), pnb + lp_last, NEG_INF)
        cls = topk_cls[:, None, :]  # (B, 1, K)
        vals = topk_vals[:, None, :]
    else:
        stay_pb = total + lp_blank
        stay_pnb = jnp.where(last >= 0, pnb + lp_last, NEG_INF)
        cls = jnp.arange(num_classes, dtype=jnp.int32)[None, None, :]
        vals = lp_t[:, None, :]

    # extend with class c: from total, except c == last extends only from
    # pb (the repeat-after-blank path)
    base = total[:, :, None] + vals
    rep = pb[:, :, None] + vals
    is_last = cls == last[:, :, None]
    ext = jnp.where(is_last, rep, base)  # (B, W, K)
    if bscore is not None:
        ext = ext + jnp.where(cls == space, bscore[:, :, None], 0.0)
    ext = jnp.where(cls == blank, NEG_INF, ext)
    return stay_pb, stay_pnb, ext


def ptr_merge_select(stay_pb, stay_pnb, ext, last, h1, h2, ph1, ph2, w,
                     topk_cls=None):
    """Fold duplicate extensions into their stay candidates via the
    parent-hash match, then select the top ``w`` distinct candidates with
    one ``lax.top_k``.

    All front arrays are the FULL (B, W) front (replicated in the sharded
    decoder); ext is (B, W, K). Returns the new front
    (pb, pnb, last, h1, h2, ph1, ph2) plus backtrack pointers
    (parent, char), each (B, w).
    """
    batch, w_in, k = ext.shape
    num_flat = w_in * k

    # --- duplicate fold: ext(j, last_i) -> stay(i) ----------------------
    mergeable = last >= 0  # (B, W)
    pmatch = (
        (ph1[:, :, None] == h1[:, None, :])
        & (ph2[:, :, None] == h2[:, None, :])
        & mergeable[:, :, None]
    )  # (B, W_i, W_j)
    found = jnp.any(pmatch, axis=-1)
    j_of_i = jnp.argmax(pmatch, axis=-1).astype(jnp.int32)  # (B, W)
    if topk_cls is not None:
        cmatch = topk_cls[:, None, :] == last[:, :, None]  # (B, W, K)
        present = jnp.any(cmatch, axis=-1)
        c_of_i = jnp.argmax(cmatch, axis=-1).astype(jnp.int32)
    else:
        present = mergeable
        c_of_i = jnp.clip(last, 0, k - 1)
    can_merge = found & present  # (B, W)

    ext_flat = ext.reshape(batch, num_flat)
    gidx = j_of_i * k + c_of_i
    contrib = jnp.take_along_axis(ext_flat, gidx, axis=1)
    stay_pnb = _logaddexp(
        stay_pnb, jnp.where(can_merge, contrib, NEG_INF)
    )
    # kill the folded ext entries (at most one (j, c) per i — distinct
    # beams with the same parent AND same last char would be equal)
    ohj = ((jnp.arange(w_in)[None, None, :] == j_of_i[:, :, None])
           & can_merge[:, :, None]).astype(jnp.float32)  # (B, W_i, W_j)
    ohc = (jnp.arange(k)[None, None, :] == c_of_i[:, :, None]).astype(
        jnp.float32
    )  # (B, W_i, K)
    killed = jnp.einsum("biw,bik->bwk", ohj, ohc) > 0.5
    ext_flat = jnp.where(killed.reshape(batch, num_flat), NEG_INF, ext_flat)

    # --- top-W over distinct candidates ---------------------------------
    stay_tot = _logaddexp(stay_pb, stay_pnb)
    cand = jnp.concatenate([stay_tot, ext_flat], axis=1)
    top_val, top_idx = jax.lax.top_k(cand, w)  # (B, w)
    is_stay = top_idx < w_in
    eidx = jnp.clip(top_idx - w_in, 0, num_flat - 1)
    src = jnp.where(is_stay, top_idx, eidx // k).astype(jnp.int32)
    kpos = eidx % k
    if topk_cls is not None:
        ch = jnp.take_along_axis(topk_cls, kpos, axis=1).astype(jnp.int32)
    else:
        ch = kpos.astype(jnp.int32)
    ch = jnp.where(is_stay, -1, ch)

    g = lambda a: jnp.take_along_axis(a, src, axis=1)
    n_pb = jnp.where(is_stay, g(stay_pb), NEG_INF)
    n_pnb = jnp.where(is_stay, g(stay_pnb), jnp.take_along_axis(ext_flat, eidx, axis=1))
    hp1, hp2 = g(h1), g(h2)
    chu = (ch + 1).astype(jnp.uint32)
    n_h1 = jnp.where(is_stay, hp1, hp1 * _H1_MUL + chu)
    n_h2 = jnp.where(is_stay, hp2, hp2 * _H2_MUL + chu)
    n_ph1 = jnp.where(is_stay, g(ph1), hp1)
    n_ph2 = jnp.where(is_stay, g(ph2), hp2)
    n_last = jnp.where(is_stay, g(last), ch)

    # dead winners (filler slots while the front is still narrow) get the
    # unique sentinel hashes so they never alias a live prefix
    dead = top_val <= NEG_INF / 2
    lane = jnp.arange(w, dtype=jnp.uint32)[None, :]
    n_h1 = jnp.where(dead, _DEAD_H1, n_h1)
    n_h2 = jnp.where(dead, lane, n_h2)
    n_ph1 = jnp.where(dead, _DEAD_PH1, n_ph1)
    n_ph2 = jnp.where(dead, lane, n_ph2)
    n_last = jnp.where(dead, -1, n_last)
    n_pb = jnp.where(dead, NEG_INF, n_pb)
    n_pnb = jnp.where(dead, NEG_INF, n_pnb)
    bk_char = jnp.where(dead, -1, ch)
    return (n_pb, n_pnb, n_last, n_h1, n_h2, n_ph1, n_ph2), (src, bk_char)


@functools.partial(
    jax.jit,
    static_argnames=(
        "beam_width", "blank", "max_symbols", "space", "cutoff_top_n"
    ),
)
def ctc_beam_search_device(
    probs: jnp.ndarray,  # (B, T, C) softmax probabilities
    lengths: jnp.ndarray,  # (B,) int32 valid frame counts
    beam_width: int = 64,
    blank: int = 0,
    max_symbols: int | None = None,
    lm=None,  # decode.device_lm.DeviceLM for on-device LM fusion
    alpha: float = 0.0,
    beta: float = 0.0,
    space: int = -1,
    cutoff_top_n: int = 40,
):
    """Batched beam search. Returns (labels, times, lens, scores):

    labels — (B, W, T) int32, top-W label sequences (padded with -1)
    times  — (B, W, T) int32 frame index of each emitted char
    lens   — (B, W) int32 sequence lengths
    scores — (B, W) f32 total ln-probabilities, best first

    With ``lm`` (a DeviceLM), word-boundary LM fusion runs inside the scan:
    every space extension earns alpha * ln p(word | context) + beta from
    HBM-resident hash-table probes, and final beams not ending in space
    score their trailing word — the reference's ctcdecode+KenLM
    configuration (decoder.py:96-144) with no host round-trip.
    """
    batch, t_max, num_classes = probs.shape
    w = beam_width
    log_probs = jnp.log(jnp.clip(probs, 1e-30, None)).astype(jnp.float32)

    front0 = init_front(batch, w)

    if lm is not None:
        from .device_lm import (
            boundary_scores,
            init_lm_state,
            reconstruct_lm_state,
            final_scores,
        )

        lm_state0 = init_lm_state(batch, w, lm.order)
    else:
        lm_state0 = None

    use_topk = cutoff_top_n < num_classes

    def step(state, inputs):
        (pb, pnb, last, h1, h2, ph1, ph2), lm_state = state
        lp_t, t = inputs  # (B, C), scalar

        if use_topk:
            topk_vals, topk_cls = jax.lax.top_k(lp_t, cutoff_top_n)
        else:
            topk_vals = topk_cls = None

        if lm is not None:
            if use_topk:
                # LM probing is the dominant per-step cost (hash-table
                # gathers for every beam); a frame whose class cut excludes
                # space cannot extend any word, so the whole probe batch is
                # skipped via cond on most frames of peaky CTC posteriors
                space_present = jnp.any(topk_cls == space)
                bscore, wid = jax.lax.cond(
                    space_present,
                    lambda: boundary_scores(lm, lm_state, alpha, beta),
                    lambda: (
                        jnp.zeros((batch, w), jnp.float32),
                        jnp.full((batch, w), -1, jnp.int32),
                    ),
                )
            else:
                bscore, wid = boundary_scores(lm, lm_state, alpha, beta)
        else:
            bscore = None

        stay_pb, stay_pnb, ext = stay_ext_candidates(
            pb, pnb, last, lp_t, blank,
            topk_vals=topk_vals, topk_cls=topk_cls,
            space=space, bscore=bscore,
        )
        front, (bk_parent, bk_char) = ptr_merge_select(
            stay_pb, stay_pnb, ext, last, h1, h2, ph1, ph2, w,
            topk_cls=topk_cls,
        )

        # freeze state for rows past their length
        active = (t < lengths)[:, None]
        keep = lambda new, old: jnp.where(active, new, old)
        # inactive rows: every beam keeps itself with no emission
        bk_parent = jnp.where(
            active, bk_parent, jnp.arange(w, dtype=jnp.int32)[None, :]
        )
        bk_char = jnp.where(active, bk_char, jnp.full((batch, w), -1, jnp.int32))
        if lm is not None:
            lm_state = reconstruct_lm_state(
                lm_state, bk_parent, bk_char, wid, space
            )
        old = (pb, pnb, last, h1, h2, ph1, ph2)
        new_front = tuple(keep(n, o) for n, o in zip(front, old))
        return (new_front, lm_state), (bk_parent, bk_char)

    ((pb, pnb, last, *_), lm_state), (parents, chars) = jax.lax.scan(
        step,
        (front0, lm_state0),
        (jnp.transpose(log_probs, (1, 0, 2)), jnp.arange(t_max)),
    )
    if lm is not None:
        extra = final_scores(lm, lm_state, last, alpha, beta, space)
    else:
        extra = None
    return backtrack_beams(pb, pnb, parents, chars, t_max, extra_scores=extra)


@functools.partial(jax.jit, static_argnames=("t_max",))
def backtrack_beams(pb, pnb, parents, chars, t_max, extra_scores=None):
    """Score-sort the final beams and reconstruct label sequences + times
    by walking the per-step (parent, char) pointers backwards.

    parents/chars are (T, B, W); ``extra_scores`` (B, W), if given, is
    added to the CTC path scores before ranking (the trailing-word LM
    term). Returns (labels, times, lens, scores).
    """
    batch, w = pb.shape
    scores = _logaddexp(pb, pnb)  # (B, W)
    if extra_scores is not None:
        scores = scores + extra_scores
    order = jnp.argsort(-scores, axis=1)
    scores = jnp.take_along_axis(scores, order, axis=1)

    # ---- backtrack (device): walk parent pointers from the end with a
    # tiny (B, W) carry, emitting each step's on-path char --------------
    def backtrack(beam_idx, inputs):
        par_t, chr_t = inputs  # (B, W), (B, W)
        ch = jnp.take_along_axis(chr_t, beam_idx, axis=1)  # (B, W)
        beam_idx = jnp.take_along_axis(par_t, beam_idx, axis=1)
        return beam_idx, ch

    b_idx = jnp.broadcast_to(order, (batch, w)).astype(jnp.int32)
    _, path = jax.lax.scan(backtrack, b_idx, (parents[::-1], chars[::-1]))
    path = jnp.transpose(path[::-1], (1, 2, 0))  # (B, W, T), time order

    # compact the emitted (>= 0) chars to the front, preserving time
    # order, with ONE small argsort per row instead of T scatter steps
    emitted = path >= 0
    lens = emitted.sum(axis=-1).astype(jnp.int32)  # (B, W)
    t_idx = jnp.arange(t_max, dtype=jnp.int32)
    pos = jnp.cumsum(emitted, axis=-1) - 1  # emission rank in time order
    key = jnp.where(emitted, pos, t_max + t_idx)
    perm = jnp.argsort(key, axis=-1)
    labels = jnp.take_along_axis(path, perm, axis=-1)
    times = jnp.take_along_axis(
        jnp.broadcast_to(t_idx, path.shape), perm, axis=-1
    )
    valid = t_idx[None, None, :] < lens[:, :, None]
    labels = jnp.where(valid, labels, -1)
    times = jnp.where(valid, times, 0)
    return labels, times, lens, scores


class DeviceBeamDecoder:
    """Decoder-API wrapper over :func:`ctc_beam_search_device`.

    Same (strings, offsets) contract as BeamCTCDecoder.decode — including
    LM-fused decoding when ``lm`` is given (an NgramLM/ARPA path is packed
    into a DeviceLM on construction and lives in HBM across calls).
    """

    def __init__(
        self,
        labels: str,
        beam_width: int = 64,
        blank_index: int = 0,
        lm=None,
        alpha: float = 0.0,
        beta: float = 0.0,
        cutoff_top_n: int = 40,
    ):
        self.labels = labels
        self.beam_width = beam_width
        self.blank_index = blank_index
        self.cutoff_top_n = cutoff_top_n
        self.space_index = labels.index(" ") if " " in labels else -1
        self.alpha = alpha
        self.beta = beta
        from .lm import coerce_device_lm

        self.lm = coerce_device_lm(lm, labels)

    # engine hint: decode(n_best=...) limits the beams fetched to host
    supports_n_best = True

    def decode(self, probs, sizes=None, n_best: int | None = None):
        """Decode to (strings, offsets). ``n_best`` limits how many beams
        are converted AND fetched — the (B, W, T) label/time arrays are
        sliced on device first, so a top-1 serving call transfers W x less
        than the full ctcdecode-style all-beams return."""
        probs = jnp.asarray(probs)
        batch, t_max, _ = probs.shape
        sizes = (
            jnp.asarray(sizes, jnp.int32)
            if sizes is not None
            else jnp.full((batch,), t_max, jnp.int32)
        )
        labels, times, lens, scores = ctc_beam_search_device(
            probs, sizes, beam_width=self.beam_width, blank=self.blank_index,
            lm=self.lm, alpha=self.alpha, beta=self.beta,
            space=self.space_index, cutoff_top_n=self.cutoff_top_n,
        )
        return reconstruct_beam_results(
            labels, times, lens, self.labels, self.beam_width, n_best
        )


def reconstruct_beam_results(labels, times, lens, label_str, beam_width,
                             n_best):
    """Slice beams on device, fetch, and rebuild the reference's nested
    (strings, offsets) layout — shared by the device and sharded decoders
    (previously copy-pasted; r4 code-review finding)."""
    top = beam_width if n_best is None else min(n_best, beam_width)
    labels = np.asarray(labels[:, :top])
    times = np.asarray(times[:, :top])
    lens = np.asarray(lens[:, :top])
    all_strings, all_offsets = [], []
    for b in range(labels.shape[0]):
        strings, offsets = [], []
        for k in range(top):
            n = int(lens[b, k])
            strings.append("".join(label_str[c] for c in labels[b, k, :n]))
            offsets.append(times[b, k, :n].astype(np.int32))
        all_strings.append(strings)
        all_offsets.append(offsets)
    return all_strings, all_offsets
