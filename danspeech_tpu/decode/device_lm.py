"""Device-resident n-gram LM scoring for the on-device beam search.

Completes SURVEY §2.2 N2/N3: the reference's LM-fused beam decode lives in
the external C++ ctcdecode extension + KenLM
(/root/reference/danspeech/deepspeech/decoder.py:96-100); round 1 replaced
that with a host C++ decoder (native/ctcbeam) but the flagship LM-decode
configuration could not ride the device mesh. This module puts the n-gram
tables in HBM and scores words *inside* the jitted beam-search step:

- :func:`pack_device_lm` flattens an :class:`~.lm.NgramLM` into an
  open-addressing hash table with bounded linear probing (keys are a pair
  of independent 32-bit multiplicative fingerprints over word ids — TPUs
  have no native 64-bit integers, two 32-bit chains give a 64-bit-equivalent
  collision rate) plus a vocabulary table mapping a rolling hash of a
  word's *label characters* to its word id;
- :func:`boundary_scores` computes alpha * ln p(word | context) + beta for
  each beam's just-completed word with the standard backoff recursion,
  fully vectorized over (batch, beam) via gather probes — no host callback;
- :func:`init_lm_state` / :func:`reconstruct_lm_state` thread the per-beam
  LM state (last order-1 word ids, rolling current-word hash) through the
  beam scan: state is recomputed from each merged candidate's
  (parent, emitted char) pointer, so the candidate sort in
  device_beam.merge_top_w carries no extra payload.

Scoring semantics match the host scorers (decode/lm.py NgramLM /
native/ctcbeam): natural-log probabilities, OOV words at -1000, OOV
context words dropped from the context window at scoring time (they still
occupy a slot of the last order-1 words), empty words (double space)
score 0.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

OOV_SCORE = -1000.0

_M32 = 0xFFFFFFFF
# word-character rolling hash (current partial word)
_WM1 = 0x01000193  # FNV-ish odd multipliers
_WM2 = 0x61C88647
# n-gram word-id chain
_NM1 = 0x9E3779B1
_NM2 = 0x85EBCA77
_NG_SEED1 = 0x811C9DC5
_NG_SEED2 = 0xC2B2AE35
# slot-index mix
_SLOT_MIX = 0x7FEB352D


def _h_word(char_ids) -> tuple[int, int]:
    """Host-side rolling hash of a word's label-character ids."""
    h1 = h2 = 0
    for c in char_ids:
        h1 = (h1 * _WM1 + c + 1) & _M32
        h2 = (h2 * _WM2 + c + 1) & _M32
    return h1, h2


def _h_ngram(word_ids) -> tuple[int, int]:
    """Host-side fingerprint chain over word ids (oldest first)."""
    h1, h2 = _NG_SEED1, _NG_SEED2
    for w in word_ids:
        h1 = (h1 * _NM1 + w + 1) & _M32
        h2 = (h2 * _NM2 + w + 1) & _M32
    if h1 == 0 and h2 == 0:  # keep (0,0) free as the empty-slot sentinel
        h1 = h2 = 1
    return h1, h2


def _slot(h1: int, h2: int, size: int) -> int:
    return ((h1 ^ ((h2 * _SLOT_MIX) & _M32)) & _M32) % size


class _TableBuilder:
    """Open-addressing insert with a bounded probe window; grows and
    rehashes when any entry would land further than max_probe slots from
    its home, so the device lookup can gather a fixed-size window.

    The window size is the dominant device-side LM cost (every beam's
    boundary score gathers (2*order+1) probes x window slots per frame),
    so the table trades memory for a small window: 2.5x load headroom
    keeps displacements < 8 for virtually all entries, and the
    grow-and-retry loop guarantees the bound."""

    def __init__(self, n_entries: int, n_values: int, max_probe: int):
        self.max_probe = max_probe
        self.n_values = n_values
        self.size = max(8, int(n_entries * 2.5))
        self._alloc()

    def _alloc(self):
        self.k1 = np.zeros(self.size, np.uint32)
        self.k2 = np.zeros(self.size, np.uint32)
        self.values = np.zeros((self.size, self.n_values), np.float32)

    def insert_all(self, entries):
        """entries: list of (h1, h2, value-tuple). Retries with a larger
        table until every displacement fits the probe window."""
        while True:
            self._alloc()
            if all(self._insert(*e) for e in entries):
                return
            self.size = int(self.size * 1.5)

    def _insert(self, h1, h2, vals) -> bool:
        i = _slot(h1, h2, self.size)
        for d in range(self.max_probe):
            j = (i + d) % self.size
            if self.k1[j] == 0 and self.k2[j] == 0:
                self.k1[j] = h1
                self.k2[j] = h2
                self.values[j] = vals
                return True
            if self.k1[j] == h1 and self.k2[j] == h2:
                raise ValueError("duplicate key in device LM table")
        return False


@jax.tree_util.register_pytree_node_class
class DeviceLM:
    """N-gram LM packed as device arrays; a jit-traceable pytree whose
    static aux data is (order, max_probe)."""

    def __init__(
        self, order, max_probe,
        ng_k1, ng_k2, ng_prob, ng_backoff,
        voc_k1, voc_k2, voc_id,
    ):
        self.order = int(order)
        self.max_probe = int(max_probe)
        self.ng_k1 = ng_k1
        self.ng_k2 = ng_k2
        self.ng_prob = ng_prob
        self.ng_backoff = ng_backoff
        self.voc_k1 = voc_k1
        self.voc_k2 = voc_k2
        self.voc_id = voc_id

    def tree_flatten(self):
        children = (
            self.ng_k1, self.ng_k2, self.ng_prob, self.ng_backoff,
            self.voc_k1, self.voc_k2, self.voc_id,
        )
        return children, (self.order, self.max_probe)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*aux, *children)


def pack_device_lm(lm, labels: str, max_probe: int = 8) -> DeviceLM:
    """Pack an NgramLM (decode/lm.py) into a :class:`DeviceLM`.

    ``labels`` is the acoustic label string: the vocabulary table is keyed
    by each word's label-character ids (the only spelling the beam search
    can produce), so LM words containing characters outside ``labels`` are
    unreachable and skipped.
    """
    char_index = {ch: i for i, ch in enumerate(labels)}

    voc_entries = []
    seen = {}
    for wid, word in enumerate(lm.words):
        try:
            ids = [char_index[ch] for ch in word]
        except KeyError:
            continue
        if not ids:
            continue
        key = _h_word(ids)
        if key == (0, 0):  # would alias the empty-slot sentinel
            raise ValueError(f"word hash hit the empty sentinel: {word!r}")
        if key in seen:  # 64-bit-equivalent hash collision: effectively
            raise ValueError(  # impossible at zoo-vocabulary sizes
                f"vocab hash collision: {word!r} vs {lm.words[seen[key]]!r}"
            )
        seen[key] = wid
        voc_entries.append((key[0], key[1], (np.float32(wid),)))

    ng_entries = []
    for table in lm.tables:
        for ids, (prob, backoff) in table.items():
            h1, h2 = _h_ngram(ids)
            ng_entries.append((h1, h2, (prob, backoff)))

    vt = _TableBuilder(len(voc_entries), 1, max_probe)
    vt.insert_all(voc_entries)
    nt = _TableBuilder(len(ng_entries), 2, max_probe)
    nt.insert_all(ng_entries)

    return DeviceLM(
        order=lm.order,
        max_probe=max_probe,
        ng_k1=jnp.asarray(nt.k1),
        ng_k2=jnp.asarray(nt.k2),
        ng_prob=jnp.asarray(nt.values[:, 0]),
        ng_backoff=jnp.asarray(nt.values[:, 1]),
        voc_k1=jnp.asarray(vt.k1),
        voc_k2=jnp.asarray(vt.k2),
        voc_id=jnp.asarray(vt.values[:, 0].astype(np.int32)),
    )


# ---------------------------------------------------------------------------
# Device-side probes
# ---------------------------------------------------------------------------


def _probe(tk1, tk2, q1, q2, max_probe: int):
    """Vectorized bounded linear probe. Returns (found, slot) with
    ``slot`` valid only where ``found``; q1/q2 are uint32 of any shape."""
    size = tk1.shape[0]
    idx0 = (q1 ^ (q2 * jnp.uint32(_SLOT_MIX))) % jnp.uint32(size)
    window = jnp.arange(max_probe, dtype=jnp.uint32)
    idx = (idx0[..., None] + window) % jnp.uint32(size)
    gk1 = tk1[idx]
    gk2 = tk2[idx]
    match = (gk1 == q1[..., None]) & (gk2 == q2[..., None])
    found = jnp.any(match, axis=-1)
    j = jnp.argmax(match, axis=-1)
    slot = jnp.take_along_axis(idx, j[..., None].astype(jnp.uint32), axis=-1)[..., 0]
    return found, slot.astype(jnp.int32)


def lookup_word_ids(lm: DeviceLM, wh1, wh2):
    """Map rolling word hashes to word ids; -1 where the word is OOV."""
    found, slot = _probe(lm.voc_k1, lm.voc_k2, wh1, wh2, lm.max_probe)
    return jnp.where(found, lm.voc_id[slot], -1)


def _ngram_probe(lm: DeviceLM, q1, q2):
    found, slot = _probe(lm.ng_k1, lm.ng_k2, q1, q2, lm.max_probe)
    prob = jnp.where(found, lm.ng_prob[slot], 0.0)
    backoff = jnp.where(found, lm.ng_backoff[slot], 0.0)
    return found, prob, backoff


def _compact_context(ctx):
    """Right-align the valid (>= 0) entries of the last-axis context
    buffer, preserving order; invalid slots become -1 on the left.

    Mirrors the host scorers: OOV words occupy a slot of the last order-1
    words but are dropped from the scoring context (lm.py score_word).
    Returns (compacted (..., K) int32, m (...,) int32 valid count).
    """
    k = ctx.shape[-1]
    valid = ctx >= 0
    # count of valid entries at or after each position
    cnt_ge = jnp.cumsum(valid[..., ::-1].astype(jnp.int32), axis=-1)[..., ::-1]
    tgt = k - cnt_ge  # output slot for each valid entry
    onehot = (tgt[..., :, None] == jnp.arange(k)) & valid[..., :, None]
    compacted = jnp.where(
        jnp.any(onehot, axis=-2),
        jnp.sum(jnp.where(onehot, ctx[..., :, None], 0), axis=-2),
        -1,
    )
    return compacted, valid.sum(axis=-1)


def _chain(h1, h2, wid):
    """Extend an n-gram fingerprint chain by one word id (uint32 math)."""
    w = (wid + 1).astype(jnp.uint32)
    return h1 * jnp.uint32(_NM1) + w, h2 * jnp.uint32(_NM2) + w


def score_word_ids(lm: DeviceLM, ctx, wid):
    """ln p(wid | ctx) with backoff, vectorized over leading dims.

    ctx: (..., order-1) int32 word ids oldest-first, -1 = absent/OOV slot;
    wid: (...,) int32, -1 = OOV (scores OOV_SCORE). Matches
    NgramLM.score_word_ids / the native C++ scorer semantics.
    """
    kmax = lm.order - 1
    seed1 = jnp.uint32(_NG_SEED1)
    seed2 = jnp.uint32(_NG_SEED2)
    wid_safe = jnp.maximum(wid, 0)

    if kmax == 0:
        h1, h2 = _chain(seed1, seed2, wid_safe)
        found, prob, _ = _ngram_probe(lm, h1, h2)
        score = jnp.where(found, prob, OOV_SCORE)
        return jnp.where(wid < 0, OOV_SCORE, score)

    cmp_ctx, m = _compact_context(ctx)
    ctx_safe = jnp.maximum(cmp_ctx, 0)

    # fingerprint chains of every context suffix: suffix of length k spans
    # positions [kmax-k, kmax). K <= 4, so the O(K^2) unroll is tiny.
    suf1 = [None] * (kmax + 1)  # suffix length -> (h1, h2)
    suf2 = [None] * (kmax + 1)
    suf1[0], suf2[0] = (
        jnp.broadcast_to(seed1, wid.shape),
        jnp.broadcast_to(seed2, wid.shape),
    )
    for klen in range(1, kmax + 1):
        h1, h2 = seed1, seed2
        for p in range(kmax - klen, kmax):
            h1, h2 = _chain(h1, h2, ctx_safe[..., p])
        suf1[klen], suf2[klen] = h1, h2

    zero = jnp.zeros(wid.shape, jnp.float32)
    result = jnp.full(wid.shape, OOV_SCORE, jnp.float32)
    done = jnp.zeros(wid.shape, bool)
    backoff_acc = zero
    for klen in range(kmax, -1, -1):
        applicable = klen <= m
        q1, q2 = _chain(suf1[klen], suf2[klen], wid_safe)
        # the (0,0) -> (1,1) sentinel remap of the host packer
        sent = (q1 == 0) & (q2 == 0)
        q1 = jnp.where(sent, jnp.uint32(1), q1)
        q2 = jnp.where(sent, jnp.uint32(1), q2)
        found, prob, _ = _ngram_probe(lm, q1, q2)
        hit = applicable & ~done & found
        result = jnp.where(hit, backoff_acc + prob, result)
        done = done | hit
        if klen > 0:
            bq1, bq2 = suf1[klen], suf2[klen]
            bsent = (bq1 == 0) & (bq2 == 0)
            bq1 = jnp.where(bsent, jnp.uint32(1), bq1)
            bq2 = jnp.where(bsent, jnp.uint32(1), bq2)
            bfound, _, bo = _ngram_probe(lm, bq1, bq2)
            backoff_acc = backoff_acc + jnp.where(
                applicable & ~done & bfound, bo, 0.0
            )
    return jnp.where(wid < 0, OOV_SCORE, result)


# ---------------------------------------------------------------------------
# Beam-scan integration
# ---------------------------------------------------------------------------


def init_lm_state(batch: int, w: int, order: int):
    """Per-beam LM state pytree: (ctx, cw_h1, cw_h2, cw_len).

    ctx — (B, W, order-1) int32 last completed word ids (-1 = absent/OOV);
    cw_* — rolling hash pair of the current partial word; cw_len — its
    character count (0 = at a word boundary).
    """
    kmax = max(order - 1, 1)
    return (
        jnp.full((batch, w, kmax), -1, jnp.int32),
        jnp.zeros((batch, w), jnp.uint32),
        jnp.zeros((batch, w), jnp.uint32),
        jnp.zeros((batch, w), jnp.int32),
    )


def boundary_scores(lm: DeviceLM, lm_state, alpha: float, beta: float):
    """(bscore, wid) per beam: the LM bonus the beam earns if the next
    emitted char completes its current word (i.e. is a space), and the
    current word's vocab id (-1 = OOV) for the context push.

    bscore = alpha * ln p(word | ctx) + beta; 0 for an empty word (double
    space), reproducing the host _LMScorer.score_boundary (decode/beam.py).
    """
    ctx, cw_h1, cw_h2, cw_len = lm_state
    wid = lookup_word_ids(lm, cw_h1, cw_h2)
    s = score_word_ids(lm, ctx, wid)
    has_word = cw_len > 0
    wid = jnp.where(has_word, wid, -1)
    return jnp.where(has_word, alpha * s + beta, 0.0), wid


def reconstruct_lm_state(lm_state, parent, char, wid, space: int):
    """LM state of each merged candidate from its (parent, emitted char).

    The LM state is a pure function of the prefix, and a merged candidate's
    prefix is parent-prefix + char — so instead of sorting the LM state
    through merge_top_w, gather the parent's state and apply one char
    update. ``parent``/``char`` are the (B, W) backtrack pointers the merge
    emits (char -1 = no emission), ``wid`` the per-parent current-word ids
    from :func:`boundary_scores`.
    """
    ctx, cw_h1, cw_h2, cw_len = lm_state
    g2 = lambda a: jnp.take_along_axis(a, parent, axis=1)
    p_ctx = jnp.take_along_axis(ctx, parent[..., None], axis=1)
    p_h1, p_h2, p_len = g2(cw_h1), g2(cw_h2), g2(cw_len)
    p_wid = g2(wid)

    is_space = char == space
    is_char = (char >= 0) & ~is_space

    pushed = jnp.concatenate([p_ctx[..., 1:], p_wid[..., None]], axis=-1)
    new_ctx = jnp.where((is_space & (p_len > 0))[..., None], pushed, p_ctx)

    c = jnp.where(is_char, char, 0).astype(jnp.uint32) + 1
    up_h1 = p_h1 * jnp.uint32(_WM1) + c
    up_h2 = p_h2 * jnp.uint32(_WM2) + c
    zero_u = jnp.zeros_like(p_h1)
    new_h1 = jnp.where(is_space, zero_u, jnp.where(is_char, up_h1, p_h1))
    new_h2 = jnp.where(is_space, zero_u, jnp.where(is_char, up_h2, p_h2))
    new_len = jnp.where(
        is_space, 0, p_len + is_char.astype(jnp.int32)
    )
    return new_ctx, new_h1, new_h2, new_len


def final_scores(lm: DeviceLM, lm_state, last, alpha: float, beta: float,
                 space: int):
    """End-of-utterance LM bonus: prefixes not ending in space score their
    trailing partial word (host oracle decode/beam.py prefix_beam_search
    final loop; ctcdecode semantics)."""
    bscore, _ = boundary_scores(lm, lm_state, alpha, beta)
    return jnp.where((last >= 0) & (last != space), bscore, 0.0)
