"""Band-packed Pallas aligner — v2 kernel.

The v1 kernel (align_pallas.py) computes full [B, Lt] rows although only
a ~(11+|Δlen|)-wide band per row is live.  This kernel keeps state in
band-window coordinates w = j - i + ML (ML = 5 + max length excess), so
each DP row is a [W]-vector per pair with W=32 — the moving band —
instead of Lt+1 lanes:

  * pairs live on lanes (128 per slab), the window on sublanes,
  * G slabs stack along sublanes -> [G*W, 128] vector ops per row,
  * the diagonal term needs no shift at all in w-space; the vertical
    term is a sublane roll; the horizontal affine chain is a masked
    Kogge-Stone scan within each W-segment,
  * the text window slides one column per row via an arbitrary-offset
    dynamic sublane slice of the transposed [Lt, B] text block (the
    text is pre-shifted by ML+1 so the offset is simply the row index).

Same scoring contract as ops/align.py; pairs whose length difference
exceeds the window must use the v1 kernel (asserted by the wrapper).
"""

from __future__ import annotations

import functools

from ..utils import jaxcache as _jaxcache

_jaxcache.enable()

import jax
import jax.numpy as jnp

from ..utils.aot import aot_jit
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SCORE_MATCH = 2
SCORE_MISMATCH = -2
GO = -4
GE = -1
NEG_INF = -(1 << 24)

W = 32           # default band window width (sublanes per pair)
LANES = 128      # pairs per slab

# Packed traceback-stat counters: match in bits 0-8, mismatch in 9-17,
# indel in 18-26 (fields never exceed lenp+lent+2 < 512 for supported
# shapes).  One int32 carries all three through the fill.
MU = 1
XU = 1 << 9
IU = 1 << 18


def _band_kernel(tl_ref, plen_ref, t_ref, p_ref, out_ref, stats_ref=None,
                 *, G, Lp, ML, stats=False, W=W):
    S = G * W
    w_local = jax.lax.broadcasted_iota(jnp.int32, (S, LANES), 0) % W

    def tile(x):  # [G, 1, LANES] -> [S, LANES]
        return jnp.concatenate([
            jnp.broadcast_to(x[g], (W, LANES)) for g in range(G)], axis=0)

    t_lens = tile(tl_ref[:])
    p_lens = tile(plen_ref[:])
    diff = t_lens - p_lens
    left = 5 + jnp.maximum(-diff, 0)
    right = 5 + jnp.maximum(diff, 0)
    w_final = ML + diff  # sublane holding m[lenp][lent]
    # Loop-invariant pieces of the band test: with j = i + w_local - ML,
    # j >= i - left and j <= i + right reduce to bounds on w_local alone
    # (carrying the full per-round scan masks instead was SLOWER — the
    # extra live registers spill — but these three small arrays pay off).
    j_rel = w_local - ML
    wband = (w_local >= ML - left) & (w_local <= ML + right)
    wfin = w_local == w_final

    # row 0 state in w coordinates (j = w - ML at i=0)
    j0 = w_local - ML
    m0 = jnp.where(j0 == 0, 0,
                   jnp.where((j0 >= 1) & (j0 <= t_lens), GO + j0 * GO, NEG_INF))
    e0 = jnp.where(j0 == 0, 0,
                   jnp.where((j0 >= 1) & (j0 <= t_lens),
                             GO + (p_lens + 1) * GO, NEG_INF))
    score0 = jnp.full((S, LANES), NEG_INF, jnp.int32)

    # Count state for the traceback-stats variant (packed MU/XU/IU
    # fields).  Row-0 closed forms mirror the reference walk's boundary
    # behaviour (AlignAlgo.hpp:379-400 quirks): along the top row the
    # delete-run costs j indels, plus one spurious insert when the
    # insert matrix dominates (j > 4*(lenp+1) with these scores); an
    # insert-run reaching the top row costs one extra op.
    if stats:
        pm0 = jnp.where(
            j0 == 0, 0,
            j0 * IU + jnp.where(j0 * GE >= (p_lens + 1) * GO, 0, IU))
        pe0 = jnp.where(j0 == 0, 0, (j0 + 1) * IU)
        stat0 = jnp.zeros((S, LANES), jnp.int32)

    def shift_up(x, fill=NEG_INF):
        """x'[w] = x[w+1] within each W-segment."""
        r = pltpu.roll(x, shift=S - 1, axis=0)
        return jnp.where(w_local == W - 1, fill, r)

    def shift_down(x, fill=NEG_INF):
        """x'[w] = x[w-1] within each W-segment."""
        r = pltpu.roll(x, shift=1, axis=0)
        return jnp.where(w_local == 0, fill, r)

    def seg_copy_scan(key, payload):
        """Inclusive per-segment scan: for each w, the payload at the
        largest key position <= w (keys are sublane indices or the
        -1024 sentinel)."""
        ka, pa = key, payload
        s = 1
        while s < W:
            rk = pltpu.roll(ka, shift=s, axis=0)
            rp = pltpu.roll(pa, shift=s, axis=0)
            take = (w_local >= s) & (rk > ka)
            ka = jnp.where(take, rk, ka)
            pa = jnp.where(take, rp, pa)
            s *= 2
        return ka, pa

    def seg_prefix_max_excl(u):
        """Exclusive running max along w within each W-segment."""
        acc = u
        s = 1
        while s < W:
            r = pltpu.roll(acc, shift=s, axis=0)
            acc = jnp.maximum(acc, jnp.where(w_local < s, NEG_INF, r))
            s *= 2
        r = pltpu.roll(acc, shift=1, axis=0)
        return jnp.where(w_local == 0, NEG_INF, r)

    def body(i, carry):
        if stats:
            m_prev, e_prev, score, pm_prev, pe_prev, statv = carry
        else:
            m_prev, e_prev, score = carry
        j = j_rel + i

        # text window (t pre-shifted by ML+1 rows, so offset == i)
        t_win = jnp.concatenate(
            [t_ref[g, pl.ds(i, W), :] for g in range(G)], axis=0)
        p_base = jnp.concatenate(
            [jnp.broadcast_to(p_ref[g, pl.ds(i - 1, 1), :], (W, LANES))
             for g in range(G)], axis=0)
        sub = jnp.where((t_win == p_base) | (t_win == 4) | (p_base == 4),
                        SCORE_MATCH, SCORE_MISMATCH)

        in_band = wband & (j >= 1) & (j <= t_lens)
        col0 = j == 0
        m0_i = GO + i * GO
        start_le1 = left >= i - 1  # start = max(i-left, 1) <= 1

        # max commutes with the masked shift (both sides fill NEG_INF up
        # to a bounded constant that in_band masking absorbs), so one
        # shift replaces two
        e_cur = shift_up(jnp.maximum(e_prev + GE, m_prev + (GO + GE)))
        e_cur = jnp.where(col0, GO + i * GE, e_cur)

        h = jnp.maximum(m_prev + sub, e_cur)
        h = jnp.where(col0, m0_i, h)
        h = jnp.where(in_band | (col0 & start_le1), h, NEG_INF)

        u = h - GE * j
        # max(m0_i, m0_i - GO) == m0_i - GO since GO < 0
        u = jnp.where(col0,
                      jnp.where(start_le1, m0_i - GO, NEG_INF), u)
        f = GO + GE * j + seg_prefix_max_excl(u)

        ibc = in_band | col0
        m_cur = jnp.maximum(h, f)
        m_cur = jnp.where(ibc, m_cur, NEG_INF)
        m_cur = jnp.where(col0, m0_i, m_cur)
        e_cur = jnp.where(ibc, e_cur, NEG_INF)

        active = i <= p_lens
        m_cur = jnp.where(active, m_cur, m_prev)
        e_cur = jnp.where(active, e_cur, e_prev)
        score = jnp.where((i == p_lens) & wfin, m_cur, score)

        if not stats:
            return m_cur, e_cur, score

        # Forward count propagation with the walk's exact local rules
        # (engine.cc BandedGlobalAlignStats).  The insert-run pop check
        # compares the previous row's m (same j -> w+1 here); the
        # delete-run pop check compares this row's m one column left.
        su = jnp.where(sub == SCORE_MATCH, MU, XU)
        m_up = shift_up(m_prev)
        open_e = m_up + GO + GE == e_cur
        pe_cur = IU + jnp.where(open_e, shift_up(pm_prev, 0),
                                shift_up(pe_prev, 0))
        diag_ok = (m_prev + sub == m_cur) & (j >= 1) & ~col0
        # m without the f matrix: the only values a delete run can root
        # at (an open where m came via f is score-impossible).
        pm_nof = jnp.where(diag_ok, pm_prev + su, pe_cur)
        m_left = shift_down(m_cur)
        o = (m_left + GO + GE == f) & (j >= 1) & ~col0
        o = o | col0
        key = jnp.where(o, w_local, -1024)
        payload = jnp.where(col0, i * IU, shift_down(pm_nof, 0))
        kwin, pwin = seg_copy_scan(key, payload)
        pf_cur = pwin + (w_local - kwin + 1) * IU
        pm_cur = jnp.where(diag_ok, pm_prev + su,
                           jnp.where(f >= e_cur, pf_cur, pe_cur))
        pm_cur = jnp.where(col0, i * IU, pm_cur)

        pm_cur = jnp.where(active, pm_cur, pm_prev)
        pe_cur = jnp.where(active, pe_cur, pe_prev)
        statv = jnp.where((i == p_lens) & wfin, pm_cur, statv)
        return m_cur, e_cur, score, pm_cur, pe_cur, statv

    if stats:
        carry = jax.lax.fori_loop(1, Lp + 1, body,
                                  (m0, e0, score0, pm0, pe0, stat0))
        score, statv = carry[2], carry[5]
        for g in range(G):
            stats_ref[g, :] = jnp.max(statv[g * W:(g + 1) * W, :], axis=0)
    else:
        _, _, score = jax.lax.fori_loop(1, Lp + 1, body, (m0, e0, score0))
    for g in range(G):
        out_ref[g, :] = jnp.max(score[g * W:(g + 1) * W, :], axis=0)


def _round_up(x, m):
    return (x + m - 1) // m * m


@functools.partial(jax.jit,
                   static_argnames=("G", "ML", "Lp", "interpret", "W"))
def _band_call(tl, plen, t_pad, p_pad, G: int, ML: int, Lp: int,
               interpret: bool = False, W: int = W):
    """Single-block call ([G, ...] inputs) — used by tests."""
    return pl.pallas_call(
        functools.partial(_band_kernel, G=G, Lp=Lp, ML=ML, W=W),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, LANES), jnp.int32),
        interpret=interpret,
    )(tl, plen, t_pad, p_pad)


@functools.partial(jax.jit,
                   static_argnames=("G", "ML", "Lp", "interpret", "W"))
def _band_stats_call(tl, plen, t_pad, p_pad, G: int, ML: int, Lp: int,
                     interpret: bool = False, W: int = W):
    """Single-block scores+stats call — used by tests."""
    return pl.pallas_call(
        functools.partial(_band_kernel, G=G, Lp=Lp, ML=ML, stats=True, W=W),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((G, LANES), jnp.int32)] * 2,
        interpret=interpret,
    )(tl, plen, t_pad, p_pad)


@functools.partial(
    aot_jit,
    static_argnames=("G", "ML", "Lp", "Lt", "Lt_pad", "Lp_pad", "nblocks",
                     "stats", "interpret", "W"))
def _band_grid(t_codes, t_lens, p_codes, p_lens, G: int, ML: int, Lp: int,
               Lt: int, Lt_pad: int, Lp_pad: int, nblocks: int,
               stats: bool = False, interpret: bool = False, W: int = W):
    """Whole-batch path: packs/transposes on device and runs one
    pallas_call with a grid over pair blocks."""
    P = G * LANES
    B = t_codes.shape[0]
    lead = ML + 1

    tb = jnp.zeros((nblocks * P, Lt_pad), jnp.int32)
    tb = tb.at[:B, lead:lead + Lt].set(t_codes.astype(jnp.int32))
    pb = jnp.zeros((nblocks * P, Lp_pad), jnp.int32)
    pb = pb.at[:B, :Lp].set(p_codes.astype(jnp.int32))
    tl = jnp.zeros(nblocks * P, jnp.int32).at[:B].set(t_lens.astype(jnp.int32))
    pln = jnp.zeros(nblocks * P, jnp.int32).at[:B].set(p_lens.astype(jnp.int32))

    t_pad = tb.reshape(nblocks * G, LANES, Lt_pad).transpose(0, 2, 1)
    p_pad = pb.reshape(nblocks * G, LANES, Lp_pad).transpose(0, 2, 1)
    tl = tl.reshape(nblocks * G, 1, LANES)
    pln = pln.reshape(nblocks * G, 1, LANES)

    out_spec = pl.BlockSpec((G, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((nblocks * G, LANES), jnp.int32)
    out = pl.pallas_call(
        functools.partial(_band_kernel, G=G, Lp=Lp, ML=ML, stats=stats, W=W),
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((G, 1, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, 1, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, Lt_pad, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, Lp_pad, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[out_spec] * 2 if stats else out_spec,
        out_shape=[out_shape] * 2 if stats else out_shape,
        interpret=interpret,
    )(tl, pln, t_pad, p_pad)
    if stats:
        out, packed = out
        packed = packed.reshape(-1)[:B]
    scores = out.reshape(-1)[:B]

    single = (t_lens == 1) & (p_lens == 1)
    eq = ((t_codes[:, 0] == p_codes[:, 0]) | (t_codes[:, 0] == 4)
          | (p_codes[:, 0] == 4))
    scores = jnp.where(single, jnp.where(eq, SCORE_MATCH, SCORE_MISMATCH),
                       scores)
    empty = (t_lens == 0) | (p_lens == 0)
    scores = jnp.where(empty, 0, scores)
    if not stats:
        return scores
    packed = jnp.where(single, jnp.where(eq, MU, XU), packed)
    packed = jnp.where(empty, 0, packed)
    return scores, packed


def band_window(ml: int, max_tp_diff: int, cap: int = 256) -> int:
    """Smallest window width (multiple of 8) covering the full band:
    the in-band region reaches w = ML + 5 + (t_len - p_len) mid-row, so
    every band cell is represented iff W > that for every pair."""
    need = ml + 5 + max(max_tp_diff, 0) + 1
    w = _round_up(max(need, 8), 8)
    assert w <= cap, "band exceeds the maximum window; use the v1 kernel"
    return w


def banded_scores_band(t_codes, t_lens, p_codes, p_lens, G: int = 8,
                       interpret: bool = False):
    """Band-packed scores; the window width adapts to the batch's
    maximum length difference (narrower window = fewer live sublanes)."""
    t_codes = np.asarray(t_codes)
    p_codes = np.asarray(p_codes)
    t_lens = np.asarray(t_lens, np.int32)
    p_lens = np.asarray(p_lens, np.int32)
    B, Lt = t_codes.shape
    Lp = int(p_codes.shape[1])
    ML = 5 + max(0, int((p_lens - t_lens).max(initial=0)))
    Wd = band_window(ML, int((t_lens - p_lens).max(initial=0)))

    P = G * LANES
    lead = ML + 1
    Lt_pad = _round_up(max(Lt + lead, Lp + Wd + 1) + 1, 8)
    Lp_pad = _round_up(max(Lp, 8), 8)
    nblocks = -(-B // P)
    return np.asarray(_band_grid(
        jnp.asarray(t_codes), jnp.asarray(t_lens), jnp.asarray(p_codes),
        jnp.asarray(p_lens), G, ML, Lp, Lt, Lt_pad, Lp_pad, nblocks,
        interpret=interpret, W=Wd))


def banded_stats_band(t_codes, t_lens, p_codes, p_lens, G: int = 8,
                      ml: int = None, w: int = None,
                      interpret: bool = False):
    """Scores plus match/mismatch/indel counts along the optimal
    traceback, computed by forward count propagation with the walk's
    exact tie-break rules (engine.cc BandedGlobalAlignStats) — no
    direction bits, no traceback pass.  Returns
    (scores, match, mismatch, indel) int32 arrays of shape [B].
    The window width adapts to ML and the maximum length difference."""
    t_codes = np.asarray(t_codes)
    p_codes = np.asarray(p_codes)
    t_lens = np.asarray(t_lens, np.int32)
    p_lens = np.asarray(p_lens, np.int32)
    B, Lt = t_codes.shape
    Lp = int(p_codes.shape[1])
    ML = (ml if ml is not None
          else 5 + max(0, int((p_lens - t_lens).max(initial=0))))
    assert ML >= 5 + max(0, int((p_lens - t_lens).max(initial=0)))
    Wd = w if w is not None else band_window(
        ML, int((t_lens - p_lens).max(initial=0)))
    assert Wd >= band_window(ML, int((t_lens - p_lens).max(initial=0)))
    # A counter field can reach t_len+p_len+2 ops for its pair; the 9-bit
    # packing overflows at 512 (tests/test_defer_caps.py pins both sides).
    max_ops = int((t_lens + p_lens).max(initial=0)) + 2
    assert max_ops < 512, "packed count fields overflow beyond 511 ops"

    P = G * LANES
    lead = ML + 1
    Lt_pad = _round_up(max(Lt + lead, Lp + Wd + 1) + 1, 8)
    Lp_pad = _round_up(max(Lp, 8), 8)
    nblocks = -(-B // P)
    scores, packed = _band_grid(
        jnp.asarray(t_codes), jnp.asarray(t_lens), jnp.asarray(p_codes),
        jnp.asarray(p_lens), G, ML, Lp, Lt, Lt_pad, Lp_pad, nblocks,
        stats=True, interpret=interpret, W=Wd)
    packed = np.asarray(packed)
    return (np.asarray(scores), packed & 511, (packed >> 9) & 511,
            (packed >> 18) & 511)


# Length buckets for the deferred-DP stats service: padding item batches
# to a small set of static shapes keeps XLA recompiles bounded.
_LEN_BUCKETS = (16, 32, 48, 64, 96, 128, 192, 256)
# Length-difference buckets: ML (and with it the window width) adapts
# to the batch's actual diffs instead of assuming the engine's maximum
# (kDeferMaxDiff=10, engine.cc) — most gap-fill items have tiny diffs,
# and a narrower window means fewer live sublanes per pair.
_DIFF_BUCKETS = (0, 2, 6, 10)


def _bucket(n: int) -> int:
    for b in _LEN_BUCKETS:
        if n <= b:
            return b
    return _round_up(n, 64)


def _diff_bucket(d: int) -> int:
    for b in _DIFF_BUCKETS:
        if d <= b:
            return b
    return d


# ------------------------------------------------------------- descriptors
#
# Descriptor transport for the deferred-DP service: the packed reference
# and the batch's reads are device-RESIDENT (uploaded once), and each
# deferred item ships only (t_off, t_len, p_off, p_len) — ~12 bytes —
# instead of two padded byte windows (~400 bytes at the length cap).
# On this rig's tunneled chip (0.7 GB/s up, 0.05 GB/s down) that is the
# difference between the transfers dominating and vanishing.  Windows
# are gathered on device with contiguous dynamic slices; reverse-
# complement pattern windows address the precomputed rc half of the
# doubled [fwd | rc] read tensor, so every gather is forward-contiguous.

# Fixed per-call item-slice size: every compiled variant sees the same
# grid, so the kernel set is just the two length buckets — no
# batch-size-dependent recompiles.  131072 = 128 blocks of G*LANES.
_DESC_SLICE = 131072

# One (ML, W) class covers every deferrable item (|t_len-p_len| <= 10):
# kernel-variant count is the scarce resource on this rig — each
# band-kernel compile costs ~10-30s through the remote-compile relay and
# there is no persistent cache — while padded kernel compute is nearly
# free, so diff==0 items ride the full 32-sublane window too.
_DESC_ML, _DESC_W = 15, 32

# Two length buckets for the same reason (HLA/KIR gap and extension
# windows are p99 <= 60bp, so the 96 bucket serves ~everything and the
# 256 variant only ever compiles for long-read workloads).
_DESC_BUCKETS = (96, 256)
_DESC_BUCKETS_INTERPRET = (16, 32, 48, 64, 96, 128, 256)


@functools.partial(
    aot_jit,
    static_argnames=("Lb", "ML", "W", "nblocks", "G", "interpret"))
def _desc_stats_call(ref_pad, reads_pad, t_off, t_len, p_off, p_len,
                     Lb: int, ML: int, W: int, nblocks: int, G: int = 8,
                     interpret: bool = False):
    """Gather item windows from device-resident sequence tensors and run
    the band-packed stats kernel.  All inputs are device arrays; offsets
    are int32 row starts (sequences are padded with Lb trailing zeros so
    no slice clamps).  Returns per-item match counts (int16)."""
    P = G * LANES
    B = nblocks * P
    lead = ML + 1
    Lt_pad = _round_up(max(Lb + lead, Lb + W + 1) + 1, 8)
    Lp_pad = _round_up(max(Lb, 8), 8)

    gather = jax.vmap(
        lambda flat, o: jax.lax.dynamic_slice(flat, (o,), (Lb,)),
        in_axes=(None, 0))
    t_win = gather(ref_pad, t_off).astype(jnp.int32)    # [B, Lb]
    p_win = gather(reads_pad, p_off).astype(jnp.int32)  # [B, Lb]
    # mask beyond each item's length (padding bytes may be arbitrary)
    col = jax.lax.broadcasted_iota(jnp.int32, (B, Lb), 1)
    t_win = jnp.where(col < t_len[:, None], t_win, 0)
    p_win = jnp.where(col < p_len[:, None], p_win, 0)

    tb = jnp.zeros((B, Lt_pad), jnp.int32)
    tb = jax.lax.dynamic_update_slice(tb, t_win, (0, lead))
    pb = jnp.zeros((B, Lp_pad), jnp.int32)
    pb = jax.lax.dynamic_update_slice(pb, p_win, (0, 0))

    t_pad = tb.reshape(nblocks * G, LANES, Lt_pad).transpose(0, 2, 1)
    p_pad = pb.reshape(nblocks * G, LANES, Lp_pad).transpose(0, 2, 1)
    tl = t_len.astype(jnp.int32).reshape(nblocks * G, 1, LANES)
    pln = p_len.astype(jnp.int32).reshape(nblocks * G, 1, LANES)

    out_spec = pl.BlockSpec((G, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((nblocks * G, LANES), jnp.int32)
    scores, packed = pl.pallas_call(
        functools.partial(_band_kernel, G=G, Lp=Lb, ML=ML, stats=True, W=W),
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((G, 1, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, 1, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, Lt_pad, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, Lp_pad, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[out_spec] * 2,
        out_shape=[out_shape] * 2,
        interpret=interpret,
    )(tl, pln, t_pad, p_pad)
    match = (packed.reshape(-1) & 511).astype(jnp.int32)
    # boundary fixups as in _band_grid: single-base and empty items
    t0 = t_win[:, 0]
    p0 = p_win[:, 0]
    single = (t_len == 1) & (p_len == 1)
    eq = (t0 == p0) | (t0 == 4) | (p0 == 4)
    match = jnp.where(single, jnp.where(eq, 1, 0), match)
    match = jnp.where((t_len == 0) | (p_len == 0), 0, match)
    return match.astype(jnp.int16)


class DeferredDescService:
    """Descriptor-mode scorer for NativeEngine.assign_batch_deferred.

    Holds the device-resident packed reference (per engine lifetime) and
    the current batch's doubled [fwd | rc] read tensor; `stats` buckets
    items by (max length, diff class), pads each bucket to the fixed
    slice grid, and runs the band-packed stats kernel per slice."""

    def __init__(self, G: int = 8, interpret: bool = False):
        self.G = G
        self.interpret = interpret
        self._ref = None
        self._ref_key = None
        self._reads = None
        self._reads_len = 0
        self._warmed = False

    @staticmethod
    def _pow2_pad(n: int, lo: int = 1 << 18) -> int:
        """Sequence tensors are padded to power-of-2 lengths with a HIGH
        floor so the jit signatures (which bake in array shapes) are
        CANONICAL across datasets: a reference up to 8MB and a read
        batch up to 4MB share one compiled kernel variant.  Kernel
        compiles run through a relay that takes 50-400s per variant
        (congestion-dependent) while the persistent cache serves a
        cached variant in ~0.2s — a few MB of padded HBM is free by
        comparison."""
        p = lo
        while p < n:
            p <<= 1
        return p

    def set_ref(self, codes: np.ndarray) -> None:
        # Content digest key: a buffer-address key can alias a freed
        # temporary when the caller passes a fresh contiguous copy, and
        # a service reused across engines could then score against a
        # stale reference (ADVICE r2).
        import hashlib

        key = (hashlib.blake2b(codes.tobytes(), digest_size=16).digest(),
               codes.shape[0])
        if self._ref_key == key:
            return
        p = self._pow2_pad(codes.shape[0] + 256, lo=1 << 23)
        buf = np.zeros(p, np.int8)
        buf[:codes.shape[0]] = codes
        self._ref = jnp.asarray(buf)
        self._ref_key = key

    def begin_batch(self, read_codes: np.ndarray) -> int:
        """Upload the batch's flat read codes and build the doubled
        [fwd | rc] tensor on device.  rc windows in the engine's
        descriptors address padded_total + offset and are forward-
        contiguous there; the per-read reversal indices arrive from the
        same starts/lens the engine saw (set via set_layout).  Returns
        the padded total the engine must use as its rc base."""
        total = int(read_codes.shape[0])
        # rc-half offsets are int32 in the descriptor transport and the
        # doubled tensor addresses 2*padded+256 positions (ADVICE r2)
        assert total < 2**30, (
            "deferred descriptor transport caps at 2^30 read bytes per "
            "batch; chunk the reads")
        p = self._pow2_pad(total + 256, lo=1 << 22)
        buf = np.zeros(p, np.int8)
        buf[:total] = read_codes
        fwd = jnp.asarray(buf)
        rev = np.zeros(p, np.int32)
        rev[:total] = self._rev_idx
        rev = jnp.asarray(rev)
        rc = jnp.where(fwd[rev] < 4, 3 - fwd[rev], fwd[rev]).astype(jnp.int8)
        pad = jnp.zeros(256, jnp.int8)
        self._reads = jnp.concatenate([fwd, rc, pad])
        self._reads_len = p
        return p

    def set_layout(self, read_starts: np.ndarray,
                   read_lens: np.ndarray) -> None:
        """Precompute per-position reversal indices: position start+j of
        read r maps to start + len-1-j (host-side numpy; ~4 bytes/base,
        uploaded once per batch)."""
        starts = np.asarray(read_starts, np.int64)
        lens = np.asarray(read_lens, np.int64)
        total = int((starts[-1] + lens[-1]) if len(lens) else 0)
        assert total < 2**30, (
            "rev-index transport caps at 2^30 read bytes per batch")
        rep_start = np.repeat(starts, lens)
        rep_len = np.repeat(lens, lens)
        idx = np.arange(total, dtype=np.int64)
        self._rev_idx = (2 * rep_start + rep_len - 1 - idx).astype(np.int32)

    def stats_async(self, t_off, t_len, p_off, p_len):
        """Dispatch scoring of the items to the device and return a
        materializer.  JAX execution is asynchronous, so the caller can
        do host work (the next chunk's seed/chain) while the kernel
        runs; calling the returned function blocks on and collects the
        match counts."""
        n = len(t_len)
        if n == 0:
            zero = np.zeros(0, np.int32)
            return lambda: zero
        t_off = np.asarray(t_off)
        p_off = np.asarray(p_off)
        t_len = np.asarray(t_len, np.int32)
        p_len = np.asarray(p_len, np.int32)
        assert int(t_off.max(initial=0)) < 2**31
        assert int(p_off.max(initial=0)) < 2**31

        maxlen = np.maximum(t_len, p_len)
        buckets = (_DESC_BUCKETS_INTERPRET if self.interpret
                   else _DESC_BUCKETS)
        pending = []  # (idx, device match array)
        lower = 0
        for lb in buckets:
            sel = (maxlen <= lb) & (maxlen > lower)
            lower = lb
            idx = np.nonzero(sel)[0]
            if len(idx) == 0:
                continue
            slice_cap = (_DESC_SLICE if not self.interpret
                         else _round_up(len(idx), self.G * LANES))
            nblocks = slice_cap // (self.G * LANES)
            for lo in range(0, len(idx), slice_cap):
                part = idx[lo:lo + slice_cap]
                to = np.zeros(slice_cap, np.int32)
                po = np.zeros(slice_cap, np.int32)
                tl = np.zeros(slice_cap, np.int32)
                pl_ = np.zeros(slice_cap, np.int32)
                to[:len(part)] = t_off[part]
                po[:len(part)] = p_off[part]
                tl[:len(part)] = t_len[part]
                pl_[:len(part)] = p_len[part]
                m = _desc_stats_call(
                    self._ref, self._reads, jnp.asarray(to),
                    jnp.asarray(tl), jnp.asarray(po), jnp.asarray(pl_),
                    lb, _DESC_ML, _DESC_W, nblocks, self.G, self.interpret)
                pending.append((part, m))

        def collect() -> np.ndarray:
            out = np.zeros(n, np.int32)
            for part, m in pending:
                out[part] = np.asarray(m)[:len(part)].astype(np.int32)
            return out

        return collect

    def stats(self, t_off, t_len, p_off, p_len) -> np.ndarray:
        return self.stats_async(t_off, t_len, p_off, p_len)()


def make_deferred_desc_service(G: int = 8, interpret: bool = False):
    return DeferredDescService(G=G, interpret=interpret)


def make_deferred_stats_fn(G: int = 8, interpret: bool = False):
    """Returns stats_fn(t_codes, t_lens, p_codes, p_lens) -> match[int32]
    for NativeEngine.assign_batch_deferred: scores the engine's deferred
    gap-fill / extension items on the band-packed stats kernel."""

    def stats_fn(t_codes, t_lens, p_codes, p_lens):
        t_codes = np.asarray(t_codes, np.int8)
        p_codes = np.asarray(p_codes, np.int8)
        t_lens = np.asarray(t_lens, np.int32)
        p_lens = np.asarray(p_lens, np.int32)
        n = t_codes.shape[0]
        if n == 0:
            return np.zeros(0, np.int32)
        lt = _bucket(t_codes.shape[1])
        lp = _bucket(p_codes.shape[1])
        ml = 5 + _diff_bucket(int((p_lens - t_lens).max(initial=0)))
        wd = band_window(ml, _diff_bucket(int((t_lens - p_lens)
                                              .max(initial=0))))
        nb = 1
        while nb * G * LANES < n:
            nb *= 2
        cap = nb * G * LANES
        tc = np.zeros((cap, lt), np.int8)
        pc = np.zeros((cap, lp), np.int8)
        tc[:n, :t_codes.shape[1]] = t_codes
        pc[:n, :p_codes.shape[1]] = p_codes
        tl = np.zeros(cap, np.int32)
        pl = np.zeros(cap, np.int32)
        tl[:n] = t_lens
        pl[:n] = p_lens
        _, match, _, _ = banded_stats_band(tc, tl, pc, pl, G=G, ml=ml,
                                           w=wd, interpret=interpret)
        return match[:n].astype(np.int32)

    return stats_fn
