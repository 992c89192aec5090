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

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SCORE_MATCH = 2
SCORE_MISMATCH = -2
GO = -4
GE = -1
NEG_INF = -(1 << 24)

W = 32           # band window width (sublanes per pair)
LANES = 128      # pairs per slab


def _band_kernel(tl_ref, plen_ref, t_ref, p_ref, out_ref, *, G, Lp, ML):
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

    # row 0 state in w coordinates (j = w - ML at i=0)
    j0 = w_local - ML
    m0 = jnp.where(j0 == 0, 0,
                   jnp.where((j0 >= 1) & (j0 <= t_lens), GO + j0 * GO, NEG_INF))
    e0 = jnp.where(j0 == 0, 0,
                   jnp.where((j0 >= 1) & (j0 <= t_lens),
                             GO + (p_lens + 1) * GO, NEG_INF))
    score0 = jnp.full((S, LANES), NEG_INF, jnp.int32)

    def shift_up(x):
        """x'[w] = x[w+1] within each W-segment."""
        r = pltpu.roll(x, shift=S - 1, axis=0)
        return jnp.where(w_local == W - 1, NEG_INF, r)

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
        m_prev, e_prev, score = carry
        j = i + w_local - ML

        # text window (t pre-shifted by ML+1 rows, so offset == i)
        t_win = jnp.concatenate(
            [t_ref[g, pl.ds(i, W), :] for g in range(G)], axis=0)
        p_base = jnp.concatenate(
            [jnp.broadcast_to(p_ref[g, pl.ds(i - 1, 1), :], (W, LANES))
             for g in range(G)], axis=0)
        sub = jnp.where((t_win == p_base) | (t_win == 4) | (p_base == 4),
                        SCORE_MATCH, SCORE_MISMATCH)

        start = jnp.maximum(i - left, 1)
        end = jnp.minimum(i + right, t_lens)
        in_band = (j >= start) & (j <= end)
        col0 = j == 0
        m0_i = GO + i * GO

        e_cur = jnp.maximum(shift_up(e_prev) + GE, shift_up(m_prev) + GO + GE)
        e_cur = jnp.where(col0, GO + i * GE, e_cur)

        h = jnp.maximum(m_prev + sub, e_cur)
        h = jnp.where(col0, m0_i, h)
        h = jnp.where(in_band | (col0 & (start <= 1)), h, NEG_INF)

        u = h - GE * j
        u = jnp.where(col0,
                      jnp.where(start <= 1, jnp.maximum(m0_i, m0_i - GO),
                                NEG_INF), u)
        f = GO + GE * j + seg_prefix_max_excl(u)

        m_cur = jnp.maximum(h, f)
        m_cur = jnp.where(in_band | col0, m_cur, NEG_INF)
        m_cur = jnp.where(col0, m0_i, m_cur)
        e_cur = jnp.where(in_band | col0, e_cur, NEG_INF)

        active = i <= p_lens
        m_cur = jnp.where(active, m_cur, m_prev)
        e_cur = jnp.where(active, e_cur, e_prev)
        score = jnp.where((i == p_lens) & (w_local == w_final), m_cur, score)
        return m_cur, e_cur, score

    _, _, score = jax.lax.fori_loop(1, Lp + 1, body, (m0, e0, score0))
    for g in range(G):
        out_ref[g, :] = jnp.max(score[g * W:(g + 1) * W, :], axis=0)


def _round_up(x, m):
    return (x + m - 1) // m * m


@functools.partial(jax.jit, static_argnames=("G", "ML", "Lp", "interpret"))
def _band_call(tl, plen, t_pad, p_pad, G: int, ML: int, Lp: int,
               interpret: bool = False):
    """Single-block call ([G, ...] inputs) — used by tests."""
    return pl.pallas_call(
        functools.partial(_band_kernel, G=G, Lp=Lp, ML=ML),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, LANES), jnp.int32),
        interpret=interpret,
    )(tl, plen, t_pad, p_pad)


@functools.partial(
    jax.jit,
    static_argnames=("G", "ML", "Lp", "Lt", "Lt_pad", "Lp_pad", "nblocks",
                     "interpret"))
def _band_grid(t_codes, t_lens, p_codes, p_lens, G: int, ML: int, Lp: int,
               Lt: int, Lt_pad: int, Lp_pad: int, nblocks: int,
               interpret: bool = False):
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

    out = pl.pallas_call(
        functools.partial(_band_kernel, G=G, Lp=Lp, ML=ML),
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
        out_specs=pl.BlockSpec((G, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nblocks * G, LANES), jnp.int32),
        interpret=interpret,
    )(tl, pln, t_pad, p_pad)
    scores = out.reshape(-1)[:B]

    single = (t_lens == 1) & (p_lens == 1)
    eq = ((t_codes[:, 0] == p_codes[:, 0]) | (t_codes[:, 0] == 4)
          | (p_codes[:, 0] == 4))
    scores = jnp.where(single, jnp.where(eq, SCORE_MATCH, SCORE_MISMATCH),
                       scores)
    return jnp.where((t_lens == 0) | (p_lens == 0), 0, scores)


def banded_scores_band(t_codes, t_lens, p_codes, p_lens, G: int = 8,
                       interpret: bool = False):
    """Band-packed scores; requires the length difference to fit the
    window: -ML <= t_len - p_len <= W-1-ML for every pair."""
    t_codes = np.asarray(t_codes)
    p_codes = np.asarray(p_codes)
    t_lens = np.asarray(t_lens, np.int32)
    p_lens = np.asarray(p_lens, np.int32)
    B, Lt = t_codes.shape
    Lp = int(p_codes.shape[1])
    ML = 5 + max(0, int((p_lens - t_lens).max(initial=0)))
    assert ML + int((t_lens - p_lens).max(initial=0)) < W, \
        "length difference exceeds band window; use the v1 kernel"

    P = G * LANES
    lead = ML + 1
    Lt_pad = _round_up(max(Lt + lead, Lp + W + 1) + 1, 8)
    Lp_pad = _round_up(max(Lp, 8), 8)
    nblocks = -(-B // P)
    return np.asarray(_band_grid(
        jnp.asarray(t_codes), jnp.asarray(t_lens), jnp.asarray(p_codes),
        jnp.asarray(p_lens), G, ML, Lp, Lt, Lt_pad, Lp_pad, nblocks,
        interpret=interpret))
