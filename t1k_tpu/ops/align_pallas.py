"""Pallas TPU kernel for the batched banded affine-gap aligner.

Same numerical contract as ops/align.py (and the native engine), with the
whole row state pinned in VMEM: the grid tiles the batch, each program
aligns a [BLOCK_B] slab of pairs by looping over read positions and doing
[BLOCK_B, Lt+1] vector work per row.  The horizontal (deletion) chain is
resolved with a Kogge-Stone max-scan over lanes (log2 L steps of
roll+max), so there is no serial inner loop — per-chip speed of light is
bounded by VPU throughput rather than scalar latency.
"""

from __future__ import annotations

import functools

from ..utils import jaxcache as _jaxcache

_jaxcache.enable()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SCORE_MATCH = 2
SCORE_MISMATCH = -2
GO = -4
GE = -1
NEG_INF = -(1 << 24)


def _prefix_max_lanes(u, width: int):
    """Inclusive cumulative max along the last axis (Kogge-Stone)."""
    cols = jax.lax.broadcasted_iota(jnp.int32, u.shape, dimension=1)
    sh = 1
    while sh < width:
        rolled = pltpu.roll(u, shift=sh, axis=1)
        rolled = jnp.where(cols < sh, NEG_INF, rolled)
        u = jnp.maximum(u, rolled)
        sh *= 2
    return u


def _align_kernel(t_ref, tl_ref, p_ref, pl_ref, out_ref, *, Lt, Lp):
    t_codes = t_ref[:].astype(jnp.int32)          # [B, Ltp] (Lt+1 padded)
    t_lens = tl_ref[:].astype(jnp.int32)          # [B, 1]
    p_lens = pl_ref[:].astype(jnp.int32)          # [B, 1]
    B = t_codes.shape[0]
    W = t_codes.shape[1]                          # lanes = Lt + 1 padded

    cols = jax.lax.broadcasted_iota(jnp.int32, (B, W), dimension=1)
    diff = t_lens - p_lens
    left_band = 5 + jnp.maximum(-diff, 0)
    right_band = 5 + jnp.maximum(diff, 0)

    # t shifted so column j holds base j-1 (1-based DP columns)
    t_shift = pltpu.roll(t_codes, shift=1, axis=1)

    m0 = (GO + cols * GO) * (cols > 0)
    e0 = jnp.where(cols > 0, GO + (p_lens + 1) * GO, 0)

    p_codes = p_ref[:].astype(jnp.int32)
    p_cols = jax.lax.broadcasted_iota(jnp.int32, p_codes.shape, dimension=1)

    def body(i, carry):
        m_prev, e_prev, score = carry
        # gather read base i-1 with a masked reduction (dynamic lane
        # slicing requires 128-alignment on TPU)
        p_base = jnp.max(
            jnp.where(p_cols == i - 1, p_codes, -1), axis=1, keepdims=True)
        sub = jnp.where(
            (t_shift == p_base) | (t_shift == 4) | (p_base == 4),
            SCORE_MATCH, SCORE_MISMATCH)

        e_cur = jnp.maximum(e_prev + GE, m_prev + GO + GE)
        e_cur = jnp.where(cols == 0, GO + i * GE, e_cur)

        diag_in = pltpu.roll(m_prev, shift=1, axis=1)
        diag = jnp.where(cols == 0, NEG_INF, diag_in + sub)
        h = jnp.maximum(diag, e_cur)
        m0_i = GO + i * GO
        h = jnp.where(cols == 0, m0_i, h)

        start = jnp.maximum(i - left_band, 1)
        end = jnp.minimum(i + right_band, t_lens)
        in_band = (cols >= start) & (cols <= end)
        col0 = cols == 0
        h = jnp.where(in_band | (col0 & (start <= 1)), h, NEG_INF)

        u = h - GE * cols
        u = jnp.where(col0,
                      jnp.where(start <= 1, jnp.maximum(m0_i, m0_i - GO), NEG_INF),
                      u)
        cmax = _prefix_max_lanes(u, W)
        f_chain = pltpu.roll(cmax, shift=1, axis=1)
        f_chain = jnp.where(col0, NEG_INF, f_chain)
        f = GO + GE * cols + f_chain

        m_cur = jnp.maximum(h, f)
        m_cur = jnp.where(in_band | col0, m_cur, NEG_INF)
        m_cur = jnp.where(col0, m0_i, m_cur)
        e_cur = jnp.where(in_band | col0, e_cur, NEG_INF)

        active = i <= p_lens
        m_cur = jnp.where(active, m_cur, m_prev)
        e_cur = jnp.where(active, e_cur, e_prev)

        end_scores = jnp.max(
            jnp.where(cols == t_lens, m_cur, NEG_INF), axis=1, keepdims=True)
        score = jnp.where(i == p_lens, end_scores, score)
        return m_cur, e_cur, score

    score0 = jnp.max(jnp.where(cols == t_lens, m0, NEG_INF), axis=1, keepdims=True)
    _, _, score = jax.lax.fori_loop(1, Lp + 1, body, (m0, e0, score0))

    t0 = t_codes[:, 0:1]
    p0 = p_ref[:][:, 0:1].astype(jnp.int32)
    single = (t_lens == 1) & (p_lens == 1)
    eq = (t0 == p0) | (t0 == 4) | (p0 == 4)
    score = jnp.where(single, jnp.where(eq, SCORE_MATCH, SCORE_MISMATCH), score)
    score = jnp.where((t_lens == 0) | (p_lens == 0), 0, score)
    out_ref[:] = score


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.partial(jax.jit, static_argnames=("block_b", "interpret"))
def banded_scores_pallas(t_codes, t_lens, p_codes, p_lens,
                         block_b: int = 512, interpret: bool = False):
    """Alignment scores on TPU via the Pallas kernel.

    t_codes [B, Lt] int8, p_codes [B, Lp] int8, lens int32.
    Returns int32 [B].
    """
    B, Lt = t_codes.shape
    Lp = p_codes.shape[1]
    Bp = _round_up(max(B, 8), block_b)
    W = _round_up(Lt + 1, 128)
    Wp = _round_up(max(Lp, 1), 128)

    t_pad = jnp.zeros((Bp, W), jnp.int32).at[:B, :Lt].set(t_codes.astype(jnp.int32))
    p_pad = jnp.zeros((Bp, Wp), jnp.int32).at[:B, :Lp].set(p_codes.astype(jnp.int32))
    tl = jnp.zeros((Bp, 1), jnp.int32).at[:B, 0].set(t_lens.astype(jnp.int32))
    plens = jnp.zeros((Bp, 1), jnp.int32).at[:B, 0].set(p_lens.astype(jnp.int32))

    grid = (Bp // block_b,)
    out = pl.pallas_call(
        functools.partial(_align_kernel, Lt=Lt, Lp=Lp),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, Wp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_b, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, 1), jnp.int32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=10 * Bp * Lp * W, bytes_accessed=Bp * (W + Wp) * 4,
            transcendentals=0),
    )(t_pad, tl, p_pad, plens)
    return out[:B, 0]
