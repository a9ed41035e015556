"""Fused WavLM attention for TPU (Pallas): flash attention with the gated
relative-position bias recomputed in-kernel from its small factors.

The reference WavLM path (``/root/reference/wav2vec2/components.py:546-647``)
materializes the gated bias as a full (B, total_heads, L, L) fp32 tensor per
layer and runs dense attention over it — at B=16, L=750 that is ~430 MB of
HBM traffic per layer per direction.  Here the bias stays factored:

  s[b,h,i,j] = scale * q.k + gate[b,h,i] * bias[h,i,j] + length_mask

with ``bias`` the (H, L, L) bucketed embedding lookup (shared across the
batch, threaded through all layers) and ``gate`` the per-(batch, head, row)
GRU-style gate ``gate_a_1`` (computed in XLA — it is tiny and carries its
own gradient chain back to the gru projection).  Each grid cell loads a
(block_q, block_kv) bias tile and a (block_q,) gate column; nothing of size
B*H*L*L ever exists.

Backward: three kernels sharing the flash recompute (p from saved m/l):
  * dkv   — grid (B, H, n_kv, n_q), accumulates dk/dv over q (as HuBERT)
  * dq+dg — grid (B, H, n_q, n_kv), accumulates dq and dgate over kv
  * dbias — grid (H, n_q, n_kv, B), accumulates gate*ds over the batch in
            VMEM scratch (batch is the innermost, sequential axis), so the
            bias gradient also never materializes per-batch.

Single-KV-block fast path (production shape: ``block_kv == Lp`` so
``n_kv == 1``; L<=800 per SURVEY §5 — r5): the general grids re-read the
(H, L, L) bias from HBM once per *batch element* per kernel (Pallas only
elides a block refetch when its index is unchanged between consecutive
grid steps, and b outermost changes the (h,i,j) sweep B times).  With one
KV block there is no cross-step softmax state, so the batch axis can go
innermost:

  * fwd      — grid (H, n_q, B): bias tile index (h, i) is constant across
               the inner b sweep -> fetched once per (h, i), 16x less bias
               traffic at B=16; single-pass softmax (no m/l carry).
  * dq+dg+dbias — ONE kernel, grid (H, n_q, B): recomputes s/p/ds once for
               all three gradients (the general path recomputes the same
               s and do.v matmuls in two separate kernels), writes dq/dg
               per step, accumulates dbias over the sequential inner b.
  * dkv      — grid (H, B, n_q): loads the whole (Lp, block_kv) bias
               column of head h as one block (index constant across the
               b x n_q inner sweep) and slices the i-th (block_q, block_kv)
               tile in-kernel.

Dropout on the probabilities reuses the counter-hash mask of
``flash_attention`` (regenerated exactly in every backward kernel).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .flash_attention import LANES, NEG_INF, _ceil_to, _dropout_keep_mask


def _single_block_enabled() -> bool:
    """Escape hatch for the n_kv==1 fast path (fwd + bwd dispatch read the
    same process-level env, so the VJP pair always agrees)."""
    import os

    return os.environ.get("DPHUBERT_WAVLM_SINGLE_BLOCK", "1") != "0"


def _biased_scores(
    q, k, scale, bias_tile, gate_col, lengths_ref, b, kv_idx, block_kv, masked
):
    """(block_q, block_kv) logits: scale*qk + gate*bias + length mask."""
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s = s * scale + gate_col * bias_tile.astype(jnp.float32)
    if masked:
        length = lengths_ref[b]
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + kv_idx * block_kv
        s = jnp.where(col < length, s, NEG_INF)
    return s


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _fwd_kernel(
    lengths_ref,
    seed_ref,
    q_ref,  # (1, 1, block_q, D)
    k_ref,  # (1, 1, block_kv, D)
    v_ref,  # (1, 1, block_kv, D)
    bias_ref,  # (1, block_q, block_kv)
    gate_ref,  # (1, 1, 1, block_q); lane row -> sublane column in-kernel
    o_ref,
    m_out_ref,
    l_out_ref,
    m_ref,
    l_ref,
    acc_ref,
    *,
    scale: float,
    block_kv: int,
    n_kv: int,
    masked: bool,
    dropout_rate: float,
):
    b = pl.program_id(0)
    h = pl.program_id(1)
    q_idx = pl.program_id(2)
    kv_idx = pl.program_id(3)

    @pl.when(kv_idx == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # (1, block_q) lane row -> (block_q, 1) sublane column: Mosaic supports
    # the 2-D transpose but not the equivalent reshape
    gate_col = gate_ref[0, 0].astype(jnp.float32).T
    s = _biased_scores(
        q_ref[0, 0], k_ref[0, 0], scale, bias_ref[0], gate_col,
        lengths_ref, b, kv_idx, block_kv, masked,
    )

    m_prev = m_ref[:, :1]
    l_prev = l_ref[:, :1]
    m_curr = jnp.max(s, axis=1, keepdims=True)
    m_next = jnp.maximum(m_prev, m_curr)
    alpha = jnp.exp(m_prev - m_next)
    p = jnp.exp(s - m_next)
    l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
    m_ref[...] = jnp.broadcast_to(m_next, m_ref.shape)
    l_ref[...] = jnp.broadcast_to(l_next, l_ref.shape)

    if dropout_rate > 0.0:
        keep = _dropout_keep_mask(
            p.shape, 1.0 - dropout_rate, seed_ref[0], b, h,
            q_idx * p.shape[0], kv_idx * block_kv,
        )
        p = jnp.where(keep, p, 0.0)

    v = v_ref[0, 0]
    pv = jax.lax.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    acc_ref[...] = acc_ref[...] * alpha + pv

    @pl.when(kv_idx == n_kv - 1)
    def _store():
        l_final = l_ref[:, :1]
        l_inv = jnp.where(l_final == 0.0, 1.0, 1.0 / l_final)
        if dropout_rate > 0.0:
            l_inv = l_inv / (1.0 - dropout_rate)
        o_ref[0, 0] = (acc_ref[...] * l_inv).astype(o_ref.dtype)
        m_out_ref[0, 0] = m_ref[...]
        l_out_ref[0, 0] = l_ref[...]


def _fwd_single_kernel(
    lengths_ref,
    seed_ref,
    q_ref,  # (1, 1, block_q, D)
    k_ref,  # (1, 1, block_kv, D)
    v_ref,  # (1, 1, block_kv, D)
    bias_ref,  # (1, block_q, block_kv)
    gate_ref,  # (1, 1, 1, block_q)
    o_ref,
    m_out_ref,
    l_out_ref,
    *,
    scale: float,
    block_kv: int,
    masked: bool,
    dropout_rate: float,
):
    """n_kv == 1 forward: one-pass softmax, batch innermost so the bias
    tile (index (h, i), constant in b) is fetched once per (h, i)."""
    h = pl.program_id(0)
    q_idx = pl.program_id(1)
    b = pl.program_id(2)

    # (1, block_q) lane row -> (block_q, 1) sublane column: Mosaic supports
    # the 2-D transpose but not the equivalent reshape
    gate_col = gate_ref[0, 0].astype(jnp.float32).T
    s = _biased_scores(
        q_ref[0, 0], k_ref[0, 0], scale, bias_ref[0], gate_col,
        lengths_ref, b, 0, block_kv, masked,
    )
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=1, keepdims=True)
    if dropout_rate > 0.0:
        keep = _dropout_keep_mask(
            p.shape, 1.0 - dropout_rate, seed_ref[0], b, h,
            q_idx * p.shape[0], 0,
        )
        p = jnp.where(keep, p, 0.0)
    l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
    if dropout_rate > 0.0:
        l_inv = l_inv / (1.0 - dropout_rate)
    v = v_ref[0, 0]
    pv = jax.lax.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    o_ref[0, 0] = (pv * l_inv).astype(o_ref.dtype)
    m_out_ref[0, 0] = jnp.broadcast_to(m, m_out_ref.shape[2:])
    l_out_ref[0, 0] = jnp.broadcast_to(l, l_out_ref.shape[2:])


def _fwd_single(q, k, v, bias, gate, lengths, seed, scale, block_q, block_kv,
                interpret, dropout_rate, masked):
    B, H, L, D = q.shape
    n_q = L // block_q

    return pl.pallas_call(
        functools.partial(
            _fwd_single_kernel,
            scale=scale,
            block_kv=block_kv,
            masked=masked,
            dropout_rate=dropout_rate,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(H, n_q, B),
            in_specs=[
                pl.BlockSpec((1, 1, block_q, D), lambda h, i, b, *_: (b, h, i, 0)),
                pl.BlockSpec((1, 1, block_kv, D), lambda h, i, b, *_: (b, h, 0, 0)),
                pl.BlockSpec((1, 1, block_kv, D), lambda h, i, b, *_: (b, h, 0, 0)),
                pl.BlockSpec((1, block_q, block_kv), lambda h, i, b, *_: (h, i, 0)),
                pl.BlockSpec((1, 1, 1, block_q), lambda h, i, b, *_: (b, h, 0, i)),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, block_q, D), lambda h, i, b, *_: (b, h, i, 0)),
                pl.BlockSpec(
                    (1, 1, block_q, LANES), lambda h, i, b, *_: (b, h, i, 0)
                ),
                pl.BlockSpec(
                    (1, 1, block_q, LANES), lambda h, i, b, *_: (b, h, i, 0)
                ),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, H, L, D), q.dtype),
            jax.ShapeDtypeStruct((B, H, L, LANES), jnp.float32),
            jax.ShapeDtypeStruct((B, H, L, LANES), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        interpret=interpret,
    )(lengths, seed, q, k, v, bias, gate[:, :, None, :])


def _fwd(q, k, v, bias, gate, lengths, seed, scale, block_q, block_kv,
         interpret, dropout_rate):
    B, H, L, D = q.shape
    n_q = L // block_q
    n_kv = L // block_kv
    masked = lengths is not None
    if lengths is None:
        lengths = jnp.full((B,), L, jnp.int32)
    if n_kv == 1 and _single_block_enabled():
        return _fwd_single(q, k, v, bias, gate, lengths, seed, scale,
                           block_q, block_kv, interpret, dropout_rate, masked)

    out, m, l = pl.pallas_call(
        functools.partial(
            _fwd_kernel,
            scale=scale,
            block_kv=block_kv,
            n_kv=n_kv,
            masked=masked,
            dropout_rate=dropout_rate,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B, H, n_q, n_kv),
            in_specs=[
                pl.BlockSpec((1, 1, block_q, D), lambda b, h, i, j, *_: (b, h, i, 0)),
                pl.BlockSpec((1, 1, block_kv, D), lambda b, h, i, j, *_: (b, h, j, 0)),
                pl.BlockSpec((1, 1, block_kv, D), lambda b, h, i, j, *_: (b, h, j, 0)),
                pl.BlockSpec((1, block_q, block_kv), lambda b, h, i, j, *_: (h, i, j)),
                pl.BlockSpec((1, 1, 1, block_q), lambda b, h, i, j, *_: (b, h, 0, i)),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, block_q, D), lambda b, h, i, j, *_: (b, h, i, 0)),
                pl.BlockSpec(
                    (1, 1, block_q, LANES), lambda b, h, i, j, *_: (b, h, i, 0)
                ),
                pl.BlockSpec(
                    (1, 1, block_q, LANES), lambda b, h, i, j, *_: (b, h, i, 0)
                ),
            ],
            scratch_shapes=[
                pltpu.VMEM((block_q, LANES), jnp.float32),
                pltpu.VMEM((block_q, LANES), jnp.float32),
                pltpu.VMEM((block_q, D), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, H, L, D), q.dtype),
            jax.ShapeDtypeStruct((B, H, L, LANES), jnp.float32),
            jax.ShapeDtypeStruct((B, H, L, LANES), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(lengths, seed, q, k, v, bias, gate[:, :, None, :])
    return out, m, l


# ---------------------------------------------------------------------------
# Backward kernels
# ---------------------------------------------------------------------------


def _recompute_p(s, m, l):
    l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
    return jnp.exp(s - m) * l_inv


def _bwd_dkv_kernel(
    lengths_ref, seed_ref,
    q_ref, k_ref, v_ref, bias_ref, gate_ref, do_ref, m_ref, l_ref, di_ref,
    dk_ref, dv_ref, dk_acc, dv_acc,
    *, scale, block_q, block_kv, n_q, masked, dropout_rate,
):
    b = pl.program_id(0)
    h = pl.program_id(1)
    kv_idx = pl.program_id(2)
    q_idx = pl.program_id(3)

    @pl.when(q_idx == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    do = do_ref[0, 0].astype(jnp.float32)
    m = m_ref[0, 0][:, :1]
    l = l_ref[0, 0][:, :1]
    di = di_ref[0, 0][:, :1]
    # (1, block_q) lane row -> (block_q, 1) sublane column: Mosaic supports
    # the 2-D transpose but not the equivalent reshape
    gate_col = gate_ref[0, 0].astype(jnp.float32).T

    s = _biased_scores(
        q, k, scale, bias_ref[0], gate_col, lengths_ref, b, kv_idx, block_kv,
        masked,
    )
    p = _recompute_p(s, m, l)
    dp = jax.lax.dot_general(
        do, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if dropout_rate > 0.0:
        keep = _dropout_keep_mask(
            p.shape, 1.0 - dropout_rate, seed_ref[0], b, h,
            q_idx * block_q, kv_idx * block_kv,
        )
        inv_keep = 1.0 / (1.0 - dropout_rate)
        p_used = jnp.where(keep, p * inv_keep, 0.0)
        dp = jnp.where(keep, dp * inv_keep, 0.0)
    else:
        p_used = p
    dv_acc[...] += jax.lax.dot_general(
        p_used, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = p * (dp - di)  # d(logits); qk part scaled below
    dk_acc[...] += jax.lax.dot_general(
        ds * scale, q.astype(jnp.float32), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(q_idx == n_q - 1)
    def _store():
        dk_ref[0, 0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[...].astype(dv_ref.dtype)


def _bwd_dq_kernel(
    lengths_ref, seed_ref,
    q_ref, k_ref, v_ref, bias_ref, gate_ref, do_ref, m_ref, l_ref, di_ref,
    dq_ref, dg_ref, dq_acc, dg_acc,
    *, scale, block_kv, n_kv, masked, dropout_rate,
):
    b = pl.program_id(0)
    h = pl.program_id(1)
    q_idx = pl.program_id(2)
    kv_idx = pl.program_id(3)

    @pl.when(kv_idx == 0)
    def _init():
        dq_acc[...] = jnp.zeros_like(dq_acc)
        dg_acc[...] = jnp.zeros_like(dg_acc)

    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    do = do_ref[0, 0].astype(jnp.float32)
    m = m_ref[0, 0][:, :1]
    l = l_ref[0, 0][:, :1]
    di = di_ref[0, 0][:, :1]
    bias = bias_ref[0].astype(jnp.float32)
    # (1, block_q) lane row -> (block_q, 1) sublane column: Mosaic supports
    # the 2-D transpose but not the equivalent reshape
    gate_col = gate_ref[0, 0].astype(jnp.float32).T

    s = _biased_scores(
        q, k, scale, bias, gate_col, lengths_ref, b, kv_idx, block_kv, masked
    )
    p = _recompute_p(s, m, l)
    dp = jax.lax.dot_general(
        do, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if dropout_rate > 0.0:
        keep = _dropout_keep_mask(
            p.shape, 1.0 - dropout_rate, seed_ref[0], b, h,
            q_idx * p.shape[0], kv_idx * block_kv,
        )
        dp = jnp.where(keep, dp / (1.0 - dropout_rate), 0.0)
    ds = p * (dp - di)
    dq_acc[...] += jax.lax.dot(
        ds * scale, k.astype(jnp.float32), preferred_element_type=jnp.float32
    )
    # dgate[b,h,i] = sum_j ds * bias  (bias enters as gate*bias); lane 0 of
    # the LANES-wide scratch carries the value (Mosaic tile constraint)
    dg_acc[...] += jnp.broadcast_to(
        jnp.sum(ds * bias, axis=1, keepdims=True), dg_acc.shape
    )

    @pl.when(kv_idx == n_kv - 1)
    def _store():
        dq_ref[0, 0] = dq_acc[...].astype(dq_ref.dtype)
        # (block_q, 1) column -> (1, block_q) lane row via 2-D transpose
        dg_ref[0, 0] = dg_acc[:, :1].T.astype(dg_ref.dtype)


def _bwd_dbias_kernel(
    lengths_ref, seed_ref,
    q_ref, k_ref, v_ref, bias_ref, gate_ref, do_ref, m_ref, l_ref, di_ref,
    dbias_ref, db_acc,
    *, scale, block_q, block_kv, n_b, masked, dropout_rate,
):
    h = pl.program_id(0)
    q_idx = pl.program_id(1)
    kv_idx = pl.program_id(2)
    b = pl.program_id(3)

    @pl.when(b == 0)
    def _init():
        db_acc[...] = jnp.zeros_like(db_acc)

    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    do = do_ref[0, 0].astype(jnp.float32)
    m = m_ref[0, 0][:, :1]
    l = l_ref[0, 0][:, :1]
    di = di_ref[0, 0][:, :1]
    # (1, block_q) lane row -> (block_q, 1) sublane column: Mosaic supports
    # the 2-D transpose but not the equivalent reshape
    gate_col = gate_ref[0, 0].astype(jnp.float32).T

    s = _biased_scores(
        q, k, scale, bias_ref[0], gate_col, lengths_ref, b, kv_idx, block_kv,
        masked,
    )
    p = _recompute_p(s, m, l)
    dp = jax.lax.dot_general(
        do, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if dropout_rate > 0.0:
        keep = _dropout_keep_mask(
            p.shape, 1.0 - dropout_rate, seed_ref[0], b, h,
            q_idx * block_q, kv_idx * block_kv,
        )
        dp = jnp.where(keep, dp / (1.0 - dropout_rate), 0.0)
    ds = p * (dp - di)
    db_acc[...] += gate_col * ds

    @pl.when(b == n_b - 1)
    def _store():
        dbias_ref[0] = db_acc[...].astype(dbias_ref.dtype)


def _bwd_fused_single_kernel(
    lengths_ref, seed_ref,
    q_ref, k_ref, v_ref, bias_ref, gate_ref, do_ref, m_ref, l_ref, di_ref,
    dq_ref, dg_ref, dbias_ref, db_acc,
    *, scale, block_q, block_kv, n_b, masked, dropout_rate,
):
    """n_kv == 1 fused dq + dgate + dbias: grid (H, n_q, B), batch
    innermost/sequential.  One s/p/ds recompute serves all three gradients
    (the general path runs it twice, in _bwd_dq_kernel and
    _bwd_dbias_kernel), and the bias tile index (h, i) is constant across
    the inner b sweep so Pallas fetches it once per (h, i)."""
    h = pl.program_id(0)
    q_idx = pl.program_id(1)
    b = pl.program_id(2)

    @pl.when(b == 0)
    def _init():
        db_acc[...] = jnp.zeros_like(db_acc)

    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    do = do_ref[0, 0].astype(jnp.float32)
    m = m_ref[0, 0][:, :1]
    l = l_ref[0, 0][:, :1]
    di = di_ref[0, 0][:, :1]
    bias = bias_ref[0].astype(jnp.float32)
    # (1, block_q) lane row -> (block_q, 1) sublane column: Mosaic supports
    # the 2-D transpose but not the equivalent reshape
    gate_col = gate_ref[0, 0].astype(jnp.float32).T

    s = _biased_scores(
        q, k, scale, bias, gate_col, lengths_ref, b, 0, block_kv, masked
    )
    p = _recompute_p(s, m, l)
    dp = jax.lax.dot_general(
        do, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if dropout_rate > 0.0:
        keep = _dropout_keep_mask(
            p.shape, 1.0 - dropout_rate, seed_ref[0], b, h,
            q_idx * block_q, 0,
        )
        dp = jnp.where(keep, dp / (1.0 - dropout_rate), 0.0)
    ds = p * (dp - di)
    dq_ref[0, 0] = jax.lax.dot(
        ds * scale, k.astype(jnp.float32), preferred_element_type=jnp.float32
    ).astype(dq_ref.dtype)
    # dgate[b,h,i] = sum_j ds * bias; (block_q, 1) column -> (1, block_q)
    # lane row via 2-D transpose
    dg_ref[0, 0] = jnp.sum(ds * bias, axis=1, keepdims=True).T.astype(
        dg_ref.dtype)
    db_acc[...] += gate_col * ds

    @pl.when(b == n_b - 1)
    def _store():
        dbias_ref[0] = db_acc[...].astype(dbias_ref.dtype)


def _bwd_dkv_single_kernel(
    lengths_ref, seed_ref,
    q_ref, k_ref, v_ref, bias_ref, gate_ref, do_ref, m_ref, l_ref, di_ref,
    dk_ref, dv_ref, dk_acc, dv_acc,
    *, scale, block_q, block_kv, n_q, masked, dropout_rate,
):
    """n_kv == 1 dk/dv: grid (H, B, n_q), q-blocks innermost (the dk/dv
    accumulation), with the ENTIRE (Lp, block_kv) bias column of head h as
    one block — its index (h,) is constant across the whole inner b x n_q
    sweep, so it is fetched once per head; the i-th (block_q, block_kv)
    tile is sliced in-kernel (block_q-aligned sublane start)."""
    b = pl.program_id(1)
    h = pl.program_id(0)
    q_idx = pl.program_id(2)

    @pl.when(q_idx == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    do = do_ref[0, 0].astype(jnp.float32)
    m = m_ref[0, 0][:, :1]
    l = l_ref[0, 0][:, :1]
    di = di_ref[0, 0][:, :1]
    bias_tile = bias_ref[0, pl.ds(q_idx * block_q, block_q), :]
    # (1, block_q) lane row -> (block_q, 1) sublane column: Mosaic supports
    # the 2-D transpose but not the equivalent reshape
    gate_col = gate_ref[0, 0].astype(jnp.float32).T

    s = _biased_scores(
        q, k, scale, bias_tile, gate_col, lengths_ref, b, 0, block_kv, masked
    )
    p = _recompute_p(s, m, l)
    dp = jax.lax.dot_general(
        do, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if dropout_rate > 0.0:
        keep = _dropout_keep_mask(
            p.shape, 1.0 - dropout_rate, seed_ref[0], b, h,
            q_idx * block_q, 0,
        )
        inv_keep = 1.0 / (1.0 - dropout_rate)
        p_used = jnp.where(keep, p * inv_keep, 0.0)
        dp = jnp.where(keep, dp * inv_keep, 0.0)
    else:
        p_used = p
    dv_acc[...] += jax.lax.dot_general(
        p_used, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = p * (dp - di)
    dk_acc[...] += jax.lax.dot_general(
        ds * scale, q.astype(jnp.float32), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(q_idx == n_q - 1)
    def _store():
        dk_ref[0, 0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[...].astype(dv_ref.dtype)


def _bwd_single(q, k, v, bias, gate, lengths, seed, do, m, l, di, scale,
                block_q, block_kv, interpret, dropout_rate, masked):
    """Single-KV-block backward dispatch: dkv + fused dq/dg/dbias."""
    B, H, L, D = q.shape
    n_q = L // block_q
    kw = dict(scale=scale, masked=masked, dropout_rate=dropout_rate,
              block_q=block_q, block_kv=block_kv)
    qspec = lambda order: pl.BlockSpec((1, 1, block_q, D), order)
    kvspec = lambda order: pl.BlockSpec((1, 1, block_kv, D), order)
    statspec = lambda order: pl.BlockSpec((1, 1, block_q, LANES), order)

    # --- dk/dv: grid (H, B, n_q), whole bias column per head ---
    dkv_in = [
        qspec(lambda h, b, i, *_: (b, h, i, 0)),
        kvspec(lambda h, b, i, *_: (b, h, 0, 0)),
        kvspec(lambda h, b, i, *_: (b, h, 0, 0)),
        pl.BlockSpec((1, L, block_kv), lambda h, b, i, *_: (h, 0, 0)),
        pl.BlockSpec((1, 1, 1, block_q), lambda h, b, i, *_: (b, h, 0, i)),
        qspec(lambda h, b, i, *_: (b, h, i, 0)),
        statspec(lambda h, b, i, *_: (b, h, i, 0)),
        statspec(lambda h, b, i, *_: (b, h, i, 0)),
        statspec(lambda h, b, i, *_: (b, h, i, 0)),
    ]
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_single_kernel, n_q=n_q, **kw),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(H, B, n_q),
            in_specs=dkv_in,
            out_specs=[
                kvspec(lambda h, b, i, *_: (b, h, 0, 0)),
                kvspec(lambda h, b, i, *_: (b, h, 0, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((block_kv, D), jnp.float32),
                pltpu.VMEM((block_kv, D), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, H, L, D), q.dtype),
            jax.ShapeDtypeStruct((B, H, L, D), q.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(lengths, seed, q, k, v, bias, gate[:, :, None, :], do, m, l, di)

    # --- fused dq + dgate + dbias: grid (H, n_q, B), batch innermost ---
    fused_in = [
        qspec(lambda h, i, b, *_: (b, h, i, 0)),
        kvspec(lambda h, i, b, *_: (b, h, 0, 0)),
        kvspec(lambda h, i, b, *_: (b, h, 0, 0)),
        pl.BlockSpec((1, block_q, block_kv), lambda h, i, b, *_: (h, i, 0)),
        pl.BlockSpec((1, 1, 1, block_q), lambda h, i, b, *_: (b, h, 0, i)),
        qspec(lambda h, i, b, *_: (b, h, i, 0)),
        statspec(lambda h, i, b, *_: (b, h, i, 0)),
        statspec(lambda h, i, b, *_: (b, h, i, 0)),
        statspec(lambda h, i, b, *_: (b, h, i, 0)),
    ]
    dq, dg, dbias = pl.pallas_call(
        functools.partial(_bwd_fused_single_kernel, n_b=B, **kw),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(H, n_q, B),
            in_specs=fused_in,
            out_specs=[
                qspec(lambda h, i, b, *_: (b, h, i, 0)),
                pl.BlockSpec((1, 1, 1, block_q), lambda h, i, b, *_: (b, h, 0, i)),
                pl.BlockSpec((1, block_q, block_kv), lambda h, i, b, *_: (h, i, 0)),
            ],
            scratch_shapes=[pltpu.VMEM((block_q, block_kv), jnp.float32)],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, H, L, D), q.dtype),
            jax.ShapeDtypeStruct((B, H, 1, L), jnp.float32),
            jax.ShapeDtypeStruct((H, L, L), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(lengths, seed, q, k, v, bias, gate[:, :, None, :], do, m, l, di)

    return dq, dk, dv, dbias, dg[:, :, 0, :]


# ---------------------------------------------------------------------------
# Custom VJP
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11))
def _wavlm_flash(q, k, v, bias, gate, lengths, seed, scale, block_q, block_kv,
                 interpret, dropout_rate):
    out, _, _ = _fwd(
        q, k, v, bias, gate, lengths, seed, scale, block_q, block_kv,
        interpret, dropout_rate,
    )
    return out


def _wavlm_fwd_rule(q, k, v, bias, gate, lengths, seed, scale, block_q,
                    block_kv, interpret, dropout_rate):
    out, m, l = _fwd(
        q, k, v, bias, gate, lengths, seed, scale, block_q, block_kv,
        interpret, dropout_rate,
    )
    return out, (q, k, v, bias, gate, lengths, seed, out, m, l)


def _wavlm_bwd_rule(scale, block_q, block_kv, interpret, dropout_rate, res, do):
    q, k, v, bias, gate, lengths, seed, out, m, l = res
    B, H, L, D = q.shape
    n_q = L // block_q
    n_kv = L // block_kv
    masked = lengths is not None
    if lengths is None:
        lengths = jnp.full((B,), L, jnp.int32)
    di = jnp.sum(out.astype(jnp.float32) * do.astype(jnp.float32), axis=-1)
    di = jnp.broadcast_to(di[..., None], (B, H, L, LANES))

    if n_kv == 1 and _single_block_enabled():
        dq, dk, dv, dbias, dg = _bwd_single(
            q, k, v, bias, gate, lengths, seed, do, m, l, di, scale,
            block_q, block_kv, interpret, dropout_rate, masked,
        )
        return (dq, dk, dv, dbias.astype(bias.dtype), dg.astype(gate.dtype),
                None, None)

    kw = dict(scale=scale, masked=masked, dropout_rate=dropout_rate)
    qspec = lambda order: pl.BlockSpec((1, 1, block_q, D), order)
    kvspec = lambda order: pl.BlockSpec((1, 1, block_kv, D), order)
    statspec = lambda order: pl.BlockSpec((1, 1, block_q, LANES), order)

    # --- dk/dv: grid (B, H, n_kv, n_q) ---
    dkv_in = [
        qspec(lambda b, h, j, i, *_: (b, h, i, 0)),
        kvspec(lambda b, h, j, i, *_: (b, h, j, 0)),
        kvspec(lambda b, h, j, i, *_: (b, h, j, 0)),
        pl.BlockSpec((1, block_q, block_kv), lambda b, h, j, i, *_: (h, i, j)),
        pl.BlockSpec((1, 1, 1, block_q), lambda b, h, j, i, *_: (b, h, 0, i)),
        qspec(lambda b, h, j, i, *_: (b, h, i, 0)),
        statspec(lambda b, h, j, i, *_: (b, h, i, 0)),
        statspec(lambda b, h, j, i, *_: (b, h, i, 0)),
        statspec(lambda b, h, j, i, *_: (b, h, i, 0)),
    ]
    dk, dv = pl.pallas_call(
        functools.partial(
            _bwd_dkv_kernel, block_q=block_q, block_kv=block_kv, n_q=n_q, **kw
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B, H, n_kv, n_q),
            in_specs=dkv_in,
            out_specs=[
                kvspec(lambda b, h, j, i, *_: (b, h, j, 0)),
                kvspec(lambda b, h, j, i, *_: (b, h, j, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((block_kv, D), jnp.float32),
                pltpu.VMEM((block_kv, D), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, H, L, D), q.dtype),
            jax.ShapeDtypeStruct((B, H, L, D), q.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(lengths, seed, q, k, v, bias, gate[:, :, None, :], do, m, l, di)

    # --- dq + dgate: grid (B, H, n_q, n_kv) ---
    dq_in = [
        qspec(lambda b, h, i, j, *_: (b, h, i, 0)),
        kvspec(lambda b, h, i, j, *_: (b, h, j, 0)),
        kvspec(lambda b, h, i, j, *_: (b, h, j, 0)),
        pl.BlockSpec((1, block_q, block_kv), lambda b, h, i, j, *_: (h, i, j)),
        pl.BlockSpec((1, 1, 1, block_q), lambda b, h, i, j, *_: (b, h, 0, i)),
        qspec(lambda b, h, i, j, *_: (b, h, i, 0)),
        statspec(lambda b, h, i, j, *_: (b, h, i, 0)),
        statspec(lambda b, h, i, j, *_: (b, h, i, 0)),
        statspec(lambda b, h, i, j, *_: (b, h, i, 0)),
    ]
    dq, dg = pl.pallas_call(
        functools.partial(
            _bwd_dq_kernel, block_kv=block_kv, n_kv=n_kv, **kw
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B, H, n_q, n_kv),
            in_specs=dq_in,
            out_specs=[
                qspec(lambda b, h, i, j, *_: (b, h, i, 0)),
                pl.BlockSpec((1, 1, 1, block_q), lambda b, h, i, j, *_: (b, h, 0, i)),
            ],
            scratch_shapes=[
                pltpu.VMEM((block_q, D), jnp.float32),
                pltpu.VMEM((block_q, LANES), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, H, L, D), q.dtype),
            jax.ShapeDtypeStruct((B, H, 1, L), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(lengths, seed, q, k, v, bias, gate[:, :, None, :], do, m, l, di)

    # --- dbias: grid (H, n_q, n_kv, B), batch innermost + sequential ---
    dbias_in = [
        qspec(lambda h, i, j, b, *_: (b, h, i, 0)),
        kvspec(lambda h, i, j, b, *_: (b, h, j, 0)),
        kvspec(lambda h, i, j, b, *_: (b, h, j, 0)),
        pl.BlockSpec((1, block_q, block_kv), lambda h, i, j, b, *_: (h, i, j)),
        pl.BlockSpec((1, 1, 1, block_q), lambda h, i, j, b, *_: (b, h, 0, i)),
        qspec(lambda h, i, j, b, *_: (b, h, i, 0)),
        statspec(lambda h, i, j, b, *_: (b, h, i, 0)),
        statspec(lambda h, i, j, b, *_: (b, h, i, 0)),
        statspec(lambda h, i, j, b, *_: (b, h, i, 0)),
    ]
    (dbias,) = pl.pallas_call(
        functools.partial(
            _bwd_dbias_kernel, block_q=block_q, block_kv=block_kv, n_b=B, **kw
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(H, n_q, n_kv, B),
            in_specs=dbias_in,
            out_specs=[
                pl.BlockSpec((1, block_q, block_kv), lambda h, i, j, b, *_: (h, i, j)),
            ],
            scratch_shapes=[pltpu.VMEM((block_q, block_kv), jnp.float32)],
        ),
        out_shape=[jax.ShapeDtypeStruct((H, L, L), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(lengths, seed, q, k, v, bias, gate[:, :, None, :], do, m, l, di)

    dg = dg[:, :, 0, :]
    return dq, dk, dv, dbias.astype(bias.dtype), dg.astype(gate.dtype), None, None


_wavlm_flash.defvjp(_wavlm_fwd_rule, _wavlm_bwd_rule)


def wavlm_flash_attention(
    q,
    k,
    v,
    bias,
    gate,
    lengths: Optional[jax.Array] = None,
    *,
    scale: Optional[float] = None,
    block_q: int = 256,
    block_kv: Optional[int] = None,
    interpret: Optional[bool] = None,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
):
    """Fused WavLM attention.

    q, k, v: (B, H, L, D); bias: (H, L, L) relative position bias (already
    head-selected); gate: (B, H, L) per-row bias gate (``gate_a_1``, ones if
    gru_rel_pos is off); lengths: optional (B,) valid key counts.
    """
    B, H, L, D = q.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if scale is None:
        scale = D ** -0.5
    block_q = min(block_q, _ceil_to(L, LANES))
    Lp = _ceil_to(L, block_q)
    if block_kv is None:
        block_kv = Lp
    block_kv = min(block_kv, Lp)
    if Lp % block_kv:
        Lp = _ceil_to(Lp, block_kv)

    if dropout_rate > 0.0:
        if dropout_rng is None:
            raise ValueError("dropout_rate > 0 requires dropout_rng")
        seed = jax.random.bits(dropout_rng, (1,), jnp.uint32).astype(jnp.int32)
    else:
        seed = jnp.zeros((1,), jnp.int32)

    if Lp != L:
        pad4 = [(0, 0), (0, 0), (0, Lp - L), (0, 0)]
        q = jnp.pad(q, pad4)
        k = jnp.pad(k, pad4)
        v = jnp.pad(v, pad4)
        bias = jnp.pad(bias, [(0, 0), (0, Lp - L), (0, Lp - L)])
        gate = jnp.pad(gate, [(0, 0), (0, 0), (0, Lp - L)])
        if lengths is None:
            lengths = jnp.full((B,), L, jnp.int32)
    if lengths is not None:
        lengths = lengths.astype(jnp.int32)
    out = _wavlm_flash(
        q, k, v, bias, gate, lengths, seed, float(scale), block_q, block_kv,
        interpret, float(dropout_rate),
    )
    if Lp != L:
        out = out[:, :, :L, :]
    return out
