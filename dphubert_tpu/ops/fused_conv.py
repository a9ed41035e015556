"""Fused conv feature-extractor kernels for TPU (Pallas).

Replaces the XLA ``conv_general_dilated`` path of the waveform CNN
(reference ``/root/reference/wav2vec2/components.py:81-134``): each conv
stage becomes ONE Pallas kernel computing conv + bias + norm + exact GELU +
HardConcrete channel gate, bf16 in/out with fp32 accumulation.  The XLA path
materializes fp32 norm statistics and un-fused GELU/gate passes over the
(B, 512, T) activations — the dominant HBM cost of the whole train step
(~54% at B=16x15s).  Here every elementwise op runs in VMEM on the conv
output tile, so each stage costs exactly one read of its input and one
write of its output.

Layout: activations stay time-major ``(B, T, C)`` in HBM end-to-end (TPU
HBM arrays are tiled (8, 128), so any XLA reshape across the lane dim would
be a full-tensor relayout copy).  Each kernel reshapes its input tile to
the *depth view* ``xd = x_tile.reshape(F + Q - 1, s*C)`` in VMEM, where a
stride-``s`` conv with kernel ``k`` becomes ``Q = ceil(k/s)`` MXU matmuls
``y[t] = sum_q xd[t+q] @ Wd_q`` with ``Wd_q[j*C_in + c, o] = W[o, c,
q*s + j]`` (the final tap group contracts only its ``rem*C_in`` real lanes,
so padded taps cost no MXU work).  Cross-tile halos ((Q-1)*s rows) are read
through a second small BlockSpec on the same array with a clamped index map.

Inter-layer buffers are **tile-aligned and zero-filled**: each layer emits
``p_out`` frames (a multiple of its tile, with rows past ``valid_out``
masked to zero in-kernel), and the padded row budget is planned so every
block and halo read of the next layer is in-bounds.  Nothing ever reads
uninitialized HBM, which removes the per-element sanitize pass an
out-of-bounds-tolerant design would need (several VPU ops per input
element).  The final output is sliced back to the true length once.

The raw ``(B, T)`` waveform is pre-grouped in XLA to ``(B, T//s0, s0)``
(one cheap copy of the smallest array in the model; its VJP is automatic),
which turns layer 0 into an ordinary ``(c_in=s0, k=ceil(k0/s0), stride=1)``
layer whose depth-view reshape is an identity.  This sidesteps Mosaic's
"unsupported shape cast" on lane->sublane reshapes (a ``(1, F*s0)`` lane
vector cannot be reshaped to ``(F, s0)`` in-kernel), keeps every BlockSpec
tile-legal (the lane dim s0 equals the full array dim), and removes all
waveform special-casing from the kernels.

GroupNorm (layer 0 of the Base family) needs global per-(batch, channel)
statistics over time, so it is split into a partial-sums kernel
(:func:`_conv0_partials`, differentiable through mean/var) plus an
``affine`` input ``(B, 2, C)`` to the layer kernel.  The per-frame
``layer_norm`` mode (Large family) is computed fully in-kernel.

Custom VJPs: backward kernels recompute the conv output from the input tile
(the conv FLOPs are cheap; the pipeline is bandwidth-bound), so the only
residuals are the op inputs.  ``dW``/``db``/``dgate``/``dLN``/``daffine``
accumulate directly in VMEM-resident output blocks over a sequential time
axis and are summed over batch by XLA; ``dx`` is emitted in the input's
dtype and natural layout.

Interpret mode (CPU tests) uses the same kernels via ``interpret=True``.
Irregular post-surgery channel counts fall back to the XLA path (see
:func:`supports_spec`).
"""

from __future__ import annotations

import functools
import math
import os
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LN_EPS = 1e-5
_HALO = 16  # halo block rows (sublane aligned); must divide every F*s tile


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _ceil_to(x: int, m: int) -> int:
    return _cdiv(x, m) * m


class ConvDef(NamedTuple):
    """Static single-layer descriptor (hashable; closed over by the VJP)."""

    c_in: int
    c_out: int
    k: int
    s: int
    has_bias: bool
    norm: str  # "none" | "ln" | "affine"
    has_gate: bool
    f_tile: int  # output frames per grid cell (multiple of 16)
    f_tile_bwd: int  # smaller bwd tile: bwd kernels hold ~3x the buffers
    valid_out: int  # true output length (T_in - k)//s + 1
    p_out: int  # padded output frames (multiple of f_tile; zero past valid)
    interpret: bool

    @property
    def q(self) -> int:
        return _cdiv(self.k, self.s)

    @property
    def w_lane(self) -> int:
        return self.s * self.c_in

    @property
    def rem_lane(self) -> int:
        """Real lanes of the final tap group: the depth weights pad ``k`` to
        ``q*s`` taps, so tap group q-1 holds only ``k - (q-1)*s`` nonzero
        taps — contract just those."""
        return (self.k - (self.q - 1) * self.s) * self.c_in


def _depth_weights(w, k: int, s: int):
    """torch-layout ``(O, I, K)`` conv weight -> ``(Q, s*I, O)`` matmul
    stack for the depth view (tap ``q*s + j`` lands at row ``j*I + c``)."""
    O, I, K = w.shape
    q = _cdiv(k, s)
    if q * s != K:
        w = jnp.pad(w, ((0, 0), (0, 0), (0, q * s - K)))
    return w.reshape(O, I, q, s).transpose(2, 3, 1, 0).reshape(q, s * I, O)


def _erf_f32(x):
    """fp32 erf from Mosaic-supported primitives (``lax.erf`` has no Pallas
    TPU lowering).  Abramowitz & Stegun 7.1.26: max abs error 1.5e-7 —
    far inside the <=1e-4 reference-parity budget.  Used on every backend
    so the CPU tests validate exactly the TPU numerics."""
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429)))
    )
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_f32(u):
    return 0.5 * u * (1.0 + _erf_f32(u * (1.0 / math.sqrt(2.0))))


def _gelu_grad_f32(u):
    cdf = 0.5 * (1.0 + _erf_f32(u * (1.0 / math.sqrt(2.0))))
    pdf = jnp.exp(-0.5 * u * u) * (1.0 / math.sqrt(2.0 * math.pi))
    return cdf + u * pdf


def _depth_view(cdef: ConvDef, xm, xr, xl, n_frames: int):
    """Assemble the VMEM depth view (n_frames + Q - 1, s*C_in) for a tile
    from the main block plus optional right/left halo blocks (halos carry
    (Q-1)*s input rows each)."""
    s, q = cdef.s, cdef.q
    hrows = (q - 1) * s
    x = xm[0]  # (F*s, C)
    parts = []
    if xl is not None:
        parts.append(xl[0][_HALO - hrows:])
    parts.append(x)
    if xr is not None:
        parts.append(xr[0][:hrows])
    if len(parts) > 1:
        x = jnp.concatenate(parts, axis=0)
    rows = (n_frames + q - 1) * s
    return x[:rows].reshape(n_frames + q - 1, s * cdef.c_in)


def _conv_rows(cdef: ConvDef, xd, wd_ref, n_rows: int):
    """``n_rows`` conv outputs from the depth view (n_rows + Q - 1 rows):
    fp32 accumulation on the MXU; the last tap group contracts only its
    real lanes (k=3,s=2 layers would otherwise waste 25% of the MXU on
    zero taps)."""
    acc = jnp.zeros((n_rows, cdef.c_out), jnp.float32)
    rem = cdef.rem_lane
    for qi in range(cdef.q):
        lhs = xd[qi : qi + n_rows]
        rhs = wd_ref[qi]
        if qi == cdef.q - 1 and rem < cdef.w_lane:
            lhs = lhs[:, :rem]
            rhs = rhs[:rem]
        acc = acc + jax.lax.dot(lhs, rhs, preferred_element_type=jnp.float32)
    return acc


def _x_block_specs(cdef: ConvDef, f: int, t_in: int, *, left: bool, right: bool):
    """Main + halo BlockSpecs over the natural-layout input for tiles of
    ``f`` output frames (``f*s`` input rows each)."""
    rows = f * cdef.s
    hb = rows // _HALO
    last = max(_cdiv(t_in, _HALO) - 1, 0)
    c = cdef.c_in
    specs = [pl.BlockSpec((1, rows, c), lambda b, t: (b, t, 0))]
    if right:
        specs.append(
            pl.BlockSpec(
                (1, _HALO, c),
                lambda b, t: (b, jnp.minimum((t + 1) * hb, last), 0),
            )
        )
    if left:
        specs.append(
            pl.BlockSpec(
                (1, _HALO, c), lambda b, t: (b, jnp.maximum(t * hb - 1, 0), 0)
            )
        )
    return specs


def _vec_spec(c):
    return pl.BlockSpec((1, c), lambda b, t: (0, 0))


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _fwd_kernel(*refs, cdef: ConvDef):
    it = iter(refs)
    xm_ref = next(it)
    xr_ref = next(it) if cdef.q > 1 else None
    wd_ref = next(it)
    b_ref = next(it) if cdef.has_bias else None
    if cdef.norm == "ln":
        lnw_ref, lnb_ref = next(it), next(it)
    aff_ref = next(it) if cdef.norm == "affine" else None
    g_ref = next(it) if cdef.has_gate else None
    o_ref = next(it)

    t = pl.program_id(1)
    F = cdef.f_tile
    xd = _depth_view(cdef, xm_ref, xr_ref, None, F)
    z = _conv_rows(cdef, xd, wd_ref, F)
    if b_ref is not None:
        z = z + b_ref[...].astype(jnp.float32)
    if cdef.norm == "affine":
        z = z * aff_ref[0, 0:1, :] + aff_ref[0, 1:2, :]
    elif cdef.norm == "ln":
        mean = jnp.mean(z, axis=1, keepdims=True)
        var = jnp.mean(jnp.square(z - mean), axis=1, keepdims=True)
        z = (z - mean) * jax.lax.rsqrt(var + LN_EPS)
        z = z * lnw_ref[...].astype(jnp.float32) + lnb_ref[...].astype(jnp.float32)
    y = _gelu_f32(z)
    if g_ref is not None:
        y = y * g_ref[...].astype(jnp.float32)
    if cdef.p_out > cdef.valid_out:
        # zero-fill past the valid length: downstream layers read these rows
        # through their tiles/halos, so they must be finite (and zero keeps
        # the GroupNorm partial sums exact)
        frame = jax.lax.broadcasted_iota(jnp.int32, (F, 1), 0) + t * F
        y = jnp.where(frame < cdef.valid_out, y, 0.0)
    o_ref[0] = y.astype(o_ref.dtype)


def _small_operands(cdef: ConvDef, bias, lnw, lnb, affine, gate):
    ops, specs = [], []
    c = cdef.c_out
    if cdef.has_bias:
        ops.append(bias.reshape(1, c).astype(jnp.float32))
        specs.append(_vec_spec(c))
    if cdef.norm == "ln":
        ops += [
            lnw.reshape(1, c).astype(jnp.float32),
            lnb.reshape(1, c).astype(jnp.float32),
        ]
        specs += [_vec_spec(c), _vec_spec(c)]
    if cdef.norm == "affine":
        ops.append(affine.astype(jnp.float32))
        specs.append(pl.BlockSpec((1, 2, c), lambda b, t: (b, 0, 0)))
    if cdef.has_gate:
        ops.append(gate.reshape(1, c).astype(jnp.float32))
        specs.append(_vec_spec(c))
    return ops, specs


def _conv_fwd(cdef: ConvDef, x, wd, bias, lnw, lnb, affine, gate):
    B = x.shape[0]
    t_in = x.shape[1]
    F = cdef.f_tile
    n_t = cdef.p_out // F
    x_specs = _x_block_specs(cdef, F, t_in, left=False, right=cdef.q > 1)
    operands = [x] * len(x_specs)
    operands.append(wd)
    wspec = pl.BlockSpec((cdef.q, cdef.w_lane, cdef.c_out), lambda b, t: (0, 0, 0))
    small_ops, small_specs = _small_operands(cdef, bias, lnw, lnb, affine, gate)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, cdef=cdef),
        grid=(B, n_t),
        in_specs=x_specs + [wspec] + small_specs,
        out_specs=pl.BlockSpec((1, F, cdef.c_out), lambda b, t: (b, t, 0)),
        out_shape=jax.ShapeDtypeStruct((B, cdef.p_out, cdef.c_out), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=cdef.interpret,
    )(*operands, *small_ops)


# ---------------------------------------------------------------------------
# Backward
# ---------------------------------------------------------------------------


def _bwd_kernel(*refs, cdef: ConvDef):
    it = iter(refs)
    xm_ref = next(it)
    xr_ref = next(it) if cdef.q > 1 else None
    xl_ref = next(it) if cdef.q > 1 else None
    wd_ref = next(it)
    dy_ref = next(it)
    dyl_ref = next(it) if cdef.q > 1 else None
    b_ref = next(it) if cdef.has_bias else None
    if cdef.norm == "ln":
        lnw_ref, lnb_ref = next(it), next(it)
    aff_ref = next(it) if cdef.norm == "affine" else None
    g_ref = next(it) if cdef.has_gate else None
    # outputs
    dx_ref = next(it)
    dwd_ref = next(it)
    db_ref = next(it) if cdef.has_bias else None
    dln_ref = next(it) if cdef.norm == "ln" else None
    daff_ref = next(it) if cdef.norm == "affine" else None
    dg_ref = next(it) if cdef.has_gate else None

    t = pl.program_id(1)
    F, E = cdef.f_tile_bwd, cdef.q - 1
    Fe = F + E  # extended frames: [t*F - E, t*F + F)

    @pl.when(t == 0)
    def _init():
        dwd_ref[...] = jnp.zeros_like(dwd_ref)
        if db_ref is not None:
            db_ref[...] = jnp.zeros_like(db_ref)
        if dln_ref is not None:
            dln_ref[...] = jnp.zeros_like(dln_ref)
        if daff_ref is not None:
            daff_ref[...] = jnp.zeros_like(daff_ref)
        if dg_ref is not None:
            dg_ref[...] = jnp.zeros_like(dg_ref)

    xd = _depth_view(cdef, xm_ref, xr_ref, xl_ref, Fe)  # (Fe + Q - 1, sC)
    if E > 0:
        # dy halo blocks are _DY_HALO(=8) rows (frame units)
        dy_full = jnp.concatenate([dyl_ref[0][8 - E :], dy_ref[0]], axis=0)
    else:
        dy_full = dy_ref[0]

    frame = (
        jax.lax.broadcasted_iota(jnp.int32, (Fe, 1), 0) + t * F - E
    )  # global output-frame index per extended row
    fvalid = jnp.logical_and(frame >= 0, frame < cdef.valid_out)
    own = jnp.logical_and(fvalid, frame >= t * F)
    dy = jnp.where(fvalid, dy_full.astype(jnp.float32), 0.0)

    z = _conv_rows(cdef, xd, wd_ref, Fe)
    if b_ref is not None:
        z = z + b_ref[...].astype(jnp.float32)

    if cdef.norm == "affine":
        scale = aff_ref[0, 0:1, :]
        u = z * scale + aff_ref[0, 1:2, :]
    elif cdef.norm == "ln":
        lnw = lnw_ref[...].astype(jnp.float32)
        mean = jnp.mean(z, axis=1, keepdims=True)
        var = jnp.mean(jnp.square(z - mean), axis=1, keepdims=True)
        rstd = jax.lax.rsqrt(var + LN_EPS)
        xhat = (z - mean) * rstd
        u = xhat * lnw + lnb_ref[...].astype(jnp.float32)
    else:
        u = z

    da = dy
    if g_ref is not None:
        gate = g_ref[...].astype(jnp.float32)
        da = dy * gate
        dg_ref[...] += jnp.sum(
            jnp.where(own, dy * _gelu_f32(u), 0.0), axis=0, keepdims=True
        )
    du = da * _gelu_grad_f32(u)

    if cdef.norm == "affine":
        du_own = jnp.where(own, du, 0.0)
        daff_ref[0, 0:1, :] += jnp.sum(du_own * z, axis=0, keepdims=True)
        daff_ref[0, 1:2, :] += jnp.sum(du_own, axis=0, keepdims=True)
        dz = du * scale
    elif cdef.norm == "ln":
        du_own = jnp.where(own, du, 0.0)
        dln_ref[0, 0:1, :] += jnp.sum(du_own * xhat, axis=0, keepdims=True)
        dln_ref[0, 1:2, :] += jnp.sum(du_own, axis=0, keepdims=True)
        dxh = du * lnw
        dz = (
            dxh
            - jnp.mean(dxh, axis=1, keepdims=True)
            - xhat * jnp.mean(dxh * xhat, axis=1, keepdims=True)
        ) * rstd
    else:
        dz = du
    dz = jnp.where(fvalid, dz, 0.0)
    dz_own = dz[E:]  # frames [t*F, t*F + F)

    if db_ref is not None:
        db_ref[...] += jnp.sum(jnp.where(own[E:], dz_own, 0.0), axis=0, keepdims=True)

    for qi in range(cdef.q):
        dwd_ref[0, qi] += jax.lax.dot_general(
            xd[E + qi : E + qi + F],
            dz_own,
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    dxd = jnp.zeros((F, cdef.w_lane), jnp.float32)
    for qi in range(cdef.q):
        dxd = dxd + jax.lax.dot_general(
            dz[E - qi : E - qi + F],
            wd_ref[qi],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    dx_ref[0] = dxd.reshape(F * cdef.s, cdef.c_in).astype(dx_ref.dtype)


def _dy_specs(cdef: ConvDef, f: int):
    """Main (clamped) + left-halo BlockSpecs over dy for bwd tiles — grid
    tiles past the last dy block exist only to zero-fill trailing dx rows
    (their dz is fully masked)."""
    c = cdef.c_out
    fb = f // 8
    n_main = max(cdef.p_out // f - 1, 0)
    n_halo = max(cdef.p_out // 8 - 1, 0)
    specs = [
        pl.BlockSpec((1, f, c), lambda b, t: (b, jnp.minimum(t, n_main), 0))
    ]
    if cdef.q > 1:
        specs.append(
            pl.BlockSpec(
                (1, 8, c),
                lambda b, t: (b, jnp.minimum(jnp.maximum(t * fb - 1, 0), n_halo), 0),
            )
        )
    return specs


def _bwd_grid_and_out(cdef: ConvDef, x):
    """Backward grid covers every input row (dx rows past the last valid
    frame are zero because dz is masked, but they must be written)."""
    B = x.shape[0]
    t_in = x.shape[1]
    F = cdef.f_tile_bwd
    rows = F * cdef.s
    n_t = _cdiv(max(_cdiv(t_in, cdef.s), cdef.valid_out), F)
    dx_spec = pl.BlockSpec((1, rows, cdef.c_in), lambda b, t: (b, t, 0))
    dx_shape = jax.ShapeDtypeStruct((B, n_t * rows, cdef.c_in), x.dtype)
    return n_t, dx_spec, dx_shape


def _conv_bwd_impl(cdef: ConvDef, x, wd, bias, lnw, lnb, affine, gate, dy):
    B = x.shape[0]
    t_in = x.shape[1]
    Q, C, F = cdef.q, cdef.c_out, cdef.f_tile_bwd
    n_t, dx_spec, dx_shape = _bwd_grid_and_out(cdef, x)

    x_specs = _x_block_specs(cdef, F, t_in, left=Q > 1, right=Q > 1)
    wspec = pl.BlockSpec((Q, cdef.w_lane, C), lambda b, t: (0, 0, 0))
    dy_specs = _dy_specs(cdef, F)
    small_ops, small_specs = _small_operands(cdef, bias, lnw, lnb, affine, gate)

    in_specs = x_specs + [wspec] + dy_specs + small_specs
    operands = [x] * len(x_specs) + [wd] + [dy] * len(dy_specs) + small_ops

    out_specs = [
        dx_spec,
        pl.BlockSpec((1, Q, cdef.w_lane, C), lambda b, t: (b, 0, 0, 0)),
    ]
    out_shape = [
        dx_shape,
        jax.ShapeDtypeStruct((B, Q, cdef.w_lane, C), jnp.float32),
    ]
    if cdef.has_bias:
        out_specs.append(pl.BlockSpec((1, 1, C), lambda b, t: (b, 0, 0)))
        out_shape.append(jax.ShapeDtypeStruct((B, 1, C), jnp.float32))
    if cdef.norm == "ln":
        out_specs.append(pl.BlockSpec((1, 2, C), lambda b, t: (b, 0, 0)))
        out_shape.append(jax.ShapeDtypeStruct((B, 2, C), jnp.float32))
    if cdef.norm == "affine":
        out_specs.append(pl.BlockSpec((1, 2, C), lambda b, t: (b, 0, 0)))
        out_shape.append(jax.ShapeDtypeStruct((B, 2, C), jnp.float32))
    if cdef.has_gate:
        out_specs.append(pl.BlockSpec((1, 1, C), lambda b, t: (b, 0, 0)))
        out_shape.append(jax.ShapeDtypeStruct((B, 1, C), jnp.float32))

    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, cdef=cdef),
        grid=(B, n_t),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=cdef.interpret,
    )(*operands)

    it = iter(outs)
    dx = next(it)[:, :t_in]
    dwd = jnp.sum(next(it), axis=0).astype(wd.dtype)
    dbias = dlnw = dlnb = daff = dgate = None
    if cdef.has_bias:
        dbias = jnp.sum(next(it), axis=(0, 1)).astype(bias.dtype)
    if cdef.norm == "ln":
        dln = next(it)
        dlnw = jnp.sum(dln[:, 0, :], axis=0).astype(lnw.dtype)
        dlnb = jnp.sum(dln[:, 1, :], axis=0).astype(lnb.dtype)
    if cdef.norm == "affine":
        daff = next(it).astype(affine.dtype)
    if cdef.has_gate:
        dgate = jnp.sum(next(it), axis=(0, 1)).reshape(gate.shape).astype(gate.dtype)
    return dx, dwd, dbias, dlnw, dlnb, daff, dgate


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _conv_layer(cdef: ConvDef, x, wd, bias, lnw, lnb, affine, gate):
    return _conv_fwd(cdef, x, wd, bias, lnw, lnb, affine, gate)


def _conv_layer_fwd_rule(cdef, x, wd, bias, lnw, lnb, affine, gate):
    out = _conv_fwd(cdef, x, wd, bias, lnw, lnb, affine, gate)
    return out, (x, wd, bias, lnw, lnb, affine, gate)


def _conv_layer_bwd_rule(cdef, res, dy):
    x, wd, bias, lnw, lnb, affine, gate = res
    return _conv_bwd_impl(cdef, x, wd, bias, lnw, lnb, affine, gate, dy)


_conv_layer.defvjp(_conv_layer_fwd_rule, _conv_layer_bwd_rule)


# ---------------------------------------------------------------------------
# GroupNorm statistics (layer 0): partial sums of z and z^2 over time
# ---------------------------------------------------------------------------


def _stats_fwd_kernel(*refs, cdef: ConvDef):
    it = iter(refs)
    xm_ref = next(it)
    xr_ref = next(it) if cdef.q > 1 else None
    wd_ref = next(it)
    b_ref = next(it) if cdef.has_bias else None
    o_ref = next(it)

    t = pl.program_id(1)
    F = cdef.f_tile
    xd = _depth_view(cdef, xm_ref, xr_ref, None, F)
    z = _conv_rows(cdef, xd, wd_ref, F)
    if b_ref is not None:
        z = z + b_ref[...].astype(jnp.float32)
    frame = jax.lax.broadcasted_iota(jnp.int32, (F, 1), 0) + t * F
    valid = frame < cdef.valid_out
    z = jnp.where(valid, z, 0.0)
    o_ref[0, 0, 0:1, :] = jnp.sum(z, axis=0, keepdims=True)
    o_ref[0, 0, 1:2, :] = jnp.sum(z * z, axis=0, keepdims=True)


def _stats_bwd_kernel(*refs, cdef: ConvDef):
    it = iter(refs)
    xm_ref = next(it)
    xr_ref = next(it) if cdef.q > 1 else None
    xl_ref = next(it) if cdef.q > 1 else None
    wd_ref = next(it)
    ds_ref = next(it)
    b_ref = next(it) if cdef.has_bias else None
    dx_ref = next(it)
    dwd_ref = next(it)
    db_ref = next(it) if cdef.has_bias else None

    t = pl.program_id(1)
    F, E = cdef.f_tile_bwd, cdef.q - 1
    Fe = F + E

    @pl.when(t == 0)
    def _init():
        dwd_ref[...] = jnp.zeros_like(dwd_ref)
        if db_ref is not None:
            db_ref[...] = jnp.zeros_like(db_ref)

    xd = _depth_view(cdef, xm_ref, xr_ref, xl_ref, Fe)
    z = _conv_rows(cdef, xd, wd_ref, Fe)
    if b_ref is not None:
        z = z + b_ref[...].astype(jnp.float32)
    frame = jax.lax.broadcasted_iota(jnp.int32, (Fe, 1), 0) + t * F - E
    fvalid = jnp.logical_and(frame >= 0, frame < cdef.valid_out)
    own = jnp.logical_and(fvalid, frame >= t * F)
    # NOTE: the cotangent of the partial-sums op is per-tile, and the left
    # halo frames belong to tile t-1 — whose ds equals ours only after the
    # outer jnp.sum over tiles (broadcast cotangent).  That holds for every
    # caller here (stats are always consumed through the tile-sum).
    ds1 = ds_ref[0, 0, 0:1, :]
    ds2 = ds_ref[0, 0, 1:2, :]
    dz = jnp.where(fvalid, ds1 + 2.0 * ds2 * z, 0.0)
    dz_own = jnp.where(own[E:], dz[E:], 0.0)

    if db_ref is not None:
        db_ref[...] += jnp.sum(dz_own, axis=0, keepdims=True)
    for qi in range(cdef.q):
        dwd_ref[0, qi] += jax.lax.dot_general(
            xd[E + qi : E + qi + F],
            dz_own,
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    dxd = jnp.zeros((F, cdef.w_lane), jnp.float32)
    for qi in range(cdef.q):
        dxd = dxd + jax.lax.dot_general(
            dz[E - qi : E - qi + F],
            wd_ref[qi],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    dx_ref[0] = dxd.reshape(F * cdef.s, cdef.c_in).astype(dx_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _conv0_partials(cdef: ConvDef, x, wd, bias):
    return _stats_fwd(cdef, x, wd, bias)


def _stats_fwd(cdef: ConvDef, x, wd, bias):
    B = x.shape[0]
    t_in = x.shape[1]
    F = cdef.f_tile
    n_t = cdef.p_out // F
    x_specs = _x_block_specs(cdef, F, t_in, left=False, right=cdef.q > 1)
    wspec = pl.BlockSpec((cdef.q, cdef.w_lane, cdef.c_out), lambda b, t: (0, 0, 0))
    operands = [x] * len(x_specs) + [wd]
    in_specs = x_specs + [wspec]
    if cdef.has_bias:
        operands.append(bias.reshape(1, cdef.c_out).astype(jnp.float32))
        in_specs.append(_vec_spec(cdef.c_out))
    return pl.pallas_call(
        functools.partial(_stats_fwd_kernel, cdef=cdef),
        grid=(B, n_t),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, 2, cdef.c_out), lambda b, t: (b, t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, n_t, 2, cdef.c_out), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=cdef.interpret,
    )(*operands)


def _stats_fwd_rule(cdef, x, wd, bias):
    return _stats_fwd(cdef, x, wd, bias), (x, wd, bias)


def _stats_bwd_rule(cdef, res, ds):
    x, wd, bias = res
    B = x.shape[0]
    t_in = x.shape[1]
    Q, C, F = cdef.q, cdef.c_out, cdef.f_tile_bwd
    n_t, dx_spec, dx_shape = _bwd_grid_and_out(cdef, x)

    x_specs = _x_block_specs(cdef, F, t_in, left=Q > 1, right=Q > 1)
    wspec = pl.BlockSpec((Q, cdef.w_lane, C), lambda b, t: (0, 0, 0))
    n_ds = max(ds.shape[1] - 1, 0)  # clamp: trailing zero-fill tiles (masked)
    ds_spec = pl.BlockSpec(
        (1, 1, 2, C), lambda b, t: (b, jnp.minimum(t, n_ds), 0, 0)
    )
    in_specs = x_specs + [wspec, ds_spec]
    operands = [x] * len(x_specs) + [wd, ds]
    if cdef.has_bias:
        in_specs.append(_vec_spec(C))
        operands.append(bias.reshape(1, C).astype(jnp.float32))

    out_specs = [
        dx_spec,
        pl.BlockSpec((1, Q, cdef.w_lane, C), lambda b, t: (b, 0, 0, 0)),
    ]
    out_shape = [
        dx_shape,
        jax.ShapeDtypeStruct((B, Q, cdef.w_lane, C), jnp.float32),
    ]
    if cdef.has_bias:
        out_specs.append(pl.BlockSpec((1, 1, C), lambda b, t: (b, 0, 0)))
        out_shape.append(jax.ShapeDtypeStruct((B, 1, C), jnp.float32))

    outs = pl.pallas_call(
        functools.partial(_stats_bwd_kernel, cdef=cdef),
        grid=(B, n_t),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=cdef.interpret,
    )(*operands)
    dx = outs[0][:, :t_in]
    dwd = jnp.sum(outs[1], axis=0).astype(wd.dtype)
    dbias = None
    if cdef.has_bias:
        dbias = jnp.sum(outs[2], axis=(0, 1)).astype(bias.dtype)
    return dx, dwd, dbias


_conv0_partials.defvjp(_stats_fwd_rule, _stats_bwd_rule)


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------


def supports_spec(spec) -> bool:
    """Fused path supports: layer-0 c_in == 1 with kernel a multiple of
    stride (so the grouped-waveform view loses no frames), all other
    channel counts multiples of 128 (lane-aligned depth views), s <= k with
    halos within one _HALO block, and the reference norm placements
    (group_norm only at layer 0)."""
    convs = spec.conv_layers
    if not convs or convs[0].in_channels != 1:
        return False
    c0 = convs[0]
    if c0.stride < 1 or c0.kernel_size % c0.stride != 0:
        return False
    if c0.kernel_size // c0.stride - 1 > _HALO:
        return False
    for i, c in enumerate(convs):
        if c.kernel_size < c.stride or c.stride < 1:
            return False
        if (_cdiv(c.kernel_size, c.stride) - 1) * c.stride > _HALO:
            return False
        if c.out_channels % 128 != 0:
            return False
        if i > 0 and (c.in_channels % 128 != 0 or c.norm == "group_norm"):
            return False
    return True


def use_fused_conv(spec) -> bool:
    """Opt-in (DPHUBERT_FUSED_CONV=1).  Measured on v5e at the bench shape
    (bf16, B=16x15s): fused forward ties XLA (19.6 vs 19.8 ms) but the
    recompute-based backward loses (70 vs 42 ms fwd+bwd) — XLA's native
    conv path on TPU is already near its roofline for this stack, so the
    fused path stays off by default until the backward wins."""
    env = os.environ.get("DPHUBERT_FUSED_CONV")
    if env is None or env in ("0", "false", "False"):
        return False
    return supports_spec(spec)


def fused_feature_extractor(
    p,
    spec,
    wave,
    gates=None,
    *,
    interpret: Optional[bool] = None,
    f_tile: int = 512,
    f_tile_bwd: int = 128,
):
    """(B, T) waveform -> (B, frames, C) features through the fused conv
    stack (without the trailing ``dummy_weight``; reference
    ``components.py:158-185``)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    dt = wave.dtype
    convs = spec.conv_layers

    # --- pass 1: plan true lengths, tiles, and padded row budgets --------
    # each layer's padded output (p_out frames, multiple of its tile) must
    # cover BOTH its own valid frames and every row the next layer's grid
    # and halos will read, so no kernel ever touches uninitialized HBM
    plan = []
    r = wave.shape[1]
    for i, c in enumerate(convs):
        k, s = c.kernel_size, c.stride
        r_out = max((r - k) // s + 1, 1)
        if i == 0 and c.in_channels == 1:
            k_eff, s_eff, cin_eff = k // s, 1, s
        else:
            k_eff, s_eff, cin_eff = k, s, c.in_channels
        f = _ceil_to(min(f_tile, _ceil_to(r_out, _HALO)), _HALO)
        if f > f_tile_bwd:
            f = _ceil_to(f, f_tile_bwd)  # fb must divide f
        fb = min(f_tile_bwd, f)
        plan.append(dict(c=c, k=k_eff, s=s_eff, cin=cin_eff, r_out=r_out,
                         f=f, fb=fb))
        r = r_out
    rows_needed = 0  # input rows the NEXT layer's grids consume
    next_align = None  # next layer's bwd-grid granularity fb*s
    for info in reversed(plan):
        # p_out must be a multiple of this layer's fwd tile AND of the next
        # layer's bwd tile-rows (its backward grid tiles the input exactly,
        # so no tail tile ever reads out of bounds — OOB garbage would
        # poison the dW dot even against zeroed dz rows, NaN * 0 = NaN)
        align = info["f"]
        if next_align is not None:
            align = align * next_align // math.gcd(align, next_align)
        p_out = _ceil_to(max(info["r_out"], rows_needed), align)
        info["p_out"] = p_out
        rows_needed = p_out * info["s"]
        next_align = info["fb"] * info["s"]
    in_align = next_align  # layer 0's own bwd granularity

    # --- pass 2: run the stack ------------------------------------------
    x = wave
    for i, (c, info) in enumerate(zip(convs, plan)):
        k_eff, s_eff, cin_eff = info["k"], info["s"], info["cin"]
        r_out, f, fb, p_out = info["r_out"], info["f"], info["fb"], info["p_out"]

        lp = p["conv_layers"][str(i)]
        w = lp["conv"]["weight"].astype(dt)
        if i == 0 and c.in_channels == 1:
            # Group the waveform: (B, T) -> (B, T//s, s), making layer 0 an
            # ordinary (c_in=s, k=k//s, stride=1) layer (identity depth
            # view; Mosaic can't reshape lane vectors to sublanes).  The
            # grouping reshape is XLA-level, so its VJP is automatic.
            s0 = c.stride
            g = x.shape[1] // s0
            x = x[:, : g * s0].reshape(x.shape[0], g, s0)
            # zero-pad group rows so the first layer's fwd AND bwd grids +
            # halos are in-bounds (rows_needed after the plan = layer 0's
            # forward consumption; in_align = its backward granularity)
            g_pad = _ceil_to(max(g, p_out * s_eff), in_align)
            if g_pad > g:
                x = jnp.pad(x, ((0, 0), (0, g_pad - g), (0, 0)))
            # (O, 1, k) -> (O, s, q0) with w'[o, j, qi] = w[o, 0, qi*s + j]
            w = w.reshape(c.out_channels, k_eff, s0).transpose(0, 2, 1)
        elif i == 0:
            # externally supplied feature input: same in-bounds guarantee
            t0 = x.shape[1]
            t_pad = _ceil_to(max(t0, p_out * s_eff), in_align)  # in_align = fb0*s0
            if t_pad > t0:
                x = jnp.pad(x, ((0, 0), (0, t_pad - t0), (0, 0)))
        wd = _depth_weights(w, k_eff, s_eff)
        bias = lp["conv"].get("bias")
        gate = None
        if gates is not None:
            gate = gates.get("conv_layers", {}).get(str(i))

        lnw = lnb = affine = None
        if c.norm == "group_norm":
            cdef_s = ConvDef(
                cin_eff, c.out_channels, k_eff, s_eff, bias is not None,
                "none", False, f, fb, r_out, p_out, interpret,
            )
            partials = _conv0_partials(cdef_s, x, wd, bias)
            sums = jnp.sum(partials, axis=1)  # (B, 2, C)
            inv_n = 1.0 / float(r_out)
            mean = sums[:, 0] * inv_n
            var = jnp.maximum(sums[:, 1] * inv_n - jnp.square(mean), 0.0)
            gnw = lp["layer_norm"]["weight"].astype(jnp.float32)
            gnb = lp["layer_norm"]["bias"].astype(jnp.float32)
            scale = jax.lax.rsqrt(var + LN_EPS) * gnw[None, :]
            shift = gnb[None, :] - mean * scale
            affine = jnp.stack([scale, shift], axis=1)  # (B, 2, C)
            norm = "affine"
        elif c.norm == "layer_norm":
            lnw = lp["layer_norm"]["weight"]
            lnb = lp["layer_norm"]["bias"]
            norm = "ln"
        else:
            norm = "none"

        cdef = ConvDef(
            cin_eff, c.out_channels, k_eff, s_eff, bias is not None,
            norm, gate is not None, f, fb, r_out, p_out, interpret,
        )
        x = _conv_layer(cdef, x, wd, bias, lnw, lnb, affine, gate)
    return x[:, : plan[-1]["r_out"]]
