"""Fused DiffNet gated-residual block (Pallas, forward + backward).

One block of the FluentSpeech denoiser (reference
``modules/speech_editing/spec_denoiser/diffnet.py:60-81``) is

    y  = x + step                      # step [B, C] broadcast over T
    h  = conv_k3(y) + cond @ Wc + bc   # dilated_conv + conditioner_projection
    g  = sigmoid(h[:, :C]) * tanh(h[:, C:])
    o  = g @ Wo + bo                   # output_projection (1x1)
    x' = (x + o[:, :C]) / sqrt(2) ;  skip = o[:, C:]

XLA runs this as 3 matmuls with elementwise segments between them; the VPU
segments and the k=3 conv lowering serialise against the MXU and cap the
measured step MFU at ~67% (BASELINE.md roofline table). This kernel fuses
the whole block per (batch element, time tile): the k=3 conv becomes one
MXU matmul against the [3C, 2C] reshaped kernel over in-VMEM shifted
slices (no halo DMA of full planes, no im2col in HBM), and gating/residual
math happens between the matmuls without leaving VMEM.

The grid tiles T as well as B (``nt = ceil(T/512)`` tiles) to keep one
tile's [T, 2C] working set inside comfortable VMEM double-buffering. The
k=3 conv needs one halo row on each side of a tile; those single rows are
pre-gathered in XLA ([B, nt, C] — a few KB) and concatenated in-VMEM, so
tiles never DMA-overlap. Mosaic sublane alignment (offsets multiple of
8/16) holds because the tile length is rounded to the dtype's sublane
multiple.

**Measured verdict (v5e, scripts/bench_fused_ab.py, in-process round-robin
A/B): the fused path LOSES to XLA's own fusion of the same graph** —
train step 41.3 ms vs 37.2 ms at B=80×T=512 bf16 (0.90x) and 55.6 ms vs
43.5 ms at the production B=26×T=1548 (0.78x). XLA already fuses the VPU
segments into the three MXU matmuls and overlaps the next block's weight
prefetch with the current block's compute across the 20-block chain; the
pallas_call boundary per block forfeits that inter-block pipelining, and
the in-kernel [TT,3C]-concat im2col re-reads each x tile 3x from VMEM
without cutting HBM traffic (x was already resident exactly once per
block either way). Kept behind ``fused_diffnet`` (default OFF) as
measured evidence + an experimentation scaffold; numerics are exact
(grads collapse to ~1e-6 vs XLA under ``highest`` matmul precision).

Backward splits the work by what each engine is best at: a Pallas kernel
produces dh (gate backward fused with the dg matmul) and dx (dh @ Wd^T
plus shift scatter, fused with the residual path); the three weight-grad
matmuls (dWd/dWc/dWo) and dcond stay in XLA where a plain big matmul is
already optimal. The halo dh rows are recomputed in-kernel from
pre-gathered single rows of (h, dxout, dskip) — dh is row-local given h.
Residuals saved: x and the h preactivations (the same footprint XLA's
autodiff keeps for the gated block).

Constraints: dilation == 1 (the flagship ``dilation_cycle_length: 1``
config; other dilations keep the XLA path). Two gates must both be open:
the model flag ``fused_diffnet`` (-> ``DiffNet.allow_fused``, default
False per the verdict above) and :func:`fused_enabled`
(``SET_FUSED_DIFFNET=0|1`` override; non-TPU backends run the same
kernels in interpret mode only under tests).
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp

RSQRT2 = 1.0 / math.sqrt(2.0)
_TILE_TARGET = 512  # rows per time tile (VMEM working-set sweet spot)


def fused_enabled() -> bool:
    env = os.environ.get("SET_FUSED_DIFFNET")
    if env is not None:
        return env not in ("0", "false", "")
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _tiles(t: int, dtype) -> tuple[int, int, int]:
    """(n_tiles, tile_len, padded_T): tile_len is sublane-aligned and the
    tiles cover T with minimal padding (<= one sublane group per tile)."""
    mult = 16 if dtype == jnp.bfloat16 else 8
    nt = max(1, -(-t // _TILE_TARGET))
    tt = -(-(-(-t // nt)) // mult) * mult  # ceil(ceil(t/nt)/mult)*mult
    return nt, tt, nt * tt


def _edge_rows(arrs, idx, t_true):
    """Gather rows ``idx`` from each [B, T_pad, C] array (zeros where idx is
    out of the true range). Tiny: nt rows per batch element."""
    valid = ((idx >= 0) & (idx < t_true))
    safe = jnp.clip(idx, 0, arrs[0].shape[1] - 1)
    out = []
    for a in arrs:
        r = jnp.take(a, safe, axis=1)  # [B, nt, C]
        out.append(r * valid[None, :, None].astype(a.dtype))
    return out


def _sublane8(a):
    """[B, nt, C] halo rows -> [B, nt, 8, C]: Mosaic requires the block's
    second-to-last dim divisible by 8 (or equal to the array dim), so each
    single halo row is stored in its own 8-row sublane group and the kernel
    reads row 0. Bytes cost: nt x 8 rows per batch element — negligible."""
    b, nt, c = a.shape
    return jnp.pad(a[:, :, None, :], ((0, 0), (0, 0), (0, 7), (0, 0)))


# -- forward -----------------------------------------------------------------

def _fwd_kernel(x_ref, cond_ref, step_ref, mask_ref, yprev_ref, ynext_ref,
                wd_ref, bd_ref, wc_ref, bc_ref, wo_ref, bo_ref,
                xout_ref, skip_ref, h_ref):
    x = x_ref[0]                                     # [TT, C]
    c = x.shape[1]
    y = (x + step_ref[0]) * mask_ref[:]              # zero padded tail rows
    ym1 = jnp.concatenate([yprev_ref[0, 0, :1], y[:-1]], axis=0)
    yp1 = jnp.concatenate([y[1:], ynext_ref[0, 0, :1]], axis=0)
    cat = jnp.concatenate([ym1, y, yp1], axis=1)     # [TT, 3C]
    h = jnp.dot(cat, wd_ref[:], preferred_element_type=jnp.float32)
    h = h + jnp.dot(cond_ref[0], wc_ref[:],
                    preferred_element_type=jnp.float32)
    h = h + (bd_ref[:] + bc_ref[:])
    h_ref[0] = h.astype(x.dtype)
    g = jax.nn.sigmoid(h[:, :c]) * jnp.tanh(h[:, c:])
    o = jnp.dot(g.astype(x.dtype), wo_ref[:],
                preferred_element_type=jnp.float32) + bo_ref[:]
    xout_ref[0] = ((x + o[:, :c].astype(jnp.float32))
                   * RSQRT2).astype(x.dtype)
    skip_ref[0] = o[:, c:].astype(x.dtype)


def _fwd_call(x, cond, step, wd, bd, wc, bc, wo, bo):
    from jax.experimental import pallas as pl

    b, t, c = x.shape
    hdim = cond.shape[-1]
    nt, tt, t_pad = _tiles(t, x.dtype)
    if t_pad != t:
        x = jnp.pad(x, ((0, 0), (0, t_pad - t), (0, 0)))
        cond = jnp.pad(cond, ((0, 0), (0, t_pad - t), (0, 0)))
    mask = (jnp.arange(t_pad) < t).astype(x.dtype)[:, None]
    step_b = step[:, None, :]                        # [B, 1, C]
    # halo rows: y at the row just before / just after each tile
    idx = jnp.arange(nt) * tt
    (xp,) = _edge_rows([x], idx - 1, t)
    (xn,) = _edge_rows([x], idx + tt, t)
    vp = ((idx - 1 >= 0) & (idx - 1 < t))[None, :, None].astype(x.dtype)
    vn = (idx + tt < t)[None, :, None].astype(x.dtype)
    yprev = (xp + step_b) * vp
    ynext = (xn + step_b) * vn

    tile = lambda ch: pl.BlockSpec((1, tt, ch), lambda i, j: (i, j, 0))
    row = lambda ch: pl.BlockSpec((1, 1, 8, ch), lambda i, j: (i, j, 0, 0))
    rep = lambda shape: pl.BlockSpec(shape, lambda i, j: (0,) * len(shape))

    xout, skip, h = pl.pallas_call(
        _fwd_kernel,
        grid=(b, nt),
        in_specs=[tile(c), tile(hdim),
                  pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0)),
                  pl.BlockSpec((tt, 1), lambda i, j: (j, 0)),
                  row(c), row(c),
                  rep((3 * c, 2 * c)), rep((1, 2 * c)),
                  rep((hdim, 2 * c)), rep((1, 2 * c)),
                  rep((c, 2 * c)), rep((1, 2 * c))],
        out_specs=[tile(c), tile(c), tile(2 * c)],
        out_shape=[jax.ShapeDtypeStruct((b, t_pad, c), x.dtype),
                   jax.ShapeDtypeStruct((b, t_pad, c), x.dtype),
                   jax.ShapeDtypeStruct((b, t_pad, 2 * c), x.dtype)],
        interpret=_interpret(),
    )(x, cond, step_b, mask, _sublane8(yprev), _sublane8(ynext),
      wd, bd[None], wc, bc[None], wo, bo[None])
    return xout[:, :t], skip[:, :t], h[:, :t]


# -- backward ----------------------------------------------------------------

def _bwd_kernel(h_ref, dxout_ref, dskip_ref, mask_ref,
                hprev_ref, doprev_ref, hnext_ref, donext_ref,
                wd_ref, wo_ref,
                dx_ref, dh_ref, g_ref):
    h = h_ref[0].astype(jnp.float32)                 # [TT, 2C]
    c = h.shape[1] // 2
    dt = dxout_ref.dtype

    def gate_dh(hrow, dorow):
        sig = jax.nn.sigmoid(hrow[:, :c])
        th = jnp.tanh(hrow[:, c:])
        dg = jax.lax.dot_general(dorow.astype(dt), wo_ref[:],
                                 (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dh = jnp.concatenate([dg * th * sig * (1.0 - sig),
                              dg * sig * (1.0 - th * th)], axis=1)
        return sig * th, dh

    dxo = dxout_ref[0].astype(jnp.float32) * RSQRT2
    dsk = dskip_ref[0].astype(jnp.float32)
    do = jnp.concatenate([dxo, dsk], axis=1)         # [TT, 2C]
    g, dh = gate_dh(h, do)
    g_ref[0] = g.astype(dt)                          # for dWo in XLA
    dh_ref[0] = dh.astype(dt)
    # halo rows: dh just outside the tile (row-local recompute)
    _, dhp = gate_dh(hprev_ref[0, 0, :1].astype(jnp.float32),
                     doprev_ref[0, 0, :1].astype(jnp.float32))
    _, dhn = gate_dh(hnext_ref[0, 0, :1].astype(jnp.float32),
                     donext_ref[0, 0, :1].astype(jnp.float32))
    wdT = wd_ref[:]
    dot_t = lambda a: jax.lax.dot_general(
        a.astype(dt), wdT, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dy3 = dot_t(dh)                                  # [TT, 3C]
    dy3p = dot_t(dhp)                                # [1, 3C]
    dy3n = dot_t(dhn)                                # [1, 3C]
    # grad of the shifted reads: ym1[t] = y[t-1] -> its grad shifts up;
    # yp1[t] = y[t+1] -> shifts down; tile edges come from the halo rows
    dy = (jnp.concatenate([dy3[1:, :c], dy3n[:, :c]], axis=0)
          + dy3[:, c:2 * c]
          + jnp.concatenate([dy3p[:, 2 * c:], dy3[:-1, 2 * c:]], axis=0))
    dy = dy * mask_ref[:]
    dx_ref[0] = (dy + dxout_ref[0].astype(jnp.float32)
                 * RSQRT2).astype(dt)


def _bwd_call(h, dxout, dskip, wd, wo, t_true):
    from jax.experimental import pallas as pl

    b, t, c2 = h.shape
    c = c2 // 2
    nt, tt, t_pad = _tiles(t, h.dtype)
    if t_pad != t:
        pad = ((0, 0), (0, t_pad - t), (0, 0))
        h = jnp.pad(h, pad)
        dxout = jnp.pad(dxout, pad)
        dskip = jnp.pad(dskip, pad)
    mask = (jnp.arange(t_pad) < t_true).astype(jnp.float32)[:, None]
    # halo rows of (h, do): dh outside the tile is row-local in these.
    # Zeroing do at invalid rows makes the halo dh exactly zero (dh ∝ dg).
    idx = jnp.arange(nt) * tt
    f32 = jnp.float32
    do_full_parts = (dxout.astype(f32) * RSQRT2, dskip.astype(f32))
    hp, dxop, dskp = _edge_rows([h] + list(do_full_parts), idx - 1, t_true)
    hn, dxon, dskn = _edge_rows([h] + list(do_full_parts), idx + tt, t_true)
    doprev = jnp.concatenate([dxop, dskp], axis=-1)
    donext = jnp.concatenate([dxon, dskn], axis=-1)

    tile = lambda ch: pl.BlockSpec((1, tt, ch), lambda i, j: (i, j, 0))
    row = lambda ch: pl.BlockSpec((1, 1, 8, ch), lambda i, j: (i, j, 0, 0))
    rep = lambda shape: pl.BlockSpec(shape, lambda i, j: (0,) * len(shape))

    dx, dh, g = pl.pallas_call(
        _bwd_kernel,
        grid=(b, nt),
        in_specs=[tile(c2), tile(c), tile(c),
                  pl.BlockSpec((tt, 1), lambda i, j: (j, 0)),
                  row(c2), row(c2), row(c2), row(c2),
                  rep((3 * c, 2 * c)), rep((c, 2 * c))],
        out_specs=[tile(c), tile(c2), tile(c)],
        out_shape=[jax.ShapeDtypeStruct((b, t_pad, c), dxout.dtype),
                   jax.ShapeDtypeStruct((b, t_pad, c2), dxout.dtype),
                   jax.ShapeDtypeStruct((b, t_pad, c), dxout.dtype)],
        interpret=_interpret(),
    )(h, dxout, dskip, mask, _sublane8(hp), _sublane8(doprev),
      _sublane8(hn), _sublane8(donext), wd, wo)
    return dx[:, :t_true], dh[:, :t_true], g[:, :t_true]


# -- custom-vjp wrapper ------------------------------------------------------

@jax.custom_vjp
def fused_diffnet_block(x, cond, step, wd, bd, wc, bc, wo, bo):
    """x [B,T,C]; cond [B,T,H]; step [B,C]; wd [3C,2C]; wc [H,2C];
    wo [C,2C]; biases [2C] -> (x_out [B,T,C], skip [B,T,C])."""
    xout, skip, _ = _fwd_call(x, cond, step, wd, bd, wc, bc, wo, bo)
    return xout, skip


def _vjp_fwd(x, cond, step, wd, bd, wc, bc, wo, bo):
    xout, skip, h = _fwd_call(x, cond, step, wd, bd, wc, bc, wo, bo)
    return (xout, skip), (x, cond, step, h, wd, wc, wo)


def _vjp_bwd(res, grads):
    x, cond, step, h, wd, wc, wo = res
    dxout, dskip = grads
    t_true = x.shape[1]
    dx, dh, g = _bwd_call(h, dxout, dskip, wd, wo, t_true)
    # weight/cond grads: plain big matmuls — XLA territory
    b, t, c = x.shape
    f32 = jnp.float32
    y = (x + step[:, None, :]).astype(dh.dtype)
    zero = jnp.zeros_like(y[:, :1])
    cat = jnp.concatenate([
        jnp.concatenate([zero, y[:, :-1]], axis=1), y,
        jnp.concatenate([y[:, 1:], zero], axis=1)], axis=2)  # [B,T,3C]
    dh2 = dh.reshape(b * t, -1)
    dwd = jnp.dot(cat.reshape(b * t, -1).T, dh2,
                  preferred_element_type=f32).astype(wd.dtype)
    dwc = jnp.dot(cond.reshape(b * t, -1).astype(dh.dtype).T, dh2,
                  preferred_element_type=f32).astype(wc.dtype)
    do = jnp.concatenate([dxout.astype(f32) * RSQRT2,
                          dskip.astype(f32)], axis=-1).astype(g.dtype)
    dwo = jnp.dot(g.reshape(b * t, -1).T, do.reshape(b * t, -1),
                  preferred_element_type=f32).astype(wo.dtype)
    dbias_h = dh2.astype(f32).sum(0)  # bd and bc both add into h
    dbo = do.reshape(b * t, -1).astype(f32).sum(0)
    dcond = jax.lax.dot_general(
        dh, wc, (((2,), (1,)), ((), ())),
        preferred_element_type=f32).astype(cond.dtype)
    # step reaches the loss only through y, and the kernel's
    # dx = dy + dxout * rsqrt2 => dy = dx - dxout * rsqrt2
    dstep = (dx.astype(f32) - dxout.astype(f32) * RSQRT2).sum(axis=1)
    return (dx, dcond, dstep.astype(step.dtype),
            dwd, dbias_h.astype(wd.dtype), dwc, dbias_h.astype(wc.dtype),
            dwo, dbo.astype(wo.dtype))


fused_diffnet_block.defvjp(_vjp_fwd, _vjp_bwd)
