"""Fused multigrid level kernels for the spatial-unwrap solver.

The weighted-Laplacian V-cycle's per-level work (damped-Jacobi sweeps,
residual, post-smooths; ops/unwrap_spatial.vcycle) is HBM-bound in XLA:
each sweep re-streams r / e / wy / wx / dinv. These kernels fuse one
level's descent (nu=2 pre-smooths from zero + residual) and ascent
(nu=2 post-smooths) into single VMEM-resident passes with 2-row halos,
roughly halving the level's HBM traffic.

EXACTNESS CONTRACT: every operation reproduces the XLA path's
source-level floating-point association —

  matvec:   ((dy_up - dy_dn) + dx_lt) - dx_rt       (_edge_scatter)
  smoother: e + (omega * dinv) * (r - A e)          (vcycle)

with no approximate reciprocals, so the kernels are ALGEBRAICALLY
identical to the ops they replace; the only residual difference is
compiler FMA contraction (~1 ulp per fused multiply-add, which jit-ed
XLA applies and is not controllable across Mosaic/XLA), verified ~1e-6
relative by tests/test_pallas.py::test_mg_level_kernels_exact. The
final unwrap output is unchanged regardless: the congruence snap
(psi + round(...)*T) collapses sub-ulp solver differences. The tiled
solver's lockstep asserts (equal CG iteration counts vs single-device)
run on the CPU mesh where BOTH paths take the XLA branch — exactly
lockstep as before; on real multi-TPU the counts could differ by +-1
from FMA contraction, which the congruence snap makes immaterial.

Edge semantics: the wrapper zero-pads r / dinv and the edge-weight
maps; a zero weight kills every wrapped-roll contribution, reproducing
the XLA concatenate-with-zero-row borders exactly.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HALO = 2  # rows: nu=2 smooths + residual consume 2 halo rows


def _matvec_rows(p, wyf, wxf, lo, n):
    """A p on scratch rows [lo, lo+n), XLA association.

    ``wyf[i]`` weights edge (i, i+1) (zero beyond the image); ``wxf``
    weights edge (j, j+1) with zeros in the last image column and the
    lane pad, so wrapped rolls contribute exact zeros."""
    py = p[lo - 1:lo + n + 1, :]
    dy = wyf[lo - 1:lo + n, :] * (py[1:, :] - py[:-1, :])
    dy_up = dy[:-1, :]                  # edge (i-1, i) at row i
    dy_dn = dy[1:, :]                   # edge (i, i+1) at row i
    pc = p[lo:lo + n, :]
    wxc = wxf[lo:lo + n, :]
    pad_w = p.shape[1]
    dx = wxc * (pltpu.roll(pc, pad_w - 1, axis=1) - pc)  # edge (j, j+1)
    dx_lt = pltpu.roll(dx, 1, axis=1)   # edge (j-1, j) at column j
    return ((dy_up - dy_dn) + dx_lt) - dx


def _sweep(e, r, omd, wyf, wxf, lo, n):
    """One damped-Jacobi sweep on scratch rows [lo, lo+n):
    e' = e + (omega*dinv) * (r - A e), XLA association."""
    av = _matvec_rows(e, wyf, wxf, lo, n)
    return e[lo:lo + n, :] + omd[lo:lo + n, :] * (r[lo:lo + n, :] - av)


def _refit(x, lo, s_rows, pad_w):
    """Re-embed rows [lo, lo+n) into a full-height zero field so the
    next _matvec_rows can index it; rows outside are never read."""
    return jnp.concatenate(
        [jnp.zeros((lo, pad_w), jnp.float32), x,
         jnp.zeros((s_rows - lo - x.shape[0], pad_w), jnp.float32)],
        axis=0)


def _dma_all(srcs, scrs, sem, i, bh, s_rows):
    copies = [pltpu.make_async_copy(
        s.at[pl.ds(i * bh, s_rows), :], d, sem.at[k])
        for k, (s, d) in enumerate(zip(srcs, scrs))]
    for c in copies:
        c.start()
    for c in copies:
        c.wait()


def _down_kernel(r_hbm, wy_hbm, wx_hbm, dinv_hbm, e_out, res_out,
                 r_scr, wy_scr, wx_scr, dinv_scr, sem, *,
                 omega: float, block_h: int, pad_w: int, s_rows: int):
    i = pl.program_id(0)
    bh = block_h
    _dma_all([r_hbm, wy_hbm, wx_hbm, dinv_hbm],
             [r_scr, wy_scr, wx_scr, dinv_scr], sem, i, bh, s_rows)
    r = r_scr[:]
    wyf = wy_scr[:]
    wxf = wx_scr[:]
    omd = jnp.float32(omega) * dinv_scr[:]

    e1 = omd * r                        # sweep 1 from e=0, full height
    lo = HALO - 1
    e2 = _sweep(e1, r, omd, wyf, wxf, lo, bh + 2)
    e2f = _refit(e2, lo, s_rows, pad_w)
    av2 = _matvec_rows(e2f, wyf, wxf, HALO, bh)
    res = r[HALO:HALO + bh, :] - av2
    e_out[:] = e2[1:1 + bh, :e_out.shape[1]]
    res_out[:] = res[:, :res_out.shape[1]]


def _up_kernel(e_hbm, r_hbm, wy_hbm, wx_hbm, dinv_hbm, e_out,
               e_scr, r_scr, wy_scr, wx_scr, dinv_scr, sem, *,
               omega: float, block_h: int, pad_w: int, s_rows: int):
    i = pl.program_id(0)
    bh = block_h
    _dma_all([e_hbm, r_hbm, wy_hbm, wx_hbm, dinv_hbm],
             [e_scr, r_scr, wy_scr, wx_scr, dinv_scr], sem, i, bh,
             s_rows)
    e = e_scr[:]
    r = r_scr[:]
    wyf = wy_scr[:]
    wxf = wx_scr[:]
    omd = jnp.float32(omega) * dinv_scr[:]

    lo = HALO - 1
    e4 = _sweep(e, r, omd, wyf, wxf, lo, bh + 2)
    e4f = _refit(e4, lo, s_rows, pad_w)
    e5 = _sweep(e4f, r, omd, wyf, wxf, HALO, bh)
    e_out[:] = e5[:, :e_out.shape[1]]


def _pad_args(arrs, block_h, h, w):
    """Zero-pad (value, pad-to-full-height) each array to the blocked
    layout; edge-weight maps simply gain zero rows/cols (no edges into
    the pad)."""
    pad_w = -(-w // 128) * 128
    hb = -(-h // block_h) * block_h
    s_rows = -(-(block_h + 2 * HALO) // 8) * 8
    h_pad = hb - block_h + s_rows       # rows the last block's DMA reads
    out = [jnp.pad(x, ((HALO, h_pad - HALO - x.shape[0]),
                       (0, pad_w - x.shape[1])))
           for x in arrs]
    return out, pad_w, hb, s_rows


@functools.partial(jax.jit,
                   static_argnames=("omega", "block_h", "interpret"))
def mg_down_pallas(r: jax.Array, wy: jax.Array, wx: jax.Array,
                   dinv: jax.Array, omega: float = 0.9,
                   block_h: int = 128, interpret: bool = False
                   ) -> Tuple[jax.Array, jax.Array]:
    """nu=2 pre-smooth from zero + residual in one HBM pass. Returns
    (e2, res); the caller restricts ``res`` (restrict2 unchanged)."""
    h, w = r.shape
    (rp, wyp, wxp, dip), pad_w, hb, s_rows = _pad_args(
        [r, wy, wx, dinv], block_h, h, w)
    kernel = functools.partial(_down_kernel, omega=float(omega),
                               block_h=block_h, pad_w=pad_w,
                               s_rows=s_rows)
    out_spec = pl.BlockSpec((block_h, w), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    shp = jax.ShapeDtypeStruct((h, w), jnp.float32)
    return pl.pallas_call(
        kernel,
        grid=(hb // block_h,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
        out_specs=(out_spec, out_spec),
        out_shape=(shp, shp),
        scratch_shapes=[pltpu.VMEM((s_rows, pad_w), jnp.float32)] * 4
        + [pltpu.SemaphoreType.DMA((4,))],
        interpret=interpret,
    )(rp, wyp, wxp, dip)


@functools.partial(jax.jit,
                   static_argnames=("omega", "block_h", "interpret"))
def mg_up_pallas(e: jax.Array, r: jax.Array, wy: jax.Array,
                 wx: jax.Array, dinv: jax.Array, omega: float = 0.9,
                 block_h: int = 128, interpret: bool = False
                 ) -> jax.Array:
    """nu=2 post-smooth of the correction-augmented ``e`` in one HBM
    pass — exactly vcycle's ascent ops."""
    h, w = r.shape
    (ep, rp, wyp, wxp, dip), pad_w, hb, s_rows = _pad_args(
        [e, r, wy, wx, dinv], block_h, h, w)
    kernel = functools.partial(_up_kernel, omega=float(omega),
                               block_h=block_h, pad_w=pad_w,
                               s_rows=s_rows)
    out_spec = pl.BlockSpec((block_h, w), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(hb // block_h,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 5,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.float32),
        scratch_shapes=[pltpu.VMEM((s_rows, pad_w), jnp.float32)] * 5
        + [pltpu.SemaphoreType.DMA((5,))],
        interpret=interpret,
    )(ep, rp, wyp, wxp, dip)
