"""Tile-parallel spatial unwrapping: distributed weighted-Poisson CG.

The weighted-LS unwrap of slc_tpu.ops.unwrap_spatial distributed over an
image-tile mesh: the 5-point-stencil matvec gathers a 1-px halo via
`ppermute` per CG iteration; the CG inner products are local partial
sums reduced with `psum`. Scalar CG coefficients are therefore identical
on every device and the iteration is lockstep — the halo-exchange-per-
sweep pattern SURVEY.md §5 calls for. At the true image border the
ppermute zero-fill gives quality 0, i.e. "no edge", matching the
single-device operator exactly.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from slc_tpu.ops.unwrap_spatial import (wrap_to_half, build_mg_levels,
                                        lane_pair_sum, restrict2, prolong2,
                                        MG_NU, MG_OMEGA, MG_COARSE_SWEEPS,
                                        MG_COARSEST, MG_KDEPTH,
                                        MG_OVERCORR,
                                        vcycle as _vcycle_single,
                                        _fcg2 as _fcg2_single)
from slc_tpu.parallel.halo import halo_exchange
from slc_tpu.parallel.mesh import TILE_Y, TILE_X

# Reduce over the tile axes only: the inputs are invariant along the
# scan axis (psum over an axis a value does not vary on is an error).
_AXES = (TILE_Y, TILE_X)
SPEC2 = P(TILE_Y, TILE_X)


def _psum_all(x):
    return jax.lax.psum(x, _AXES)


def _neighbor_stack(x_ext: jax.Array) -> tuple:
    """(up, down, left, right) neighbor views of a 1-px halo-extended
    tile, each cropped to the core shape."""
    up = x_ext[:-2, 1:-1]
    down = x_ext[2:, 1:-1]
    left = x_ext[1:-1, :-2]
    right = x_ext[1:-1, 2:]
    return up, down, left, right


def _gather_global(x: jax.Array) -> jax.Array:
    """Assemble the full (global_h, global_w) array on every device
    from its (tile_h, tile_w) shards (all_gather over both tile axes,
    concatenating in tile order)."""
    g = jax.lax.all_gather(x, TILE_Y, axis=0, tiled=True)
    return jax.lax.all_gather(g, TILE_X, axis=1, tiled=True)


def _coarsen_nbr(wn: tuple) -> tuple:
    """Per-tile exact Galerkin 2x2 aggregation of the neighbor-edge
    weight maps (ops.unwrap_spatial.coarsen_weights in the tiled
    (up, down, left, right) representation; tile dims must be even so
    no cell straddles a tile boundary). Cross-tile edges stay correct:
    a tile's row-0 ``up`` weights already encode the neighbor tile via
    the fine-level halo exchange of quality."""
    up, dn, lt, rt = wn
    return (lane_pair_sum(up[0::2, :]),
            lane_pair_sum(dn[1::2, :]),
            (lt[0::2, :] + lt[1::2, :])[:, 0::2],
            (rt[0::2, :] + rt[1::2, :])[:, 1::2])


def _restrict_local(x: jax.Array) -> jax.Array:
    return restrict2(x)           # tile dims are even (enforced)


def _prolong_local(e: jax.Array, h: int, w: int) -> jax.Array:
    return prolong2(e, h, w)


@functools.partial(jax.jit,
                   static_argnames=("period", "mesh", "max_iters",
                                    "return_info", "mg"))
def tiled_unwrap_spatial(psi: jax.Array, period: float, mesh,
                         quality: Optional[jax.Array] = None,
                         max_iters: int = 300, tol: float = 3e-4,
                         anchor: Optional[jax.Array] = None,
                         return_info: bool = False,
                         mg: bool = True):
    """Distributed version of slc_tpu.ops.unwrap_spatial.unwrap_spatial;
    same operator, same CG, SAME DEFAULT tol (3e-4 — must track
    unwrap_spatial's default or the two solvers stop at different
    iterations at defaults), numerically lockstep across tiles — the
    multigrid preconditioner included: V-cycle levels stay tile-sharded
    (per-tile Galerkin aggregation + halo-exchange Jacobi smoothing)
    while tile dims are even and the global grid is above the coarsest
    threshold, then the remaining small levels are all_gather'd and run
    REPLICATED through the single-device ``vcycle`` code itself — the
    level schedule is a function of the global shape only, so it is
    identical to the single-device solver's wherever the switch
    happens. With ``return_info=True`` also returns the same
    diagnostics dict (cg_iters / rel_residual replicated scalars;
    residue and suspect counts psum-reduced across tiles; ``suspect``
    mask tile-sharded).

    Tile dims should be EVEN at the finest level: odd tiles make
    shard_levels empty, so the entire V-cycle runs replicated
    (all_gathering the full-resolution residual every CG iteration) —
    correct but silently defeating the sharding, hence the warning
    below (ADVICE r3)."""
    if mg:
        th0 = psi.shape[0] // mesh.shape[TILE_Y]
        tw0 = psi.shape[1] // mesh.shape[TILE_X]
        if th0 % 2 or tw0 % 2:
            import warnings
            warnings.warn(
                f"tiled_unwrap_spatial: tile dims ({th0}x{tw0}) are "
                f"odd at the finest level; the multigrid hierarchy "
                f"cannot shard and every V-cycle will all_gather the "
                f"full-resolution residual. Use even tile dims for a "
                f"sharded hierarchy.", stacklevel=2)
    if quality is None:
        quality = jnp.ones_like(psi, dtype=jnp.float32)
    if anchor is None:
        anchor = psi

    def f(psi_t, q_t, p0_t):
        psi_t = psi_t.astype(jnp.float32)
        q_t = q_t.astype(jnp.float32)
        q_t = q_t / jnp.maximum(jax.lax.pmax(q_t.max(), _AXES), 1e-20)
        q_ext = halo_exchange(q_t, 1, 1)
        psi_ext = halo_exchange(psi_t, 1, 1)
        w_nbr = tuple(jnp.minimum(q_t, qn)
                      for qn in _neighbor_stack(q_ext))
        d_nbr = tuple(wrap_to_half(psi_t - pn, period)
                      for pn in _neighbor_stack(psi_ext))

        def mk_matvec(wn):
            def mv(p):
                p_ext = halo_exchange(p, 1, 1)
                out = jnp.zeros_like(p)
                for w_, pn in zip(wn, _neighbor_stack(p_ext)):
                    out = out + w_ * (p - pn)
                return out
            return mv

        matvec = mk_matvec(w_nbr)

        b = jnp.zeros_like(psi_t)
        diag = jnp.zeros_like(psi_t)
        for w_, d_ in zip(w_nbr, d_nbr):
            b = b + w_ * d_
            diag = diag + w_
        dinv = 1.0 / jnp.maximum(diag, 1e-8)

        def dot(a, c):
            return _psum_all(jnp.sum(a * c))

        if mg:
            # Sharded V-cycle levels (see docstring). Same nu/omega/
            # coarsest parameters as ops.unwrap_spatial.vcycle.
            NU, CS, COARSEST = MG_NU, MG_COARSE_SWEEPS, MG_COARSEST
            OMEGA = jnp.float32(MG_OMEGA)
            ty_n = jax.lax.axis_size(TILE_Y)
            tx_n = jax.lax.axis_size(TILE_X)
            th, tw = psi_t.shape
            gh, gw = th * ty_n, tw * tx_n
            shard_levels = []
            cw, cth, ctw = w_nbr, th, tw
            while (min(gh, gw) > COARSEST
                   and cth % 2 == 0 and ctw % 2 == 0):
                dg = cw[0] + cw[1] + cw[2] + cw[3]
                shard_levels.append(
                    (cw, 1.0 / jnp.maximum(dg, 1e-8)))
                cw = _coarsen_nbr(cw)
                cth //= 2
                ctw //= 2
                gh //= 2
                gw //= 2
            # Replicated continuation: reassemble the switch level's
            # weights into the single-device (wy, wx) format and let
            # ops.vcycle finish the hierarchy (same global schedule).
            wy_g = _gather_global(cw[0])[1:, :]
            wx_g = _gather_global(cw[2])[:, 1:]
            sub_levels = build_mg_levels(wy_g, wx_g, gh, gw,
                                         coarsest=COARSEST)
            iy = jax.lax.axis_index(TILE_Y)
            ix = jax.lax.axis_index(TILE_X)
            n_total = len(shard_levels) + len(sub_levels)
            KD = MG_KDEPTH

            # K-cycle schedule in GLOBAL level indices: the correction
            # at level li+1 is Krylov-accelerated (two flexible-CG
            # steps, psum dot products) iff li < KD and li+1 is not the
            # coarsest — exactly the single-device vcycle's rule, since
            # its kdepth at level li is KD - li. Lockstep preserved.
            def vt(r, li):
                if li >= len(shard_levels):
                    e_g = _vcycle_single(_gather_global(r), sub_levels,
                                         NU, MG_OMEGA, CS,
                                         kdepth=max(0, KD - li))
                    return jax.lax.dynamic_slice(
                        e_g, (iy * r.shape[0], ix * r.shape[1]),
                        r.shape)
                wn, dinv_l = shard_levels[li]
                mv = mk_matvec(wn)
                e = OMEGA * dinv_l * r
                for _ in range(NU - 1):
                    e = e + OMEGA * dinv_l * (r - mv(e))
                rc = _restrict_local(r - mv(e))
                if li < KD and li + 1 < n_total - 1:
                    # K-corrected level: flexible CG scales optimally.
                    ec = fcg2_t(rc, li + 1)
                    e = e + _prolong_local(ec, *r.shape)
                else:
                    # Plain-V correction: PWC-aggregation
                    # over-correction, same factor as the single-device
                    # vcycle (lockstep).
                    ec = vt(rc, li + 1)
                    e = e + jnp.float32(MG_OVERCORR) \
                        * _prolong_local(ec, *r.shape)
                for _ in range(NU):
                    e = e + OMEGA * dinv_l * (r - mv(e))
                return e

            def fcg2_t(bb, lj):
                # ops.unwrap_spatial._fcg2 with global (psum) dots.
                if lj >= len(shard_levels):
                    e_g = _fcg2_single(_gather_global(bb), sub_levels,
                                       NU, MG_OMEGA, CS,
                                       max(0, KD - lj))
                    return jax.lax.dynamic_slice(
                        e_g, (iy * bb.shape[0], ix * bb.shape[1]),
                        bb.shape)
                wn, _ = shard_levels[lj]
                mv = mk_matvec(wn)
                z0 = vt(bb, lj)
                v0 = mv(z0)
                rho0 = jnp.maximum(dot(z0, v0), 1e-30)
                alpha0 = dot(z0, bb) / rho0
                x1 = alpha0 * z0
                r1 = bb - alpha0 * v0
                z1 = vt(r1, lj)
                v1 = mv(z1)
                gam = dot(z1, v0) / rho0
                rho1 = jnp.maximum(dot(z1, v1) - gam * gam * rho0,
                                   1e-30)
                t = dot(z1, r1) / rho1
                return x1 + t * (z1 - gam * z0)

            precond = lambda r: vt(r, 0)
        else:
            precond = lambda r: dinv * r

        p0 = p0_t.astype(jnp.float32)
        r0 = b - matvec(p0)
        z0 = precond(r0)
        b_norm = jnp.sqrt(dot(b, b)) + 1e-20

        def cond(carry):
            _, r, _, _, it = carry
            return (it < max_iters) & (jnp.sqrt(dot(r, r)) > tol * b_norm)

        def body(carry):
            p, r, z, d, it = carry
            ad = matvec(d)
            rz = dot(r, z)
            alpha = rz / jnp.maximum(dot(d, ad), 1e-20)
            p = p + alpha * d
            r_new = r - alpha * ad
            z_new = precond(r_new)
            # Flexible PR+ beta (ops.unwrap_spatial body — identical
            # scalar sequence, required by the K-cycle preconditioner).
            beta = jnp.maximum(
                dot(z_new, r_new - r) / jnp.maximum(rz, 1e-20), 0.0)
            return p, r_new, z_new, z_new + beta * d, it + 1

        p, r_fin, _, _, it_fin = jax.lax.while_loop(
            cond, body, (p0, r0, z0, z0, jnp.int32(0)))

        wsum = jnp.maximum(_psum_all(q_t.sum()), 1e-20)
        shift = _psum_all(jnp.sum(q_t * (p - p0))) / wsum
        p = p - shift + jnp.round(shift / period) * period
        k = jnp.round((p - psi_t) / period)
        out = psi_t + k * jnp.float32(period)
        if not return_info:
            return out

        # --- diagnostics (mirrors ops.unwrap_spatial info) ---------
        # Plaquette residues anchored at core pixels, using the right/
        # bottom halo; the global last row/col has no plaquette, so
        # mask it off on the edge tiles (halo there is zero-fill).
        w = jnp.float32(period)
        c = psi_ext[1:-1, 1:-1]
        rt = psi_ext[1:-1, 2:]
        dn = psi_ext[2:, 1:-1]
        dg = psi_ext[2:, 2:]
        loop = (wrap_to_half(rt - c, period)
                + wrap_to_half(dg - rt, period)
                - wrap_to_half(dg - dn, period)
                - wrap_to_half(dn - c, period))
        charge = jnp.abs(jnp.round(loop / w).astype(jnp.int32))
        last_y = (jax.lax.axis_index(TILE_Y)
                  == jax.lax.axis_size(TILE_Y) - 1)
        last_x = (jax.lax.axis_index(TILE_X)
                  == jax.lax.axis_size(TILE_X) - 1)
        row = jnp.arange(charge.shape[0])[:, None]
        col = jnp.arange(charge.shape[1])[None, :]
        valid = ~((last_y & (row == charge.shape[0] - 1))
                  | (last_x & (col == charge.shape[1] - 1)))
        residue_count = _psum_all(jnp.sum(jnp.where(valid, charge, 0)))

        # Suspect (cut high-quality) edges; zero-filled halo quality
        # makes border edges weight-0, so they never flag.
        out_ext = halo_exchange(out, 1, 1)
        sus = jnp.zeros(out.shape, bool)
        for w_, d_, pn in zip(w_nbr, d_nbr, _neighbor_stack(out_ext)):
            sus = sus | ((jnp.abs((out - pn) - d_) > w / 2.0)
                         & (w_ > 0.5))
        dis = jnp.abs(out - p0) > w / 2.0
        info = {
            "cg_iters": it_fin,
            "rel_residual": jnp.sqrt(dot(r_fin, r_fin)) / b_norm,
            "residue_count": residue_count,
            "suspect": sus,
            "suspect_count": _psum_all(jnp.sum(sus)),
            "anchor_disagreement": dis,
            "anchor_disagreement_count": _psum_all(jnp.sum(dis)),
        }
        return out, info

    if not return_info:
        return shard_map(f, mesh=mesh, in_specs=(SPEC2, SPEC2, SPEC2),
                         out_specs=SPEC2)(psi, quality, anchor)
    out_specs = (SPEC2, {"cg_iters": P(), "rel_residual": P(),
                         "residue_count": P(), "suspect": SPEC2,
                         "suspect_count": P(),
                         "anchor_disagreement": SPEC2,
                         "anchor_disagreement_count": P()})
    return shard_map(f, mesh=mesh, in_specs=(SPEC2, SPEC2, SPEC2),
                     out_specs=out_specs)(psi, quality, anchor)
