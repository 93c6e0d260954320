"""Multi-scan fusion: Schur-complement bundle adjustment
(BASELINE config 5; no reference equivalent — the reference is strictly
single-scan).

Model: S scans with unknown world-from-scan poses (R_s, t_s) observe a
set of L shared landmarks; observation y_{s,l} is the landmark in scan
s's local frame (in practice: a feature point triangulated from the
scan's depth map). Gauss-Newton on

    min sum_{s,l} m_{s,l} || R_s y_{s,l} + t_s - X_l ||^2

over poses AND landmark positions X. Each GN step eliminates the
landmarks through the Schur complement:

    S_cc = H_cc - H_cl H_ll^{-1} H_lc      (6S x 6S, dense, tiny)
    delta_c = solve(S_cc, b_c - H_cl H_ll^{-1} b_l)
    delta_l = H_ll^{-1} (b_l - H_lc delta_c)

Distribution (slc_tpu.parallel mesh): landmarks are sharded across all
devices; every Schur term is a sum over landmarks, so each device
reduces its local landmarks and a single `psum` forms the global
reduced system, which is solved replicated (96 x 96 for 16 scans). The
landmark back-substitution is purely local. This is DP over DCN at the
multi-host scale with one tiny collective per GN iteration.

Gauge freedom is fixed by freezing scan 0's pose.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from slc_tpu import se3


def residuals(rot: jax.Array, trans: jax.Array, landmarks: jax.Array,
              obs: jax.Array, mask: jax.Array) -> jax.Array:
    """(S,3,3), (S,3), (L,3), (S,L,3), (S,L) -> masked (S,L,3)."""
    pred = jnp.einsum("sij,slj->sli", rot, obs) + trans[:, None, :]
    return (pred - landmarks[None]) * mask[..., None]


def _gn_terms(rot, trans, landmarks, obs, mask):
    """Per-landmark GN blocks. Jacobians: d r / d xi_s = [I | -[R y]x],
    d r / d X_l = -I. Returns (h_cc (S,6,6), b_c (S,6),
    h_ll (L,3,3), b_l (L,3), h_cl (S,L,6,3), r)."""
    s, l = mask.shape
    ry = jnp.einsum("sij,slj->sli", rot, obs)               # (S,L,3)
    r = (ry + trans[:, None, :] - landmarks[None]) * mask[..., None]

    eye3 = jnp.eye(3, dtype=r.dtype)
    jp = jnp.concatenate([
        jnp.broadcast_to(eye3, (s, l, 3, 3)),
        -se3.hat(ry)], axis=-1)                             # (S,L,3,6)
    jp = jp * mask[..., None, None]

    h_cc = jnp.einsum("slki,slkj->sij", jp, jp)             # (S,6,6)
    b_c = -jnp.einsum("slki,slk->si", jp, r)                # (S,6)
    # J_l = -I (masked): H_ll = (#obs) I, H_cl = -J_p^T.
    nobs = mask.sum(axis=0)                                 # (L,)
    h_ll = nobs[:, None, None] * eye3[None]
    b_l = jnp.einsum("slk->lk", r)                          # -J_l^T r = +sum r
    h_cl = -jnp.swapaxes(jp, -1, -2)                        # (S,L,6,3)
    return h_cc, b_c, h_ll, b_l, h_cl, r


def _schur_reduce(h_cc, b_c, h_ll, b_l, h_cl, damping):
    """Form the reduced camera system from (possibly local-shard) sums.
    Returns (s_cc (S,6,S,6) flattened contributions, rhs (S,6),
    h_ll_inv)."""
    s, l = h_cl.shape[0], h_cl.shape[1]
    h_ll_inv = jnp.linalg.inv(
        h_ll + damping * jnp.eye(3, dtype=h_ll.dtype)[None])
    # W_l = H_cl H_ll^{-1}: (S,L,6,3)
    w = jnp.einsum("slij,ljk->slik", h_cl, h_ll_inv)
    # Off-diagonal coupling: sum_l W_s H_lc_s' = (S,6,S',6)
    s_off = jnp.einsum("slik,tljk->sitj", w, h_cl)
    rhs_red = b_c - jnp.einsum("slik,lk->si", w, b_l)
    return s_off, rhs_red, h_ll_inv


def gn_step(rot, trans, landmarks, obs, mask,
            damping: float = 1e-6,
            reduce_fn=None) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """One Gauss-Newton step; ``reduce_fn`` sums Schur terms across
    landmark shards (identity locally, `psum` under shard_map)."""
    s = rot.shape[0]
    h_cc, b_c, h_ll, b_l, h_cl, _ = _gn_terms(rot, trans, landmarks, obs,
                                              mask)
    s_off, rhs_red, h_ll_inv = _schur_reduce(h_cc, b_c, h_ll, b_l, h_cl,
                                             damping)
    if reduce_fn is not None:
        h_cc = reduce_fn(h_cc)
        s_off = reduce_fn(s_off)
        rhs_red = reduce_fn(rhs_red)

    a = (jax.scipy.linalg.block_diag(*(h_cc + damping * jnp.eye(6)))
         .reshape(s, 6, s, 6) - s_off)
    # Gauge fix: freeze scan 0 (identity rows/cols, zero rhs).
    a = a.reshape(6 * s, 6 * s)
    fix = jnp.arange(6)
    a = a.at[fix, :].set(0.0).at[:, fix].set(0.0)
    a = a.at[fix, fix].set(1.0)
    rhs = rhs_red.reshape(-1).at[fix].set(0.0)

    delta_c = jnp.linalg.solve(a, rhs).reshape(s, 6)

    # Landmark back-substitution (local to each shard).
    # b_l - H_lc delta_c ; H_lc = H_cl^T over scans.
    corr = b_l - jnp.einsum("slij,si->lj", h_cl, delta_c)
    delta_l = jnp.einsum("lij,lj->li", h_ll_inv, corr)

    # Update parameterization matching the Jacobian [I | -[Ry]x]:
    # R' = exp(w) R, t' = t + dt (translation NOT rotated).
    d_rot, d_t = se3.exp_se3(delta_c)
    new_rot = d_rot @ rot
    new_trans = trans + d_t
    return new_rot, new_trans, landmarks + delta_l


@functools.partial(jax.jit, static_argnames=("iters",))
def fuse_scans(obs: jax.Array, mask: jax.Array,
               init_rot: Optional[jax.Array] = None,
               init_trans: Optional[jax.Array] = None,
               init_landmarks: Optional[jax.Array] = None,
               iters: int = 10, damping: float = 1e-6):
    """Single-device bundle adjustment.

    Args:
      obs: (S, L, 3) landmark observations in each scan's local frame.
      mask: (S, L) 1.0 where scan s observes landmark l.
    Returns (rot (S,3,3), trans (S,3), landmarks (L,3)).
    """
    s, l = mask.shape
    rot = (init_rot if init_rot is not None
           else jnp.broadcast_to(jnp.eye(3, dtype=obs.dtype), (s, 3, 3)))
    trans = (init_trans if init_trans is not None
             else jnp.zeros((s, 3), obs.dtype))
    if init_landmarks is None:
        # Initialize landmarks as the masked mean of transformed obs.
        pred = jnp.einsum("sij,slj->sli", rot, obs) + trans[:, None, :]
        init_landmarks = (pred * mask[..., None]).sum(0) \
            / jnp.maximum(mask.sum(0)[:, None], 1.0)
    lm = init_landmarks

    def body(_, carry):
        r, t, x = carry
        return gn_step(r, t, x, obs, mask, damping)

    return jax.lax.fori_loop(0, iters, body, (rot, trans, lm))


def ate_rmse(rot, trans, rot_gt, trans_gt) -> jax.Array:
    """Absolute trajectory error after aligning to the gauge of scan 0:
    express every pose relative to scan 0 in both sets, compare
    translations."""
    r0i, t0i = se3.invert(rot[0], trans[0])
    g0i, g0t = se3.invert(rot_gt[0], trans_gt[0])
    rel_t = jnp.einsum("ij,sj->si", r0i, trans) + t0i
    rel_gt = jnp.einsum("ij,sj->si", g0i, trans_gt) + g0t
    return jnp.sqrt(jnp.mean(jnp.sum((rel_t - rel_gt) ** 2, -1)))
