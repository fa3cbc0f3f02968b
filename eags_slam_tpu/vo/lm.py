"""SE3 Levenberg-Marquardt alignment of edge points to a keyframe's
distance transform.

Replaces the SSE-accelerated C++ optimizer (VO/system/optimizer.{h,cpp}):
  - `calcErrorAndBuffers` (:81-219): transform edge points, project,
    bilinearly interpolate (gx, gy, dt), Huber-style weight
    w = min(1, huber_edge / r) with huber_edge = 0.3 (optimizer.h:77,153-156),
    per-level edge-distance filter (optimizer.h:62);
  - `calculateWarpUpdate` (:241-250): 6-dof image Jacobian accumulated into
    normal equations (the C++ `LGS6` SSE accumulator, VO/utils/LGSX.h) —
    here ONE `jnp.einsum` over all edge points (SURVEY.md §2.4 P5);
  - the LM loop (:257-351): lambda * diag scaling, success x0.5 / fail x2,
    convergence eps 0.999, bounded iterations — a `lax.while_loop`.

The whole per-level solve is a single jitted device program.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.camera import Camera
from ..core.se3 import se3_exp
from ..ops.image import bilinear_sample


class LMSettings(NamedTuple):
    huber_edge: float = 0.3
    max_iters: int = 100
    eps: float = 0.999          # stop when new_cost > eps * old_cost
    lambda_init: float = 1e-4
    max_lambda_tries: int = 5
    dist_filter: float = 30.0   # ignore points with dt > filter (per level)


class LMResult(NamedTuple):
    R: jnp.ndarray          # (3, 3)
    t: jnp.ndarray          # (3,)
    cost: jnp.ndarray       # () mean weighted residual
    good: jnp.ndarray       # () int32 points with small residual
    bad: jnp.ndarray        # () int32 valid but large-residual points
    iters: jnp.ndarray


def _residuals(R, t, pts, valid, kf_gx, kf_gy, kf_dt, cam: Camera,
               s: LMSettings):
    """Residuals + weights + jacobian ingredients for the current pose."""
    p = pts @ R.T + t                                   # (P, 3)
    z = p[:, 2]
    in_front = z > 1e-3
    zs = jnp.maximum(z, 1e-3)
    inv_z = 1.0 / zs
    u = p[:, 0] * inv_z * cam.fx + cam.cx
    v = p[:, 1] * inv_z * cam.fy + cam.cy
    uv = jnp.stack([u, v], axis=-1)

    dt, in_b = bilinear_sample(kf_dt, uv)
    gx, _ = bilinear_sample(kf_gx, uv)
    gy, _ = bilinear_sample(kf_gy, uv)

    ok = valid & in_front & in_b & (dt <= s.dist_filter)
    r = jnp.where(ok, dt, 0.0)
    w = jnp.where(r > s.huber_edge, s.huber_edge / jnp.maximum(r, 1e-9), 1.0)
    w = jnp.where(ok, w, 0.0)
    return p, r, w, gx, gy, ok


def _normal_equations(p, r, w, gx, gy, cam: Camera):
    """A = J^T W J (6x6), b = -J^T W r via one einsum (the LGS6 replacement).

    Twist convention [rho, phi] matching core.se3.se3_exp.
    """
    z = jnp.maximum(p[:, 2], 1e-3)
    inv_z = 1.0 / z
    x, y = p[:, 0], p[:, 1]
    gu = gx * cam.fx * inv_z
    gv = gy * cam.fy * inv_z
    # d(residual)/d(twist): translation part then rotation part
    # (Kerl-style image jacobian, optimizer.cpp:241-250 formulas).
    j_tx = gu
    j_ty = gv
    j_tz = -(gu * x + gv * y) * inv_z
    j_rx = -gu * x * y * inv_z - gv * (z + y * y * inv_z)
    j_ry = gu * (z + x * x * inv_z) + gv * x * y * inv_z
    j_rz = -gu * y + gv * x
    J = jnp.stack([j_tx, j_ty, j_tz, j_rx, j_ry, j_rz], axis=-1)  # (P, 6)
    Jw = J * w[:, None]
    A = jnp.einsum("pi,pj->ij", Jw, J, precision=jax.lax.Precision.HIGHEST)
    b = -jnp.einsum("pi,p->i", Jw, r, precision=jax.lax.Precision.HIGHEST)
    return A, b


def _cost(r, w, ok):
    n = jnp.maximum(jnp.sum(ok.astype(jnp.float32)), 1.0)
    return jnp.sum(w * r * r) / n


class _LMCarry(NamedTuple):
    R: jnp.ndarray
    t: jnp.ndarray
    cost: jnp.ndarray
    lam: jnp.ndarray
    it: jnp.ndarray
    done: jnp.ndarray


@functools.partial(jax.jit, static_argnames=("cam", "s"))
def lm_align(
    pts, valid, kf_gx, kf_gy, kf_dt, R0, t0, cam: Camera, s: LMSettings
) -> LMResult:
    """LM solve for the pose aligning `pts` onto the keyframe DT."""

    def eval_cost(R, t):
        _, r, w, _, _, ok = _residuals(R, t, pts, valid, kf_gx, kf_gy, kf_dt,
                                       cam, s)
        return _cost(r, w, ok)

    def body(c: _LMCarry):
        p, r, w, gx, gy, ok = _residuals(
            c.R, c.t, pts, valid, kf_gx, kf_gy, kf_dt, cam, s
        )
        A, b = _normal_equations(p, r, w, gx, gy, cam)

        def try_lambda(carry):
            lam, best_R, best_t, best_cost, accepted, tries = carry
            Areg = A + lam * jnp.diag(jnp.diag(A)) + 1e-8 * jnp.eye(6)
            delta = jnp.linalg.solve(Areg, b)
            finite = jnp.all(jnp.isfinite(delta))
            T_new = se3_exp(delta)
            R_new = T_new[:3, :3] @ c.R
            t_new = T_new[:3, :3] @ c.t + T_new[:3, 3]
            new_cost = eval_cost(R_new, t_new)
            better = finite & (new_cost < best_cost)
            return (
                jnp.where(better, lam * 0.5, lam * 2.0),
                jnp.where(better, R_new, best_R),
                jnp.where(better, t_new, best_t),
                jnp.where(better, new_cost, best_cost),
                accepted | better,
                tries + 1,
            )

        def try_cond(carry):
            _, _, _, _, accepted, tries = carry
            return (~accepted) & (tries < s.max_lambda_tries)

        cost0 = _cost(r, w, ok)
        lam, R_new, t_new, new_cost, accepted, _ = jax.lax.while_loop(
            try_cond, try_lambda, (c.lam, c.R, c.t, cost0, jnp.array(False),
                                   jnp.zeros((), jnp.int32)),
        )
        converged = new_cost > s.eps * cost0
        return _LMCarry(
            R=R_new, t=t_new, cost=new_cost, lam=lam, it=c.it + 1,
            done=(~accepted) | converged,
        )

    def cond(c: _LMCarry):
        return (c.it < s.max_iters) & ~c.done

    init = _LMCarry(
        R=R0, t=t0, cost=eval_cost(R0, t0),
        lam=jnp.asarray(s.lambda_init), it=jnp.zeros((), jnp.int32),
        done=jnp.array(False),
    )
    final = jax.lax.while_loop(cond, body, init)

    _, r, w, _, _, ok = _residuals(
        final.R, final.t, pts, valid, kf_gx, kf_gy, kf_dt, cam, s
    )
    # good/bad feed the keyframe gate (tracker.cpp:394-395). Points that
    # project out of bounds or beyond the edge-distance filter are BAD, not
    # invisible — otherwise the ratio stays flat as the view drifts away from
    # the keyframe and promotion never fires.
    good = jnp.sum(ok & (r < s.huber_edge))
    bad = jnp.sum(valid) - good
    return LMResult(final.R, final.t, final.cost, good, bad, final.it)
