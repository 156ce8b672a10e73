"""Warm-started Jacobi-preconditioned conjugate gradient (marker space).

Solves (tau * A^T A + gam2 * I) x = v entirely on-device as a
``lax.while_loop`` — the TPU-native reshape of the reference's
``precondCG_solver`` (vamp.cpp:1120-1229).  Each iteration costs one
``ax`` + one ``atx`` pass over the packed matrix (lmmse_mult,
vamp.cpp:1074-1118); cross-shard reduction rides the psum inside ``ax``.

Two exit modes, as in the reference:
  * solver mode (``onsager=False``): relative residual ||r||/||v|| < 1e-5
    (vamp.cpp:1213-1223);
  * Onsager-probe mode (``onsager=True``): early-exit when the probe
    functional gam2 * <v, mu> stabilizes to 1e-8 relative change
    (vamp.cpp:1174-1193).
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class CGResult(NamedTuple):
    mu: jax.Array
    iters: jax.Array
    rel_err: jax.Array


def solve(
    lmmse_mult: Callable[[jax.Array], jax.Array],
    v: jax.Array,
    mu_start: jax.Array,
    diag: jax.Array,          # scalar or [M] Jacobi preconditioner
    gam2,
    max_iter: int,
    onsager: bool = False,
    err_tol: float = 1e-5,
    onsager_tol: float = 1e-8,
) -> CGResult:
    dt = v.dtype

    r0 = v - lmmse_mult(mu_start)
    z0 = r0 / diag
    norm_v = jnp.sqrt(jnp.sum(jnp.square(v)))

    class S(NamedTuple):
        i: jax.Array
        mu: jax.Array
        r: jax.Array
        z: jax.Array
        p: jax.Array
        rz: jax.Array
        prev_ons: jax.Array
        rel_err: jax.Array
        done: jax.Array

    s0 = S(jnp.asarray(0), mu_start, r0, z0, z0,
           jnp.sum(r0 * z0), jnp.asarray(0.0, dt),
           jnp.asarray(jnp.inf, dt), jnp.asarray(False))

    def cond(s: S):
        return (s.i < max_iter) & (~s.done)

    def body(s: S):
        d = lmmse_mult(s.p)
        alpha = s.rz / jnp.sum(d * s.p)
        mu = s.mu + alpha * s.p
        if onsager:
            ons = gam2 * jnp.sum(v * mu)
            rel = jnp.where(ons != 0, jnp.abs((ons - s.prev_ons) / ons), 1.0)
            ons_done = rel < onsager_tol
            prev_ons = ons
        else:
            ons_done = jnp.asarray(False)
            prev_ons = s.prev_ons
        r = s.r - alpha * d
        z = r / diag
        rz_new = jnp.sum(r * z)
        beta = rz_new / s.rz
        p = z + beta * s.p
        rel_err = jnp.sqrt(jnp.sum(jnp.square(r))) / norm_v
        done = ons_done | (rel_err < err_tol)
        out = S(s.i + 1, mu, r, z, p, rz_new, prev_ons, rel_err, done)
        return jax.tree_util.tree_map(
            lambda n, ref: jnp.asarray(n, ref.dtype), out, s)

    out = jax.lax.while_loop(cond, body, s0)
    return CGResult(mu=out.mu, iters=out.i, rel_err=out.rel_err)


def make_lmmse_mult(ax_fn, atx_fn, op, tau, gam2):
    """p -> tau * A^T(A p) + gam2 * p (reference lmmse_mult, vamp.cpp:1074)."""

    def mult(p):
        return tau * atx_fn(op, ax_fn(op, p)) + gam2 * p

    return mult


def jacobi_diag(tau, gam2, N):
    """tau*(N-1)/N + gam2 — the diagonal of the LMMSE operator under marker
    standardization (reference vamp.cpp:1137-1139)."""
    return tau * (N - 1.0) / N + gam2
