"""Special functions for the probit denoiser and p-value calculation.

The reference implements a polynomial erfcx (utilities.cpp:345-409) for
numerically stable phi/Phi ratios and uses boost's Student-t CDF for p-values
(utilities.cpp:321-334).  Here both come from JAX primitives so they fuse
into the surrounding kernels and differentiate cleanly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.special import betainc

_SQRT1_2 = 0.7071067811865476
_SQRT_2PI = 2.5066282746310002


def erfcx(x: jax.Array) -> jax.Array:
    """Scaled complementary error function exp(x^2) * erfc(x).

    Stable for both signs: for x >= 0 uses exp(x^2)*erfc(x) evaluated via
    erfc of the (moderate) positive argument when x is small and an
    asymptotic continued-fraction style rational for large x; for x < 0 uses
    the reflection erfcx(x) = 2 exp(x^2) - erfcx(-x).
    """
    x = jnp.asarray(x)
    a = jnp.abs(x)
    # small |x|: the direct product exp(a^2)*erfc(a) is safe and accurate
    # (both factors positive, no cancellation) while exp(a^2) stays finite.
    small = a < 4.0
    am = jnp.minimum(a, 4.0)
    direct = jnp.exp(jnp.square(am)) * jax.lax.erfc(am)
    # large |x|: Laplace continued fraction; for a >= 4 sixteen levels give
    # relative error below 1e-15.
    z = jnp.maximum(a, 4.0)
    cf = jnp.zeros_like(z)
    for n in range(16, 0, -1):
        cf = (0.5 * n) / (z + cf)
    large = 1.0 / (_SQRT_2PI * _SQRT1_2 * (z + cf))  # = 1/(sqrt(pi)*(z+cf))
    pos = jnp.where(small, direct, large)
    # reflection for negative arguments
    return jnp.where(x >= 0, pos, 2.0 * jnp.exp(jnp.square(x)) - pos)


def normal_cdf(x: jax.Array) -> jax.Array:
    """Phi(x) (reference utilities.cpp:336-339)."""
    return 0.5 * jax.lax.erfc(-x * _SQRT1_2)


def normal_logcdf(x: jax.Array) -> jax.Array:
    """log Phi(x), stable in the deep left tail via erfcx."""
    # Phi(x) = 0.5 erfc(-x/sqrt2) = 0.5 erfcx(-x/sqrt2) exp(-x^2/2)
    u = -x * _SQRT1_2
    return jnp.log(0.5 * erfcx(u)) - jnp.square(x) / 2.0


def phi_over_Phi(c: jax.Array) -> jax.Array:
    """N(c;0,1) / Phi(c), the inverse Mills ratio, erfcx-stable.

    Identity used throughout the probit denoiser (reference
    vamp_probit.cpp:686): pdf(c)/cdf(c) = 2 / (sqrt(2 pi) erfcx(-c/sqrt(2))).
    """
    return 2.0 / (_SQRT_2PI * erfcx(-c * _SQRT1_2))


def student_t_sf2(t: jax.Array, df: jax.Array) -> jax.Array:
    """Two-sided p-value 2*P(T_df > |t|) via the incomplete beta function.

    P(T > t) = 0.5 * I_{df/(df+t^2)}(df/2, 1/2) for t >= 0, matching the
    boost students_t complement CDF used by the reference
    (utilities.cpp:330-333).
    """
    t = jnp.abs(t)
    x = df / (df + jnp.square(t))
    return betainc(df / 2.0, 0.5, x)


def log_mix_gauss_pdf_ratio(x, eta_nom, eta_den, pi_nom, pi_den):
    """log of a ratio of two zero-mean Gaussian-mixture densities at x;
    eta_* are the component VARIANCES (reference log_mix_gauss_pdf_ratio,
    utilities.cpp:216-233 — kept for API parity; the reference itself has
    no live callers).  Max-variance exponent shifting keeps both sums
    overflow-free.
    """
    x = jnp.asarray(x)
    eta_nom = jnp.asarray(eta_nom)
    eta_den = jnp.asarray(eta_den)
    pi_nom = jnp.asarray(pi_nom)
    pi_den = jnp.asarray(pi_den)
    x2 = jnp.square(x)[..., None]

    def shifted_sum(eta, pi):
        emax = jnp.max(eta)
        t = pi / jnp.sqrt(eta) * jnp.exp(-x2 / 2 * (emax - eta) / (eta * emax))
        return jnp.sum(t, axis=-1), emax

    s_nom, e_nom = shifted_sum(eta_nom, pi_nom)
    s_den, e_den = shifted_sum(eta_den, pi_den)
    return (jnp.log(s_nom) - jnp.log(s_den)
            - jnp.square(x) / 2 * (e_den - e_nom) / (e_den * e_nom))
