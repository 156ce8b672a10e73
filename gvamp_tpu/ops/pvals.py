"""LOO / LOCO association p-values over the packed genotype matrix.

Re-design of the reference's per-marker scalar loops (pvals_calc,
data.cpp:1108-1226; pvals_calc_LOCO, data.cpp:1235-1353) as blocked decode +
einsum passes.  Key algebra: with the marker-k contribution added back,

    y_mark = y_mod + s_k * value_k,   s_k = x1_k / sqrt(N),
    value_k = (a - mave_k) * msig_k * b * na,

every sufficient statistic expands into marker-linear contractions of the
decode (a, b) against the FIXED vectors {na, y_mod, y_mod^2} plus one
quadratic moment sum a^2*na — one pass over the packed matrix reproduces the
exact (sumx, sumsqx, sumxy, sumy, sumsqy, count) the reference accumulates
per marker; the t-test is betainc-based Student-t (utilities.cpp:321-334).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from gvamp_tpu.ops import matvec
from gvamp_tpu.ops.special import student_t_sf2


@functools.partial(jax.jit, static_argnames=("block",))
def _moments(words, vecs, na, block=256):
    """One blocked decode pass.

    vecs: f[V, 4, Nb] contraction vectors. Returns
    (av f[V, M], bv f[V, M], aa_na f[M]) with av[v] = sum a * vecs[v] etc.
    and aa_na = sum a^2 * na.
    """
    Nw, M = words.shape
    dt = vecs.dtype
    V = vecs.shape[0]

    def body(i, acc):
        av, bv, aa = acc
        blk = jax.lax.dynamic_slice(words, (0, i * block), (Nw, block))
        a, b = matvec.decode_planar_dense(blk, dt)  # [4, Nb, blk]
        av = jax.lax.dynamic_update_slice(
            av, jnp.einsum("knm,vkn->vm", a, vecs), (0, i * block))
        bv = jax.lax.dynamic_update_slice(
            bv, jnp.einsum("knm,vkn->vm", b, vecs), (0, i * block))
        aa = jax.lax.dynamic_update_slice(
            aa, jnp.einsum("knm,kn->m", a * a, na), (i * block,))
        return av, bv, aa

    zrow = (words[0, :] * np.uint32(0)).astype(dt)
    z2 = jnp.broadcast_to(zrow, (V, M))
    av, bv, aa = jax.lax.fori_loop(0, M // block, body, (z2, z2, zrow))
    return av, bv, aa


def _reg1d_pvals(sumx, sumsqx, sumxy, sumy, sumsqy, n):
    """1-D regression t-test (reference linear_reg1d_pvals,
    utilities.cpp:321-334)."""
    s2y = (sumsqy - sumy * sumy / n) / (n - 1)
    s2x = (sumsqx - sumx * sumx / n) / (n - 1)
    sxy = (sumxy - sumx * sumy / n) / (n - 1)
    rxy = sxy / jnp.sqrt(s2x * s2y)
    t = rxy * jnp.sqrt((n - 2) / jnp.maximum(1.0 - rxy * rxy, 1e-300))
    return student_t_sf2(t, n - 2)


def _pvals_from_target(geno, y_target_planar, x1_internal, block):
    """Sufficient stats + t-test for y_mark = y_target + s_k value_k."""
    na = geno.na_planar
    yc = y_target_planar * na
    vecs = jnp.stack([na.astype(geno.dtype), yc, yc * yc])
    av, bv, aa_na = _moments(geno.words, vecs, na.astype(geno.dtype), block=block)
    a_na, a_y = av[0], av[1]
    b_na, b_y, b_yy = bv[0], bv[1], bv[2]
    mave, msig = geno.mave, geno.msig

    sumx = msig * (a_na - mave * b_na)
    sumsqx = msig**2 * (aa_na - 2 * mave * a_na + mave**2 * b_na)
    vy = msig * (a_y - mave * b_y)       # sum value * y_target
    s = x1_internal * geno.inv_sqrt_n    # marker-k add-back scale
    sumxy = vy + s * sumsqx
    sumy = b_y + s * sumx
    sumsqy = b_yy + 2 * s * vy + s**2 * sumsqx
    return _reg1d_pvals(sumx, sumsqx, sumxy, sumy, sumsqy, b_na)


def loo_pvals(geno, z1_planar, x1_internal):
    """LOO p-values (reference pvals_calc, data.cpp:1108-1226).

    z1_planar: A @ x1 (planar); x1_internal: internal-scale estimate [Mpad].
    Returns float64[M] two-sided p-values.
    """
    y = geno.filter_pheno()
    ym = (y - z1_planar) * geno.na_planar
    block = min(256, geno.Mpad)
    p = _pvals_from_target(geno, ym, x1_internal, block)
    from gvamp_tpu import dist
    return dist.to_numpy(p).astype(np.float64)[: geno.M]


def loco_pvals(geno, z1_planar, x1_internal, chroms, predictor_cb=None):
    """LOCO p-values (reference pvals_calc_LOCO, data.cpp:1235-1353).

    chroms: int[M] chromosome per local marker ('X' mapped to 23).  For each
    chromosome the genetic predictor y_chrom = A (x1 * 1[ch]) is one masked
    ``ax`` pass (replacing the reference's per-marker accumulation +
    MPI_Iallreduce, data.cpp:1285-1289); y_corr = y_mod + y_chrom feeds the
    same sufficient statistics, keeping only ch's markers.

    predictor_cb(ch, y_chrom_planar) is invoked per chromosome (for the
    reference's *_LOCO_chr_N.csv dumps).
    """
    y = geno.filter_pheno()
    na = geno.na_planar
    ym = (y - z1_planar) * na
    chroms_pad = np.zeros(geno.Mpad, dtype=np.int32)
    chroms_pad[: geno.M] = np.asarray(chroms)
    pvals = np.ones(geno.Mpad, dtype=np.float64)
    block = min(256, geno.Mpad)
    from gvamp_tpu import dist
    present = [ch for ch in range(1, 24) if (chroms_pad == ch).any()]
    if not present:
        return pvals[: geno.M]

    # ONE wide pass builds every chromosome's genetic predictor
    # (replacing the reference's per-chromosome accumulation +
    # MPI_Iallreduce, data.cpp:1285-1289)
    masks = np.stack([(chroms_pad == ch).astype(np.float64) for ch in present],
                     axis=1)
    y_chroms = geno.axm(x1_internal[:, None] * jnp.asarray(masks, geno.dtype))
    if predictor_cb is not None:
        for j, ch in enumerate(present):
            predictor_cb(ch, y_chroms[..., j])

    # ONE blocked decode pass accumulates all chromosomes' sufficient
    # statistics: vecs = [na, yc_1, yc_1^2, yc_2, yc_2^2, ...]
    ycs = [(ym + y_chroms[..., j]) * na for j in range(len(present))]
    vecs = jnp.stack([na.astype(geno.dtype)]
                     + [v for yc in ycs for v in (yc, yc * yc)])
    av, bv, aa_na = _moments(geno.words, vecs, na.astype(geno.dtype),
                             block=block)
    mave, msig = geno.mave, geno.msig
    a_na, b_na = av[0], bv[0]
    sumx = msig * (a_na - mave * b_na)
    sumsqx = msig**2 * (aa_na - 2 * mave * av[0] + mave**2 * b_na)
    s = x1_internal * geno.inv_sqrt_n

    for j, ch in enumerate(present):
        a_y, b_y, b_yy = av[1 + 2 * j], bv[1 + 2 * j], bv[2 + 2 * j]
        vy = msig * (a_y - mave * b_y)
        sumxy = vy + s * sumsqx
        sumy = b_y + s * sumx
        sumsqy = b_yy + 2 * s * vy + s**2 * sumsqx
        p = dist.to_numpy(_reg1d_pvals(sumx, sumsqx, sumxy, sumy, sumsqy, b_na))
        sel = chroms_pad == ch
        pvals[sel] = p[sel]

    return pvals[: geno.M]
