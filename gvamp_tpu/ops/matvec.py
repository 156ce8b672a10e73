"""Packed-genotype matrix-vector products (the hot kernels).

The standardized design matrix is, elementwise (reference data.cpp:891-921,
728-801):

    A[n, m] = (g_nm - mave_m) * nonmiss_nm * msig_m * scale,   scale = 1/sqrt(N)

with ``g`` the 2-bit dosage decode and ``nonmiss`` zero at the PLINK "01"
missing code.  Phenotype-NA masking (na_lut in the reference) is applied by
callers: ``ax`` output is multiplied by the planar NA mask and ``atx`` inputs
are pre-masked, matching the reference's scalar-path semantics
(data.cpp:959-989 applies na_lut inside Ax; ATx relies on filtered inputs,
data.cpp:728-801 + vamp.cpp:219).

Storage layout: packed words are kept **word-major**: ``uint32[Nw, M]`` —
N-words on sublanes, markers on lanes.  Inside the Pallas kernels a
``pltpu.bitcast(u32 -> int8)`` expands each word-row into four byte-rows
(empirically verified: byte ``b`` of word-row ``i`` lands at row ``4i+b`` on
both Mosaic and interpret backends), which is exactly the byte-position axis
of :class:`gvamp_tpu.ops.layout.PlanarLayout`.  Decode is pure SWAR arithmetic
on u32 lanes — ~2.75 VPU ops per genotype — and the contraction runs on the
MXU, so a full pass over the packed matrix streams HBM once with no gathers.

Both backends compute, in planar layout:

    ax : z[k, p]  = sum_m a_k[m, p] * w[m] - b_k[m, p] * u[m]
    atx: av[m]    = sum_{k,p} a_k[m, p] * v[k, p]   (and bv[m] likewise on b)

with w = msig*x*scale and u = mave*msig*x*scale folded by the caller.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_M1 = np.uint32(0x01010101)
_M3 = np.uint32(0x03030303)

# Default tiles: word-rows (sublanes) x markers (lanes).
_TNW = 32
_TM = 512

_HI = jax.lax.Precision.HIGHEST


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _swar(words, k: int):
    """SWAR decode of bit-pair plane k: u32 words -> (a, b) packed u32 bytes.

    Per byte lane: a = {2,0,1,0}[code], b = {1,0,1,1}[code] — the arithmetic
    replacement for the reference's dotp_lut_a / dotp_lut_b gather tables
    (dotp_lut.hpp:3,1030).
    """
    c = (words >> np.uint32(2 * k)) & _M3
    lo = c & _M1
    hi = (c >> np.uint32(1)) & _M1
    notlo = lo ^ _M1
    a = (notlo << np.uint32(1)) - (hi & notlo)
    b = hi | notlo
    return a, b


# --------------------------------------------------------------------------
# XLA reference path (CPU tests / small data; materializes the decode)
# --------------------------------------------------------------------------


def decode_planar_dense(words: jax.Array, dtype=jnp.float32):
    """uint32[Nw, M] -> (a, b) dtype[4, Nb, M] planar-dense decode."""
    nw, m = words.shape
    a_pl, b_pl = [], []
    for k in range(4):
        a, b = _swar(words, k)
        # byte j of word-row i -> row 4i+j (little-endian), matching the
        # Mosaic bitcast semantics used in the Pallas path.
        a8 = jax.lax.bitcast_convert_type(a.T, jnp.uint8)  # [M, Nw, 4]
        b8 = jax.lax.bitcast_convert_type(b.T, jnp.uint8)
        a_pl.append(a8.reshape(m, 4 * nw).T)
        b_pl.append(b8.reshape(m, 4 * nw).T)
    return (
        jnp.stack(a_pl).astype(dtype),
        jnp.stack(b_pl).astype(dtype),
    )


def ax_xla(words, w, u, dtype=jnp.float32):
    a, b = decode_planar_dense(words, dtype)  # [4, Nb, M]
    return jnp.einsum("knm,m->kn", a, w.astype(dtype)) - jnp.einsum(
        "knm,m->kn", b, u.astype(dtype)
    )


def atx_xla(words, v_planar, dtype=jnp.float32):
    a, b = decode_planar_dense(words, dtype)
    v = v_planar.astype(dtype)
    av = jnp.einsum("knm,kn->m", a, v)
    bv = jnp.einsum("knm,kn->m", b, v)
    return av, bv


# --------------------------------------------------------------------------
# Pallas TPU kernels
# --------------------------------------------------------------------------


def _decode_tile_f32(g, k: int):
    """uint32[TNW, TM] tile -> (a, b) float32[4*TNW, TM] for plane k."""
    a_sw, b_sw = _swar(g, k)
    af = pltpu.bitcast(a_sw, jnp.int8).astype(jnp.float32)
    bf = pltpu.bitcast(b_sw, jnp.int8).astype(jnp.float32)
    return af, bf


def _ax_kernel(g_ref, w_ref, u_ref, z_ref):
    im = pl.program_id(1)

    @pl.when(im == 0)
    def _():
        z_ref[...] = jnp.zeros(z_ref.shape, z_ref.dtype)

    g = g_ref[...]
    w = w_ref[...]  # [TM, 1]
    u = u_ref[...]
    for k in range(4):
        a, b = _decode_tile_f32(g, k)
        za = jax.lax.dot_general(
            a, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_HI,
        )  # [4*TNW, 1]
        zb = jax.lax.dot_general(
            b, u, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_HI,
        )
        z_ref[k, :] += (za - zb)[:, 0]


@functools.partial(jax.jit, static_argnames=("tnw", "tm"))
def ax_pallas(words, w, u, tnw=_TNW, tm=_TM):
    """Fused decode+matvec: planar z[4, Nb] from uint32[Nw, M] packed words.

    Nw and M must be multiples of (tnw, tm); pad markers with msig=0 columns
    and words with 0x55 bytes (both contribute exactly zero).
    """
    Nw, M = words.shape
    assert Nw % tnw == 0 and M % tm == 0, (Nw, M, tnw, tm)
    grid = (Nw // tnw, M // tm)
    return pl.pallas_call(
        _ax_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tnw, tm), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, 1), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, 1), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((4, 4 * tnw), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, 4 * Nw), jnp.float32),
        interpret=_interpret(),
    )(words, w.astype(jnp.float32).reshape(M, 1), u.astype(jnp.float32).reshape(M, 1))


def _atx_kernel(g_ref, v_ref, av_ref, bv_ref):
    jn = pl.program_id(1)

    @pl.when(jn == 0)
    def _():
        av_ref[...] = jnp.zeros(av_ref.shape, av_ref.dtype)
        bv_ref[...] = jnp.zeros(bv_ref.shape, bv_ref.dtype)

    g = g_ref[...]
    av = jnp.zeros(av_ref.shape, av_ref.dtype)
    bv = jnp.zeros(bv_ref.shape, bv_ref.dtype)
    for k in range(4):
        a, b = _decode_tile_f32(g, k)  # [4*TNW, TM]
        vk = v_ref[k, :][:, None]  # [4*TNW, 1]
        av += jax.lax.dot_general(
            a, vk, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_HI,
        )  # [TM, 1]
        bv += jax.lax.dot_general(
            b, vk, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_HI,
        )
    av_ref[...] += av
    bv_ref[...] += bv


@functools.partial(jax.jit, static_argnames=("tnw", "tm"))
def atx_pallas(words, v_planar, tnw=_TNW, tm=_TM):
    """Fused decode+transposed matvec: (av[M], bv[M]) from planar v[4, Nb]."""
    Nw, M = words.shape
    assert Nw % tnw == 0 and M % tm == 0, (Nw, M, tnw, tm)
    grid = (M // tm, Nw // tnw)
    av, bv = pl.pallas_call(
        _atx_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tnw, tm), lambda j, i: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, 4 * tnw), lambda j, i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tm, 1), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, 1), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((M, 1), jnp.float32),
            jax.ShapeDtypeStruct((M, 1), jnp.float32),
        ],
        interpret=_interpret(),
    )(words, v_planar.astype(jnp.float32))
    return av[:, 0], bv[:, 0]
