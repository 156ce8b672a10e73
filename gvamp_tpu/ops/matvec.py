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
(byte ``b`` of word-row ``i`` lands at row ``4i+b`` on both Mosaic and
interpret backends), which is exactly the byte-position axis of
:class:`gvamp_tpu.ops.layout.PlanarLayout`.  Decode is pure SWAR arithmetic
on u32 lanes — the arithmetic replacement for the reference's 1024-entry
gather tables (dotp_lut.hpp) — so a full pass streams HBM once, gather-free.

Kernel families (measured on TPU v5e; packed HBM bandwidth is the metric
because 2-bit data expands 16x into lanes; burst-marginal numbers — see
docs/ROOFLINE.md for the measurement discipline):

* **int8-MXU wide kernels** (the production path, all engines route here
  even at B=1): the decoded planes stay int8 after the bitcast and the
  f32 right-hand sides quantize into 4 radix-127 int8 digits recombined
  outside (~1e-7 hardware-exact).  Both directions use the
  **transposed-output orientation** — the small digit matrix is the dot's
  lhs and the decoded plane streams through the MXU as the wide operand —
  worth 2-4x over the naive orientation: ``ax`` 776 GB/s a-only / 364
  missing-path, ``atx`` 611-727 / ~400 at tm=2048 lane tiles.  Wide
  blocks (D > 64 digit rows) auto-dispatch to the classic orientation,
  which wins there.  Extra RHS columns ride the same decode pass
  (block-CG, multi-trait, LOCO batching).
* **Single-vector VPU kernels** ``ax_pallas`` / ``atx_pallas`` and the
  bf16 3-way-split block kernels ``axm_pallas`` / ``atxm_pallas``: exact
  f32 reference implementations, kept for tests and fallback.

Both backends compute, in planar layout:

    ax : z[k, p]     = sum_m a_k[m, p] * w[m] - b_k[m, p] * u[m]
    atx: av[m]       = sum_{k,p} a_k[m, p] * v[k, p]  (bv likewise on b)
    axm: z[k, p, j]  = sum_m a_k[m, p] * W[m, j] - b_k[m, p] * U[m, j]
    atxm: av[m, j]   = sum_{k,p} a_k[m, p] * V[k, p, j]

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

# Default marker-tile (lanes). Word-tiles (sublanes) are picked per shape.
_TM = 512


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _pick_tnw(nw: int, prefer: int) -> int:
    """Largest word-tile <= prefer that divides nw (layout aligns nw to 32)."""
    for t in (256, 128, 64, 32):
        if t <= prefer and nw % t == 0:
            return t
    if nw % 32 == 0:
        return 32
    return nw  # tiny unpadded arrays (tests)


def _pick_tm(m: int, prefer: int = _TM) -> int:
    """Largest marker-tile <= prefer dividing m.

    Round-2 tile sweep (1.68 GB packed): the transposed-orientation atx
    kernels gain strongly from wide lane tiles (tm=2048: 610 GB/s vs 470
    at 512 — the plane streams through the MXU as the RHS, and wider
    tiles amortize its weight loads); ax gains mildly from tm=1024
    (341 vs 300).  VMEM bounds the atx choice by D (out + digit blocks
    scale with D), handled by the callers."""
    for t in (8192, 4096, 2048, 1024, _TM, 256, 128):
        if t <= prefer and m % t == 0:
            return t
    return m


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


def _split_hi_lo(x: jax.Array, axis: int) -> jax.Array:
    """f32 -> three exact bf16 parts concatenated along ``axis``.

    x ~= hi + mid + lo with all parts bf16; against an integer-valued (hence
    bf16-exact) left matrix, three single-pass bf16 MXU dots reproduce the
    f32 product to ~1e-8 relative — far cheaper than precision=HIGHEST
    (measured 4x wall-clock on v5e for the width-1..32 shapes used here,
    because HIGHEST's 6-pass f32 emulation is latency-bound).
    """
    x = x.astype(jnp.float32)
    # optimization_barrier: XLA's allow-excess-precision pass otherwise
    # treats the f32->bf16->f32 round-trip as exact and folds the residuals
    # to zero, silently degrading the product to single-bf16 accuracy
    hi = jax.lax.optimization_barrier(x.astype(jnp.bfloat16))
    r1 = x - hi.astype(jnp.float32)
    mid = jax.lax.optimization_barrier(r1.astype(jnp.bfloat16))
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return jnp.concatenate([hi, mid, lo], axis=axis)


def two_sum(hi, lo, p):
    """Compensated accumulation (Knuth two-sum): (hi, lo) += p with the
    rounding error of the hi update captured exactly in lo.  hi + lo folded
    at higher precision recovers the f64-grade sum — the TPU-native stand-in
    for the reference's all-double sufficient-statistic accumulators
    (data.cpp:446-483, 1108-1226)."""
    s = hi + p
    bp = s - hi
    err = (hi - (s - bp)) + (p - bp)
    return s, lo + err


def nb_chunk(Nb: int, target: int = 8192) -> int:
    """Largest chunk length <= target dividing Nb (PlanarLayout guarantees
    Nb is a multiple of 128) — the N-axis split for compensated moments."""
    q = Nb // 128
    d = max(dd for dd in range(1, min(q, target // 128) + 1) if q % dd == 0)
    return 128 * d


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


def axm_xla(words, W, U, dtype=jnp.float32):
    a, b = decode_planar_dense(words, dtype)
    return jnp.einsum("knm,mj->knj", a, W.astype(dtype)) - jnp.einsum(
        "knm,mj->knj", b, U.astype(dtype)
    )


def atxm_xla(words, V, dtype=jnp.float32):
    a, b = decode_planar_dense(words, dtype)
    v = V.astype(dtype)
    av = jnp.einsum("knm,knj->mj", a, v)
    bv = jnp.einsum("knm,knj->mj", b, v)
    return av, bv


# --------------------------------------------------------------------------
# Pallas TPU kernels — single vector (VPU multiply-accumulate)
# --------------------------------------------------------------------------


def _decode_tile(g, k: int, dtype=jnp.float32):
    """uint32[TNW, TM] tile -> (a, b) dtype[4*TNW, TM] for plane k."""
    a_sw, b_sw = _swar(g, k)
    af = pltpu.bitcast(a_sw, jnp.int8).astype(dtype)
    bf = pltpu.bitcast(b_sw, jnp.int8).astype(dtype)
    return af, bf


# kept under its historical name: callers/tests use it as the tile oracle
_decode_tile_f32 = _decode_tile


def _ax_kernel(g_ref, w_ref, u_ref, z_ref):
    im = pl.program_id(1)

    @pl.when(im == 0)
    def _():
        z_ref[...] = jnp.zeros(z_ref.shape, z_ref.dtype)

    g = g_ref[...]
    w = w_ref[...]  # [1, TM]
    u = u_ref[...]
    for k in range(4):
        a, b = _decode_tile(g, k)
        z_ref[k, :] += jnp.sum(a * w - b * u, axis=1)


@functools.partial(jax.jit, static_argnames=("tnw", "tm"))
def ax_pallas(words, w, u, tnw=0, tm=0):
    """Fused decode+matvec: planar z[4, Nb] from uint32[Nw, M] packed words.

    Pad markers with msig=0 columns and words with 0x55 bytes (both
    contribute exactly zero).
    """
    Nw, M = words.shape
    tnw = tnw or _pick_tnw(Nw, 32)
    tm = tm or _pick_tm(M)
    assert Nw % tnw == 0 and M % tm == 0, (Nw, M, tnw, tm)
    grid = (Nw // tnw, M // tm)
    return pl.pallas_call(
        _ax_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tnw, tm), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((4, 4 * tnw), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, 4 * Nw), jnp.float32),
        interpret=_interpret(),
    )(words, w.astype(jnp.float32).reshape(1, M), u.astype(jnp.float32).reshape(1, M))


def _atx_kernel(g_ref, v_ref, av_ref, bv_ref):
    jn = pl.program_id(1)

    @pl.when(jn == 0)
    def _():
        av_ref[...] = jnp.zeros(av_ref.shape, av_ref.dtype)
        bv_ref[...] = jnp.zeros(bv_ref.shape, bv_ref.dtype)

    g = g_ref[...]
    av = jnp.zeros(av_ref.shape, jnp.float32)
    bv = jnp.zeros(bv_ref.shape, jnp.float32)
    for k in range(4):
        a, b = _decode_tile(g, k)  # [4*TNW, TM]
        vk = v_ref[k, :][:, None]  # [4*TNW, 1]
        av += jnp.sum(a * vk, axis=0, keepdims=True)
        bv += jnp.sum(b * vk, axis=0, keepdims=True)
    av_ref[...] += av
    bv_ref[...] += bv


@functools.partial(jax.jit, static_argnames=("tnw", "tm"))
def atx_pallas(words, v_planar, tnw=0, tm=0):
    """Fused decode+transposed matvec: (av[M], bv[M]) from planar v[4, Nb]."""
    Nw, M = words.shape
    tnw = tnw or _pick_tnw(Nw, 256)
    tm = tm or _pick_tm(M)
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
            pl.BlockSpec((1, tm), lambda j, i: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm), lambda j, i: (0, j), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, M), jnp.float32),
            jax.ShapeDtypeStruct((1, M), jnp.float32),
        ],
        interpret=_interpret(),
    )(words, v_planar.astype(jnp.float32))
    return av[0], bv[0]


# --------------------------------------------------------------------------
# Pallas TPU kernels — wide RHS (MXU, bf16 hi/lo exact splitting)
# --------------------------------------------------------------------------


def _axm_kernel(g_ref, w2_ref, u2_ref, z_ref, *, B):
    im = pl.program_id(1)

    @pl.when(im == 0)
    def _():
        z_ref[...] = jnp.zeros(z_ref.shape, z_ref.dtype)

    g = g_ref[...]
    w2 = w2_ref[...]  # [TM, 3B] bf16 (hi | mid | lo)
    u2 = u2_ref[...]
    for k in range(4):
        a, b = _decode_tile(g, k, jnp.bfloat16)
        za = jax.lax.dot_general(
            a, w2, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # [4*TNW, 3B]
        zb = jax.lax.dot_general(
            b, u2, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        d = za - zb
        z_ref[k] += d[:, :B] + d[:, B : 2 * B] + d[:, 2 * B :]


@functools.partial(jax.jit, static_argnames=("tnw", "tm"))
def axm_pallas(words, W, U, tnw=0, tm=0):
    """Block matvec: planar z[4, Nb, B] from W, U: f32[M, B].

    One decode pass serves all B columns; bf16 3-way splitting keeps ~1e-8
    relative accuracy through single-pass MXU dots.
    """
    Nw, M = words.shape
    B = W.shape[1]
    tnw = tnw or _pick_tnw(Nw, 256)
    tm = tm or _pick_tm(M)
    assert Nw % tnw == 0 and M % tm == 0, (Nw, M, tnw, tm)
    if B > _BMAX_BF16:
        return _chunk_cols(
            lambda lo, hi: axm_pallas(words, W[:, lo:hi], U[:, lo:hi],
                                      tnw=tnw, tm=tm),
            B, _BMAX_BF16, 2)
    grid = (Nw // tnw, M // tm)
    kern = functools.partial(_axm_kernel, B=B)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tnw, tm), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, 3 * B), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, 3 * B), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (4, 4 * tnw, B), lambda i, j: (0, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((4, 4 * Nw, B), jnp.float32),
        interpret=_interpret(),
    )(words, _split_hi_lo(W, 1), _split_hi_lo(U, 1))


def _atxm_kernel(g_ref, v2_ref, av_ref, bv_ref, *, B):
    jn = pl.program_id(1)

    @pl.when(jn == 0)
    def _():
        av_ref[...] = jnp.zeros(av_ref.shape, av_ref.dtype)
        bv_ref[...] = jnp.zeros(bv_ref.shape, bv_ref.dtype)

    g = g_ref[...]
    av = jnp.zeros(av_ref.shape, jnp.float32)
    bv = jnp.zeros(bv_ref.shape, jnp.float32)
    for k in range(4):
        a, b = _decode_tile(g, k, jnp.bfloat16)  # [4*TNW, TM]
        vk = v2_ref[k]  # [4*TNW, 3B] bf16
        da = jax.lax.dot_general(
            a, vk, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # [TM, 3B]
        db = jax.lax.dot_general(
            b, vk, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        av += da[:, :B] + da[:, B : 2 * B] + da[:, 2 * B :]
        bv += db[:, :B] + db[:, B : 2 * B] + db[:, 2 * B :]
    av_ref[...] += av
    bv_ref[...] += bv


@functools.partial(jax.jit, static_argnames=("tnw", "tm"))
def atxm_pallas(words, V, tnw=0, tm=0):
    """Block transposed matvec: (av[M, B], bv[M, B]) from planar V[4, Nb, B]."""
    Nw, M = words.shape
    B = V.shape[2]
    tnw = tnw or _pick_tnw(Nw, 256)
    tm = tm or _pick_tm(M)
    assert Nw % tnw == 0 and M % tm == 0, (Nw, M, tnw, tm)
    if B > _BMAX_BF16:
        return _chunk_cols(
            lambda lo, hi: atxm_pallas(words, V[:, :, lo:hi], tnw=tnw, tm=tm),
            B, _BMAX_BF16, 1)
    grid = (M // tm, Nw // tnw)
    kern = functools.partial(_atxm_kernel, B=B)
    av, bv = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tnw, tm), lambda j, i: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (4, 4 * tnw, 3 * B), lambda j, i: (0, i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec((tm, B), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, B), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((M, B), jnp.float32),
            jax.ShapeDtypeStruct((M, B), jnp.float32),
        ],
        interpret=_interpret(),
    )(words, _split_hi_lo(V, 2))
    return av, bv


# --------------------------------------------------------------------------
# Pallas TPU kernels — wide RHS, int8 MXU path
# --------------------------------------------------------------------------
#
# The bf16 wide kernels above still pay 2 x 16 int8->bf16 lane-converts per
# packed word.  The MXU also runs int8 x int8 -> int32 natively, and the
# decoded planes are ALREADY int8 after the bitcast — so quantizing the RHS
# into ``_NDIG`` radix-127 int8 digits (x ~= sum_d digit_d * s0/127^d) skips
# every convert: measured ~1.5x faster than the bf16 path on v5e.  Digit
# recombination happens outside the kernel in f32; a and b products are
# emitted separately because their digit scales differ.  Absolute error is
# ~127^-_NDIG of the per-column max (~3.8e-9), on par with the bf16 3-split.

# Worst-case digit-quantization error of a length-M dot against the integer
# LHS: |err| <= M * 2 * colmax / (2 * 127^NDIG) ~ M * colmax * 3.8e-9 at
# NDIG=4 (all-same-sign adversarial inputs; typical ~1e-8 relative).  At the
# production M=131k this is ~5e-4 * colmax absolute worst case —
# tools/tpu_check.py pins a constant-sign M=131k case on hardware.
_NDIG = 4

# Wide-RHS kernels hold their whole output block (and digit inputs) in VMEM
# per grid tile; very wide calls (e.g. the k=256 deflation power iteration)
# overflow the ~16 MB scoped-VMEM budget.  Wrappers split the column axis
# into chunks of at most these widths and concatenate — per-chunk passes
# re-stream HBM, which only matters for setup-time factorizations.
_BMAX_AXM = 32        # axm_i8: 2 int32 out blocks x NDIG digits
_BMAX_AXM_A = 64      # axm_i8a: 1 out block
_BMAX_ATXM = 96
_BMAX_BF16 = 64


def _chunk_cols(call, B: int, bmax: int, concat_axis: int, *tree_args):
    """Apply `call(lo, hi)` over column chunks and concatenate outputs."""
    if B <= bmax:
        return call(0, B)
    outs = [call(lo, min(lo + bmax, B)) for lo in range(0, B, bmax)]
    return jax.tree_util.tree_map(
        lambda *xs: jnp.concatenate(xs, axis=concat_axis), *outs)


def _quant_digits(x: jax.Array, axis: int):
    """f32 -> (int8 digits concat along ``axis``, per-column base scales)."""
    x = x.astype(jnp.float32)
    red = tuple(i for i in range(x.ndim) if i != axis and x.shape[i] != 1)
    m = jnp.max(jnp.abs(x), axis=red, keepdims=True)
    s0 = jnp.where(m == 0, 1.0, m) / 127.0
    digs = []
    r = x
    s = s0
    for _ in range(_NDIG):
        d = jnp.round(r / s)
        digs.append(d.astype(jnp.int8))
        r = r - d * s
        s = s / 127.0
    return jnp.concatenate(digs, axis=axis), s0


def _fold_digits(z_i32: jax.Array, s0: jax.Array, B: int):
    """int32 [..., NDIG*B] digit products + scales [..., B] -> f32 [..., B]."""
    zf = z_i32.astype(jnp.float32)
    out = zf[..., :B] * s0
    scale = s0
    for d in range(1, _NDIG):
        scale = scale / 127.0
        out = out + zf[..., d * B:(d + 1) * B] * scale
    return out


def _fold_digits_zt(zt_i32, s0, B: int):
    """int32[NDIG*B, 4, Nb] digit rows + scales [B] -> f32[4, Nb, B]."""
    D = _NDIG * B
    zf = zt_i32.astype(jnp.float32).reshape(_NDIG, B, *zt_i32.shape[1:])
    scales = s0[None, :] * (127.0 ** -jnp.arange(_NDIG, dtype=jnp.float32)[:, None])
    return jnp.einsum("dbkn,db->knb", zf, scales)


def _axm_i8_kernel(g_ref, w8t_ref, u8t_ref, za_ref, zb_ref):
    im = pl.program_id(1)

    @pl.when(im == 0)
    def _():
        za_ref[...] = jnp.zeros(za_ref.shape, za_ref.dtype)
        zb_ref[...] = jnp.zeros(zb_ref.shape, zb_ref.dtype)

    g = g_ref[...]
    w8t = w8t_ref[...]  # [NDIG*B, TM] int8 (digits of W^T)
    u8t = u8t_ref[...]
    for k in range(4):
        a_sw, b_sw = _swar(g, k)
        a8 = pltpu.bitcast(a_sw, jnp.int8)
        b8 = pltpu.bitcast(b_sw, jnp.int8)
        # transposed-output orientation: the decoded plane is the wide
        # operand of the dot (contraction over its lane axis) — measured
        # 510 vs 327 GB/s against the [4tnw, tm] @ [tm, D] form
        za_ref[:, k] += jax.lax.dot_general(
            w8t, a8, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32)
        zb_ref[:, k] += jax.lax.dot_general(
            u8t, b8, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32)


@functools.partial(jax.jit, static_argnames=("tnw", "tm"))
def axm_i8_pallas(words, W, U, tnw=0, tm=0):
    """int8-MXU block matvec: z[4, Nb, B] = A_a @ W - A_b @ U."""
    Nw, M = words.shape
    B = W.shape[1]
    tnw = tnw or _pick_tnw(Nw, 256)
    # wide lane tiles amortize the zT dot's weight loads (776 GB/s at
    # tm=2048 vs 533 at 512 for the a-only kernel)
    tm = tm or _pick_tm(M, 2048)
    assert Nw % tnw == 0 and M % tm == 0, (Nw, M, tnw, tm)
    if B > _BMAX_AXM:
        return _chunk_cols(
            lambda lo, hi: axm_i8_pallas(words, W[:, lo:hi], U[:, lo:hi],
                                         tnw=tnw, tm=tm),
            B, _BMAX_AXM, 2)
    w8t, ws = _quant_digits(jnp.transpose(W.astype(jnp.float32)), 0)
    u8t, us = _quant_digits(jnp.transpose(U.astype(jnp.float32)), 0)
    grid = (Nw // tnw, M // tm)
    D = _NDIG * B
    za, zb = pl.pallas_call(
        _axm_i8_kernel, grid=grid,
        in_specs=[
            pl.BlockSpec((tnw, tm), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, tm), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, tm), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((D, 4, 4 * tnw), lambda i, j: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, 4, 4 * tnw), lambda i, j: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((D, 4, 4 * Nw), jnp.int32),
            jax.ShapeDtypeStruct((D, 4, 4 * Nw), jnp.int32),
        ],
        interpret=_interpret(),
    )(words, w8t, u8t)
    return (_fold_digits_zt(za, ws[:, 0], B)
            - _fold_digits_zt(zb, us[:, 0], B))


def _axm_i8s_kernel(g_ref, w8t_ref, mu8t_ref, za_ref):
    im = pl.program_id(1)

    @pl.when(im == 0)
    def _():
        za_ref[...] = jnp.zeros(za_ref.shape, za_ref.dtype)

    g = g_ref[...]
    w8t = w8t_ref[...]    # [NDIG*B, TM] int8: digits of W^T
    mu8t = mu8t_ref[...]  # digits of -U^T at the SAME per-column scales
    for k in range(4):
        a_sw, b_sw = _swar(g, k)
        a8 = pltpu.bitcast(a_sw, jnp.int8)
        b8 = pltpu.bitcast(b_sw, jnp.int8)
        # (W, -U) share one quantization scale (|U| <= 2|W| costs <= 1 of
        # the 28 digit bits), so both dots accumulate into ONE int32 block
        # and fold once: the b-side rides the a-side's accumulator instead
        # of doubling the output-block traffic of _axm_i8_kernel.
        za_ref[:, k] += jax.lax.dot_general(
            w8t, a8, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32)
        za_ref[:, k] += jax.lax.dot_general(
            mu8t, b8, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32)


def _quant_digits_pair(W, U):
    """Digits of W^T and -U^T under ONE shared per-column scale."""
    S = jnp.stack([W.astype(jnp.float32), -U.astype(jnp.float32)], axis=1)
    # [M, 2, B] -> transpose to [B, M, 2] won't keep digit layout; quantize
    # the flattened [B, 2M] view so _quant_digits' per-column max spans
    # both W and U entries, then split the column halves back out.
    M, _, B = S.shape
    s8, ss = _quant_digits(jnp.transpose(S.reshape(2 * M, B)), 0)
    D = s8.shape[0]
    s2 = s8.reshape(D, M, 2)
    return s2[:, :, 0], s2[:, :, 1], ss


@functools.partial(jax.jit, static_argnames=("tnw", "tm"))
def axm_i8s_pallas(words, W, U, tnw=0, tm=0):
    """Shared-accumulator variant of axm_i8_pallas: z = A_a W - A_b U with
    (W, -U) digit-quantized at one scale so the two MXU dots share one
    int32 output block and one fold (reference fused value*indicator pass,
    data.cpp:728-801)."""
    Nw, M = words.shape
    B = W.shape[1]
    tnw = tnw or _pick_tnw(Nw, 256)
    tm = tm or _pick_tm(M, 2048)
    assert Nw % tnw == 0 and M % tm == 0, (Nw, M, tnw, tm)
    if B > _BMAX_AXM:
        return _chunk_cols(
            lambda lo, hi: axm_i8s_pallas(words, W[:, lo:hi], U[:, lo:hi],
                                          tnw=tnw, tm=tm),
            B, _BMAX_AXM, 2)
    w8t, mu8t, ws = _quant_digits_pair(W, U)
    grid = (Nw // tnw, M // tm)
    D = _NDIG * B
    za = pl.pallas_call(
        _axm_i8s_kernel, grid=grid,
        in_specs=[
            pl.BlockSpec((tnw, tm), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, tm), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, tm), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((D, 4, 4 * tnw), lambda i, j: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((D, 4, 4 * Nw), jnp.int32),
        interpret=_interpret(),
    )(words, w8t, mu8t)
    return _fold_digits_zt(za, ws[:, 0], B)


def _atxm_i8_kernel(g_ref, vt_ref, av_ref, bv_ref):
    jn = pl.program_id(1)

    @pl.when(jn == 0)
    def _():
        av_ref[...] = jnp.zeros(av_ref.shape, av_ref.dtype)
        bv_ref[...] = jnp.zeros(bv_ref.shape, bv_ref.dtype)

    g = g_ref[...]
    av = jnp.zeros(av_ref.shape, jnp.int32)
    bv = jnp.zeros(bv_ref.shape, jnp.int32)
    for k in range(4):
        a_sw, b_sw = _swar(g, k)
        a8 = pltpu.bitcast(a_sw, jnp.int8)
        b8 = pltpu.bitcast(b_sw, jnp.int8)
        vt = vt_ref[k]  # [NDIG*B, 4*TNW] int8 (digits of V^T)
        # standard-form dot (contraction = lhs last x rhs FIRST dim): the
        # decoded plane streams through the MXU as the tm-wide RHS.
        # Measured 3x faster than the dim0-contraction orientation, which
        # makes Mosaic transpose the big operand (533 vs 181 GB/s packed,
        # docs/ROOFLINE.md round-2 study).
        av += jax.lax.dot_general(
            vt, a8, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
        bv += jax.lax.dot_general(
            vt, b8, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
    av_ref[...] += av
    bv_ref[...] += bv


def _quant_digits_t(V):
    """Digits of V^T: f32[4, Nb, B] -> (int8[4, NDIG*B, Nb], scales [B]).

    The transpose happens in f32 BEFORE quantization (an int8 XLA
    transpose produced wrong values through the axon backend in round-2
    testing; f32 transposes are exercised everywhere and trusted)."""
    vt = jnp.transpose(V.astype(jnp.float32), (0, 2, 1))  # [4, B, Nb]
    v8, vs = _quant_digits(vt, 1)                          # [4, NDIG*B, Nb]
    return v8, vs[0, :, 0]


def _fold_digits_t(av_i32, s0, B: int):
    """int32[NDIG*B, M] digit rows + scales [B] -> f32[M, B] (fold in the
    [D, M] orientation, then one f32 transpose)."""
    zf = av_i32.astype(jnp.float32)
    out = zf[:B] * s0[:, None]
    scale = s0
    for d in range(1, _NDIG):
        scale = scale / 127.0
        out = out + zf[d * B:(d + 1) * B] * scale[:, None]
    return out.T


@functools.partial(jax.jit, static_argnames=("tnw", "tm"))
def atxm_i8_pallas(words, V, tnw=0, tm=0):
    """int8-MXU block transposed matvec: (av[M, B], bv[M, B])."""
    Nw, M = words.shape
    B = V.shape[2]
    tnw = tnw or _pick_tnw(Nw, 256)
    # wide lane tiles feed the streaming-RHS orientation (tile sweep:
    # tm=2048 610 GB/s vs 470 at 512); scoped VMEM caps the width as D
    # grows (measured: D=64 with tm=2048 overflows the 16 MB budget in the
    # two-output kernel; D=8 uses ~5 MB)
    D_ = _NDIG * B
    tm = tm or _pick_tm(M, 2048 if D_ <= 16 else (1024 if D_ <= 96 else 512))
    assert Nw % tnw == 0 and M % tm == 0, (Nw, M, tnw, tm)
    if B > _BMAX_ATXM:
        return _chunk_cols(
            lambda lo, hi: atxm_i8_pallas(words, V[:, :, lo:hi],
                                          tnw=tnw, tm=tm),
            B, _BMAX_ATXM, 1)
    v8, s0 = _quant_digits_t(V)
    grid = (M // tm, Nw // tnw)
    D = _NDIG * B
    av, bv = pl.pallas_call(
        _atxm_i8_kernel, grid=grid,
        in_specs=[
            pl.BlockSpec((tnw, tm), lambda j, i: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, D, 4 * tnw), lambda j, i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((D, tm), lambda j, i: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, tm), lambda j, i: (0, j), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((D, M), jnp.int32),
            jax.ShapeDtypeStruct((D, M), jnp.int32),
        ],
        interpret=_interpret(),
    )(words, v8)
    return _fold_digits_t(av, s0, B), _fold_digits_t(bv, s0, B)


# --------------------------------------------------------------------------
# No-missing fast path: a-only kernels
# --------------------------------------------------------------------------
#
# Imputed datasets (the common production case) have NO missing genotypes:
# the non-missing indicator b is identically 1 over real (n, m) pairs, so
# its contractions collapse to scalars computed outside the kernel
# (sum_m u_m for ax; sum_n v_n per column for atx) and the kernels do half
# the work.  Containers detect completeness at load (data.py) and route here.


def _axm_i8a_wide_kernel(g_ref, w8_ref, za_ref):
    # classic orientation for wide blocks: at D >= ~128 output digit rows
    # the zT form's lhs spans many MXU weight tiles and loses (271 vs
    # 326 GB/s measured at B=32); the [4tnw, tm] @ [tm, D] form wins there
    im = pl.program_id(1)

    @pl.when(im == 0)
    def _():
        za_ref[...] = jnp.zeros(za_ref.shape, za_ref.dtype)

    g = g_ref[...]
    w8 = w8_ref[...]
    for k in range(4):
        a_sw, _ = _swar(g, k)
        a8 = pltpu.bitcast(a_sw, jnp.int8)
        za_ref[k] += jax.lax.dot_general(
            a8, w8, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)


# zT-orientation threshold: below this D the transposed-output form is
# faster (B=2: 474 vs 327 GB/s), above it the classic form wins
_D_ZT_MAX = 64


def _axm_i8a_kernel(g_ref, w8t_ref, za_ref):
    im = pl.program_id(1)

    @pl.when(im == 0)
    def _():
        za_ref[...] = jnp.zeros(za_ref.shape, za_ref.dtype)

    g = g_ref[...]
    w8t = w8t_ref[...]  # [NDIG*B, TM] int8 (digits of W^T)
    for k in range(4):
        a_sw, _ = _swar(g, k)
        a8 = pltpu.bitcast(a_sw, jnp.int8)
        # transposed-output orientation (see _axm_i8_kernel): 510 vs 327 GB/s
        za_ref[:, k] += jax.lax.dot_general(
            w8t, a8, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32)


@functools.partial(jax.jit, static_argnames=("tnw", "tm"))
def axm_i8a_pallas(words, W, tnw=0, tm=0):
    """a-only int8 block matvec: A_a @ W -> [4, Nb, B] (caller subtracts the
    scalar b-contraction)."""
    Nw, M = words.shape
    B = W.shape[1]
    tnw = tnw or _pick_tnw(Nw, 256)
    # zT path (D <= _D_ZT_MAX): round-4 sweep: tm=4096 651 GB/s vs 605 at
    # 2048 (and 533 at 512); classic wide path keeps tm <= 1024
    tm = tm or _pick_tm(M, 4096 if _NDIG * B <= _D_ZT_MAX else 1024)
    assert Nw % tnw == 0 and M % tm == 0, (Nw, M, tnw, tm)
    if B > _BMAX_AXM_A:
        return _chunk_cols(
            lambda lo, hi: axm_i8a_pallas(words, W[:, lo:hi], tnw=tnw, tm=tm),
            B, _BMAX_AXM_A, 2)
    grid = (Nw // tnw, M // tm)
    D = _NDIG * B
    if D > _D_ZT_MAX:
        w8, ws = _quant_digits(W, 1)
        za = pl.pallas_call(
            _axm_i8a_wide_kernel, grid=grid,
            in_specs=[
                pl.BlockSpec((tnw, tm), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tm, D), lambda i, j: (j, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((4, 4 * tnw, D), lambda i, j: (0, i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((4, 4 * Nw, D), jnp.int32),
            interpret=_interpret(),
        )(words, w8)
        return _fold_digits(za, ws[0][None, None, :], B)
    w8t, ws = _quant_digits(jnp.transpose(W.astype(jnp.float32)), 0)
    za = pl.pallas_call(
        _axm_i8a_kernel, grid=grid,
        in_specs=[
            pl.BlockSpec((tnw, tm), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, tm), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((D, 4, 4 * tnw), lambda i, j: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((D, 4, 4 * Nw), jnp.int32),
        interpret=_interpret(),
    )(words, w8t)
    return _fold_digits_zt(za, ws[:, 0], B)


# --------------------------------------------------------------------------
# Fused Gram pass: A^T (na ∘ (A W)) in ONE stream over the packed words
# --------------------------------------------------------------------------
#
# The LMMSE/Onsager block-CG spends its packed-matrix traffic on the Gram
# product A^T(A P) (reference lmmse_mult, vamp.cpp:1074-1118 = Ax + ATx
# back-to-back).  Because the Gram operator is additive over sample bands,
#
#     A^T diag(na) A = sum_i  A_i^T diag(na_i) A_i        (A_i = band rows)
#
# the two contractions can share one HBM read per packed block if the band
# stays resident: per band row i, the forward dots accumulate z_i tile by
# tile while the packed blocks are COPIED into a VMEM band cache; at the
# next band row, z_{i-1} is folded/masked/re-quantized and the transpose
# dots consume the CACHED previous band — every packed word is fetched
# from HBM exactly once per Gram call, versus twice for atxm(axm(·)).
# The band cache costs tnw*M*4 bytes of VMEM, so this path is for a
# single shard's marker range (fine: the marker-sharded multi-chip path
# needs a global-z psum between the contractions anyway and keeps the
# two-pass form; each chip's local M makes the cache small).
#
# z is re-quantized per BAND (4*tnw rows), a strictly tighter dynamic
# range than the global per-column quantization of the two-pass path —
# the fused product is as accurate or better (~1e-7 hardware-exact).


def _gram_i8a_kernel(nI, B, tm, g_ref, w8t_ref, ws_ref, cu_ref, na_ref,
                     av_ref, sv_ref, bandg, z32, ztf, z8, zs):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when((i == 0) & (j == 0))
    def _():
        sv_ref[...] = jnp.zeros(sv_ref.shape, sv_ref.dtype)

    @pl.when(i == 0)
    def _():
        av_ref[...] = jnp.zeros(av_ref.shape, av_ref.dtype)

    # ---- band boundary: fold band i-1, mask, colsum, re-quantize ----
    @pl.when((j == 0) & (i > 0))
    def _():
        ws = ws_ref[0]                      # [B] digit base scales of W^T
        cu = cu_ref[0]                      # [B] colsum(U) correction
        na = na_ref[...]                    # [4, B, 4*tnw] per-col NA mask
        for k in range(4):
            zf = z32[k].astype(jnp.float32)              # [Dw, 4*tnw]
            acc = zf[:B] * ws[:, None]
            s = ws
            for d in range(1, _NDIG):
                s = s / 127.0
                acc = acc + zf[d * B:(d + 1) * B] * s[:, None]
            acc = (acc - cu[:, None]) * na[k]
            ztf[k] = acc
            sv_ref[...] += jnp.sum(acc, axis=1)[None, :]
        zt = ztf[...]                                    # [4, B, 4*tnw]
        m = jnp.max(jnp.abs(zt), axis=(0, 2))            # [B]
        s0 = jnp.where(m == 0.0, 1.0, m) / 127.0
        zs[...] = s0[None, :]
        r = zt
        s = s0
        for d in range(_NDIG):
            dig = jnp.round(r / s[None, :, None])
            z8[:, d * B:(d + 1) * B, :] = dig.astype(jnp.int8)
            r = r - dig * s[None, :, None]
            s = s / 127.0

    @pl.when(j == 0)
    def _():
        z32[...] = jnp.zeros(z32.shape, z32.dtype)

    # ---- transpose side for band i-1: cached words, zero HBM traffic ----
    @pl.when(i > 0)
    def _():
        gb = bandg[:, pl.dslice(j * tm, tm)]
        s0 = zs[0]                                       # [B]
        out32 = None
        for k in range(4):
            a_sw, _ = _swar(gb, k)
            a8 = pltpu.bitcast(a_sw, jnp.int8)
            d = jax.lax.dot_general(
                z8[k], a8, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            out32 = d if out32 is None else out32 + d
        zf = out32.astype(jnp.float32)                   # [Dz, tm]
        acc = zf[:B] * s0[:, None]
        s = s0
        for d in range(1, _NDIG):
            s = s / 127.0
            acc = acc + zf[d * B:(d + 1) * B] * s[:, None]
        av_ref[...] += acc

    # ---- forward side for band i: dots + copy into the band cache ----
    @pl.when(i < nI)
    def _():
        g = g_ref[...]
        bandg[:, pl.dslice(j * tm, tm)] = g
        w8t = w8t_ref[...]
        for k in range(4):
            a_sw, _ = _swar(g, k)
            a8 = pltpu.bitcast(a_sw, jnp.int8)
            z32[k] += jax.lax.dot_general(
                w8t, a8, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)


# band-cache VMEM ceiling for the fused Gram pass; beyond it callers use
# the two-pass composition (v5e has 128 MB VMEM; leave room for blocks,
# double-buffering and the scoped default)
_GRAM_BAND_MAX_BYTES = 80 * 1024 * 1024


def gram_band_bytes(Nw: int, M: int) -> int:
    """VMEM band-cache cost of the fused Gram pass for this shape."""
    tnw = _pick_tnw(Nw, 64)
    return 4 * tnw * M


@functools.partial(jax.jit, static_argnames=("tnw", "tm"))
def gram_i8a_pallas(words, W, na_planar, colsum_u, tnw=0, tm=0):
    """Fused a-only Gram: (av[M, B], sv[B]) with

        z  = na ∘ (A_a W - colsum_u)      (per-band, never materialized)
        av = A_a^T z,   sv = Σ_n z

    in one HBM stream over ``words``.  Callers apply the mave/msig/scale
    corrections exactly as for atxm_i8a_pallas ∘ axm_i8a_pallas.

    ``na_planar`` is [4, Nb] (one mask for all columns) or [4, Nb, B]
    (per-column masks — the multi-trait case)."""
    Nw, M = words.shape
    B = W.shape[1]
    tnw = tnw or _pick_tnw(Nw, 64)
    tm = tm or _pick_tm(M, 2048)
    assert Nw % tnw == 0 and M % tm == 0, (Nw, M, tnw, tm)
    if B > _BMAX_AXM_A:
        def call(lo, hi):
            na_c = na_planar if na_planar.ndim == 2 else na_planar[:, :, lo:hi]
            av, sv = gram_i8a_pallas(words, W[:, lo:hi], na_c,
                                     colsum_u[lo:hi], tnw=tnw, tm=tm)
            return av, sv
        return _chunk_cols(call, B, _BMAX_AXM_A, -1)
    if na_planar.ndim == 2:
        na_cols = jnp.broadcast_to(
            na_planar.astype(jnp.float32)[:, None, :], (4, B, 4 * Nw))
    else:
        na_cols = jnp.transpose(na_planar.astype(jnp.float32), (0, 2, 1))
    w8t, ws = _quant_digits(jnp.transpose(W.astype(jnp.float32)), 0)
    nI = Nw // tnw
    D = _NDIG * B
    grid = (nI + 1, M // tm)
    av, sv = pl.pallas_call(
        functools.partial(_gram_i8a_kernel, nI, B, tm),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tnw, tm), lambda i, j: (jnp.minimum(i, nI - 1), j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, tm), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, B, 4 * tnw),
                         lambda i, j: (0, 0, jnp.maximum(i - 1, 0)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((B, tm), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, M), jnp.float32),
            jax.ShapeDtypeStruct((1, B), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tnw, M), jnp.uint32),        # band cache
            pltpu.VMEM((4, D, 4 * tnw), jnp.int32),  # z digit products
            pltpu.VMEM((4, B, 4 * tnw), jnp.float32),  # folded z planes
            pltpu.VMEM((4, D, 4 * tnw), jnp.int8),   # z digits (vt layout)
            pltpu.VMEM((1, B), jnp.float32),         # z digit base scales
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(int(4 * tnw * M * 1.15) + 24 * 1024 * 1024,
                                 120 * 1024 * 1024)),
        interpret=_interpret(),
    )(words, w8t,
      jnp.transpose(ws.astype(jnp.float32)),
      colsum_u.astype(jnp.float32)[None, :],
      na_cols)
    return jnp.transpose(av), sv[0]


def _gram_i8_kernel(nI, B, tm, g_ref, w8t_ref, mu8t_ref, ws_ref, na_ref,
                    av_ref, bv_ref, bandg, z32, ztf, z8, zs):
    # general-genotype fused Gram: forward z = A_a W - A_b U (shared-scale
    # digit pair, see _axm_i8s_kernel), transpose av = A_a^T z, bv = A_b^T z
    # — same band-cache structure as _gram_i8a_kernel.
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        av_ref[...] = jnp.zeros(av_ref.shape, av_ref.dtype)
        bv_ref[...] = jnp.zeros(bv_ref.shape, bv_ref.dtype)

    # ---- band boundary: fold band i-1, mask, re-quantize ----
    @pl.when((j == 0) & (i > 0))
    def _():
        ws = ws_ref[0]                      # [B] shared digit base scales
        na = na_ref[...]                    # [4, B, 4*tnw] per-col NA mask
        for k in range(4):
            zf = z32[k].astype(jnp.float32)              # [D, 4*tnw]
            acc = zf[:B] * ws[:, None]
            s = ws
            for d in range(1, _NDIG):
                s = s / 127.0
                acc = acc + zf[d * B:(d + 1) * B] * s[:, None]
            ztf[k] = acc * na[k]
        zt = ztf[...]                                    # [4, B, 4*tnw]
        m = jnp.max(jnp.abs(zt), axis=(0, 2))            # [B]
        s0 = jnp.where(m == 0.0, 1.0, m) / 127.0
        zs[...] = s0[None, :]
        r = zt
        s = s0
        for d in range(_NDIG):
            dig = jnp.round(r / s[None, :, None])
            z8[:, d * B:(d + 1) * B, :] = dig.astype(jnp.int8)
            r = r - dig * s[None, :, None]
            s = s / 127.0

    @pl.when(j == 0)
    def _():
        z32[...] = jnp.zeros(z32.shape, z32.dtype)

    # ---- transpose side for band i-1: cached words, zero HBM traffic ----
    @pl.when(i > 0)
    def _():
        gb = bandg[:, pl.dslice(j * tm, tm)]
        s0 = zs[0]                                       # [B]
        a32 = None
        b32 = None
        for k in range(4):
            a_sw, b_sw = _swar(gb, k)
            a8 = pltpu.bitcast(a_sw, jnp.int8)
            b8 = pltpu.bitcast(b_sw, jnp.int8)
            da = jax.lax.dot_general(
                z8[k], a8, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            db = jax.lax.dot_general(
                z8[k], b8, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            a32 = da if a32 is None else a32 + da
            b32 = db if b32 is None else b32 + db

        def fold(x32):
            xf = x32.astype(jnp.float32)                 # [D, tm]
            acc = xf[:B] * s0[:, None]
            s = s0
            for d in range(1, _NDIG):
                s = s / 127.0
                acc = acc + xf[d * B:(d + 1) * B] * s[:, None]
            return acc

        av_ref[...] += fold(a32)
        bv_ref[...] += fold(b32)

    # ---- forward side for band i: dots + copy into the band cache ----
    @pl.when(i < nI)
    def _():
        g = g_ref[...]
        bandg[:, pl.dslice(j * tm, tm)] = g
        w8t = w8t_ref[...]
        mu8t = mu8t_ref[...]
        for k in range(4):
            a_sw, b_sw = _swar(g, k)
            a8 = pltpu.bitcast(a_sw, jnp.int8)
            b8 = pltpu.bitcast(b_sw, jnp.int8)
            z32[k] += jax.lax.dot_general(
                w8t, a8, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)
            z32[k] += jax.lax.dot_general(
                mu8t, b8, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)


@functools.partial(jax.jit, static_argnames=("tnw", "tm"))
def gram_i8_pallas(words, W, U, na_planar, tnw=0, tm=0):
    """General fused Gram: (av[M, B], bv[M, B]) with

        z  = na ∘ (A_a W - A_b U)         (per-band, never materialized)
        av = A_a^T z,   bv = A_b^T z

    in one HBM stream over ``words``.  Callers apply the mave/msig/scale
    corrections exactly as for atxm_i8_pallas ∘ axm_i8_pallas.

    ``na_planar`` is [4, Nb] (one mask for all columns) or [4, Nb, B]
    (per-column masks — the multi-trait case)."""
    Nw, M = words.shape
    B = W.shape[1]
    tnw = tnw or _pick_tnw(Nw, 64)
    tm = tm or _pick_tm(M, 2048)
    assert Nw % tnw == 0 and M % tm == 0, (Nw, M, tnw, tm)
    if B > _BMAX_AXM:
        def call(lo, hi):
            na_c = na_planar if na_planar.ndim == 2 else na_planar[:, :, lo:hi]
            return gram_i8_pallas(words, W[:, lo:hi], U[:, lo:hi],
                                  na_c, tnw=tnw, tm=tm)
        return _chunk_cols(call, B, _BMAX_AXM, -1)
    if na_planar.ndim == 2:
        na_cols = jnp.broadcast_to(
            na_planar.astype(jnp.float32)[:, None, :], (4, B, 4 * Nw))
    else:
        na_cols = jnp.transpose(na_planar.astype(jnp.float32), (0, 2, 1))
    w8t, mu8t, ws = _quant_digits_pair(W, U)
    nI = Nw // tnw
    D = _NDIG * B
    grid = (nI + 1, M // tm)
    av, bv = pl.pallas_call(
        functools.partial(_gram_i8_kernel, nI, B, tm),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tnw, tm), lambda i, j: (jnp.minimum(i, nI - 1), j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, tm), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, tm), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, B, 4 * tnw),
                         lambda i, j: (0, 0, jnp.maximum(i - 1, 0)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((B, tm), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, tm), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, M), jnp.float32),
            jax.ShapeDtypeStruct((B, M), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tnw, M), jnp.uint32),        # band cache
            pltpu.VMEM((4, D, 4 * tnw), jnp.int32),  # z digit products
            pltpu.VMEM((4, B, 4 * tnw), jnp.float32),  # folded z planes
            pltpu.VMEM((4, D, 4 * tnw), jnp.int8),   # z digits (vt layout)
            pltpu.VMEM((1, B), jnp.float32),         # z digit base scales
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(int(4 * tnw * M * 1.15) + 24 * 1024 * 1024,
                                 120 * 1024 * 1024)),
        interpret=_interpret(),
    )(words, w8t, mu8t,
      jnp.transpose(ws.astype(jnp.float32)),
      na_cols)
    return jnp.transpose(av), jnp.transpose(bv)


def _gram_aat_i8_kernel(nJ, B, tnw, g_ref, vt_ref, vs_ref, mave_ref,
                        msig2_ref, z_ref, stripec, t32a, t32b, w8, mu8, wsc):
    # fused dual Gram A (A^T v): the marker column-stripe analog of
    # _gram_i8_kernel.  Grid (nJ+1, nI), i fastest: stripe j's transpose
    # dots accumulate t32 over bands while the stripe blocks are cached;
    # at the next stripe the folded/corrected/requantized t_{j-1} drives
    # the forward dots against the CACHED stripe — every packed word is
    # read from HBM once per A A^T v product.  The z output keeps a
    # constant index map (VMEM-resident, written back once).
    j = pl.program_id(0)
    i = pl.program_id(1)
    nI = pl.num_programs(1)

    @pl.when((j == 0) & (i == 0))
    def _():
        z_ref[...] = jnp.zeros(z_ref.shape, z_ref.dtype)

    # ---- stripe boundary: fold t_{j-1}, apply corrections, requantize ----
    @pl.when((i == 0) & (j > 0))
    def _():
        vs = vs_ref[0]                          # [B] v digit base scales
        mave = mave_ref[0]                      # [tm] tile j-1 marker means
        msig2 = msig2_ref[0]                    # [tm] tile j-1 msig^2

        def fold(x32):
            xf = x32.astype(jnp.float32)        # [D, tm]
            acc = xf[:B] * vs[:, None]
            s = vs
            for d in range(1, _NDIG):
                s = s / 127.0
                acc = acc + xf[d * B:(d + 1) * B] * s[:, None]
            return acc

        av = fold(t32a[...])
        bv = fold(t32b[...])
        W = msig2[None, :] * (av - mave[None, :] * bv)      # [B, tm]
        mU = -mave[None, :] * W
        # shared-scale digit pair, quantized rank-2 (a rank-3 concat here
        # crashes Mosaic's VectorLayoutInferer on v5e — layout.h join
        # check failure; mathematically identical either way)
        m = jnp.maximum(jnp.max(jnp.abs(W), axis=1),
                        jnp.max(jnp.abs(mU), axis=1))        # [B]
        s0 = jnp.where(m == 0.0, 1.0, m) / 127.0
        wsc[...] = s0[None, :]
        rw, ru = W, mU
        s = s0
        for d in range(_NDIG):
            dw = jnp.round(rw / s[:, None])
            du = jnp.round(ru / s[:, None])
            w8[d * B:(d + 1) * B, :] = dw.astype(jnp.int8)
            mu8[d * B:(d + 1) * B, :] = du.astype(jnp.int8)
            rw = rw - dw * s[:, None]
            ru = ru - du * s[:, None]
            s = s / 127.0

    @pl.when(i == 0)
    def _():
        t32a[...] = jnp.zeros(t32a.shape, t32a.dtype)
        t32b[...] = jnp.zeros(t32b.shape, t32b.dtype)

    # ---- forward side for stripe j-1: cached words, zero HBM traffic ----
    @pl.when(j > 0)
    def _():
        gb = stripec[pl.dslice(i * tnw, tnw), :]
        s0 = wsc[0]                                          # [B]
        for k in range(4):
            a_sw, b_sw = _swar(gb, k)
            a8 = pltpu.bitcast(a_sw, jnp.int8)
            b8 = pltpu.bitcast(b_sw, jnp.int8)
            d32 = jax.lax.dot_general(
                w8[...], a8, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)
            d32 = d32 + jax.lax.dot_general(
                mu8[...], b8, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)
            zf = d32.astype(jnp.float32)                     # [D, 4tnw]
            acc = zf[:B] * s0[:, None]
            s = s0
            for d in range(1, _NDIG):
                s = s / 127.0
                acc = acc + zf[d * B:(d + 1) * B] * s[:, None]
            z_ref[k, :, pl.dslice(i * 4 * tnw, 4 * tnw)] += acc

    # ---- transpose side for stripe j: dots + copy into the stripe cache --
    @pl.when(j < nJ)
    def _():
        g = g_ref[...]
        stripec[pl.dslice(i * tnw, tnw), :] = g
        for k in range(4):
            a_sw, b_sw = _swar(g, k)
            a8 = pltpu.bitcast(a_sw, jnp.int8)
            b8 = pltpu.bitcast(b_sw, jnp.int8)
            vt = vt_ref[k]                                   # [D, 4tnw]
            t32a[...] += jax.lax.dot_general(
                vt, a8, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            t32b[...] += jax.lax.dot_general(
                vt, b8, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)


def _gram_aat_i8a_kernel(nJ, B, tnw, g_ref, vt_ref, vs_ref, sv_ref, mave_ref,
                         msig2_ref, z_ref, us_ref, stripec, t32a, w8, wsc):
    # a-only variant of _gram_aat_i8_kernel (complete genotypes): the b
    # contractions collapse to scalars — A_b^T v = sv per column (wrapper
    # input) and A_b (mave*W) = usum per column (tiny second output) — so
    # each block pays ONE decode+bitcast and one dot per side.
    j = pl.program_id(0)
    i = pl.program_id(1)

    @pl.when((j == 0) & (i == 0))
    def _():
        z_ref[...] = jnp.zeros(z_ref.shape, z_ref.dtype)
        us_ref[...] = jnp.zeros(us_ref.shape, us_ref.dtype)

    # ---- stripe boundary: fold t_{j-1}, apply corrections, requantize ----
    @pl.when((i == 0) & (j > 0))
    def _():
        vs = vs_ref[0]                          # [B] v digit base scales
        sv = sv_ref[0]                          # [B] colsum(v) (b-side)
        mave = mave_ref[0]                      # [tm] tile j-1 marker means
        msig2 = msig2_ref[0]                    # [tm] tile j-1 msig^2
        xf = t32a[...].astype(jnp.float32)      # [D, tm]
        av = xf[:B] * vs[:, None]
        s = vs
        for d in range(1, _NDIG):
            s = s / 127.0
            av = av + xf[d * B:(d + 1) * B] * s[:, None]
        W = msig2[None, :] * (av - sv[:, None] * mave[None, :])   # [B, tm]
        us_ref[...] += jnp.sum(mave[None, :] * W, axis=1)[None, :]
        m = jnp.max(jnp.abs(W), axis=1)                           # [B]
        s0 = jnp.where(m == 0.0, 1.0, m) / 127.0
        wsc[...] = s0[None, :]
        r = W
        s = s0
        for d in range(_NDIG):
            dig = jnp.round(r / s[:, None])
            w8[d * B:(d + 1) * B, :] = dig.astype(jnp.int8)
            r = r - dig * s[:, None]
            s = s / 127.0

    @pl.when(i == 0)
    def _():
        t32a[...] = jnp.zeros(t32a.shape, t32a.dtype)

    # ---- forward side for stripe j-1: cached words, zero HBM traffic ----
    @pl.when(j > 0)
    def _():
        gb = stripec[pl.dslice(i * tnw, tnw), :]
        s0 = wsc[0]                                          # [B]
        for k in range(4):
            a_sw, _ = _swar(gb, k)
            a8 = pltpu.bitcast(a_sw, jnp.int8)
            d32 = jax.lax.dot_general(
                w8[...], a8, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)
            zf = d32.astype(jnp.float32)                     # [D, 4tnw]
            acc = zf[:B] * s0[:, None]
            s = s0
            for d in range(1, _NDIG):
                s = s / 127.0
                acc = acc + zf[d * B:(d + 1) * B] * s[:, None]
            z_ref[k, :, pl.dslice(i * 4 * tnw, 4 * tnw)] += acc

    # ---- transpose side for stripe j: dots + copy into the stripe cache --
    @pl.when(j < nJ)
    def _():
        g = g_ref[...]
        stripec[pl.dslice(i * tnw, tnw), :] = g
        for k in range(4):
            a_sw, _ = _swar(g, k)
            a8 = pltpu.bitcast(a_sw, jnp.int8)
            t32a[...] += jax.lax.dot_general(
                vt_ref[k], a8, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)


def gram_aat_stripe_bytes(Nw: int, M: int, tm: int = 0) -> int:
    """VMEM stripe-cache cost of the fused dual Gram for this shape."""
    tm = tm or _pick_tm(M, 2048)
    return 4 * Nw * tm


def _pick_aat_tm(Nw: int, M: int) -> int:
    """Widest marker tile whose stripe cache fits the VMEM budget."""
    for prefer in (2048, 1024, 512, 256, 128):
        tm = _pick_tm(M, prefer)
        if 4 * Nw * tm <= _GRAM_BAND_MAX_BYTES:
            return tm
    return _pick_tm(M, 128)


@functools.partial(jax.jit, static_argnames=("tnw", "tm"))
def gram_aat_i8a_pallas(words, V, mave, msig2, tnw=0, tm=0):
    """A-only fused dual Gram (complete genotypes):
    z[4, Nb, B] = A_a W - usum,  W = msig2 * (A_a^T V - sv * mave),
    sv = colsum(V), usum = colsum(mave * W) — one HBM stream, one decoded
    plane per side.  ``V`` must already be NA-masked."""
    Nw, M = words.shape
    B = V.shape[2]
    tnw = tnw or _pick_tnw(Nw, 64)
    tm = tm or _pick_aat_tm(Nw, M)
    assert Nw % tnw == 0 and M % tm == 0, (Nw, M, tnw, tm)
    if B > _BMAX_AXM:
        def call(lo, hi):
            return gram_aat_i8a_pallas(words, V[:, :, lo:hi], mave, msig2,
                                       tnw=tnw, tm=tm)
        return _chunk_cols(call, B, _BMAX_AXM, 2)
    v8, vs = _quant_digits_t(V)
    sv = jnp.sum(V.astype(jnp.float32), axis=(0, 1))
    nJ = M // tm
    D = _NDIG * B
    grid = (nJ + 1, Nw // tnw)
    z, us = pl.pallas_call(
        functools.partial(_gram_aat_i8a_kernel, nJ, B, tnw),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tnw, tm), lambda j, i: (i, jnp.minimum(j, nJ - 1)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, D, 4 * tnw), lambda j, i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B), lambda j, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B), lambda j, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm), lambda j, i: (0, jnp.maximum(j - 1, 0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm), lambda j, i: (0, jnp.maximum(j - 1, 0)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((4, B, 4 * Nw), lambda j, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B), lambda j, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((4, B, 4 * Nw), jnp.float32),
            jax.ShapeDtypeStruct((1, B), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((Nw, tm), jnp.uint32),        # stripe cache
            pltpu.VMEM((D, tm), jnp.int32),          # t digit products
            pltpu.VMEM((D, tm), jnp.int8),           # W digits
            pltpu.VMEM((1, B), jnp.float32),         # W digit base scales
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(int(4 * Nw * tm * 1.15) + 24 * 1024 * 1024,
                                 120 * 1024 * 1024)),
        interpret=_interpret(),
    )(words, v8,
      vs.astype(jnp.float32)[None, :],
      sv[None, :],
      mave.astype(jnp.float32)[None, :],
      msig2.astype(jnp.float32)[None, :])
    return (jnp.transpose(z, (0, 2, 1))
            - us[0][None, None, :])


@functools.partial(jax.jit, static_argnames=("tnw", "tm"))
def gram_aat_i8_pallas(words, V, mave, msig2, tnw=0, tm=0):
    """Fused dual Gram: z[4, Nb, B] = A (msig2 * (A_a^T V - mave * A_b^T V))
    expanded to the general-genotype forward (A_a W - A_b (mave*W)) in ONE
    HBM stream over ``words``.  ``V`` must already be NA-masked; callers
    apply na * scale^2 to the output (see GenoBed.fn_gram_aat)."""
    Nw, M = words.shape
    B = V.shape[2]
    tnw = tnw or _pick_tnw(Nw, 64)
    tm = tm or _pick_aat_tm(Nw, M)
    assert Nw % tnw == 0 and M % tm == 0, (Nw, M, tnw, tm)
    if B > _BMAX_AXM:
        def call(lo, hi):
            return gram_aat_i8_pallas(words, V[:, :, lo:hi], mave, msig2,
                                      tnw=tnw, tm=tm)
        return _chunk_cols(call, B, _BMAX_AXM, 2)
    v8, vs = _quant_digits_t(V)
    nJ = M // tm
    D = _NDIG * B
    grid = (nJ + 1, Nw // tnw)
    z = pl.pallas_call(
        functools.partial(_gram_aat_i8_kernel, nJ, B, tnw),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tnw, tm), lambda j, i: (i, jnp.minimum(j, nJ - 1)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, D, 4 * tnw), lambda j, i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B), lambda j, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm), lambda j, i: (0, jnp.maximum(j - 1, 0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm), lambda j, i: (0, jnp.maximum(j - 1, 0)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((4, B, 4 * Nw), lambda j, i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, B, 4 * Nw), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((Nw, tm), jnp.uint32),        # stripe cache
            pltpu.VMEM((D, tm), jnp.int32),          # t digit products (a)
            pltpu.VMEM((D, tm), jnp.int32),          # t digit products (b)
            pltpu.VMEM((D, tm), jnp.int8),           # W digits
            pltpu.VMEM((D, tm), jnp.int8),           # -mave*W digits
            pltpu.VMEM((1, B), jnp.float32),         # W digit base scales
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(int(4 * Nw * tm * 1.15) + 24 * 1024 * 1024,
                                 120 * 1024 * 1024)),
        interpret=_interpret(),
    )(words, v8,
      vs.astype(jnp.float32)[None, :],
      mave.astype(jnp.float32)[None, :],
      msig2.astype(jnp.float32)[None, :])
    return jnp.transpose(z, (0, 2, 1))


def _atx_a_kernel(g_ref, v_ref, av_ref):
    jn = pl.program_id(1)

    @pl.when(jn == 0)
    def _():
        av_ref[...] = jnp.zeros(av_ref.shape, av_ref.dtype)

    g = g_ref[...]
    av = jnp.zeros(av_ref.shape, jnp.float32)
    for k in range(4):
        a, _ = _decode_tile(g, k)
        vk = v_ref[k, :][:, None]
        av += jnp.sum(a * vk, axis=0, keepdims=True)
    av_ref[...] += av


@functools.partial(jax.jit, static_argnames=("tnw", "tm"))
def atx_a_pallas(words, v_planar, tnw=0, tm=0):
    """a-only VPU transposed matvec: av[M] (b-side = sum(v), by the caller)."""
    Nw, M = words.shape
    tnw = tnw or _pick_tnw(Nw, 256)
    tm = tm or _pick_tm(M)
    assert Nw % tnw == 0 and M % tm == 0, (Nw, M, tnw, tm)
    grid = (M // tm, Nw // tnw)
    av = pl.pallas_call(
        _atx_a_kernel, grid=grid,
        in_specs=[
            pl.BlockSpec((tnw, tm), lambda j, i: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, 4 * tnw), lambda j, i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tm), lambda j, i: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, M), jnp.float32),
        interpret=_interpret(),
    )(words, v_planar.astype(jnp.float32))
    return av[0]


def _atxm_i8a_kernel(g_ref, vt_ref, av_ref):
    jn = pl.program_id(1)

    @pl.when(jn == 0)
    def _():
        av_ref[...] = jnp.zeros(av_ref.shape, av_ref.dtype)

    g = g_ref[...]
    av = jnp.zeros(av_ref.shape, jnp.int32)
    for k in range(4):
        a_sw, _ = _swar(g, k)
        a8 = pltpu.bitcast(a_sw, jnp.int8)
        # standard-form dot: decoded plane as the streaming RHS (see
        # _atxm_i8_kernel note; 533 vs 181 GB/s measured)
        av += jax.lax.dot_general(
            vt_ref[k], a8, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
    av_ref[...] += av


@functools.partial(jax.jit, static_argnames=("tnw", "tm"))
def atxm_i8a_pallas(words, V, tnw=0, tm=0):
    """a-only int8 block transposed matvec: av[M, B]."""
    Nw, M = words.shape
    B = V.shape[2]
    # round-4 tile sweep (1.68 GB burst): tnw=128 / tm=8192 reaches
    # 710 GB/s packed vs 611-625 at the round-2 (256, 2048) choice —
    # wider lane tiles amortize the streaming-RHS weight loads further
    # and the shallower word-band keeps the block DMA pipelined.  VMEM
    # caps the width as D grows.
    D_ = _NDIG * B
    tnw = tnw or _pick_tnw(Nw, 128 if D_ <= 16 else 256)
    tm = tm or _pick_tm(M, 8192 if D_ <= 16 else (1024 if D_ <= 96 else 512))
    assert Nw % tnw == 0 and M % tm == 0, (Nw, M, tnw, tm)
    if B > _BMAX_ATXM:
        return _chunk_cols(
            lambda lo, hi: atxm_i8a_pallas(words, V[:, :, lo:hi],
                                           tnw=tnw, tm=tm),
            B, _BMAX_ATXM, 1)
    v8, s0 = _quant_digits_t(V)
    grid = (M // tm, Nw // tnw)
    D = _NDIG * B
    av = pl.pallas_call(
        _atxm_i8a_kernel, grid=grid,
        in_specs=[
            pl.BlockSpec((tnw, tm), lambda j, i: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, D, 4 * tnw), lambda j, i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((D, tm), lambda j, i: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((D, M), jnp.int32),
        interpret=_interpret(),
    )(words, v8)
    return _fold_digits_t(av, s0, B)
