"""Data-layer tests: decode LUT semantics, stats, matvecs vs dense oracle.

Covers the reference's C1 (LUT decode), C3 (phenotype standardizer),
C6 (marker stats), C7 (people stats), C8/C9 (ATx/Ax) — SURVEY.md 2.1.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from gvamp_tpu.data import GenoBed, GenoDense
from gvamp_tpu.io import plink
from gvamp_tpu.ops.layout import PlanarLayout, CODE_TO_DOSAGE, CODE_TO_NONMISS

from helpers import DenseOracle, random_dataset


def make_bed(codes):
    M, N = codes.shape
    lay = PlanarLayout.create(N)
    by = np.zeros((M, lay.mbytes), dtype=np.uint8)
    for k in range(4):
        cols = np.arange(k, N, 4)
        by[:, (cols - k) // 4] |= (codes[:, cols].astype(np.uint8) << (2 * k))
    return by


def test_decode_all_256_bytes():
    """Every possible packed byte decodes to the reference LUT values."""
    lay = PlanarLayout.create(4)
    by = np.arange(256, dtype=np.uint8).reshape(256, 1)
    dose, nm = lay.dense_from_words(lay.pack_words(by))
    for byte in range(256):
        for k in range(4):
            code = (byte >> (2 * k)) & 3
            assert dose[byte, k] == CODE_TO_DOSAGE[code]
            assert nm[byte, k] == CODE_TO_NONMISS[code]


@pytest.mark.parametrize("N,M", [(61, 33), (256, 64), (1000, 40)])
def test_stats_and_matvec_vs_dense(N, M):
    rng = np.random.default_rng(42)
    codes, y = random_dataset(rng, N, M)
    oracle = DenseOracle(codes, y)
    geno = GenoBed.from_arrays(make_bed(codes), y, N=N, dtype=jnp.float64)

    assert geno.nonas == oracle.nonas
    np.testing.assert_allclose(geno.intercept, oracle.intercept, rtol=1e-12)
    np.testing.assert_allclose(geno.scale, oracle.scale, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(geno.mave)[:M], oracle.mave, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(geno.msig)[:M], oracle.msig, rtol=1e-10)

    x = rng.normal(size=geno.Mpad)
    x_np = np.array(x)
    x_np[M:] = 0
    z = geno.deplanarize(geno.ax(jnp.asarray(x)))
    np.testing.assert_allclose(z, oracle.ax(x_np[:M]), rtol=1e-8, atol=1e-10)

    v = rng.normal(size=N)
    r = np.asarray(geno.atx(geno.planarize(v)))
    np.testing.assert_allclose(r[:M], oracle.atx(v), rtol=1e-8, atol=1e-10)
    assert np.all(r[M:] == 0)


def test_adjointness():
    rng = np.random.default_rng(3)
    codes, y = random_dataset(rng, 130, 50)
    geno = GenoBed.from_arrays(make_bed(codes), y, N=130, dtype=jnp.float64)
    x = jnp.asarray(rng.normal(size=geno.Mpad) * np.asarray(geno.m_mask))
    v = geno.planarize(rng.normal(size=130))
    lhs = float(jnp.vdot(geno.ax(x), v * geno.na_planar))
    rhs = float(jnp.vdot(x, geno.atx(v)))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-10)


def test_phen_scaling_reference_semantics():
    """Phenotype is scaled but NOT centered; NA slots zeroed (data.cpp:171-186)."""
    y = np.array([1.0, 2.0, np.nan, 4.0, 10.0])
    codes = np.zeros((3, 5), dtype=np.uint8)
    geno = GenoBed.from_arrays(make_bed(codes), y, N=5, dtype=jnp.float64)
    nonas = 4
    avg = np.nanmean(y)
    sqn = np.sqrt((nonas - 1) / np.nansum((y - avg) ** 2))
    got = geno.deplanarize(geno.filter_pheno())
    np.testing.assert_allclose(got, np.where(np.isnan(y), 0.0, y * sqn), rtol=1e-12)


def test_people_statistics():
    rng = np.random.default_rng(7)
    N, M = 97, 29
    codes, y = random_dataset(rng, N, M)
    oracle = DenseOracle(codes, y)
    geno = GenoBed.from_arrays(make_bed(codes), y, N=N, dtype=jnp.float64)
    mave_p, msig_p, numb_p = (geno.deplanarize(t) for t in geno.compute_people_statistics())

    # dense reference (data.cpp:577-633)
    val = (oracle.a - oracle.mave[:, None]) * oracle.msig[:, None] * oracle.b * oracle.na[None, :]
    numb = (oracle.b * oracle.na[None, :]).sum(0)
    sum_v = val.sum(0)
    sumsq = (val**2).sum(0)
    mean = np.where(oracle.na > 0, sum_v / np.maximum(numb, 1), 0.0)
    prec = np.where(oracle.na > 0, (numb - 1) / (sumsq - numb * mean**2), 0.0)
    np.testing.assert_allclose(numb_p, numb * oracle.na, rtol=1e-8)
    np.testing.assert_allclose(mave_p, mean, rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(msig_p, np.sqrt(np.maximum(prec, 0)), rtol=1e-5, atol=1e-8)


def test_bed_file_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    codes, y = random_dataset(rng, 37, 11)
    p = str(tmp_path / "t.bed")
    plink.write_bed(p, codes)
    slab = plink.read_bed_slab(p, 37, 11, 0)
    np.testing.assert_array_equal(slab, make_bed(codes))
    sub = plink.read_bed_slab(p, 37, 4, 5)
    np.testing.assert_array_equal(sub, make_bed(codes)[5:9])


def test_dense_container_matches_bed_when_no_missing():
    """GenoDense on the decoded dosage matrix == GenoBed (no genotype NAs)."""
    rng = np.random.default_rng(5)
    N, M = 64, 24
    codes = rng.choice([0, 2, 3], size=(M, N)).astype(np.uint8)
    y = rng.normal(size=N)
    dose = CODE_TO_DOSAGE[codes]
    bed = GenoBed.from_arrays(make_bed(codes), y, N=N, dtype=jnp.float64)
    dense = GenoDense.from_arrays(dose, y, N=N, dtype=jnp.float64)
    x = rng.normal(size=max(bed.Mpad, dense.Mpad))
    xb = jnp.asarray(x[: bed.Mpad] * np.asarray(bed.m_mask))
    xd = jnp.asarray(x[: dense.Mpad] * np.asarray(dense.m_mask))
    np.testing.assert_allclose(
        bed.deplanarize(bed.ax(xb)), dense.deplanarize(dense.ax(xd)), rtol=1e-8
    )
    v = rng.normal(size=N)
    np.testing.assert_allclose(
        np.asarray(bed.atx(bed.planarize(v)))[:M],
        np.asarray(dense.atx(dense.planarize(v)))[:M],
        rtol=1e-8,
    )


@pytest.mark.parametrize("backend", ["xla", "pallas"])
def test_batched_matvec_matches_single(backend):
    """axm/atxm (wide-RHS block kernels) == column-wise ax/atx."""
    rng = np.random.default_rng(11)
    N, M, B = 130, 40, 3
    codes, y = random_dataset(rng, N, M)
    # pallas+f64 is rejected since round 4 (no silent downgrade); the
    # pallas container therefore runs at its native f32
    dt = jnp.float64 if backend == "xla" else jnp.float32
    geno = GenoBed.from_arrays(make_bed(codes), y, N=N, dtype=dt,
                               backend=backend)
    X = rng.normal(size=(geno.Mpad, B)) * np.asarray(geno.m_mask)[:, None]
    Z = np.asarray(geno.axm(jnp.asarray(X)))
    for j in range(B):
        zj = np.asarray(geno.ax(jnp.asarray(X[:, j])))
        np.testing.assert_allclose(Z[:, :, j], zj, rtol=2e-6, atol=1e-6)

    V = np.stack([np.asarray(geno.planarize(rng.normal(size=N)))
                  for _ in range(B)], axis=-1)
    R = np.asarray(geno.atxm(jnp.asarray(V)))
    for j in range(B):
        rj = np.asarray(geno.atx(jnp.asarray(V[:, :, j])))
        np.testing.assert_allclose(R[:, j], rj, rtol=2e-6, atol=1e-6)


def test_batched_matvec_dense_container():
    rng = np.random.default_rng(12)
    N, M, B = 48, 16, 2
    X = rng.normal(size=(M, N))
    y = rng.normal(size=N)
    dense = GenoDense.from_arrays(X, y, N=N, dtype=jnp.float64)
    XB = rng.normal(size=(dense.Mpad, B)) * np.asarray(dense.m_mask)[:, None]
    Z = np.asarray(dense.axm(jnp.asarray(XB)))
    for j in range(B):
        np.testing.assert_allclose(
            Z[:, :, j], np.asarray(dense.ax(jnp.asarray(XB[:, j]))), rtol=1e-9)
    V = np.stack([np.asarray(dense.planarize(rng.normal(size=N)))
                  for _ in range(B)], axis=-1)
    R = np.asarray(dense.atxm(jnp.asarray(V)))
    for j in range(B):
        np.testing.assert_allclose(
            R[:, j], np.asarray(dense.atx(jnp.asarray(V[:, :, j]))), rtol=1e-9)


def test_pallas_backend_under_mesh():
    """Pallas kernels (interpret mode on CPU) under shard_map on an 8-device
    mesh agree with the unsharded XLA path — validates the in/out specs the
    real multi-chip run uses."""
    import jax

    rng = np.random.default_rng(19)
    N, M = 130, 40
    codes, y = random_dataset(rng, N, M)
    devs = jax.devices()[:8]
    mesh = jax.sharding.Mesh(np.array(devs), ("m",))
    g_sh = GenoBed.from_arrays(make_bed(codes), y, N=N,
                               backend="pallas", mesh=mesh)
    g_ref = GenoBed.from_arrays(make_bed(codes), y, N=N, dtype=jnp.float64,
                                backend="xla")
    x = rng.normal(size=g_sh.Mpad) * np.asarray(g_sh.m_mask)
    np.testing.assert_allclose(
        np.asarray(g_sh.ax(jnp.asarray(x))),
        np.asarray(g_ref.ax(jnp.asarray(x[: g_ref.Mpad]))), rtol=1e-5, atol=1e-7)
    v = g_sh.planarize(rng.normal(size=N))
    np.testing.assert_allclose(
        np.asarray(g_sh.atx(v))[: M],
        np.asarray(g_ref.atx(v))[: M], rtol=1e-5, atol=1e-7)
    X = rng.normal(size=(g_sh.Mpad, 2)) * np.asarray(g_sh.m_mask)[:, None]
    np.testing.assert_allclose(
        np.asarray(g_sh.axm(jnp.asarray(X))),
        np.asarray(g_ref.axm(jnp.asarray(X[: g_ref.Mpad]))), rtol=1e-5, atol=1e-7)


def test_fused_dual_gram_under_mesh():
    """The dual Gram is additive over marker shards (A A^T = sum_s A_s A_s^T),
    so the shard_mapped fused kernel + one psum must match both the unsharded
    fused operator and the two-pass composition on the same meshed data."""
    import jax

    rng = np.random.default_rng(23)
    N, M = 130, 40
    codes, y = random_dataset(rng, N, M)
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:8]), ("m",))
    g_sh = GenoBed.from_arrays(make_bed(codes), y, N=N,
                               backend="pallas", mesh=mesh)
    g_ref = GenoBed.from_arrays(make_bed(codes), y, N=N,
                                backend="pallas")
    fn_sh, fn_ref = g_sh.fn_gram_aat(), g_ref.fn_gram_aat()
    assert fn_sh is not None and fn_ref is not None
    B = 3
    Up = jnp.asarray(np.stack(
        [np.asarray(g_sh.planarize(rng.normal(size=N))) for _ in range(B)],
        axis=-1))
    z_sh = np.asarray(jax.jit(fn_sh)(g_sh.op, Up))
    z_ref = np.asarray(jax.jit(fn_ref)(g_ref.op, Up))
    scale = np.abs(z_ref).max() + 1e-30
    np.testing.assert_allclose(z_sh, z_ref, rtol=0, atol=5e-5 * scale)
    z_two_pass = np.asarray(g_sh.axm(g_sh.atxm(Up)))
    np.testing.assert_allclose(z_sh, z_two_pass, rtol=0, atol=5e-5 * scale)


def test_no_missing_fast_path():
    """Complete (imputed) genotypes route through the a-only kernels and
    match the general path exactly."""
    rng = np.random.default_rng(29)
    N, M = 130, 40
    codes = rng.choice([0, 2, 3], size=(M, N)).astype(np.uint8)  # no code 1
    y = rng.normal(size=N)
    y[rng.choice(N, 9, replace=False)] = np.nan  # phenotype NAs still exist
    fast = GenoBed.from_arrays(make_bed(codes), y, N=N, backend="pallas")
    ref = GenoBed.from_arrays(make_bed(codes), y, N=N, dtype=jnp.float64,
                              backend="xla")
    assert fast.geno_complete and ref.geno_complete is True
    x = rng.normal(size=fast.Mpad) * np.asarray(fast.m_mask)
    np.testing.assert_allclose(np.asarray(fast.ax(jnp.asarray(x))),
                               np.asarray(ref.ax(jnp.asarray(x))),
                               rtol=1e-5, atol=1e-6)
    v = fast.planarize(rng.normal(size=N))
    np.testing.assert_allclose(np.asarray(fast.atx(v)),
                               np.asarray(ref.atx(v)), rtol=1e-5, atol=1e-6)
    X = rng.normal(size=(fast.Mpad, 2)) * np.asarray(fast.m_mask)[:, None]
    np.testing.assert_allclose(np.asarray(fast.axm(jnp.asarray(X))),
                               np.asarray(ref.axm(jnp.asarray(X))),
                               rtol=1e-5, atol=1e-6)
    V = np.stack([np.asarray(fast.planarize(rng.normal(size=N)))
                  for _ in range(2)], axis=-1)
    np.testing.assert_allclose(np.asarray(fast.atxm(jnp.asarray(V))),
                               np.asarray(ref.atxm(jnp.asarray(V))),
                               rtol=1e-5, atol=1e-6)
    # incomplete data must NOT take the fast path
    codes2, y2 = random_dataset(rng, N, M)
    g2 = GenoBed.from_arrays(make_bed(codes2), y2, N=N, backend="pallas")
    assert g2.geno_complete is False


def test_decode_utility_matches_layout_oracle():
    """ops.decode public API agrees with the layout dense oracle."""
    from gvamp_tpu.ops import decode

    rng = np.random.default_rng(31)
    N, M = 61, 9
    codes = rng.integers(0, 4, size=(M, N)).astype(np.uint8)
    lay = PlanarLayout.create(N)
    words = lay.pack_words(make_bed(codes))  # [M, Nw]
    a, b = decode.decode_planar(jnp.asarray(words))  # [4, M, Nb]
    dose, nm = lay.dense_from_words(words)
    p2o = lay.planar_to_orig()  # [4, Nb]
    for k in range(4):
        for p in range(lay.n_bytes):
            n = p2o[k, p]
            if n < 0:
                continue
            np.testing.assert_array_equal(np.asarray(a)[k, :, p], dose[:, n])
            np.testing.assert_array_equal(np.asarray(b)[k, :, p], nm[:, n])


def test_wide_kernel_column_chunking():
    """Wide calls beyond the per-kernel VMEM column cap split and concat."""
    from gvamp_tpu.ops import matvec

    rng = np.random.default_rng(13)
    Nw, M, B = 32, 512, matvec._BMAX_AXM_A + 7
    words = jnp.asarray(rng.integers(0, 2**32, size=(Nw, M),
                                     dtype=np.uint64).astype(np.uint32))
    W = jnp.asarray(rng.standard_normal((M, B)), jnp.float32)
    za = np.asarray(matvec.axm_i8a_pallas(words, W))
    for j in (0, B - 1):
        ref = np.asarray(matvec.axm_i8a_pallas(words, W[:, j:j+1]))[..., 0]
        np.testing.assert_allclose(za[..., j], ref, rtol=1e-5, atol=1e-5)
    V = jnp.asarray(rng.standard_normal((4, 4 * Nw, matvec._BMAX_ATXM + 5)),
                    jnp.float32)
    av, bv = matvec.atxm_i8_pallas(words, V)
    a1, b1 = matvec.atxm_i8_pallas(words, V[:, :, -1:])
    np.testing.assert_allclose(np.asarray(av)[:, -1], np.asarray(a1)[:, 0],
                               rtol=1e-5, atol=1e-5)


def test_digit_transform_helpers_roundtrip():
    """_quant_digits_t / _fold_digits_zt / _fold_digits_t: quantize-fold
    round-trips reconstruct the original values to digit precision at edge
    widths (B=1 and B=5, non-power-of-two)."""
    import numpy as np
    import jax.numpy as jnp
    from gvamp_tpu.ops import matvec

    rng = np.random.default_rng(3)
    for B in (1, 5):
        # atx-side: V [4, Nb, B]
        V = jnp.asarray(rng.standard_normal((4, 64, B)).astype(np.float32))
        v8, s0 = matvec._quant_digits_t(V)
        assert v8.shape == (4, matvec._NDIG * B, 64)
        rec = np.zeros((4, B, 64), np.float64)
        v8n = np.asarray(v8, np.float64)
        s = np.asarray(s0, np.float64)
        for d in range(matvec._NDIG):
            rec += v8n[:, d * B:(d + 1) * B, :] * (
                s[None, :, None] / (127.0 ** d))
        np.testing.assert_allclose(rec.transpose(0, 2, 1), np.asarray(V),
                                   rtol=0, atol=float(np.abs(V).max()) * 1e-7)

        # fold helpers agree with a numpy fold
        zt = jnp.asarray(rng.integers(-1000, 1000,
                                      (matvec._NDIG * B, 4, 32)), jnp.int32)
        out = np.asarray(matvec._fold_digits_zt(zt, jnp.asarray(s0), B))
        want = np.zeros((4, 32, B))
        ztn = np.asarray(zt, np.float64)
        for d in range(matvec._NDIG):
            for j in range(B):
                want[:, :, j] += ztn[d * B + j] * (s[j] / 127.0 ** d)
        np.testing.assert_allclose(out, want, rtol=1e-6)


@pytest.mark.parametrize("Nw,M,B,miss", [(16, 256, 2, 0.1), (8, 1024, 5, 0.0),
                                         (16, 256, 70, 0.2)])
def test_fused_gram_matches_composition(Nw, M, B, miss):
    """gram_i8a_pallas == atxm_i8a(mask*(axm_i8a - colsum)) in one pass —
    the fused analog of the reference's lmmse_mult (vamp.cpp:1074-1118)."""
    from gvamp_tpu.ops import matvec

    rng = np.random.default_rng(17)
    words = jnp.asarray(rng.integers(0, 2**32, size=(Nw, M),
                                     dtype=np.uint64).astype(np.uint32))
    W = jnp.asarray(rng.standard_normal((M, B)).astype(np.float32))
    na = jnp.asarray((rng.random((4, 4 * Nw)) > miss).astype(np.float32))
    cu = jnp.asarray(rng.standard_normal(B).astype(np.float32))

    za = matvec.axm_i8a_pallas(words, W)
    z = (za - cu[None, None, :]) * na[:, :, None]
    av_ref = np.asarray(matvec.atxm_i8a_pallas(words, z))
    sv_ref = np.asarray(jnp.sum(z, axis=(0, 1)))

    av, sv = matvec.gram_i8a_pallas(words, W, na, cu)
    sc = np.abs(av_ref).max() + 1e-30
    np.testing.assert_allclose(np.asarray(av), av_ref, rtol=0, atol=5e-6 * sc)
    np.testing.assert_allclose(np.asarray(sv), sv_ref, rtol=0,
                               atol=5e-6 * (np.abs(sv_ref).max() + 1e-30))


@pytest.mark.parametrize("miss_geno", [0.0, 0.05])
def test_fn_gram_matches_two_pass_operator(miss_geno, monkeypatch):
    """GenoBed.fn_gram (fused Gram wrapper with the mave/msig/scale
    corrections) equals atxm(axm(.)) on both the complete-genotype and
    missing-genotype paths, and is None on the xla backend.  Fused is
    opt-in since round 4 (GVAMP_FUSED_GRAM=1): the burst study showed the
    two-pass form wins on v5e (decode-bound)."""
    monkeypatch.setenv("GVAMP_FUSED_GRAM", "1")
    rng = np.random.default_rng(23)
    N, M = 256, 192
    codes, y = random_dataset(rng, N, M, miss_geno=miss_geno)
    geno = GenoBed.from_arrays(make_bed(codes), y, N=N, backend="pallas")
    assert geno.geno_complete == (miss_geno == 0.0)
    gram_fn = geno.fn_gram()
    assert gram_fn is not None
    X = jnp.asarray(rng.standard_normal((geno.Mpad, 3)).astype(np.float32))
    want = np.asarray(geno.atxm(geno.axm(X)))
    got = np.asarray(gram_fn(geno.op, X))
    np.testing.assert_allclose(got, want, rtol=0,
                               atol=2e-5 * (np.abs(want).max() + 1e-30))

    geno_x = GenoBed.from_arrays(make_bed(codes), y, N=N, backend="xla")
    assert geno_x.fn_gram() is None


def test_general_fused_gram_and_shared_scale_ax():
    """gram_i8_pallas == atxm_i8(na*(axm_i8)) and axm_i8s == axm_i8 —
    the missing-genotype fused kernels (shared (W,-U) digit scale)."""
    from gvamp_tpu.ops import matvec

    rng = np.random.default_rng(29)
    Nw, M, B = 16, 512, 3
    words = jnp.asarray(rng.integers(0, 2**32, size=(Nw, M),
                                     dtype=np.uint64).astype(np.uint32))
    W = jnp.asarray(rng.standard_normal((M, B)).astype(np.float32))
    mave = jnp.asarray(rng.uniform(0, 2, M).astype(np.float32))
    U = mave[:, None] * W
    na = jnp.asarray((rng.random((4, 4 * Nw)) > 0.1).astype(np.float32))

    z0 = np.asarray(matvec.axm_i8_pallas(words, W, U))
    z1 = np.asarray(matvec.axm_i8s_pallas(words, W, U))
    np.testing.assert_allclose(z1, z0, rtol=0,
                               atol=2e-6 * (np.abs(z0).max() + 1e-30))

    z = jnp.asarray(z0) * na[:, :, None]
    av_ref, bv_ref = matvec.atxm_i8_pallas(words, z)
    av, bv = matvec.gram_i8_pallas(words, W, U, na)
    np.testing.assert_allclose(
        np.asarray(av), np.asarray(av_ref), rtol=0,
        atol=5e-6 * (float(jnp.max(jnp.abs(av_ref))) + 1e-30))
    np.testing.assert_allclose(
        np.asarray(bv), np.asarray(bv_ref), rtol=0,
        atol=5e-6 * (float(jnp.max(jnp.abs(bv_ref))) + 1e-30))


def test_aat_gram_kernels_match_composition():
    """gram_aat_i8[a]_pallas == axm(msig2*(atxm_a - mave*atxm_b)) — the
    fused dual (XXT) Gram kernels, general and a-only variants."""
    from gvamp_tpu.ops import matvec

    rng = np.random.default_rng(43)
    Nw, M, B = 16, 512, 3
    words_m = np.asarray(rng.integers(0, 2**32, size=(Nw, M),
                                      dtype=np.uint64).astype(np.uint32))
    V = jnp.asarray(rng.standard_normal((4, 4 * Nw, B)).astype(np.float32))
    mave = jnp.asarray(rng.uniform(0, 2, M).astype(np.float32))
    msig2 = jnp.asarray(rng.uniform(0.5, 2, M).astype(np.float32))

    # general kernel vs two-pass composition (missing codes present)
    wm = jnp.asarray(words_m)
    av, bv = matvec.atxm_i8_pallas(wm, V)
    t = msig2[:, None] * (av - mave[:, None] * bv)
    z_ref = np.asarray(matvec.axm_i8_pallas(wm, t, mave[:, None] * t))
    z = np.asarray(matvec.gram_aat_i8_pallas(wm, V, mave, msig2))
    np.testing.assert_allclose(z, z_ref, rtol=0,
                               atol=5e-6 * (np.abs(z_ref).max() + 1e-30))

    # a-only kernel vs the general kernel on complete genotypes
    lo = words_m & 0x55555555
    hi = (words_m >> 1) & 0x55555555
    wc = jnp.asarray((words_m | ((lo & ~hi) << 1)).astype(np.uint32))
    z_g = np.asarray(matvec.gram_aat_i8_pallas(wc, V, mave, msig2))
    z_a = np.asarray(matvec.gram_aat_i8a_pallas(wc, V, mave, msig2))
    np.testing.assert_allclose(z_a, z_g, rtol=0,
                               atol=2e-5 * (np.abs(z_g).max() + 1e-30))


@pytest.mark.slow
@pytest.mark.parametrize("seed,N,M,miss_geno,miss_phen,B", [
    (101, 123, 77, 0.0, 0.0, 1),
    (102, 257, 333, 0.07, 0.1, 3),
    (103, 64, 501, 0.02, 0.0, 7),     # M > N (dual regime), odd M
    (104, 399, 129, 0.3, 0.25, 2),    # heavy missingness
    (105, 130, 130, 0.0, 0.15, 9),    # square, phen NAs only
])
def test_gram_operators_randomized_shapes(seed, N, M, miss_geno,
                                          miss_phen, B, monkeypatch):
    """Seeded odd-shape sweep: the fused primal and dual Gram operators
    must equal their two-pass compositions through the full data-layer
    padding/standardization stack (the parametrized kernel tests use
    round tile-multiple shapes only).  The primal fused Gram defaulted to
    OFF in round 4 (it loses on hardware, fn_gram) — force it on here:
    the kernels stay available behind GVAMP_FUSED_GRAM=1 and must remain
    correct."""
    monkeypatch.setenv("GVAMP_FUSED_GRAM", "1")
    rng = np.random.default_rng(seed)
    codes, y = random_dataset(rng, N, M, miss_geno=miss_geno,
                              miss_phen=miss_phen)
    geno = GenoBed.from_arrays(make_bed(codes), y, N=N, backend="pallas")
    X = jnp.asarray(rng.standard_normal((geno.Mpad, B)).astype(np.float32))

    gram_fn = geno.fn_gram()
    assert gram_fn is not None
    want = np.asarray(geno.atxm(geno.axm(X)))
    got = np.asarray(gram_fn(geno.op, X))
    np.testing.assert_allclose(got, want, rtol=0,
                               atol=3e-5 * (np.abs(want).max() + 1e-30))

    gram_aat = geno.fn_gram_aat()
    assert gram_aat is not None
    U = jnp.asarray(rng.standard_normal(
        geno.y_planar.shape + (B,)).astype(np.float32))
    Uf = U * geno.n_mask_planar[:, :, None]
    want_n = np.asarray(geno.axm(geno.atxm(Uf)))
    got_n = np.asarray(gram_aat(geno.op, Uf))
    np.testing.assert_allclose(got_n, want_n, rtol=0,
                               atol=3e-5 * (np.abs(want_n).max() + 1e-30))


@pytest.mark.slow
def test_multi_gram_per_column_randomized(monkeypatch):
    """MultiPhen.fn_gram with a trait-mixing column map equals the
    two-pass per-column operator (odd sizes, per-trait NA patterns).
    Forced on via GVAMP_FUSED_GRAM=1 (default-off since round 4)."""
    from gvamp_tpu import multi, sim

    monkeypatch.setenv("GVAMP_FUSED_GRAM", "1")
    rng = np.random.default_rng(44)
    N, M, T, P = 201, 155, 3, 2
    codes = sim.random_genotypes(rng, M, N, miss_rate=0.04)
    geno = GenoBed.from_arrays(make_bed(codes), np.zeros(N), N=N,
                               standardize_phen=False, backend="pallas")
    ys = []
    for t in range(T):
        y = rng.standard_normal(N)
        y[rng.choice(N, 10 + 7 * t, replace=False)] = np.nan
        ys.append(y)
    mp = multi.MultiPhen.build(geno, ys)
    gram_fn = mp.fn_gram()
    assert gram_fn is not None
    axm_fn, atxm_fn = mp.fns()
    cols = np.concatenate([np.arange(T), np.repeat(np.arange(T), P)])
    X = jnp.asarray(rng.standard_normal(
        (geno.Mpad, len(cols))).astype(np.float32))
    want = np.asarray(atxm_fn(mp.op, axm_fn(mp.op, X, cols), cols))
    got = np.asarray(gram_fn(mp.op, X, cols))
    np.testing.assert_allclose(got, want, rtol=0,
                               atol=3e-5 * (np.abs(want).max() + 1e-30))
