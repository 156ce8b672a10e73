"""Round-4 feature tests: f64 backend honesty (no silent precision
downgrade through the pallas int8 kernels), and the auto-backend f64
routing to the true-f64 XLA decode path."""

import numpy as np
import jax.numpy as jnp
import pytest

from gvamp_tpu.data import GenoBed, _pick_backend
from gvamp_tpu.options import Options
from helpers import random_dataset
from test_data_layer import make_bed

BASE_ARGS = ["--run-mode", "infere", "--bed-file", "x.bed",
             "--phen-files", "x.phen", "--N", "100", "--Mt", "50"]


def test_options_reject_pallas_f64():
    """--backend pallas + --dtype float64 fails fast (VERDICT r3 weak #4:
    the pallas int8-digit kernels are ~1e-7; an explicit f64 request must
    not silently degrade)."""
    with pytest.raises(SystemExit, match="float64"):
        Options.from_args(
            BASE_ARGS + ["--backend", "pallas", "--dtype", "float64"]).check()


def test_options_accept_xla_f64_and_pallas_f32():
    Options.from_args(BASE_ARGS + ["--backend", "xla",
                                   "--dtype", "float64"]).check()
    Options.from_args(BASE_ARGS + ["--backend", "pallas",
                                   "--dtype", "float32"]).check()


def test_pick_backend_routes_f64_to_xla():
    assert _pick_backend("auto", jnp.float64) == "xla"
    assert _pick_backend("xla", jnp.float64) == "xla"
    with pytest.raises(ValueError, match="float64"):
        _pick_backend("pallas", jnp.float64)


def test_container_honors_f64_auto():
    """GenoBed built with dtype=float64 lands on the true-f64 XLA matvec
    path regardless of platform."""
    rng = np.random.default_rng(0)
    codes, y = random_dataset(rng, 64, 32)
    geno = GenoBed.from_arrays(make_bed(codes), y, N=64, dtype=jnp.float64)
    assert geno.backend == "xla"
    z = geno.ax(jnp.ones(geno.Mpad, jnp.float64))
    assert z.dtype == jnp.float64

    with pytest.raises(ValueError, match="float64"):
        GenoBed.from_arrays(make_bed(codes), y, N=64, dtype=jnp.float64,
                            backend="pallas")


def test_fused_gram_default_off(monkeypatch):
    """Round-4 routing: the primal fused Gram is opt-in (burst study:
    two-pass wins on v5e, BENCH_r04/docs/ROOFLINE.md); the dual fused
    Gram stays default-on (it wins)."""
    monkeypatch.delenv("GVAMP_FUSED_GRAM", raising=False)
    monkeypatch.delenv("GVAMP_NO_FUSED_GRAM", raising=False)
    rng = np.random.default_rng(1)
    codes, y = random_dataset(rng, 64, 32, miss_geno=0.0)
    geno = GenoBed.from_arrays(make_bed(codes), y, N=64, backend="pallas")
    assert geno.fn_gram() is None
    assert geno.fn_gram_aat() is not None
    monkeypatch.setenv("GVAMP_FUSED_GRAM", "1")
    assert geno.fn_gram() is not None
    monkeypatch.setenv("GVAMP_NO_FUSED_GRAM", "1")
    assert geno.fn_gram() is None
    assert geno.fn_gram_aat() is None


def test_onsager_tol_1e6_matches_1e8():
    """The relaxed probe exit (onsager_tol 1e-6 vs the reference's 1e-8,
    vamp.cpp:1174-1193) reproduces the alpha2 trajectory far below the
    probe's own Hutchinson MC noise while saving probe CG iterations."""
    import sys
    sys.path.insert(0, "tests")
    from tests_shim import make_bed_bytes
    from gvamp_tpu import linear, sim

    rng = np.random.default_rng(5)
    N, M = 1000, 512
    codes = sim.random_genotypes(rng, M, N, miss_rate=0.0)
    vars_t, probs_t = sim.two_group_prior(M, 25, 0.6)
    beta = sim.simulate_mixture(rng, M, vars_t, probs_t)
    g = GenoBed.from_arrays(make_bed_bytes(codes), np.zeros(N), N=N,
                            standardize_phen=False, backend="pallas")
    y = sim.simulate_linear_phenotype(g, beta, 2.5, rng)
    g.set_phen(y)

    runs = {}
    for tol in (1e-8, 1e-6):
        cfg = linear.VampConfig(max_iter=5, rho=0.3, gam1_init=1e-8,
                                gamw_init=2.0, seed=5, onsager_tol=tol,
                                stop_criteria_thr=0.0)
        runs[tol] = linear.infer(g, cfg, probs_t, vars_t, verbose=False)
    a8 = np.array([float(m["alpha2"]) for m in runs[1e-8][2]])
    a6 = np.array([float(m["alpha2"]) for m in runs[1e-6][2]])
    np.testing.assert_allclose(a6, a8, rtol=2e-5)
    np.testing.assert_allclose(runs[1e-6][0], runs[1e-8][0], rtol=0,
                               atol=1e-4 * np.abs(runs[1e-8][0]).max())
    p8 = sum(int(m["probe_iters"]) for m in runs[1e-8][2])
    p6 = sum(int(m["probe_iters"]) for m in runs[1e-6][2])
    assert p6 <= p8


def test_fold_noise_matches_explicit_pass():
    """fold_noise=True (resid2/trace_corr via the CG exit Gram identity,
    z1 via the first-iteration rider column) reproduces the explicit
    noise-EM wide pass (reference updateNoisePrec, vamp.cpp:892-927)
    trajectory-for-trajectory: the identity gamw*A^T A mu = V - r - gam2*mu
    is exact for ANY mu, so only fp round-off differs."""
    import sys
    sys.path.insert(0, "tests")
    from tests_shim import make_bed_bytes
    from gvamp_tpu import linear, sim

    rng = np.random.default_rng(11)
    N, M = 800, 384
    codes = sim.random_genotypes(rng, M, N, miss_rate=0.02)
    vars_t, probs_t = sim.two_group_prior(M, 20, 0.6)
    beta = sim.simulate_mixture(rng, M, vars_t, probs_t)
    g = GenoBed.from_arrays(make_bed_bytes(codes), np.zeros(N), N=N,
                            standardize_phen=False, backend="pallas")
    y = sim.simulate_linear_phenotype(g, beta, 2.5, rng)
    g.set_phen(y)

    runs = {}
    for fold in (False, True):
        cfg = linear.VampConfig(max_iter=6, rho=0.3, gam1_init=1e-8,
                                gamw_init=2.0, seed=3, fold_noise=fold,
                                stop_criteria_thr=0.0)
        runs[fold] = linear.infer(g, cfg, probs_t, vars_t, verbose=False)
    for key in ("gamw", "R2_train_1", "R2_train_2", "alpha2", "gam1"):
        a = np.array([float(m[key]) for m in runs[False][2]])
        b = np.array([float(m[key]) for m in runs[True][2]])
        np.testing.assert_allclose(b, a, rtol=5e-4, err_msg=key)
    np.testing.assert_allclose(runs[True][0], runs[False][0], rtol=0,
                               atol=1e-4 * np.abs(runs[False][0]).max())


def test_cg_rider_forward_product():
    """solve_block's rider columns return the exact forward product A@X and
    leave the solve itself bit-identical to the rider-free call."""
    from gvamp_tpu import cg

    rng = np.random.default_rng(7)
    Mdim, Ndim, B, R = 96, 64, 2, 1
    A = jnp.asarray(rng.normal(size=(Ndim, Mdim)), jnp.float64)
    tau, gam2 = 0.7, 0.3

    def axm(op, P):
        return A @ P

    def atxm(op, Z):
        return A.T @ Z

    multb = cg.make_lmmse_mult_block(axm, atxm, None, tau, gam2)
    rmult = cg.make_lmmse_mult_block_rider(axm, atxm, None, tau, gam2)
    V = jnp.asarray(rng.normal(size=(Mdim, B)), jnp.float64)
    X = jnp.asarray(rng.normal(size=(Mdim, R)), jnp.float64)
    mu0 = jnp.zeros_like(V)
    diag = cg.jacobi_diag(tau, gam2, float(Ndim))

    plain = cg.solve_block(multb, V, mu0, diag, gam2, 40, modes=(0, 1))
    rode = cg.solve_block(multb, V, mu0, diag, gam2, 40, modes=(0, 1),
                          rider=X, rider_mult=rmult)
    # the concatenated forward matmul changes XLA's accumulation order, so
    # "identical" means fp-identical at the compute dtype (f32 here), not
    # bit-identical
    np.testing.assert_allclose(np.asarray(rode.mu), np.asarray(plain.mu),
                               rtol=3e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(rode.iters),
                                  np.asarray(plain.iters))
    np.testing.assert_allclose(np.asarray(rode.rider_out), np.asarray(A @ X),
                               rtol=3e-5, atol=1e-6)


def _zmodel_ab(module, cfg_cls, phen_fn, iters=10):
    """Shared A/B harness: run a z-model engine with z2 tracked through the
    CG recursion (fold_noise=True) vs the explicit post-solve forward pass,
    and return both metric histories."""
    import sys
    sys.path.insert(0, "tests")
    from tests_shim import make_bed_bytes
    from gvamp_tpu import sim

    rng = np.random.default_rng(19)
    N, M = 600, 256
    codes = sim.random_genotypes(rng, M, N, miss_rate=0.01)
    vars_t, probs_t = sim.two_group_prior(M, 16, 0.6)
    beta = sim.simulate_mixture(rng, M, vars_t, probs_t)
    g = GenoBed.from_arrays(make_bed_bytes(codes), np.zeros(N), N=N,
                            standardize_phen=False, dtype=jnp.float64)
    g.set_phen(phen_fn(g, beta, rng))
    outs = {}
    for fold in (False, True):
        # use_slq=False isolates the variable under test (z2 tracking): on
        # the probe path both arms share the probe-CG alpha2, keeping the
        # 1e-6 A/B bound meaningful even on the Huber collapse trajectory,
        # where the SLQ alpha2 = f(tau2) faithfully amplifies the arms'
        # z2 fp drift (SLQ-vs-probe equality is tested separately in
        # test_slq_engines.py)
        cfg = cfg_cls(max_iter=iters, rho=0.3, seed=2, fold_noise=fold,
                      stop_criteria_thr=0.0, use_slq=False)
        outs[fold] = module.infer(g, cfg, probs_t, vars_t, verbose=False)
    return outs


def test_probit_z2_tracking_matches_explicit():
    """Tracked z2 (zmu += alpha_0 A p_0 through the CG; refresh-reset with
    the Gram product) reproduces the explicit z2 = A x2 pass trajectory
    across a gram_refresh tick (10 its > refresh=8)."""
    from gvamp_tpu import probit, sim

    outs = _zmodel_ab(
        probit, probit.ProbitConfig,
        lambda g, b, rng: sim.simulate_probit_phenotype(g, b, 1.0, rng))
    for key in ("gam1", "tau1", "alpha2", "beta1"):
        a = np.array([float(m[key]) for m in outs[False][2]])
        b = np.array([float(m[key]) for m in outs[True][2]])
        np.testing.assert_allclose(b, a, rtol=1e-6, err_msg=key)
    np.testing.assert_allclose(np.asarray(outs[True][0]),
                               np.asarray(outs[False][0]), rtol=1e-6,
                               atol=1e-9)


def test_huber_z2_tracking_matches_explicit():
    from gvamp_tpu import robust, sim

    def phen(g, b, rng):
        xpad = g.pad_m(b * np.sqrt(g.N))
        z = np.asarray(g.deplanarize(g.ax(xpad)))[:g.N]
        return z + rng.standard_t(3.0, g.N) * 0.5

    outs = _zmodel_ab(robust, robust.RobustConfig, phen, iters=6)
    for key in ("gam1", "tau1", "alpha2", "beta1", "deltaH"):
        a = np.array([float(m[key]) for m in outs[False][2]])
        b = np.array([float(m[key]) for m in outs[True][2]])
        np.testing.assert_allclose(b, a, rtol=1e-6, err_msg=key)


def test_cg_plateau_exit():
    """The stagnation exit freezes columns that stop improving (an
    ill-conditioned operator at a tolerance below its reachable residual)
    and never fires on a converging solve."""
    from gvamp_tpu import cg

    rng = np.random.default_rng(3)
    Mdim, Ndim = 128, 96
    A = jnp.asarray(rng.normal(size=(Ndim, Mdim)), jnp.float64)

    def axm(op, P):
        return A @ P

    def atxm(op, Z):
        return A.T @ Z

    V = jnp.asarray(rng.normal(size=(Mdim, 1)), jnp.float64)
    mu0 = jnp.zeros_like(V)

    # singular operator (M > N => A^T A rank-deficient), tiny gam2, and an
    # err_tol below the reachable residual: classic stagnation
    tau, gam2 = 1e6, 1e-8
    multb = cg.make_lmmse_mult_block(axm, atxm, None, tau, gam2)
    diag = cg.jacobi_diag(tau, gam2, float(Ndim))
    stuck = cg.solve_block(multb, V, mu0, diag, gam2, 500, modes=(0,),
                           err_tol=1e-300, plateau=12)
    assert int(stuck.iters[0]) < 500

    # converging solve at the production tolerance (the engines all use
    # err_tol=1e-5): plateau on/off produce identical results — the exit
    # never fires before the residual test does
    tau, gam2 = 1.0, 0.5
    multb = cg.make_lmmse_mult_block(axm, atxm, None, tau, gam2)
    diag = cg.jacobi_diag(tau, gam2, float(Ndim))
    a = cg.solve_block(multb, V, mu0, diag, gam2, 200, modes=(0,),
                       err_tol=1e-5, plateau=0)
    b = cg.solve_block(multb, V, mu0, diag, gam2, 200, modes=(0,),
                       err_tol=1e-5, plateau=12)
    np.testing.assert_array_equal(np.asarray(a.mu), np.asarray(b.mu))
    np.testing.assert_array_equal(np.asarray(a.iters), np.asarray(b.iters))
