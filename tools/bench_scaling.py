"""Multi-chip scaling evidence within a 1-chip environment (VERDICT r3 #7).

Two measurable halves of the north-star extrapolation (BASELINE.md):

1. **Sharded-path overhead on one chip**: run config-B-shaped linear VAMP
   both unmeshed and under a 1-device `Mesh(("m",))` — the identical
   shard_mapped program the multi-chip run executes, minus the actual
   ICI/DCN transfer.  The delta bounds the framework-side cost of the
   sharded code path (shard_map dispatch, psum lowering, partitioned
   layouts).

2. **psum payload accounting**: count the collective bytes per VAMP
   iteration analytically from the pass structure — the marker-sharded
   `A @ x` psums one planar N-vector [4, Nb] f32 per forward pass
   (reference MPI_Allreduce of 4*LB doubles, data.cpp:928), and scalar
   reductions ride the same programs.  This turns the BASELINE.md
   "1.6 MB x ~10 passes" prose into a computed, shape-correct number
   printed next to the measured wall-clock.

Usage:  python tools/bench_scaling.py [N] [M] [ITERS]
(defaults 65536 65536 4 — sized to fit next to a second copy in HBM;
set BENCH_SCALING_FULL=1 for the 10.74 GB config-B shape, run each mode
in its own process if HBM is tight).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
M = int(sys.argv[2]) if len(sys.argv) > 2 else 65536
ITERS = int(sys.argv[3]) if len(sys.argv) > 3 else 4


def run(mesh_devices, k_iters):
    import importlib.util

    import jax
    from gvamp_tpu import linear, sim
    from gvamp_tpu.data import GenoBed

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    rng = np.random.default_rng(0)
    geno, lay, mpad = bench.synth_geno(N, M)
    if mesh_devices is not None:
        mesh = jax.sharding.Mesh(np.array(mesh_devices), ("m",))
        # rebuild the container meshed: words resharded over markers
        geno = GenoBed.from_device_words(
            jax.device_put(geno.words, jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec(None, "m"))),
            np.zeros(N), N=N, M=M, standardize_phen=False, mesh=mesh)
    vars_t, probs_t = sim.two_group_prior(M, 1000, 0.5)
    beta = sim.simulate_mixture(rng, M, vars_t, probs_t)
    y = sim.simulate_linear_phenotype(geno, beta[:M], 2.0, rng)
    geno.set_phen(y)

    cfg = linear.VampConfig(max_iter=k_iters + 2, rho=0.15, gam1_init=1e-8,
                            gamw_init=2.0)
    state = linear.init_state(geno, cfg, probs_t, vars_t)
    aux = linear.make_aux(geno, cfg)
    step = linear.make_step(geno, cfg)
    scan_step = linear.make_scan_step(geno, cfg, k_iters)
    for _ in range(2):
        state, metrics = step(state, aux)
    _s, _m = scan_step(state, aux)
    float(_m["gam1"][-1])
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        _s, _m = scan_step(state, aux)
        g = float(_m["gam1"][-1])
        best = min(best, time.perf_counter() - t0)
    return best / k_iters, g, lay


def main():
    import jax

    assert jax.default_backend() != "cpu", "run on the TPU"
    global N, M
    if os.environ.get("BENCH_SCALING_FULL", "") == "1":
        N, M = 327680, 131072

    dt0, g0, lay = run(None, ITERS)
    dt1, g1, _ = run(jax.devices()[:1], ITERS)

    # psum payload accounting: per forward pass the marker-sharded matvec
    # psums one planar [4, Nb] f32 N-vector; per iteration the linear
    # engine executes (pass structure, bench.py accounting):
    #   CG: cg_it forward passes inside the Gram mults
    #   noise-EM: 1 wide forward pass (x2 + P probes + x1 -> 2+P columns,
    #             each column psums its own N-vector)
    # plus O(1) scalar psums fused into the same programs.
    nb4 = 4 * lay.n_words * 4  # planar f32 bytes per column
    cg_it, P = 2, 1
    cols = cg_it * 1 + (2 + P)
    payload = nb4 * 4 * cols  # bytes (f32)
    packed_gb = lay.n_words * 4 * ((M + 511) // 512 * 512) / 1e9

    print(f"# shape N={N} M={M} packed={packed_gb:.2f} GB")
    print(f"# unmeshed      : {dt0*1e3:8.2f} ms/iteration (gam1={g0:.4g})")
    print(f"# mesh(1 device): {dt1*1e3:8.2f} ms/iteration (gam1={g1:.4g})")
    print(f"# sharded-path overhead: {(dt1-dt0)*1e3:+.2f} ms/iteration "
          f"({(dt1/dt0-1)*100:+.1f}%)")
    print(f"# psum payload per iteration @ steady state (cg_it={cg_it}, "
          f"P={P}): {cols} N-vector columns x {nb4/1e6:.2f} MB = "
          f"{payload/1e6:.2f} MB")
    print(f"# at 45 GB/s ICI per link that is {payload/45e9*1e6:.0f} us of "
          f"collective time per iteration — against {dt0*1e3:.0f} ms of "
          f"compute: {payload/45e9/dt0*100:.2f}%")


if __name__ == "__main__":
    main()
