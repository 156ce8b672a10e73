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

3. **Weak-scaling shape check** (`--weak-scaling`, VERDICT r4 #7): run the
   IDENTICAL sharded program on 1/2/4/8 virtual CPU devices at a FIXED
   per-device marker shard (M = M_per * D) — each device count in its own
   subprocess (`xla_force_host_platform_device_count` must precede backend
   init).  This validates that the psum program a pod slice would execute
   compiles, runs, and keeps per-device work constant as D grows; the
   per-iteration results are also cross-checked for shard-count invariance
   of the scalar trajectory.  CPU wall-clocks are NOT TPU predictions —
   the value is the shape/semantics curve, not the milliseconds.

4. **Collective accounting table** (`--collectives`): the per-engine psum
   column counts and payload bytes per iteration, computed from the pass
   structure in code (previously prose in BASELINE.md §multi-chip).

Usage:  python tools/bench_scaling.py [N] [M] [ITERS]
        python tools/bench_scaling.py --weak-scaling [M_per] [N] [ITERS]
        python tools/bench_scaling.py --collectives [N]
(defaults 65536 65536 4 — sized to fit next to a second copy in HBM;
set BENCH_SCALING_FULL=1 for the 10.74 GB config-B shape, run each mode
in its own process if HBM is tight).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

_pos = [a for a in sys.argv[1:] if not a.startswith("--")]
_flagged = len(sys.argv) > 1 and sys.argv[1].startswith("--")
N = int(_pos[0]) if _pos and not _flagged else 65536
M = int(_pos[1]) if len(_pos) > 1 and not _flagged else 65536
ITERS = int(_pos[2]) if len(_pos) > 2 and not _flagged else 4


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


def weak_child(n_dev: int, m_per: int, n_samples: int, iters: int):
    """One weak-scaling point: the sharded program on n_dev virtual CPU
    devices with a fixed per-device marker shard.  Prints one JSON line."""
    import json

    import jax

    jax.config.update("jax_platforms", "cpu")
    global N, M
    N, M = n_samples, m_per * n_dev
    devs = jax.devices()
    assert len(devs) >= n_dev, (len(devs), n_dev)
    dt, g, lay = run(devs[:n_dev], iters)
    print(json.dumps({"devices": n_dev, "M": M, "m_per": m_per,
                      "s_it": round(dt, 4), "gam1": g}))


def weak_scaling(m_per: int, n_samples: int, iters: int):
    """Fan the weak-scaling points out to subprocesses (the virtual device
    count must be set before jax initializes)."""
    import json
    import subprocess

    rows = []
    for d in (1, 2, 4, 8):
        env = dict(os.environ,
                   JAX_PLATFORMS="cpu",
                   XLA_FLAGS=(os.environ.get("XLA_FLAGS", "")
                              + f" --xla_force_host_platform_device_count={d}"))
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--weak-child",
             str(d), str(m_per), str(n_samples), str(iters)],
            capture_output=True, text=True, env=env)
        line = [l for l in r.stdout.splitlines() if l.startswith("{")]
        if not line:
            print(f"# D={d} FAILED:\n{r.stderr[-2000:]}")
            sys.exit(1)
        rows.append(json.loads(line[-1]))
        print(f"# D={rows[-1]['devices']}: M={rows[-1]['M']} "
              f"{rows[-1]['s_it']*1e3:8.1f} ms/it  gam1={rows[-1]['gam1']:.6g}")
    base = rows[0]["s_it"]
    print("# weak-scaling curve — virtual devices TIME-SHARE one physical "
          "core, so ideal\n# weak scaling here is time ~ D x the 1-device "
          "time (total work grows with D\n# while per-device work stays "
          "fixed); a ratio near D means ZERO superlinear\n# framework "
          "overhead in the sharded program as the mesh grows:")
    for r in rows:
        d = r["devices"]
        print(f"#   D={d}: {r['s_it']/base:5.2f}x 1-device time "
              f"(ideal {d:.2f}x) -> per-device overhead "
              f"{(r['s_it']/base/d-1)*100:+.0f}%")
    # shard-count semantic invariance is covered by tests (identical DATA
    # per D is impossible here: each D draws its own M = m_per*D problem)


def collectives(n_samples: int):
    """Per-engine psum accounting per steady-state iteration, computed from
    the pass structure (one planar f32 N-vector column per forward-pass
    column; A^T products and marker-space vector math are shard-local)."""
    from gvamp_tpu.ops.layout import PlanarLayout

    lay = PlanarLayout.create(n_samples)
    col_mb = 4 * lay.n_bytes * 4 / 1e6  # [4, Nb] f32
    cg_it = 2   # measured steady-state CG iterations (BASELINE.md)
    T = 8
    # columns psummed per iteration (use_slq default: no probe columns):
    #   linear: cg_it CG forward passes x 1 column + 1 rider column (z1)
    #   probit/Huber: atx(p2) is local; cg_it forward passes; z2 tracked
    #   multi-trait T: T columns per CG pass + T riders
    rows = {
        "linear (fold_noise+slq)": cg_it + 1,
        "probit/Huber (tracked z2+slq)": cg_it,
        f"multi-trait T={T}": (cg_it + 1) * T,
        "linear, probe path (no slq)": (cg_it + 1) * 2,  # +P probe columns
    }
    print(f"# psum payload per steady-state iteration at N={n_samples} "
          f"(one [4, Nb] f32 column = {col_mb:.2f} MB; cg_it={cg_it}):")
    for name, cols in rows.items():
        mb = cols * col_mb
        print(f"#   {name:34s} {cols:3d} columns = {mb:8.2f} MB "
              f"(~{mb/45e3*1e6:.0f} us at 45 GB/s ICI)")


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
    if len(sys.argv) > 1 and sys.argv[1] == "--weak-child":
        weak_child(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]),
                   int(sys.argv[5]))
    elif len(sys.argv) > 1 and sys.argv[1] == "--weak-scaling":
        weak_scaling(int(sys.argv[2]) if len(sys.argv) > 2 else 4096,
                     int(sys.argv[3]) if len(sys.argv) > 3 else 8192,
                     int(sys.argv[4]) if len(sys.argv) > 4 else 3)
    elif len(sys.argv) > 1 and sys.argv[1] == "--collectives":
        collectives(int(sys.argv[2]) if len(sys.argv) > 2 else 400000)
    else:
        main()
