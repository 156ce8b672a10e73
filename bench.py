"""Benchmark: wall-clock per linear-VAMP iteration on the BASELINE config.

Config = BASELINE.json configs[0]: linear VAMP on simulated data, N=5k,
M=20k, 3-component mixture, CG LMMSE.  The reference publishes no numbers
(BASELINE.md), so the baseline was MEASURED: the actual reference C++ was
compiled on this host (g++ -march=native -DMANVECT -Ofast, single-rank MPI
stub, 1 CPU core with AVX-512) and run on this exact config — 2.09 s per
VAMP iteration steady-state (mean of iterations 2-6 of sim.cpp's own
timers; see BASELINE.md "Measured" section).  vs_baseline is that number
over our per-iteration wall-clock.  Estimate parity on the identical
dataset: corr(ours, reference it 6) = 0.99997.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Timing discipline: everything stays on device; the only host fetches are tiny
scalars, amortized over K iterations (remote-tunnel TPU attachments make
per-call fetches expensive).
"""

import json
import os
import sys
import time

import numpy as np

N = int(os.environ.get("BENCH_N", 5000))
M = int(os.environ.get("BENCH_M", 20480))
K_ITERS = int(os.environ.get("BENCH_ITERS", 8))


def main():
    import jax
    import jax.numpy as jnp
    from gvamp_tpu.data import GenoBed
    from gvamp_tpu.ops.layout import PlanarLayout
    from gvamp_tpu import linear, sim

    rng = np.random.default_rng(0)
    lay = PlanarLayout.create(N)
    mpad = ((M + 511) // 512) * 512

    # synthetic packed genotypes generated ON DEVICE.  The measured reference
    # baseline ran the sim.cpp recipe, whose genotypes have NO missing calls
    # (BASELINE.md); generate the same: remap every 2-bit "01" missing code
    # to "11" so the complete-data fast path engages, like imputed data.
    raw = jax.random.bits(jax.random.key(0), (lay.n_words, mpad), dtype=jnp.uint32)
    lo = raw & np.uint32(0x55555555)
    hi = (raw >> np.uint32(1)) & np.uint32(0x55555555)
    is01 = lo & ~hi
    words = raw | (is01 << np.uint32(1))
    geno = GenoBed.from_device_words(words, np.zeros(N), N=N, M=M,
                                     standardize_phen=False)

    vars_t, probs_t = sim.two_group_prior(M, 1000, 0.5)
    beta = sim.simulate_mixture(rng, M, vars_t, probs_t)
    y = sim.simulate_linear_phenotype(geno, beta[:M], 2.0, rng)
    geno.set_phen(y)

    cfg = linear.VampConfig(max_iter=K_ITERS + 2, rho=0.15, gam1_init=1e-8,
                            gamw_init=2.0)
    state = linear.init_state(geno, cfg, probs_t, vars_t)
    aux = linear.make_aux(geno, cfg)
    step = linear.make_step(geno, cfg)
    scan_step = linear.make_scan_step(geno, cfg, K_ITERS)

    # warmup: compile + 2 iterations (CG iteration counts stabilize), then
    # TWO scan executions — the first post-compile run pays a one-time
    # executable-upload/autotune cost through the tunnel
    state, metrics = step(state, aux)
    state, metrics = step(state, aux)
    _s, _m = scan_step(state, aux)
    float(_m["gam1"][-1])  # sync
    _s, _m = scan_step(state, aux)
    float(_m["gam1"][-1])

    # throughput mode: K iterations per dispatch (linear.make_scan_step).
    # Fetch results with device_get (a raw transfer) — jnp indexing would
    # compile tiny gather programs through the remote-compile server.
    t0 = time.perf_counter()
    state, metrics = scan_step(state, aux)
    metrics = {k: np.asarray(v)[-1] for k, v in jax.device_get(metrics).items()}
    dt_iter = (time.perf_counter() - t0) / K_ITERS
    cg_it = float(metrics["cg_iters"])
    probe_it = float(metrics["probe_iters"])
    gam1 = float(metrics["gam1"])

    # single-pass-equivalents per iteration after the block-CG redesign:
    # joint block CG (width 2, ax+atx per it incl init) + z1 + the final
    # width-2 axm for [x2, invq]; ATy and A@bern are precomputed in aux.
    passes = 2 * (max(cg_it, probe_it) + 1) + 1 + 1
    packed_bytes = lay.n_words * 4 * mpad
    eff_gbs = passes * packed_bytes / dt_iter / 1e9

    # ---- measured reference baseline (BASELINE.md): 2.09 s/iteration on
    # this host's CPU (1 core, AVX-512, -DMANVECT -Ofast), same config
    REF_ITER_S = 2.09
    vs_baseline = REF_ITER_S / dt_iter

    out = {
        "metric": "linear_vamp_iter_wallclock_N5k_M20k",
        "value": round(dt_iter * 1e3, 3),
        "unit": "ms",
        "vs_baseline": round(vs_baseline, 2),
    }
    print(json.dumps(out))
    print(f"# backend={jax.default_backend()} passes/it={passes:.0f} "
          f"packed={packed_bytes/1e9:.2f}GB eff_bandwidth={eff_gbs:.0f}GB/s "
          f"gam1={gam1:.4g} cg_it={cg_it:.0f}", file=sys.stderr)


if __name__ == "__main__":
    main()
