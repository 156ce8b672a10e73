"""Burst-mode kernel profiling: amortize the ~10 ms axon dispatch overhead.

A single host dispatch through the axon tunnel costs ~10 ms regardless of
work (measured: xla_sum at 0.42/1.68/3.36 GB = 10.5/11.8/13.6 ms, i.e. a
10.2 ms intercept and ~913 GB/s marginal HBM bandwidth).  Every per-call
measurement therefore overstates kernel time massively.  This tool times a
jitted burst of K chained kernel calls (distinct RHS columns defeat CSE)
and reports the marginal per-call time: (T_burst - T_1call) / (K - 1).

Usage: python tools/bench_burst.py [NW] [M] [K]
"""
import sys, os, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
from gvamp_tpu.ops import matvec
from tools.bench_variants import synth_words

NW = (int(sys.argv[1]) if __name__ == "__main__" and len(sys.argv) > 1 else 6400)
M = (int(sys.argv[2]) if __name__ == "__main__" and len(sys.argv) > 2 else 65536)
K = (int(sys.argv[3]) if __name__ == "__main__" and len(sys.argv) > 3 else 6)


def time_burst(make_burst, args, k, reps=3):
    """make_burst(k) -> jitted fn of *args returning a scalar.  The arrays
    MUST be jit arguments, not closure captures — a closed-over device
    array becomes a jaxpr constant and the 1.7 GB buffer is shipped to the
    remote compile server (minutes per compile through the tunnel).
    ``k`` is the burst chain length — explicit, NOT the module global,
    so importers (bench_gram) time the chain length they asked for."""
    f1, fk = make_burst(1), make_burst(k)
    for f in (f1, fk):
        float(f(*args))          # compile + run
        float(f(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        float(f1(*args))
    t1 = (time.perf_counter() - t0) / reps
    t0 = time.perf_counter()
    for _ in range(reps):
        float(fk(*args))
    tk = (time.perf_counter() - t0) / reps
    return (tk - t1) / (k - 1), t1


def main():
    assert jax.default_backend() != "cpu"
    words = synth_words(NW, M)
    gb = NW * 4 * M / 1e9
    print(f"packed = {gb:.2f} GB  (NW={NW}, M={M})  K={K}")
    rng = np.random.default_rng(0)
    W2 = jnp.asarray(rng.standard_normal((M, 2)).astype(np.float32))
    U2 = W2 * 0.01
    V2 = jnp.asarray(rng.standard_normal((4, 4 * NW, 2)).astype(np.float32))
    w1 = jnp.asarray(rng.standard_normal(M).astype(np.float32))
    u1 = w1 * 0.01
    v1 = jnp.asarray(rng.standard_normal((4, 4 * NW)).astype(np.float32))

    def rec(name, make_burst, args):
        dt, t1 = time_burst(make_burst, args, K)
        print(f"{name:28s} {dt*1e3:8.2f} ms   {gb/dt:7.1f} GB/s   "
              f"(1-call {t1*1e3:.2f} ms)", flush=True)

    def mk(kfn, nargs, perturb=0):
        # chain k calls; scalar accumulators keep every call live
        def make(k):
            @jax.jit
            def burst(*args):
                acc = jnp.float32(0)
                for i in range(k):
                    out = kfn(*[a + jnp.float32(i) * 1e-6 if j == perturb
                                else a for j, a in enumerate(args)])
                    leaf = jax.tree_util.tree_leaves(out)[0]
                    acc += jnp.sum(leaf.ravel()[:8])
                return acc
            return burst
        return make

    def mk_xla_sum(k):
        # xor-perturb per call: stays uint32 (a float perturbation would
        # materialize K full-size f32 copies), defeats CSE
        @jax.jit
        def burst(w):
            acc = jnp.int32(0)
            for i in range(k):
                acc += jnp.sum((w ^ jnp.uint32(i)).astype(jnp.int32))
            return acc
        return burst

    rec("xla_sum", mk_xla_sum, (words,))
    rec("axm_i8 B=2", mk(matvec.axm_i8_pallas, 3, perturb=1),
        (words, W2, U2))
    rec("axm_i8a B=2", mk(matvec.axm_i8a_pallas, 2, perturb=1), (words, W2))
    rec("atxm_i8 B=2", mk(matvec.atxm_i8_pallas, 2, perturb=1), (words, V2))
    rec("atxm_i8a B=2", mk(matvec.atxm_i8a_pallas, 2, perturb=1),
        (words, V2))
    for B in (32,):
        WB = jnp.asarray(rng.standard_normal((M, B)).astype(np.float32))
        rec(f"axm_i8a B={B}", mk(matvec.axm_i8a_pallas, 2, perturb=1),
            (words, WB))


if __name__ == "__main__":
    main()
