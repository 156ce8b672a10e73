"""Round-3 fused-Gram kernel study: hardware correctness + burst-marginal
rates for the one-HBM-pass Gram kernels vs their two-pass compositions.

Usage: python tools/bench_gram.py [NW] [M] [K]     (defaults 6400 65536 6)

Times with the burst-marginal method (tools/bench_burst.py): a jitted
chain of K perturbed calls amortizes the ~10 ms axon dispatch intercept.
"""
import sys, os, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
from gvamp_tpu.ops import matvec
from tools.bench_variants import synth_words
from tools.bench_burst import time_burst

NW = (int(sys.argv[1]) if __name__ == "__main__" and len(sys.argv) > 1 else 6400)
M = (int(sys.argv[2]) if __name__ == "__main__" and len(sys.argv) > 2 else 65536)
K = (int(sys.argv[3]) if __name__ == "__main__" and len(sys.argv) > 3 else 6)


def complete_words(nw, m):
    w = synth_words(nw, m, chunk=min(4096, m))

    @jax.jit
    def remap(w):
        lo = w & jnp.uint32(0x55555555)
        hi = (w >> jnp.uint32(1)) & jnp.uint32(0x55555555)
        return w | ((lo & ~hi) << jnp.uint32(1))
    out = remap(w)
    float(jnp.sum(out[0, :8].astype(jnp.float32)))
    return out


def check(name, got, want, tol=1e-5):
    got, want = np.asarray(got), np.asarray(want)
    rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-30)
    flag = "OK " if rel < tol else "FAIL"
    print(f"  {flag} {name:26s} rel={rel:.2e}", flush=True)
    return rel < tol


def correctness():
    """Small-shape hardware-exactness vs the (trusted) two-pass kernels."""
    print("hardware correctness (NW=64, M=2048):", flush=True)
    rng = np.random.default_rng(3)
    nw, m, B = 64, 2048, 2
    wm = synth_words(nw, m, chunk=min(4096, m))   # has missing codes
    wc = complete_words(nw, m)
    W = jnp.asarray(rng.standard_normal((m, B)).astype(np.float32))
    mave = jnp.asarray(rng.uniform(0, 2, m).astype(np.float32))
    msig2 = jnp.asarray(rng.uniform(0.5, 2, m).astype(np.float32))
    U = mave[:, None] * W
    na = jnp.asarray((rng.random((4, 4 * nw)) > 0.05).astype(np.float32))
    cu = jnp.sum(U, axis=0)
    V = jnp.asarray(rng.standard_normal((4, 4 * nw, B)).astype(np.float32))
    ok = True

    za = matvec.axm_i8a_pallas(wc, W)
    z = (za - cu[None, None, :]) * na[:, :, None]
    av, sv = matvec.gram_i8a_pallas(wc, W, na, cu)
    ok &= check("gram_i8a av", av, matvec.atxm_i8a_pallas(wc, z))
    ok &= check("gram_i8a sv", sv, jnp.sum(z, axis=(0, 1)))

    zm = matvec.axm_i8_pallas(wm, W, U) * na[:, :, None]
    avm, bvm = matvec.gram_i8_pallas(wm, W, U, na)
    am, bm = matvec.atxm_i8_pallas(wm, zm)
    ok &= check("gram_i8 av", avm, am)
    ok &= check("gram_i8 bv", bvm, bm)

    ok &= check("axm_i8s", matvec.axm_i8s_pallas(wm, W, U),
                matvec.axm_i8_pallas(wm, W, U))

    a2, b2 = matvec.atxm_i8_pallas(wm, V)
    t = msig2[:, None] * (a2 - mave[:, None] * b2)
    zr = matvec.axm_i8_pallas(wm, t, mave[:, None] * t)
    ok &= check("gram_aat_i8",
                matvec.gram_aat_i8_pallas(wm, V, mave, msig2), zr)
    a2c, b2c = matvec.atxm_i8_pallas(wc, V)
    tc = msig2[:, None] * (a2c - mave[:, None] * b2c)
    zrc = matvec.axm_i8_pallas(wc, tc, mave[:, None] * tc)
    ok &= check("gram_aat_i8a",
                matvec.gram_aat_i8a_pallas(wc, V, mave, msig2), zrc, 2e-5)
    return ok


def main():
    assert jax.default_backend() != "cpu"
    if not correctness():
        print("CORRECTNESS FAILED — not timing", flush=True)
        return
    gb = NW * 4 * M / 1e9
    print(f"\nburst-marginal at packed = {gb:.2f} GB (NW={NW}, M={M}, K={K}):",
          flush=True)
    rng = np.random.default_rng(0)
    wc = complete_words(NW, M)
    wm = synth_words(NW, M)
    B = 2
    W = jnp.asarray(rng.standard_normal((M, B)).astype(np.float32))
    mave = jnp.asarray(rng.uniform(0, 2, M).astype(np.float32))
    msig2 = jnp.asarray(rng.uniform(0.5, 2, M).astype(np.float32))
    U = mave[:, None] * W
    na = jnp.asarray(np.ones((4, 4 * NW), np.float32))
    cu = jnp.sum(U, axis=0)
    V = jnp.asarray(rng.standard_normal((4, 4 * NW, B)).astype(np.float32))

    def rec(name, make_burst, args, streams=1.0):
        dt, t1 = time_burst(make_burst, args, K)
        print(f"{name:30s} {dt*1e3:8.2f} ms   {gb*streams/dt:7.1f} GB/s "
              f"eff   (1-call {t1*1e3:.2f} ms)", flush=True)

    def mk(kfn, perturb=1):
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

    # two-pass compositions (the quantity the gram kernels replace);
    # "GB/s eff" counts the TWO streams a composition reads
    def comp_a(w, W, na, cu):
        z = (matvec.axm_i8a_pallas(w, W) - cu[None, None, :]) * na[:, :, None]
        return matvec.atxm_i8a_pallas(w, z)

    def comp_m(w, W, U, na):
        z = matvec.axm_i8_pallas(w, W, U) * na[:, :, None]
        return matvec.atxm_i8_pallas(w, z)

    def comp_aat(w, V, mave, msig2):
        a2, b2 = matvec.atxm_i8_pallas(w, V)
        t = msig2[:, None] * (a2 - mave[:, None] * b2)
        return matvec.axm_i8_pallas(w, t, mave[:, None] * t)

    rec("comp a-only (ax+atx)", mk(comp_a), (wc, W, na, cu), streams=2.0)
    rec("gram_i8a", mk(matvec.gram_i8a_pallas, 1), (wc, W, na, cu))
    rec("comp miss (ax+atx)", mk(comp_m), (wm, W, U, na), streams=2.0)
    rec("gram_i8", mk(matvec.gram_i8_pallas, 1), (wm, W, U, na))
    rec("axm_i8 (miss ax)", mk(matvec.axm_i8_pallas, 1), (wm, W, U))
    rec("axm_i8s (shared-acc)", mk(matvec.axm_i8s_pallas, 1), (wm, W, U))
    def comp_aat_a(w, V, mave, msig2):
        sv = jnp.sum(V, axis=(0, 1))
        a2 = matvec.atxm_i8a_pallas(w, V)
        t = msig2[:, None] * (a2 - mave[:, None] * sv[None, :])
        za = matvec.axm_i8a_pallas(w, t)
        return za - jnp.sum(mave[:, None] * t, axis=0)[None, None, :]

    rec("comp AAT miss", mk(comp_aat), (wm, V, mave, msig2), streams=2.0)
    rec("comp AAT a-only", mk(comp_aat_a), (wc, V, mave, msig2), streams=2.0)
    rec("gram_aat_i8", mk(matvec.gram_aat_i8_pallas, 1), (wm, V, mave, msig2))
    rec("gram_aat_i8a", mk(matvec.gram_aat_i8a_pallas, 1),
        (wc, V, mave, msig2))


if __name__ == "__main__":
    main()
