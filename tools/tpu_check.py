"""Hardware-accuracy check: every Pallas kernel vs an f64 numpy oracle ON THE
REAL DEVICE.  The CPU test suite runs kernels in interpret mode, which a
TPU-only lowering hazard can slip past (e.g. XLA's allow-excess-precision
folding of bf16 splits, fixed in ops/matvec.py) — run this after any kernel
or compiler-version change:  python tools/tpu_check.py
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from gvamp_tpu.ops import matvec

TOL = 5e-7


def main():
    assert jax.default_backend() != "cpu", "run on the real device"
    rng = np.random.default_rng(0)
    Nw, M, B = 64, 2048, 3
    words_np = rng.integers(0, 2**32, size=(Nw, M), dtype=np.uint64).astype(np.uint32)
    words = jnp.asarray(words_np)
    W = rng.standard_normal((M, B)).astype(np.float32)
    U = (rng.standard_normal((M, B)) * 0.1).astype(np.float32)
    V = rng.standard_normal((4, 4 * Nw, B)).astype(np.float32)

    by = words_np.T.copy().view(np.uint8).reshape(M, 4 * Nw)
    z64 = np.zeros((4, 4 * Nw, B))
    ra64 = np.zeros((M, B)); rb64 = np.zeros((M, B))
    for k in range(4):
        code = (by >> (2 * k)) & 3
        a = np.select([code == 0, code == 2], [2.0, 1.0], 0.0)
        b = (code != 1).astype(np.float64)
        z64[k] = a.T @ W.astype(np.float64) - b.T @ U.astype(np.float64)
        ra64 += a @ V[k].astype(np.float64)
        rb64 += b @ V[k].astype(np.float64)

    def rel(x, ref):
        return float(np.abs(np.asarray(x) - ref).max() / np.abs(ref).max())

    checks = {
        "ax_pallas": rel(matvec.ax_pallas(words, jnp.asarray(W[:, 0]),
                                          jnp.asarray(U[:, 0])), z64[..., 0]),
        "axm_pallas(bf16)": rel(matvec.axm_pallas(words, jnp.asarray(W),
                                                  jnp.asarray(U)), z64),
        "axm_i8_pallas": rel(matvec.axm_i8_pallas(words, jnp.asarray(W),
                                                  jnp.asarray(U)), z64),
    }
    ia, ib = matvec.atxm_i8_pallas(words, jnp.asarray(V))
    fa, fb = matvec.atxm_pallas(words, jnp.asarray(V))
    sa, sb = matvec.atx_pallas(words, jnp.asarray(V[..., 0]))
    checks["atx_pallas"] = max(rel(sa, ra64[:, 0]), rel(sb, rb64[:, 0]))
    checks["atxm_pallas(bf16)"] = max(rel(fa, ra64), rel(fb, rb64))
    checks["atxm_i8_pallas"] = max(rel(ia, ra64), rel(ib, rb64))
    checks["atxm_i8a_pallas"] = rel(
        matvec.atxm_i8a_pallas(words, jnp.asarray(V)), ra64)

    # Production-size adversarial case (advisor r1): the radix-127 digit
    # error is O(M * colmax / 127^NDIG) worst-case, so a constant-sign RHS
    # at production contraction length must stay within the documented
    # bound.  M=131072 matches the measured BASELINE config.
    Mbig = 131072
    wb_np = rng.integers(0, 2**32, size=(8, Mbig), dtype=np.uint64).astype(np.uint32)
    wbig = jnp.asarray(wb_np)
    Wbig = np.abs(rng.standard_normal((Mbig, 2))).astype(np.float32)  # one sign
    by_b = wb_np.T.copy().view(np.uint8).reshape(Mbig, 32)
    zb64 = np.zeros((4, 32, 2))
    for k in range(4):
        code = (by_b >> (2 * k)) & 3
        a = np.select([code == 0, code == 2], [2.0, 1.0], 0.0)
        zb64[k] = a.T @ Wbig.astype(np.float64)
    checks["axm_i8a (M=131k, const-sign)"] = rel(
        matvec.axm_i8a_pallas(wbig, jnp.asarray(Wbig), tnw=8, tm=512), zb64)

    bad = {k: v for k, v in checks.items() if v > TOL}
    for k, v in checks.items():
        print(f"{'FAIL' if v > TOL else 'ok  '} {k:30s} relerr {v:.3g}")
    if bad:
        sys.exit(1)

    # round-3 fused Gram kernels vs their (checked-above) two-pass
    # compositions — bench_gram.correctness covers gram_i8[a],
    # gram_aat_i8[a] and axm_i8s on small hardware shapes
    from tools import bench_gram
    if not bench_gram.correctness():
        sys.exit(1)
    print("all kernels hardware-exact")


if __name__ == "__main__":
    main()
