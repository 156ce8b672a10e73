"""Rate-vs-B study: how the int8-digit kernels and the fused Gram scale
with the RHS column count B.  D = _NDIG*B rows feed the MXU; at small B
the 128-lane tiles are mostly padding, so rates should climb with B
until the kernels hit the DMA roofline.

Usage: python tools/bench_bscale.py [NW] [M] [K]
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
from gvamp_tpu.ops import matvec
from tools.bench_variants import synth_words
from tools.bench_burst import time_burst
from tools.bench_gram import complete_words


def mk_chain(kfn, perturb=1):
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

NW = int(sys.argv[1]) if len(sys.argv) > 1 else 6400
M = int(sys.argv[2]) if len(sys.argv) > 2 else 65536
K = int(sys.argv[3]) if len(sys.argv) > 3 else 6


def main():
    assert jax.default_backend() != "cpu"
    gb = NW * 4 * M / 1e9
    print(f"packed = {gb:.2f} GB  (NW={NW}, M={M})  K={K}", flush=True)
    rng = np.random.default_rng(0)
    wc = complete_words(NW, M)
    na = jnp.asarray(np.ones((4, 4 * NW), np.float32))
    print(f"{'B':>3s} {'ax ms':>8s} {'ax GB/s':>8s} {'atx ms':>8s} "
          f"{'atx GB/s':>8s} {'gram ms':>8s} {'gram GB/s':>9s} "
          f"{'fused/2pass':>11s}", flush=True)
    for B in (2, 4, 8, 16, 32):
        W = jnp.asarray(rng.standard_normal((M, B)).astype(np.float32))
        V = jnp.asarray(rng.standard_normal((4, 4 * NW, B)).astype(np.float32))
        cu = jnp.zeros((B,), jnp.float32)
        dt_ax, _ = time_burst(mk_chain(matvec.axm_i8a_pallas, 1), (wc, W), K)
        dt_atx, _ = time_burst(mk_chain(matvec.atxm_i8a_pallas, 1), (wc, V), K)
        dt_g, _ = time_burst(mk_chain(matvec.gram_i8a_pallas, 1),
                             (wc, W, na, cu), K)
        print(f"{B:3d} {dt_ax*1e3:8.2f} {gb/dt_ax:8.1f} {dt_atx*1e3:8.2f} "
              f"{gb/dt_atx:8.1f} {dt_g*1e3:8.2f} {gb/dt_g:9.1f} "
              f"{dt_g/(dt_ax+dt_atx):11.2f}", flush=True)


if __name__ == "__main__":
    main()
