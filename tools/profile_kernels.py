"""Per-kernel wall-clock + packed-bandwidth profile on the real TPU.

Times each hot kernel at a bandwidth-bound size (default ~1.6 GB packed) and
prints packed GB/s — the roofline currency for the 2-bit matvecs (the decode
expands 16x into lanes, so the ALU, not HBM, is the expected bound; this
script is the evidence).  Timing discipline for the axon tunnel: warm up
twice, time a burst of K calls chained through jnp.sum fetches of tiny
scalars (block_until_ready does not sync through the tunnel).

Usage: python tools/profile_kernels.py [NW] [M] [reps]
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
from gvamp_tpu.ops import matvec

NW = int(sys.argv[1]) if len(sys.argv) > 1 else 6400      # words per marker
M = int(sys.argv[2]) if len(sys.argv) > 2 else 65536      # markers
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 4


def synth_words(nw, m, chunk=4096):
    """On-device random packed words, generated in column chunks (a single
    jax.random.bits of >3 GB OOMs from temps)."""
    @jax.jit
    def gen():
        def body(i, acc):
            k = jax.random.fold_in(jax.random.key(7), i)
            blk = jax.random.bits(k, (nw, chunk), dtype=jnp.uint32)
            return jax.lax.dynamic_update_slice(acc, blk, (0, i * chunk))
        out = jnp.zeros((nw, m), jnp.uint32)
        return jax.lax.fori_loop(0, m // chunk, body, out)
    w = gen()
    float(jnp.sum(w[0, :8].astype(jnp.float32)))  # sync
    return w


def timeit(fn, *args, reps=REPS):
    out = fn(*args)
    s = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(s.astype(jnp.float32)[:1]))      # compile+exec sync
    out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)[:1]))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)[:1]))
    return (time.perf_counter() - t0) / reps


def main():
    assert jax.default_backend() != "cpu"
    words = synth_words(NW, M)
    packed_gb = NW * 4 * M / 1e9
    print(f"packed = {packed_gb:.2f} GB  (NW={NW}, M={M}, N~{NW*16})")
    rng = np.random.default_rng(0)
    w1 = jnp.asarray(rng.standard_normal(M).astype(np.float32))
    u1 = w1 * 0.01
    rows = []

    def rec(name, dt):
        gbs = packed_gb / dt
        rows.append((name, dt * 1e3, gbs))
        print(f"{name:34s} {dt*1e3:8.2f} ms   {gbs:7.1f} GB/s", flush=True)

    for B in (1, 2, 4):
        W = jnp.asarray(rng.standard_normal((M, B)).astype(np.float32))
        U = W * 0.01
        V = jnp.asarray(rng.standard_normal((4, 4 * NW, B)).astype(np.float32))
        rec(f"axm_i8 B={B}", timeit(matvec.axm_i8_pallas, words, W, U))
        rec(f"axm_i8a B={B} (a-only)", timeit(matvec.axm_i8a_pallas, words, W))
        rec(f"atxm_i8 B={B}", timeit(matvec.atxm_i8_pallas, words, V))
        rec(f"atxm_i8a B={B} (a-only)", timeit(matvec.atxm_i8a_pallas, words, V))
    rec("ax_pallas (VPU B=1)", timeit(matvec.ax_pallas, words, w1, u1))
    V1 = jnp.asarray(rng.standard_normal((4, 4 * NW)).astype(np.float32))
    rec("atx_pallas (VPU B=1)", timeit(matvec.atx_pallas, words, V1))
    rec("atx_a_pallas (VPU B=1)", timeit(matvec.atx_a_pallas, words, V1))

    # tile-size sweep for the CG-hot wide kernels at B=2
    W2 = jnp.asarray(rng.standard_normal((M, 2)).astype(np.float32))
    V2 = jnp.asarray(rng.standard_normal((4, 4 * NW, 2)).astype(np.float32))
    for tnw in (64, 128, 256):
        for tm in (256, 512, 1024):
            if NW % tnw or M % tm:
                continue
            rec(f"axm_i8a B=2 tnw={tnw} tm={tm}",
                timeit(lambda w_, x_: matvec.axm_i8a_pallas(w_, x_, tnw=tnw, tm=tm),
                       words, W2))
            rec(f"atxm_i8a B=2 tnw={tnw} tm={tm}",
                timeit(lambda w_, v_: matvec.atxm_i8a_pallas(w_, v_, tnw=tnw, tm=tm),
                       words, V2))


if __name__ == "__main__":
    main()
