"""Round-2 kernel candidates, burst-timed: v7 (int8-input decode, no
bitcast) and v8 (atx via vT @ a — standard contraction, no operand
transpose), against the production kernels.

Usage: python tools/bench_round2.py [NW] [M] [K]
"""
import sys, os, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from gvamp_tpu.ops import matvec
from gvamp_tpu.ops.matvec import _swar, _quant_digits, _fold_digits, _NDIG

NW = int(sys.argv[1]) if len(sys.argv) > 1 else 6400
M = int(sys.argv[2]) if len(sys.argv) > 2 else 65536
K = int(sys.argv[3]) if len(sys.argv) > 3 else 6
TNW, TM = 256, 512


def synth_words(nw, m, chunk=4096):
    @jax.jit
    def gen():
        def body(i, acc):
            k = jax.random.fold_in(jax.random.key(7), i)
            blk = jax.random.bits(k, (nw, chunk), dtype=jnp.uint32)
            return jax.lax.dynamic_update_slice(acc, blk, (0, i * chunk))
        out = jnp.zeros((nw, m), jnp.uint32)
        return jax.lax.fori_loop(0, m // chunk, body, out)
    w = gen()
    float(jnp.sum(w[0, :8].astype(jnp.float32)))
    return w


# ---- v8: atx with standard contraction (vT @ a) ----------------------------

def _v8_kernel(g_ref, v8_ref, av_ref):
    jn = pl.program_id(1)

    @pl.when(jn == 0)
    def _():
        av_ref[...] = jnp.zeros(av_ref.shape, av_ref.dtype)
    g = g_ref[...]
    av = jnp.zeros(av_ref.shape, jnp.int32)
    for k in range(4):
        a_sw, _ = _swar(g, k)
        a8 = pltpu.bitcast(a_sw, jnp.int8)     # [4*TNW, TM]
        vt = v8_ref[k]                         # [D, 4*TNW] int8 (pre-transposed)
        av += jax.lax.dot_general(
            vt, a8, (((1,), (0,)), ((), ())),  # standard matmul: [D, TM]
            preferred_element_type=jnp.int32)
    av_ref[...] += av


@jax.jit
def v8_atxm_vt(words, V):
    """a-only atxm with the RHS pre-transposed: out [D, M] -> [M, B]."""
    Nw, Mm = words.shape
    B = V.shape[2]
    v8, vs = _quant_digits(V, 2)               # [4, 4Nw, D] int8
    vt = jnp.transpose(v8, (0, 2, 1))          # [4, D, 4Nw]
    D = _NDIG * B
    av = pl.pallas_call(
        _v8_kernel, grid=(Mm // TM, Nw // TNW),
        in_specs=[
            pl.BlockSpec((TNW, TM), lambda j, i: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, D, 4 * TNW), lambda j, i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((D, TM), lambda j, i: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((D, Mm), jnp.int32),
        interpret=jax.default_backend() == "cpu",
    )(words, vt)
    return _fold_digits(av.T, vs[0, 0][None, :], B)


# ---- v7: int8-input decode (no in-kernel bitcast) --------------------------

def _v7_kernel(g_ref, w8_ref, za_ref):
    @pl.when(pl.program_id(1) == 0)
    def _():
        za_ref[...] = jnp.zeros(za_ref.shape, za_ref.dtype)
    g = g_ref[...]                      # int8[4*TNW, TM] packed bytes
    w8 = w8_ref[...]
    one = jnp.int8(1)
    for k in range(4):
        c = (g >> jnp.int8(2 * k)) & jnp.int8(3)
        lo = c & one
        hi = (c >> one) & one
        notlo = lo ^ one
        a8 = (notlo << one) - (hi & notlo)
        za_ref[k] += jax.lax.dot_general(
            a8, w8, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)


@jax.jit
def v7_i8decode(bytes8, W):
    N8, Mm = bytes8.shape           # N8 = 4*Nw
    B = W.shape[1]
    w8, ws = _quant_digits(W, 1)
    D = _NDIG * B
    za = pl.pallas_call(
        _v7_kernel, grid=(N8 // (4 * TNW), Mm // TM),
        in_specs=[
            pl.BlockSpec((4 * TNW, TM), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, D), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((4, 4 * TNW, D), lambda i, j: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, N8, D), jnp.int32),
    )(bytes8, w8)
    return _fold_digits(za, ws[0][None, None, :], B)


@jax.jit
def expand_words(words):
    """uint32[Nw, M] -> int8[4Nw, M] on device (one-time relayout).
    Only safe at small sizes — the XLA u8 transpose of a GB-scale array is
    pathologically slow; for timing, generate random int8 directly."""
    Nw, Mm = words.shape
    b = jax.lax.bitcast_convert_type(words.T, jnp.uint8)  # [M, Nw, 4]
    return b.reshape(Mm, 4 * Nw).T.astype(jnp.int8)


def synth_bytes(nw, m, chunk=4096):
    """Random int8[4nw, m] generated on device (timing input for v7; the
    byte DISTRIBUTION matches packed genotypes — uniform bytes)."""
    @jax.jit
    def gen():
        def body(i, acc):
            k = jax.random.fold_in(jax.random.key(9), i)
            blk = jax.random.bits(k, (4 * nw, chunk), dtype=jnp.uint8)
            return jax.lax.dynamic_update_slice(
                acc, blk.astype(jnp.int8), (0, i * chunk))
        out = jnp.zeros((4 * nw, m), jnp.int8)
        return jax.lax.fori_loop(0, m // chunk, body, out)
    b = gen()
    float(jnp.sum(b[0, :8].astype(jnp.float32)))
    return b


def time_burst(make_burst, args, reps=3):
    f1, fk = make_burst(1), make_burst(K)
    for f in (f1, fk):
        float(f(*args))
        float(f(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        float(f1(*args))
    t1 = (time.perf_counter() - t0) / reps
    t0 = time.perf_counter()
    for _ in range(reps):
        float(fk(*args))
    tk = (time.perf_counter() - t0) / reps
    return (tk - t1) / (K - 1), t1


def main():
    assert jax.default_backend() != "cpu"
    words = synth_words(NW, M)
    gb = NW * 4 * M / 1e9
    print(f"packed = {gb:.2f} GB  (NW={NW}, M={M})  K={K}", flush=True)
    rng = np.random.default_rng(0)
    W2 = jnp.asarray(rng.standard_normal((M, 2)).astype(np.float32))
    V2 = jnp.asarray(rng.standard_normal((4, 4 * NW, 2)).astype(np.float32))

    def rec(name, make_burst, args):
        dt, t1 = time_burst(make_burst, args)
        print(f"{name:28s} {dt*1e3:8.2f} ms   {gb/dt:7.1f} GB/s   "
              f"(1-call {t1*1e3:.2f} ms)", flush=True)

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

    # correctness first (tiny fetch of a norm diff, not the arrays)
    ref = matvec.atxm_i8a_pallas(words, V2)
    v8o = v8_atxm_vt(words, V2)
    err8 = float(jnp.max(jnp.abs(v8o - ref)) / jnp.max(jnp.abs(ref)))
    print(f"v8 relerr vs atxm_i8a: {err8:.2e}", flush=True)
    rec("atxm_i8a B=2 (prod)", mk(matvec.atxm_i8a_pallas), (words, V2))
    rec("v8_atxm_vt B=2", mk(v8_atxm_vt), (words, V2))

    # v7 correctness at small size (expand_words transpose is only safe
    # there), then timing on directly-generated random bytes
    try:
        ws = words[:256, :2048]
        Ws = W2[:2048]
        v7s = v7_i8decode(expand_words(ws), Ws)
        refs = matvec.axm_i8a_pallas(ws, Ws)
        err7 = float(jnp.max(jnp.abs(v7s - refs)) / jnp.max(jnp.abs(refs)))
        print(f"v7 relerr vs axm_i8a (small): {err7:.2e}", flush=True)
        bytes8 = synth_bytes(NW, M)
        rec("axm_i8a B=2 (prod)", mk(matvec.axm_i8a_pallas), (words, W2))
        rec("v7_i8decode B=2", mk(v7_i8decode), (bytes8, W2))
    except Exception as e:
        print("v7 failed:", str(e)[:250], flush=True)


if __name__ == "__main__":
    main()
