"""Kernel-variant microbenchmarks: where does the packed-matvec time go?

Round-2 roofline study (VERDICT #2).  Measures, on the real TPU at a
bandwidth-bound size, a ladder of stripped-down Pallas kernels between
"stream the words" and the production kernels, plus candidate restructurings:

  v0_stream      load u32 tile, 1 add/word                  -> HBM+grid ceiling
  v1_decode_a    SWAR a-decode all 4 planes, u32 add        -> decode ALU cost
  v2_decode_ab   SWAR a+b decode all 4 planes, u32 adds     -> full decode cost
  v3_bitcast     decode + bitcast int8 + int8 add           -> relayout cost
  v4_dot         decode + bitcast + 4 per-plane dots        == axm_i8a body
  v5_dot1        decode into int8 scratch, ONE stacked dot  -> dispatch cost
  v6_fused_ab    (missing path) a,b dots fused via K-concat with a joint
                 digit scale: [a8|b8] @ [[w8],[-u8]] in one dot per plane
                 -> halves dot count + out blocks vs axm_i8

Usage: python tools/bench_variants.py [NW] [M] [reps]
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

NW = (int(sys.argv[1]) if __name__ == "__main__" and len(sys.argv) > 1 else 6400)
M = (int(sys.argv[2]) if __name__ == "__main__" and len(sys.argv) > 2 else 65536)
REPS = (int(sys.argv[3]) if __name__ == "__main__" and len(sys.argv) > 3 else 4)
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


def timeit(fn, *args, reps=None):
    # read the module global at CALL time (an importer's argv can't reach
    # the __main__-guarded parse above, so a default bound at import would
    # silently pin reps=4)
    reps = REPS if reps is None else reps
    for _ in range(2):
        out = fn(*args)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)[:1]))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)[:1]))
    return (time.perf_counter() - t0) / reps


# ---- v0: stream only -------------------------------------------------------

def _i32(x):
    return pltpu.bitcast(x, jnp.int32) if x.dtype == jnp.uint32 else x


def _v0_kernel(g_ref, o_ref):
    @pl.when(pl.program_id(1) == 0)
    def _():
        o_ref[...] = jnp.zeros(o_ref.shape, o_ref.dtype)
    o_ref[...] += jnp.sum(_i32(g_ref[...]), axis=1, keepdims=True).T


@jax.jit
def v0_stream(words):
    Nw, Mm = words.shape
    return pl.pallas_call(
        _v0_kernel, grid=(Nw // TNW, Mm // TM),
        in_specs=[pl.BlockSpec((TNW, TM), lambda i, j: (i, j), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, TNW), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, Nw), jnp.int32),
    )(words)


# ---- v1/v2: decode only ----------------------------------------------------

def _v1_kernel(g_ref, o_ref):
    @pl.when(pl.program_id(1) == 0)
    def _():
        o_ref[...] = jnp.zeros(o_ref.shape, o_ref.dtype)
    g = g_ref[...]
    acc = jnp.zeros((TNW, TM), jnp.uint32)
    for k in range(4):
        a, _ = _swar(g, k)
        acc += a
    o_ref[...] += jnp.sum(_i32(acc), axis=1, keepdims=True).T


@jax.jit
def v1_decode_a(words):
    Nw, Mm = words.shape
    return pl.pallas_call(
        _v1_kernel, grid=(Nw // TNW, Mm // TM),
        in_specs=[pl.BlockSpec((TNW, TM), lambda i, j: (i, j), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, TNW), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, Nw), jnp.int32),
    )(words)


def _v2_kernel(g_ref, o_ref):
    @pl.when(pl.program_id(1) == 0)
    def _():
        o_ref[...] = jnp.zeros(o_ref.shape, o_ref.dtype)
    g = g_ref[...]
    acc = jnp.zeros((TNW, TM), jnp.uint32)
    for k in range(4):
        a, b = _swar(g, k)
        acc += a + b
    o_ref[...] += jnp.sum(_i32(acc), axis=1, keepdims=True).T


@jax.jit
def v2_decode_ab(words):
    Nw, Mm = words.shape
    return pl.pallas_call(
        _v2_kernel, grid=(Nw // TNW, Mm // TM),
        in_specs=[pl.BlockSpec((TNW, TM), lambda i, j: (i, j), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, TNW), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, Nw), jnp.int32),
    )(words)


# ---- v3: + bitcast to int8 -------------------------------------------------

def _v3_kernel(g_ref, o_ref):
    @pl.when(pl.program_id(1) == 0)
    def _():
        o_ref[...] = jnp.zeros(o_ref.shape, o_ref.dtype)
    g = g_ref[...]
    acc = jnp.zeros((4 * TNW, TM), jnp.int32)
    for k in range(4):
        a, _ = _swar(g, k)
        a8 = pltpu.bitcast(a, jnp.int8)
        acc += a8.astype(jnp.int32)
    o_ref[...] += jnp.sum(acc, axis=1, keepdims=True).T


@jax.jit
def v3_bitcast(words):
    Nw, Mm = words.shape
    return pl.pallas_call(
        _v3_kernel, grid=(Nw // TNW, Mm // TM),
        in_specs=[pl.BlockSpec((TNW, TM), lambda i, j: (i, j), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 4 * TNW), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 4 * Nw), jnp.int32),
    )(words)


# ---- v5: decode into scratch, one stacked dot ------------------------------

def _v5_kernel(g_ref, w8_ref, za_ref, a_scr):
    @pl.when(pl.program_id(1) == 0)
    def _():
        za_ref[...] = jnp.zeros(za_ref.shape, za_ref.dtype)
    g = g_ref[...]
    for k in range(4):
        a, _ = _swar(g, k)
        a_scr[k] = pltpu.bitcast(a, jnp.int8)
    a_all = a_scr[...].reshape(4 * 4 * TNW, TM)
    za_ref[...] += jax.lax.dot_general(
        a_all, w8_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32).reshape(za_ref.shape)


@functools.partial(jax.jit, static_argnames=("B",))
def v5_dot1(words, W, B=2):
    Nw, Mm = words.shape
    w8, ws = _quant_digits(W, 1)
    D = _NDIG * B
    za = pl.pallas_call(
        _v5_kernel, grid=(Nw // TNW, Mm // TM),
        in_specs=[
            pl.BlockSpec((TNW, TM), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, D), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((4, 4 * TNW, D), lambda i, j: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, 4 * Nw, D), jnp.int32),
        scratch_shapes=[pltpu.VMEM((4, 4 * TNW, TM), jnp.int8)],
    )(words, w8)
    return _fold_digits(za, ws[0][None, None, :], B)


# ---- v6: fused a,b dot via K-concat (joint digit scale) --------------------

def _v6_kernel(g_ref, wu8_ref, z_ref):
    @pl.when(pl.program_id(1) == 0)
    def _():
        z_ref[...] = jnp.zeros(z_ref.shape, z_ref.dtype)
    g = g_ref[...]
    wu8 = wu8_ref[...]          # [2*TM, D]: rows [w8; -u8]
    for k in range(4):
        a_sw, b_sw = _swar(g, k)
        a8 = pltpu.bitcast(a_sw, jnp.int8)
        b8 = pltpu.bitcast(b_sw, jnp.int8)
        ab = jnp.concatenate([a8, b8], axis=1)   # [4*TNW, 2*TM]
        z_ref[k] += jax.lax.dot_general(
            ab, wu8, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)


@jax.jit
def v6_fused_ab(words, W, U):
    Nw, Mm = words.shape
    B = W.shape[1]
    # joint scale so the fused int32 result folds with one scale set
    wu = jnp.concatenate([W, -U], axis=0)        # [2M, B]
    wu8, s = _quant_digits(wu, 1)
    D = _NDIG * B
    z = pl.pallas_call(
        _v6_kernel, grid=(Nw // TNW, Mm // TM),
        in_specs=[
            pl.BlockSpec((TNW, TM), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * TM, D),
                         lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((4, 4 * TNW, D), lambda i, j: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, 4 * Nw, D), jnp.int32),
    )(words, wu8.reshape(2, Mm, D).transpose(1, 0, 2).reshape(2 * Mm, D))
    return _fold_digits(z, s[0][None, None, :], B)


def main():
    assert jax.default_backend() != "cpu"
    words = synth_words(NW, M)
    packed_gb = NW * 4 * M / 1e9
    print(f"packed = {packed_gb:.2f} GB  (NW={NW}, M={M})  TNW={TNW} TM={TM}")
    rng = np.random.default_rng(0)
    W2 = jnp.asarray(rng.standard_normal((M, 2)).astype(np.float32))
    U2 = W2 * 0.01

    def rec(name, dt):
        print(f"{name:30s} {dt*1e3:8.2f} ms   {packed_gb/dt:7.1f} GB/s", flush=True)

    rec("v0_stream", timeit(v0_stream, words))
    rec("v1_decode_a", timeit(v1_decode_a, words))
    rec("v2_decode_ab", timeit(v2_decode_ab, words))
    rec("v3_bitcast", timeit(v3_bitcast, words))
    rec("v4_dot (=axm_i8a B=2)", timeit(matvec.axm_i8a_pallas, words, W2))
    try:
        rec("v5_dot1 (stacked)", timeit(v5_dot1, words, W2))
    except Exception as e:
        print("v5_dot1 failed:", str(e)[:200])
    try:
        z6 = v6_fused_ab(words, W2, U2)
        zref = matvec.axm_i8_pallas(words, W2, U2)
        err = float(jnp.max(jnp.abs(z6 - zref)) / jnp.max(jnp.abs(zref)))
        rec(f"v6_fused_ab (err={err:.1e})", timeit(v6_fused_ab, words, W2, U2))
    except Exception as e:
        print("v6_fused_ab failed:", str(e)[:200])
    rec("ref axm_i8 B=2", timeit(matvec.axm_i8_pallas, words, W2, U2))


if __name__ == "__main__":
    main()


# ---- v7: int8-input decode (no in-kernel bitcast) --------------------------
# The words buffer is stored pre-expanded as int8[4Nw, M] (same bytes, host
# reinterpretation — zero extra HBM).  Decode runs as int8 elementwise ops;
# if Mosaic executes those at full lane rate this deletes the 2.5 ms
# bitcast relayout, if it emulates them via i32 unpack it re-pays it.

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
