"""Stream-ceiling study: how fast can a Pallas kernel read the packed words?

v0 in bench_variants measured 163 GB/s — 20% of v5e HBM.  This sweeps tile
shapes, grid orientation and dimension_semantics, against an XLA jnp.sum
reference, to find the pipeline configuration that saturates HBM.

Usage: python tools/bench_stream.py [NW] [M] [reps]
"""
import sys, os, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from tools.bench_variants import synth_words, timeit

NW = int(sys.argv[1]) if len(sys.argv) > 1 else 6400
M = int(sys.argv[2]) if len(sys.argv) > 2 else 65536
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 4


def _stream_kernel(g_ref, o_ref):
    # elementwise accumulate: touches every word with ONE VPU add, no
    # cross-lane reduction (which is what stream_sum pays for)
    @pl.when(pl.program_id(1) == 0)
    def _():
        o_ref[...] = jnp.zeros(o_ref.shape, o_ref.dtype)
    o_ref[...] += pltpu.bitcast(g_ref[...], jnp.int32)


@functools.partial(jax.jit, static_argnames=("tnw", "tm", "sem"))
def stream(words, tnw=256, tm=512, sem=None):
    Nw, Mm = words.shape
    params = {}
    if sem is not None:
        params["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=sem)
    return pl.pallas_call(
        _stream_kernel, grid=(Nw // tnw, Mm // tm),
        in_specs=[pl.BlockSpec((tnw, tm), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((tnw, tm), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Nw, tm), jnp.int32),
        **params,
    )(words)


def _stream_sum_kernel(g_ref, o_ref):
    @pl.when(pl.program_id(1) == 0)
    def _():
        o_ref[...] = jnp.zeros(o_ref.shape, o_ref.dtype)
    g = pltpu.bitcast(g_ref[...], jnp.int32)
    o_ref[...] += jnp.sum(g, axis=1, keepdims=True).T


@functools.partial(jax.jit, static_argnames=("tnw", "tm", "sem"))
def stream_sum(words, tnw=256, tm=512, sem=None):
    Nw, Mm = words.shape
    params = {}
    if sem is not None:
        params["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=sem)
    return pl.pallas_call(
        _stream_sum_kernel, grid=(Nw // tnw, Mm // tm),
        in_specs=[pl.BlockSpec((tnw, tm), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, tnw), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, Nw), jnp.int32),
        **params,
    )(words)


@jax.jit
def xla_sum(words):
    return jnp.sum(words.view(jnp.int32) if hasattr(words, "view")
                   else words.astype(jnp.int32), keepdims=True)[None]


def main():
    assert jax.default_backend() != "cpu"
    words = synth_words(NW, M)
    gb = NW * 4 * M / 1e9
    print(f"packed = {gb:.2f} GB  (NW={NW}, M={M})")

    def rec(name, fn, *args):
        try:
            dt = timeit(fn, *args, reps=REPS)
            print(f"{name:44s} {dt*1e3:8.2f} ms   {gb/dt:7.1f} GB/s",
                  flush=True)
        except Exception as e:
            print(f"{name:44s} FAILED: {str(e)[:120]}", flush=True)

    rec("xla_sum (HBM reference)", xla_sum, words)
    for tnw, tm in ((256, 512), (128, 1024), (256, 1024), (512, 1024),
                    (256, 2048), (128, 4096), (64, 8192)):
        if NW % tnw or M % tm:
            continue
        rec(f"stream tnw={tnw} tm={tm}",
            functools.partial(stream, tnw=tnw, tm=tm), words)
    for sem in (("parallel", "arbitrary"), ("arbitrary", "arbitrary")):
        rec(f"stream 256x512 sem={sem}",
            functools.partial(stream, tnw=256, tm=512, sem=sem), words)
        rec(f"stream_sum 256x512 sem={sem}",
            functools.partial(stream_sum, tnw=256, tm=512, sem=sem), words)
    rec("stream_sum 256x512 (default sem)",
        functools.partial(stream_sum, tnw=256, tm=512), words)
    rec("stream_sum 128x2048",
        functools.partial(stream_sum, tnw=128, tm=2048), words)


if __name__ == "__main__":
    main()
