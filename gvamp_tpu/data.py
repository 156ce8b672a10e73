"""Genotype/phenotype containers: the L2 data layer.

``GenoBed`` owns the packed 2-bit design matrix (word-major uint32, planar N
layout), per-marker statistics, the standardized phenotype and its NA mask,
and exposes the two matvecs ``ax``/``atx`` plus marker/people statistics —
the TPU-native re-design of the reference's ``data`` class (data.hpp:18-146).

Scaling conventions (parity-critical, reference data.cpp):
  * A[n,m] = (g - mave_m) * nonmiss * msig_m / sqrt(N)   (data.cpp:825-832)
  * mave   = mean of dosage over genotype-non-missing AND phenotype-non-NA
             individuals (data.cpp:446-476)
  * msig   = (1 / sd)^alpha_scale with sd over the same support and
             denominator (nonas - 1), nonas = phenotype-non-NA count
             (data.cpp:477-483)
  * phenotype is *scaled* by sqrt((nonas-1) / sum((y-mean)^2)) but NOT
    centered; NA slots are zeroed by the filter (data.cpp:171-186, 1065-1080)

``GenoDense`` is the dense (methylation) variant of the same interface
(reference data.cpp:241-278, 487-541, 1013-1045).
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gvamp_tpu import native
from gvamp_tpu.io import plink
from gvamp_tpu.ops import matvec
from gvamp_tpu.ops.layout import PlanarLayout


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pick_backend(backend: str, dtype=jnp.float32) -> str:
    """Resolve the matvec backend; honors an f64 request (VERDICT r3 #6).

    The pallas path quantizes right-hand sides into int8 digits (~1e-7
    accuracy) — honest for f32 but a silent downgrade for an explicit
    ``--dtype float64`` request.  ``auto`` therefore routes f64 to the XLA
    decode path (true f64 accumulation, slower on TPU where f64 is
    emulated), and an explicit ``pallas`` + f64 combination is rejected
    here and in Options.check rather than silently degraded."""
    f64 = jnp.dtype(dtype) == jnp.float64
    if backend == "pallas" and f64:
        raise ValueError(
            "--backend pallas cannot honor --dtype float64: the pallas "
            "kernels quantize to int8 digits (~1e-7).  Use --backend xla "
            "for true float64, or --dtype float32 with pallas.")
    if backend != "auto":
        return backend
    if f64:
        return "xla"
    return "pallas" if jax.default_backend() == "tpu" else "xla"


class BedOp(NamedTuple):
    """Packed-operator arrays as a pytree (safe to pass through jit)."""

    words: jax.Array       # uint32[Nw, Mpad]
    mave: jax.Array        # f[Mpad]
    msig: jax.Array        # f[Mpad]
    na_planar: jax.Array   # f[4, Nb]
    m_mask: jax.Array      # f[Mpad]


class DenseOp(NamedTuple):
    X: jax.Array           # f[Mpad, N]
    mave: jax.Array
    msig: jax.Array
    na_planar: jax.Array
    m_mask: jax.Array


@functools.partial(jax.jit, static_argnames=("block", "use64"))
def _marker_stats_kernel(words, na_planar, nonas, alpha_scale, block=512, use64=False):
    """Blocked two-moment pass over the packed matrix -> (mave, msig).

    Decodes ``block`` markers at a time (bounded memory) and reduces the three
    sufficient sums S_a = sum a*mask, S_b = sum b*mask, S_aa = sum a^2*mask;
    then mave = S_a/S_b and var = (S_aa - S_a^2/S_b) / (nonas-1), matching the
    reference's two-pass loop (data.cpp:446-483) algebraically.

    The reference accumulates these in double.  In the default f32 engine
    dtype the N axis is split into chunks whose partial sums combine with
    compensated two-sum (matvec.two_sum): the (hi, lo) pairs make the sums
    1-ulp accurate at ANY N before the mave/sumsqr algebra, instead of the
    plain-f32 ~N*eps worst-case drift at biobank scale.  The remaining error
    is the final-subtraction cancellation, bounded by eps * mean^2/var per
    marker — pinned against an np.float64 oracle at N=327,680 in
    tests/test_pvals.py.
    """
    dt = jnp.float64 if use64 else jnp.float32
    Nw, M = words.shape
    na = na_planar.astype(dt)  # [4, Nb]
    Nb = na.shape[1]
    nc = matvec.nb_chunk(Nb)
    C = Nb // nc

    def body(i, acc):
        sah, sal, sbh, sbl, qh_, ql_ = acc
        blk = jax.lax.dynamic_slice(words, (0, i * block), (Nw, block))
        a, b = matvec.decode_planar_dense(blk, dt)  # [4, Nb, block]
        am = a * na[:, :, None]
        bm = b * na[:, :, None]
        pa = jnp.sum(am.reshape(4, C, nc, block), axis=(0, 2))   # [C, block]
        pb = jnp.sum(bm.reshape(4, C, nc, block), axis=(0, 2))
        pq = jnp.sum((a * am).reshape(4, C, nc, block), axis=(0, 2))

        def fold(carry, part):
            (ah, al), (bh, bl), (ch, cl) = carry
            xa, xb, xq = part
            ah, al = matvec.two_sum(ah, al, xa)
            bh, bl = matvec.two_sum(bh, bl, xb)
            ch, cl = matvec.two_sum(ch, cl, xq)
            return ((ah, al), (bh, bl), (ch, cl)), None

        z = jnp.zeros((block,), dt)
        ((ah, al), (bh, bl), (ch, cl)), _ = jax.lax.scan(
            fold, ((z, z), (z, z), (z, z)), (pa, pb, pq))
        j = i * block
        return (jax.lax.dynamic_update_slice(sah, ah, (j,)),
                jax.lax.dynamic_update_slice(sal, al, (j,)),
                jax.lax.dynamic_update_slice(sbh, bh, (j,)),
                jax.lax.dynamic_update_slice(sbl, bl, (j,)),
                jax.lax.dynamic_update_slice(qh_, ch, (j,)),
                jax.lax.dynamic_update_slice(ql_, cl, (j,)))

    # derive the init carry from `words` so its shard_map varying-axis set
    # matches the body output (zeros alone would be replicated-typed)
    zeros = (words[0, :] * np.uint32(0)).astype(dt)
    sah, sal, sbh, sbl, qh, ql = jax.lax.fori_loop(
        0, M // block, body, (zeros,) * 6)
    sa = sah + sal       # correctly-rounded sums (lo absorbs the drift)
    sb = sbh + sbl
    mave = jnp.where(sb != 0, sa / jnp.where(sb == 0, 1.0, sb), 0.0)
    # sumsqr = S_aa - mave*S_a with the lo corrections applied AFTER the
    # cancelling hi subtraction (the hi terms carry the magnitude)
    sumsqr = (qh - mave * sah) + (ql - mave * sal)
    sd = jnp.sqrt(sumsqr / (nonas - 1.0))
    msig = jnp.where(sumsqr > 0, 1.0 / jnp.power(jnp.where(sumsqr <= 0, 1.0, sd), alpha_scale), 1.0)
    return mave, msig


@dataclasses.dataclass
class GenoBed:
    """Packed .bed container + standardized operator (marker-shardable)."""

    layout: PlanarLayout
    N: int          # individuals
    Mt: int         # total markers across all shards
    M: int          # markers owned by this container (== Mt single-host)
    S: int          # global offset of first owned marker
    Mpad: int       # padded marker count (tile/shard aligned)
    words: jax.Array          # uint32[Nw, Mpad]
    mave: jax.Array           # f[Mpad]
    msig: jax.Array           # f[Mpad]
    na_planar: jax.Array      # f[4, Nb] phenotype non-NA indicator
    y_planar: jax.Array       # f[4, Nb] standardized phenotype, NA slots zero
    nonas: int
    intercept: float
    scale: float
    alpha_scale: float = 1.0
    bim_path: str = ""
    mesh: Optional[Mesh] = None
    backend: str = "auto"
    dtype: jnp.dtype = jnp.float32
    covs: Optional[np.ndarray] = None  # [N, C] covariates (probit model)
    _chroms: Optional[np.ndarray] = None
    _complete: Optional[bool] = None   # no missing genotypes (lazy-computed)
    n_offset: int = 0  # first window individual (sample_window views only)

    # ---------------------------------------------------------------- build

    @classmethod
    def from_arrays(
        cls,
        bed_bytes: np.ndarray,   # uint8[M, mbytes]
        y_raw: np.ndarray,       # float64[N], NaN = missing
        N: int,
        Mt: int | None = None,
        S: int = 0,
        standardize_phen: bool = True,
        alpha_scale: float = 1.0,
        mesh: Optional[Mesh] = None,
        backend: str = "auto",
        dtype=jnp.float32,
        bim_path: str = "",
        word_align: int = 32,
        marker_align: int = 512,
    ) -> "GenoBed":
        M = bed_bytes.shape[0]
        Mt = M if Mt is None else Mt
        lay = PlanarLayout.create(N, word_align=word_align)

        n_shards = mesh.devices.size if mesh is not None else 1
        Mpad = _round_up(max(M, 1), marker_align * n_shards)
        # native OpenMP blocked-transpose repack (gvamp_tpu/native) with a
        # numpy fallback — the loader is the framework's C++ layer, mirroring
        # the reference's C++/MPI-IO read path (data.cpp:201-234)
        words_np = native.bed_to_words(bed_bytes, N, lay.n_words, Mpad)
        if words_np is None:
            words_np = np.full((lay.n_words, Mpad), 0x55555555, dtype=np.uint32)
            words_np[:, :M] = lay.pack_words(bed_bytes).T

        isna = np.isnan(y_raw)
        nonas = int((~isna).sum())
        if standardize_phen and nonas > 1:
            avg = float(np.nanmean(y_raw))
            sqn = float(np.sqrt((nonas - 1) / np.nansum((y_raw - avg) ** 2)))
        else:
            avg, sqn = 0.0, 1.0
        y = np.where(isna, 0.0, y_raw) * sqn  # scaled, NOT centered; NA -> 0
        na = (~isna).astype(np.float64)

        if mesh is not None:
            # global-array assembly: works for single- AND multi-process
            # meshes (each process materializes only its device shards)
            from gvamp_tpu import dist
            words_dev = dist.words_global_from_host(words_np, mesh)
        else:
            words_dev = jax.device_put(words_np)

        obj = cls(
            layout=lay, N=N, Mt=Mt, M=M, S=S, Mpad=Mpad,
            words=words_dev,
            mave=jnp.zeros((Mpad,), dtype), msig=jnp.zeros((Mpad,), dtype),
            na_planar=jnp.asarray(lay.planarize(na), dtype),
            y_planar=jnp.asarray(lay.planarize(y), dtype),
            nonas=nonas, intercept=avg, scale=sqn,
            alpha_scale=alpha_scale, bim_path=bim_path,
            mesh=mesh, backend=_pick_backend(backend, dtype), dtype=dtype,
        )
        obj.compute_marker_statistics()
        return obj

    @classmethod
    def from_device_words(cls, words: jax.Array, y_raw: np.ndarray, N: int,
                          M: int | None = None, Mt: int | None = None, S: int = 0,
                          standardize_phen: bool = True, alpha_scale: float = 1.0,
                          mesh: Optional[Mesh] = None, backend: str = "auto",
                          dtype=jnp.float32, bim_path: str = "") -> "GenoBed":
        """Build from an already-on-device uint32[Nw, Mpad] word matrix.

        For benchmarks / synthetic data: avoids shipping the packed matrix
        through the host.  The caller must pad correctly (0x55 words beyond
        the real markers / samples).
        """
        Nw, Mpad = words.shape
        lay = PlanarLayout.create(N)
        assert lay.n_words <= Nw, (lay.n_words, Nw)
        lay = PlanarLayout(N=N, n_words=Nw)
        M = Mpad if M is None else M
        Mt = M if Mt is None else Mt
        isna = np.isnan(y_raw)
        nonas = int((~isna).sum())
        if standardize_phen and nonas > 1:
            avg = float(np.nanmean(y_raw))
            sqn = float(np.sqrt((nonas - 1) / np.nansum((y_raw - avg) ** 2)))
        else:
            avg, sqn = 0.0, 1.0
        y = np.where(isna, 0.0, y_raw * sqn)
        na = (~isna).astype(np.float64)
        obj = cls(
            layout=lay, N=N, Mt=Mt, M=M, S=S, Mpad=Mpad, words=words,
            mave=jnp.zeros((Mpad,), dtype), msig=jnp.zeros((Mpad,), dtype),
            na_planar=jnp.asarray(lay.planarize(na), dtype),
            y_planar=jnp.asarray(lay.planarize(y), dtype),
            nonas=nonas, intercept=avg, scale=sqn, alpha_scale=alpha_scale,
            bim_path=bim_path, mesh=mesh, backend=_pick_backend(backend, dtype),
            dtype=dtype,
        )
        obj.compute_marker_statistics()
        return obj

    @classmethod
    def from_files(
        cls, bed_path: str, phen_path: str | None, N: int, Mt: int,
        S: int = 0, M: int | None = None, **kw,
    ) -> "GenoBed":
        M = Mt if M is None else M
        if phen_path:
            y, isna = plink.read_phen(phen_path)
            y = np.where(isna, np.nan, y)
            assert y.shape[0] == N, (y.shape, N)
        else:
            y = np.zeros(N)

        # fast path: native reader transposes straight from the file into the
        # planar word layout (no marker-major intermediate)
        lay = PlanarLayout.create(N, word_align=kw.get("word_align", 32))
        mesh = kw.get("mesh")
        n_shards = mesh.devices.size if mesh is not None else 1
        Mpad = _round_up(max(M, 1), kw.get("marker_align", 512) * n_shards)
        sub = {k: v for k, v in kw.items()
               if k in ("standardize_phen", "alpha_scale", "mesh",
                        "backend", "dtype", "bim_path")}
        if mesh is not None:
            # per-shard byte-range loading: each process reads only the
            # markers its devices own (MPI-IO slab-read analog,
            # data.cpp:201-234 -> gvamp_tpu.dist.load_bed_words_global)
            from gvamp_tpu import dist
            words = dist.load_bed_words_global(
                bed_path, N, M, S, lay.n_words, Mpad, mesh)
            return cls.from_device_words(words, y, N=N, M=M, Mt=Mt, S=S, **sub)
        words = native.read_bed_words(bed_path, N, M, S, lay.n_words, Mpad)
        if words is not None:
            import jax as _jax
            return cls.from_device_words(
                _jax.device_put(words), y, N=N, M=M, Mt=Mt, S=S, **sub)

        bed = plink.read_bed_slab(bed_path, N, M, S)
        return cls.from_arrays(bed, y, N=N, Mt=Mt, S=S, **kw)

    def sample_window(self, sb: int, lb: int) -> "GenoBed":
        """Sub-block of individuals [4*sb, 4*(sb+lb)) as a masked VIEW.

        The TPU-native reshape of the reference's (SB, LB) byte-window matvec
        arguments (data.cpp:728-801, 852), used by the cross-validation
        damping tuner (vamp.cpp:356-409) and the reduced-subset CG path
        (vamp.cpp:1096-1110).  Matches the reference's semantics: marker
        statistics stay those of the FULL data (windowed dot_product receives
        the full mave/msig, data.cpp:744-747) and the matvec scale becomes
        1/sqrt(4*lb) (data.cpp:825-832); the phenotype window keeps the
        full-data standardization.

        The view SHARES the packed words on device (no host round-trip, no
        second HBM copy — the r1 implementation repacked via NumPy, O(M*Nw)
        host traffic per window): out-of-window individuals are zeroed
        through the planar phenotype-NA mask, which every matvec already
        applies (ax outputs are multiplied by it; atx inputs are pre-masked).
        ``deplanarize`` shifts by ``n_offset`` so callers' ``[: win.N]``
        slicing sees window individuals at the origin, like a standalone
        container.
        """
        import copy

        nb = self.layout.n_bytes
        n_lo, n_hi = 4 * sb, min(4 * (sb + lb), self.N)
        cols = jnp.arange(nb)
        colmask = ((cols >= sb) & (cols < sb + lb)).astype(self.dtype)[None, :]
        win = copy.copy(self)
        win.N = n_hi - n_lo
        win.n_offset = n_lo
        win.na_planar = self.na_planar * colmask
        win.y_planar = self.y_planar * colmask
        win.nonas = int(np.asarray(jnp.sum(win.na_planar)))
        # full-data completeness implies window completeness (the converse
        # need not hold; the conservative inherit keeps the a-only fast path
        # sound — an incomplete parent just uses the general kernels)
        win._complete = self.geno_complete
        return win

    def set_phen(self, y: np.ndarray, standardize: bool = False) -> None:
        """Replace the phenotype (simulation path; reference data.hpp:55 set_phen).

        Simulated phenotypes are used unstandardized (sim.cpp:219-221).
        """
        y = np.asarray(y, dtype=np.float64)
        if y.size == self.N:
            isna = np.isnan(y)
            self.nonas = int((~isna).sum())
            if standardize:
                avg = float(np.nanmean(y))
                sqn = float(np.sqrt((self.nonas - 1) / np.nansum((y - avg) ** 2)))
                self.intercept, self.scale = avg, sqn
                y = y * sqn
            yf = np.where(isna, 0.0, y)
            self.na_planar = jnp.asarray(self.layout.planarize((~isna).astype(np.float64)), self.dtype)
            self.y_planar = jnp.asarray(self.layout.planarize(yf), self.dtype)
        else:  # already planar-flat
            self.y_planar = jnp.asarray(y, self.dtype).reshape(4, self.layout.n_bytes)
        self.compute_marker_statistics()

    # ---------------------------------------------------------------- stats

    def marker_stats_for(self, na_planar, nonas):
        """(mave, msig) over an arbitrary phenotype-NA support — shared by the
        container's own stats and the multi-trait binder (multi.MultiPhen)."""
        use64 = self.dtype == jnp.float64
        # decode temporaries are 2 arrays x [4, Nb, block] floats: cap them
        # near 512 MB so biobank-scale N (Nb ~ 100k) fits next to a >10 GB
        # packed matrix in HBM
        nb = self.layout.n_bytes
        elt = 8 if use64 else 4
        cap = max(64, int(2 ** 29 // max(1, 2 * 4 * nb * elt)))
        block = min(512, self.Mpad, ((cap + 63) // 64) * 64)
        while self.Mpad % block:
            block //= 2
        if self.mesh is not None:
            stats = jax.jit(
                jax.shard_map(
                    lambda wd, na: _marker_stats_kernel(
                        wd, na, float(nonas), float(self.alpha_scale),
                        block=block, use64=use64),
                    mesh=self.mesh,
                    in_specs=(P(None, "m"), P(None, None)),
                    out_specs=P("m"), check_vma=False,
                )
            )
            mave, msig = stats(self.words, na_planar)
        else:
            mave, msig = _marker_stats_kernel(
                self.words, na_planar, float(nonas),
                float(self.alpha_scale), block=block, use64=use64)
        pad_mask = (jnp.arange(self.Mpad) < self.M)
        return (jnp.where(pad_mask, mave, 0.0).astype(self.dtype),
                jnp.where(pad_mask, msig, 0.0).astype(self.dtype))

    def compute_marker_statistics(self) -> None:
        self.mave, self.msig = self.marker_stats_for(self.na_planar, self.nonas)

    def compute_people_statistics(self):
        """Per-individual stats for the XXT preconditioner (data.cpp:558-716).

        Returns planar (mave_p, msig_p, numb_p) each f[4, Nb] where msig_p is
        sqrt((n_i-1)/(sum v^2 - n_i mean_i^2)) on non-NA slots, 0 elsewhere.
        """
        # sum_m value  where value = (a - mave)*msig*b per slot: fold msig/mave
        # into the standard a@w - b@u contraction (exact since a=0 wherever b=0)
        w = self.msig
        u = self.mave * self.msig
        sum_v = self._raw_ax_once(w, u)
        # count of genotype-non-missing markers per slot: a@0 - b@(-1) = sum b
        numb = self._raw_ax_once(jnp.zeros_like(w), -jnp.ones_like(u))
        # sum_m value^2 is quadratic in the decode -> dedicated blocked pass
        if self.mesh is not None:
            sumsq = jax.jit(
                jax.shard_map(
                    lambda wd, mv, ms: jax.lax.psum(_people_sumsq(wd, mv, ms), "m"),
                    mesh=self.mesh,
                    in_specs=(P(None, "m"), P("m"), P("m")),
                    out_specs=P(None, None), check_vma=False,
                )
            )(self.words, self.mave.astype(jnp.float32), self.msig.astype(jnp.float32))
        else:
            sumsq = _people_sumsq(self.words, self.mave.astype(jnp.float32),
                                  self.msig.astype(jnp.float32))
        na = self.na_planar
        numb = numb * na
        mave_p = jnp.where(numb > 0, sum_v * na / jnp.where(numb == 0, 1.0, numb), 0.0)
        denom = sumsq * na - numb * mave_p**2
        prec = jnp.where((na > 0) & (denom != 0), (numb - 1) / jnp.where(denom == 0, 1.0, denom), 0.0)
        msig_p = jnp.sqrt(jnp.maximum(prec, 0.0))
        return mave_p.astype(self.dtype), msig_p.astype(self.dtype), numb.astype(self.dtype)

    # ---------------------------------------------------------------- matvec

    @property
    def inv_sqrt_n(self) -> float:
        return 1.0 / float(np.sqrt(self.N))

    @property
    def op(self) -> "BedOp":
        """The operator arrays as a pytree — pass this THROUGH jit boundaries
        (capturing the packed words as jaxpr constants makes XLA try to
        constant-fold multi-GB decodes)."""
        return BedOp(words=self.words, mave=self.mave, msig=self.msig,
                     na_planar=self.na_planar, m_mask=self.m_mask)

    @property
    def geno_complete(self) -> bool:
        """True when no genotype is missing among real samples x markers.
        Imputed biobank data is complete; the kernels then skip the whole
        non-missing-indicator contraction (b = 1 collapses to scalars)."""
        if self._complete is None:
            nm = self.n_mask_planar.astype(jnp.float32)
            if self.backend == "pallas":
                raw = matvec.atx_pallas
            else:
                raw = lambda g, v: matvec.atx_xla(g, v, dtype=jnp.float32)
            if self.mesh is not None:
                fn = jax.jit(jax.shard_map(
                    raw, mesh=self.mesh,
                    in_specs=(P(None, "m"), P(None, None)),
                    out_specs=(P("m"), P("m")), check_vma=False))
                _, bv = fn(self.words, nm)
            else:
                _, bv = raw(self.words, nm)
            # reduce on device: bv may be sharded across processes
            n, m = float(self.N), self.M
            ok = jax.jit(lambda b: jnp.all(jnp.where(
                jnp.arange(b.shape[0]) < m, b, n) == n))(bv)
            self._complete = bool(np.asarray(ok))
        return self._complete

    def fns(self):
        """(ax_fn, atx_fn) with signatures (op, x) / (op, v_planar); all
        static configuration (backend, mesh, dtype, scaling) baked in."""
        backend, mesh, dtype = self.backend, self.mesh, self.dtype
        scale = self.inv_sqrt_n

        if backend == "pallas" and self.geno_complete:
            # no-missing fast path: b == 1, its contractions are scalars.
            # Single-vector calls ride the wide int8 kernels at B=1: the
            # standard-form atx orientation measured 480 GB/s packed vs the
            # VPU kernel's 107 (docs/ROOFLINE.md round 2)
            ax_a = lambda g, w_: matvec.axm_i8a_pallas(g, w_[:, None])[..., 0]
            atx_a = lambda g, v_: matvec.atxm_i8a_pallas(g, v_[:, :, None])[:, 0]
            if mesh is not None:
                ax_a_sh = jax.shard_map(
                    lambda g, w_: jax.lax.psum(ax_a(g, w_), "m"),
                    mesh=mesh, in_specs=(P(None, "m"), P("m")),
                    out_specs=P(None, None), check_vma=False)
                atx_a_sh = jax.shard_map(
                    atx_a, mesh=mesh, in_specs=(P(None, "m"), P(None, None)),
                    out_specs=P("m"), check_vma=False)
            else:
                ax_a_sh, atx_a_sh = ax_a, atx_a

            def ax_fn(op: BedOp, x):
                w = op.msig * x.astype(op.msig.dtype)
                u = op.mave * w
                z = ax_a_sh(op.words, w) - jnp.sum(u)
                return z.astype(dtype) * op.na_planar * scale

            def atx_fn(op: BedOp, v_planar):
                v = v_planar.astype(dtype) * op.na_planar
                av = atx_a_sh(op.words, v)
                sv = jnp.sum(v)
                return ((av.astype(dtype) - op.mave * sv)
                        * op.msig * scale)

            return ax_fn, atx_fn

        if backend == "pallas":
            # both directions via the int8-MXU wide kernels at B=1 (the
            # standard-form atx orientation measured 475 GB/s packed vs the
            # VPU kernel's 60-107, docs/ROOFLINE.md round 2)
            ax_raw = lambda g, w_, u_: matvec.axm_i8_pallas(
                g, w_[:, None], u_[:, None])[..., 0]

            def atx_raw(g, v_):
                av, bv = matvec.atxm_i8_pallas(g, v_[:, :, None])
                return av[:, 0], bv[:, 0]
        else:
            ax_raw = lambda g, w_, u_: matvec.ax_xla(g, w_, u_, dtype=dtype)
            atx_raw = lambda g, v: matvec.atx_xla(g, v, dtype=dtype)

        if mesh is not None:
            ax_sh = jax.shard_map(
                lambda g, w_, u_: jax.lax.psum(ax_raw(g, w_, u_), "m"),
                mesh=mesh, in_specs=(P(None, "m"), P("m"), P("m")),
                out_specs=P(None, None), check_vma=False)
            atx_sh = jax.shard_map(
                atx_raw, mesh=mesh,
                in_specs=(P(None, "m"), P(None, None)),
                out_specs=(P("m"), P("m")), check_vma=False)
        else:
            ax_sh, atx_sh = ax_raw, atx_raw

        def ax_fn(op: BedOp, x):
            """A @ x -> planar [4, Nb] (reference Ax, data.cpp:848-1005):
            standardization, na_lut output masking, 1/sqrt(N), allreduce."""
            w = op.msig * x.astype(op.msig.dtype)
            u = op.mave * w
            z = ax_sh(op.words, w, u)
            return z.astype(dtype) * op.na_planar * scale

        def atx_fn(op: BedOp, v_planar):
            """A^T @ v -> [Mpad] (reference ATx/dot_product, data.cpp:728-835);
            input is NA-masked like the reference's filtered phenotypes."""
            v = v_planar.astype(dtype) * op.na_planar
            av, bv = atx_sh(op.words, v)
            return ((av.astype(dtype) - op.mave * bv.astype(dtype))
                    * op.msig * scale)

        return ax_fn, atx_fn

    def fns_multi(self):
        """(axm_fn, atxm_fn) — B right-hand sides per decode pass.

        One pass over the packed matrix serves all B columns (block-CG,
        multi-trait, LOCO batching); signatures (op, X[Mpad, B]) ->
        z[4, Nb, B] and (op, V[4, Nb, B]) -> [Mpad, B].
        """
        backend, mesh, dtype = self.backend, self.mesh, self.dtype
        scale = self.inv_sqrt_n

        if backend == "pallas" and self.geno_complete:
            axm_a = matvec.axm_i8a_pallas
            atxm_a = matvec.atxm_i8a_pallas
            if mesh is not None:
                axm_a_sh = jax.shard_map(
                    lambda g, W: jax.lax.psum(axm_a(g, W), "m"),
                    mesh=mesh, in_specs=(P(None, "m"), P("m", None)),
                    out_specs=P(None, None, None), check_vma=False)
                atxm_a_sh = jax.shard_map(
                    atxm_a, mesh=mesh,
                    in_specs=(P(None, "m"), P(None, None, None)),
                    out_specs=P("m", None), check_vma=False)
            else:
                axm_a_sh, atxm_a_sh = axm_a, atxm_a

            def axm_fn(op: BedOp, X):
                W = op.msig[:, None] * X.astype(op.msig.dtype)
                U = op.mave[:, None] * W
                z = axm_a_sh(op.words, W) - jnp.sum(U, axis=0)[None, None, :]
                return z.astype(dtype) * op.na_planar[:, :, None] * scale

            def atxm_fn(op: BedOp, V):
                v = V.astype(dtype) * op.na_planar[:, :, None]
                av = atxm_a_sh(op.words, v)
                sv = jnp.sum(v, axis=(0, 1))
                return ((av.astype(dtype) - op.mave[:, None] * sv[None, :])
                        * op.msig[:, None] * scale)

            return axm_fn, atxm_fn

        if backend == "pallas":
            # int8-MXU digit kernels: fastest AND hardware-exact to ~1e-7
            # (the bf16-split variants remain as alternates; see matvec.py)
            axm_raw = matvec.axm_i8_pallas
            atxm_raw = matvec.atxm_i8_pallas
        else:
            axm_raw = lambda g, W, U: matvec.axm_xla(g, W, U, dtype=dtype)
            atxm_raw = lambda g, V: matvec.atxm_xla(g, V, dtype=dtype)

        if mesh is not None:
            axm_sh = jax.shard_map(
                lambda g, W, U: jax.lax.psum(axm_raw(g, W, U), "m"),
                mesh=mesh, in_specs=(P(None, "m"), P("m", None), P("m", None)),
                out_specs=P(None, None, None), check_vma=False)
            atxm_sh = jax.shard_map(
                atxm_raw, mesh=mesh,
                in_specs=(P(None, "m"), P(None, None, None)),
                out_specs=(P("m", None), P("m", None)), check_vma=False)
        else:
            axm_sh, atxm_sh = axm_raw, atxm_raw

        def axm_fn(op: BedOp, X):
            W = op.msig[:, None] * X.astype(op.msig.dtype)
            U = op.mave[:, None] * W
            z = axm_sh(op.words, W, U)
            return z.astype(dtype) * op.na_planar[:, :, None] * scale

        def atxm_fn(op: BedOp, V):
            v = V.astype(dtype) * op.na_planar[:, :, None]
            av, bv = atxm_sh(op.words, v)
            return ((av.astype(dtype) - op.mave[:, None] * bv.astype(dtype))
                    * op.msig[:, None] * scale)

        return axm_fn, atxm_fn

    def fn_gram(self):
        """Fused Gram pass ``gram_fn(op, X) -> A^T(A X)`` — one HBM stream
        over the packed words per call — or None when unavailable.

        ``atxm_fn(axm_fn(X))`` streams the packed matrix TWICE per CG
        iteration (the reference's lmmse_mult, vamp.cpp:1074-1118, pays the
        same two passes).  The Gram operator is additive over sample bands,
        so the fused kernel (matvec.gram_i8a_pallas) keeps one packed band
        VMEM-resident and runs both contractions per band — available on
        the single-shard pallas complete-genotype path (under marker
        sharding the forward product needs a global psum between the
        contractions, so meshed runs keep the two-pass form).

        Matches the two-pass composition to f32 rounding (the composition
        quantizes z per GLOBAL column, the fused kernel per band — a
        strictly tighter dynamic range).

        **Default: OFF (two-pass).** The round-4 burst study (BENCH_r04,
        docs/ROOFLINE.md) settled the round-3 question on hardware: these
        decode kernels are VPU-decode-bound (~630-780 GB/s-packed per
        decode), not HBM-bound, and the fused kernel still decodes every
        word twice (forward + cached-band transpose) — so halving the HBM
        traffic buys nothing while the band-boundary fold/requantize adds
        cost.  Measured at 1.68 GB: fused 6.10 ms vs two-pass 5.32 ms
        (complete), 10.24 vs 8.90 (missing); end-to-end config B
        0.157 -> 0.136 s/iteration with two-pass.  ``GVAMP_FUSED_GRAM=1``
        forces the fused kernels back on (kernel studies / platforms where
        the trade-off flips); ``GVAMP_NO_FUSED_GRAM=1`` still forces OFF
        (also disabling the dual fused Gram, see fn_gram_aat).
        """
        if os.environ.get("GVAMP_FUSED_GRAM", "") != "1":
            return None
        if os.environ.get("GVAMP_NO_FUSED_GRAM", "") == "1":
            return None
        if self.backend != "pallas" or self.mesh is not None:
            return None
        if (matvec.gram_band_bytes(int(self.words.shape[0]), self.Mpad)
                > matvec._GRAM_BAND_MAX_BYTES):
            return None
        dtype = self.dtype
        scale2 = self.inv_sqrt_n * self.inv_sqrt_n

        if self.geno_complete:
            def gram_fn(op: BedOp, X):
                W = op.msig[:, None] * X.astype(op.msig.dtype)
                cu = jnp.sum(op.mave[:, None] * W, axis=0)
                av, sv = matvec.gram_i8a_pallas(op.words, W, op.na_planar, cu)
                return ((av.astype(dtype)
                         - op.mave[:, None] * sv.astype(dtype)[None, :])
                        * op.msig[:, None] * scale2)
        else:
            def gram_fn(op: BedOp, X):
                W = op.msig[:, None] * X.astype(op.msig.dtype)
                U = op.mave[:, None] * W
                av, bv = matvec.gram_i8_pallas(op.words, W, U, op.na_planar)
                return ((av.astype(dtype) - op.mave[:, None] * bv.astype(dtype))
                        * op.msig[:, None] * scale2)

        return gram_fn

    def fn_gram_aat(self):
        """Fused DUAL Gram ``gram_aat_fn(op, Up) -> A A^T Up`` (with the
        standardization corrections) in one HBM stream, or None.

        The N-space/XXT solve's operator is A (A^T u) — the reference's
        denoiserXXT path (denoiserXXT.cpp:31-165) pays two passes per CG
        iteration just like lmmse_mult.  gram_aat_i8_pallas caches one
        marker column-stripe in VMEM (the dual analog of fn_gram's sample
        band), so dual iterations read the packed words once.  Available
        whenever the stripe fits VMEM (the tile width auto-narrows; only N
        in the millions overflows).

        Unlike the primal Gram, the dual product is additive over MARKER
        shards — ``A A^T = sum_s A_s A_s^T`` — so under marker sharding
        each device runs the fused kernel on its local slab and a single
        ``psum`` over "m" combines the N-space results: the same one
        collective per CG iteration as the two-pass form (whose forward
        ``A t`` ends in the identical psum), at HALF the HBM traffic.

        **Default: ON** — unlike the primal fused Gram (see fn_gram), the
        dual kernel WINS on hardware: its a-only variant decodes only the
        a-plane on both sides and measured 0.021 vs 0.023 s/iteration at
        the X config (BENCH_r04).  ``GVAMP_NO_FUSED_GRAM=1`` disables it
        (two-pass everywhere)."""
        if os.environ.get("GVAMP_NO_FUSED_GRAM", "") == "1":
            return None
        if self.backend != "pallas":
            return None
        n_sh = self.mesh.devices.size if self.mesh is not None else 1
        m_local = self.Mpad // n_sh
        Nw = int(self.words.shape[0])
        tm = matvec._pick_aat_tm(Nw, m_local)
        if matvec.gram_aat_stripe_bytes(Nw, m_local, tm) \
                > matvec._GRAM_BAND_MAX_BYTES:
            return None
        dtype = self.dtype
        scale2 = self.inv_sqrt_n * self.inv_sqrt_n

        aat_local = (matvec.gram_aat_i8a_pallas if self.geno_complete
                     else matvec.gram_aat_i8_pallas)
        if self.mesh is not None:
            aat = jax.shard_map(
                lambda g, v, mv, ms2: jax.lax.psum(aat_local(g, v, mv, ms2),
                                                   "m"),
                mesh=self.mesh,
                in_specs=(P(None, "m"), P(None, None, None), P("m"), P("m")),
                out_specs=P(None, None, None), check_vma=False)
        else:
            aat = aat_local

        def gram_aat_fn(op: BedOp, Up):
            v = Up.astype(op.msig.dtype) * op.na_planar[:, :, None]
            z = aat(op.words, v, op.mave, jnp.square(op.msig))
            return z.astype(dtype) * op.na_planar[:, :, None] * scale2

        return gram_aat_fn

    def window_fns_multi(self, lbw: int):
        """(axm_w, atxm_w) over a DYNAMIC word-row window [sbw, sbw+lbw).

        The device-side reshape of the reference's (SB, LB) byte-window
        matvec arguments (data.cpp:728-801, 852) used by the reduced-subset
        CG path (--red, vamp.cpp:561-596, 1096-1110): each pass streams only
        ``lbw / n_words`` of the packed matrix.  ``sbw`` is a traced scalar
        (word-row offset, one word row = 4 planar bytes = 16 individuals),
        so the window can move every iteration inside one jitted step.
        Marker statistics stay those of the FULL data and the scale becomes
        1/sqrt(16*lbw) (data.cpp:825-832).

        Signatures: axm_w(op, X[Mpad, B], sbw) -> z[4, 4*lbw, B] and
        atxm_w(op, V[4, 4*lbw, B], sbw) -> [Mpad, B].
        """
        backend, mesh, dtype = self.backend, self.mesh, self.dtype
        lbw = int(lbw)
        n_win = 16 * lbw
        scale = 1.0 / float(np.sqrt(n_win))

        def slice_words(words, sbw):
            return jax.lax.dynamic_slice(
                words, (sbw, 0), (lbw, words.shape[1]))

        def slice_na(na, sbw):
            return jax.lax.dynamic_slice(na, (0, 4 * sbw), (4, 4 * lbw))

        complete = backend == "pallas" and self.geno_complete
        if backend == "pallas" and complete:
            raw_ax = lambda g, W, U: matvec.axm_i8a_pallas(g, W)
            raw_atx = lambda g, V: (matvec.atxm_i8a_pallas(g, V),
                                    jnp.sum(V, axis=(0, 1)))
        elif backend == "pallas":
            raw_ax = matvec.axm_i8_pallas
            raw_atx = matvec.atxm_i8_pallas
        else:
            raw_ax = lambda g, W, U: matvec.axm_xla(g, W, U, dtype=dtype)
            raw_atx = lambda g, V: matvec.atxm_xla(g, V, dtype=dtype)

        def ax_local(words, na, W, U, sbw):
            g = slice_words(words, sbw)
            z = raw_ax(g, W, U)
            if complete:
                # b == 1 on the window: its contraction is the scalar
                # column-sum of U (the window never changes it)
                z = z - jnp.sum(U, axis=0)[None, None, :]
            return z.astype(dtype) * slice_na(na, sbw)[:, :, None]

        def atx_local(words, na, V, sbw):
            g = slice_words(words, sbw)
            v = V.astype(dtype) * slice_na(na, sbw)[:, :, None]
            av, bv = raw_atx(g, v)
            return av.astype(dtype), jnp.asarray(bv, dtype)

        if mesh is not None:
            ax_sh = jax.shard_map(
                lambda w_, na, W, U, sbw: jax.lax.psum(
                    ax_local(w_, na, W, U, sbw), "m"),
                mesh=mesh,
                in_specs=(P(None, "m"), P(None, None), P("m", None),
                          P("m", None), P()),
                out_specs=P(None, None, None), check_vma=False)
            atx_sh = jax.shard_map(
                atx_local, mesh=mesh,
                in_specs=(P(None, "m"), P(None, None), P(None, None, None),
                          P()),
                out_specs=(P("m", None), P("m", None) if not complete
                           else P(None)), check_vma=False)
        else:
            ax_sh, atx_sh = ax_local, atx_local

        def axm_w(op: BedOp, X, sbw):
            W = op.msig[:, None] * X.astype(op.msig.dtype)
            U = op.mave[:, None] * W
            return ax_sh(op.words, op.na_planar, W, U, sbw) * scale

        def atxm_w(op: BedOp, V, sbw):
            av, bv = atx_sh(op.words, op.na_planar, V, sbw)
            return ((av - op.mave[:, None] * bv[None, :] if complete
                     else av - op.mave[:, None] * bv)
                    * op.msig[:, None] * scale)

        return axm_w, atxm_w

    def ax(self, x: jax.Array) -> jax.Array:
        ax_fn, _ = self.fns()
        return ax_fn(self.op, x)

    def atx(self, v_planar: jax.Array) -> jax.Array:
        _, atx_fn = self.fns()
        return atx_fn(self.op, v_planar)

    def axm(self, X: jax.Array) -> jax.Array:
        axm_fn, _ = self.fns_multi()
        return axm_fn(self.op, X)

    def atxm(self, V: jax.Array) -> jax.Array:
        _, atxm_fn = self.fns_multi()
        return atxm_fn(self.op, V)

    def _raw_ax_once(self, w, u):
        """Unscaled, unmasked sum_m a*w - b*u (people-stats helper)."""
        if self.backend == "pallas":
            raw = matvec.ax_pallas
        else:
            raw = lambda g, w_, u_: matvec.ax_xla(g, w_, u_, dtype=self.dtype)
        if self.mesh is not None:
            return jax.jit(
                jax.shard_map(
                    lambda g, w_, u_: jax.lax.psum(raw(g, w_, u_), "m"),
                    mesh=self.mesh,
                    in_specs=(P(None, "m"), P("m"), P("m")),
                    out_specs=P(None, None), check_vma=False,
                )
            )(self.words, w, u)
        return raw(self.words, w, u)

    def zx(self, eff: jax.Array) -> jax.Array:
        """Covariate matvec Z @ eff -> planar [4, Nb] (reference data.cpp:1050)."""
        z = self.covs_np @ np.asarray(eff)
        return jnp.asarray(self.layout.planarize(z), self.dtype)

    # ---------------------------------------------------------------- misc

    @property
    def covs_np(self) -> np.ndarray:
        assert self.covs is not None, "no covariates loaded"
        return self.covs

    def read_covariates(self, path: str, n_cov: int) -> None:
        self.covs = plink.read_covariates(path, n_cov)

    def chromosomes(self) -> np.ndarray:
        if self._chroms is None:
            assert self.bim_path, "no .bim file given"
            self._chroms = plink.read_chromosomes(self.bim_path, self.M, self.S)
        return self._chroms

    def filter_pheno(self) -> jax.Array:
        """NA-zeroed standardized phenotype, planar (reference data.cpp:1065)."""
        return self.y_planar * self.na_planar

    def planarize(self, v: np.ndarray) -> jax.Array:
        return jnp.asarray(self.layout.planarize(np.asarray(v)), self.dtype)

    def deplanarize(self, vp: jax.Array) -> np.ndarray:
        arr = self.layout.deplanarize(np.asarray(vp))
        # sample_window views: window individuals appear at the origin so
        # callers' [: self.N] slicing works like a standalone container
        return arr[self.n_offset:] if self.n_offset else arr

    def pad_m(self, x: np.ndarray, fill: float = 0.0) -> jax.Array:
        out = np.full((self.Mpad,), fill, dtype=np.float64)
        out[: self.M] = np.asarray(x)
        return jnp.asarray(out, self.dtype)

    @property
    def m_mask(self) -> jax.Array:
        """f[Mpad]: 1 on real markers, 0 on padding."""
        return (jnp.arange(self.Mpad) < self.M).astype(self.dtype)

    @property
    def n_mask_planar(self) -> jax.Array:
        """f[4, Nb]: 1 on real individuals (including phenotype-NA ones)."""
        return jnp.asarray(self.layout.planar_to_orig() >= 0, self.dtype)

    def covs_planar(self) -> jax.Array:
        """Covariates as planar [4, Nb, C] (zeros at padding slots)."""
        Z = self.covs_np  # [N, C]
        return jnp.asarray(self.layout.planarize(Z.T).transpose(1, 2, 0), self.dtype)


@functools.partial(jax.jit, static_argnames=("block",))
def _people_sumsq(words, mave, msig, block=0):
    """sum_m ((a - mave_m) * msig_m)^2 * b per planar slot -> f32[4, Nb]."""
    Nw, M = words.shape
    if not block:
        # cap decode temporaries (2 x [4, 4Nw, block] f32) near 512 MB for
        # biobank-scale N, like marker_stats_for
        cap = max(64, int(2 ** 29 // max(1, 2 * 16 * Nw * 4)))
        block = min(512, M, ((cap + 63) // 64) * 64)
        while M % block:
            block //= 2

    def body(i, acc):
        blk = jax.lax.dynamic_slice(words, (0, i * block), (Nw, block))
        mv = jax.lax.dynamic_slice(mave, (i * block,), (block,))
        ms = jax.lax.dynamic_slice(msig, (i * block,), (block,))
        a, b = matvec.decode_planar_dense(blk, jnp.float32)  # [4, Nb, blk]
        v = (a - mv[None, None, :]) * ms[None, None, :] * b
        return acc + jnp.sum(v * v, axis=2)

    nb4 = 4 * Nw
    acc = jnp.zeros((4, nb4), jnp.float32)
    return jax.lax.fori_loop(0, M // block, body, acc)


@dataclasses.dataclass
class GenoDense:
    """Dense design-matrix container (methylation path, reference
    data.cpp:241-278; matvecs data.cpp:770-788, 1010-1045).

    Keeps X as f32[M, N] on device; N-vectors use ORIGINAL order padded to
    the planar width so the engine sees the same [4, Nb] planar interface
    (the planar permutation is identity-equivalent for dense data: we simply
    planarize/deplanarize at the boundary like GenoBed).
    """

    layout: PlanarLayout
    N: int
    Mt: int
    M: int
    S: int
    Mpad: int
    X: jax.Array              # f[Mpad, N]
    mave: jax.Array
    msig: jax.Array
    na_planar: jax.Array
    y_planar: jax.Array
    nonas: int
    intercept: float
    scale: float
    alpha_scale: float = 1.0
    bim_path: str = ""
    mesh: Optional[Mesh] = None
    dtype: jnp.dtype = jnp.float32
    covs: Optional[np.ndarray] = None
    backend: str = "xla"
    _chroms: Optional[np.ndarray] = None

    @classmethod
    def from_arrays(cls, X: np.ndarray, y_raw: np.ndarray, N: int,
                    Mt: int | None = None, S: int = 0,
                    standardize_phen: bool = True, alpha_scale: float = 1.0,
                    mesh: Optional[Mesh] = None, dtype=jnp.float32,
                    bim_path: str = "", marker_align: int = 8, **_kw) -> "GenoDense":
        M = X.shape[0]
        Mt = M if Mt is None else Mt
        lay = PlanarLayout.create(N, word_align=8)
        n_shards = mesh.devices.size if mesh is not None else 1
        Mpad = _round_up(max(M, 1), marker_align * n_shards)
        Xp = np.zeros((Mpad, N))
        Xp[:M] = X

        isna = np.isnan(y_raw)
        nonas = int((~isna).sum())
        if standardize_phen and nonas > 1:
            avg = float(np.nanmean(y_raw))
            sqn = float(np.sqrt((nonas - 1) / np.nansum((y_raw - avg) ** 2)))
        else:
            avg, sqn = 0.0, 1.0
        y = np.where(isna, 0.0, y_raw) * sqn
        na = (~isna).astype(np.float64)

        na_dense = na  # [N]
        cnt = na_dense.sum()
        mave = (Xp * na_dense).sum(1) / cnt
        dev = (Xp - mave[:, None]) * na_dense
        sumsqr = (dev**2).sum(1)
        sd = np.sqrt(sumsqr / (nonas - 1.0))
        msig = np.where(sumsqr != 0, 1.0 / np.power(np.where(sd == 0, 1.0, sd), alpha_scale), 1.0)
        mave[M:] = 0.0
        msig[M:] = 0.0

        sharding = NamedSharding(mesh, P("m", None)) if mesh is not None else None
        return cls(
            layout=lay, N=N, Mt=Mt, M=M, S=S, Mpad=Mpad,
            X=jax.device_put(jnp.asarray(Xp, dtype), sharding),
            mave=jnp.asarray(mave, dtype), msig=jnp.asarray(msig, dtype),
            na_planar=jnp.asarray(lay.planarize(na), dtype),
            y_planar=jnp.asarray(lay.planarize(y), dtype),
            nonas=nonas, intercept=avg, scale=sqn, alpha_scale=alpha_scale,
            bim_path=bim_path, mesh=mesh, dtype=dtype,
        )

    @classmethod
    def from_files(
        cls, meth_path: str, phen_path: str | None, N: int, Mt: int,
        S: int = 0, M: int | None = None, **kw,
    ) -> "GenoDense":
        """Load a raw-double methylation slab + phenotype (reference
        read_methylation_data, data.cpp:241-278; only phenotype NAs are
        supported, matching the 'only non-missing methylation' restriction
        at data.cpp:498)."""
        M = Mt if M is None else M
        X = plink.read_meth_slab(meth_path, N, M, S)
        if phen_path:
            y, isna = plink.read_phen(phen_path)
            y = np.where(isna, np.nan, y)
            assert y.shape[0] == N, (y.shape, N)
        else:
            y = np.zeros(N)
        kw.pop("backend", None)  # dense path is plain XLA matmul
        return cls.from_arrays(X, y, N=N, Mt=Mt, S=S, **kw)

    @property
    def inv_sqrt_n(self) -> float:
        return 1.0 / float(np.sqrt(self.N))

    def _v_dense(self, v_planar):
        """planar [4, Nb] -> dense [N] via the fixed permutation (on device)."""
        idx = jnp.asarray(self.layout.orig_to_planar())
        return v_planar.reshape(-1)[idx]

    def _to_planar(self, v_dense):
        idx = jnp.asarray(self.layout.orig_to_planar())
        out = jnp.zeros((4 * self.layout.n_bytes,), v_dense.dtype)
        return out.at[idx].set(v_dense).reshape(4, self.layout.n_bytes)

    @property
    def op(self) -> DenseOp:
        return DenseOp(X=self.X, mave=self.mave, msig=self.msig,
                       na_planar=self.na_planar, m_mask=self.m_mask)

    def fns(self):
        dtype, scale = self.dtype, self.inv_sqrt_n
        idx = jnp.asarray(self.layout.orig_to_planar())
        nb = self.layout.n_bytes

        def ax_fn(op: DenseOp, x):
            w = op.msig * x.astype(dtype)
            z = op.X.T @ w - (op.mave * w).sum()
            zp = jnp.zeros((4 * nb,), z.dtype).at[idx].set(z).reshape(4, nb)
            return zp * op.na_planar * scale

        def atx_fn(op: DenseOp, v_planar):
            v = (v_planar * op.na_planar).reshape(-1)[idx]
            av = op.X @ v
            return (av - op.mave * v.sum()) * op.msig * scale

        return ax_fn, atx_fn

    def fns_multi(self):
        """Batched (B-column) variants; see GenoBed.fns_multi."""
        dtype, scale = self.dtype, self.inv_sqrt_n
        idx = jnp.asarray(self.layout.orig_to_planar())
        nb = self.layout.n_bytes

        def axm_fn(op: DenseOp, X):
            W = op.msig[:, None] * X.astype(dtype)           # [Mpad, B]
            Z = op.X.T @ W - (op.mave[:, None] * W).sum(0)   # [N, B]
            B = Z.shape[1]
            zp = jnp.zeros((4 * nb, B), Z.dtype).at[idx].set(Z).reshape(4, nb, B)
            return zp * op.na_planar[:, :, None] * scale

        def atxm_fn(op: DenseOp, V):
            v = (V * op.na_planar[:, :, None]).reshape(4 * nb, -1)[idx]  # [N, B]
            av = op.X @ v
            return (av - op.mave[:, None] * v.sum(0)) * op.msig[:, None] * scale

        return axm_fn, atxm_fn

    def ax(self, x):
        ax_fn, _ = self.fns()
        return ax_fn(self.op, x)

    def atx(self, v_planar):
        _, atx_fn = self.fns()
        return atx_fn(self.op, v_planar)

    def axm(self, X):
        axm_fn, _ = self.fns_multi()
        return axm_fn(self.op, X)

    def atxm(self, V):
        _, atxm_fn = self.fns_multi()
        return atxm_fn(self.op, V)

    def fn_gram(self):
        """No fused Gram for dense data — XLA already fuses the two
        bf16/f32 matmuls' elementwise glue, and dense HBM traffic is the
        matrices themselves, not a packed stream worth caching."""
        return None

    def fn_gram_aat(self):
        return None

    def filter_pheno(self):
        return self.y_planar * self.na_planar

    def planarize(self, v):
        return jnp.asarray(self.layout.planarize(np.asarray(v)), self.dtype)

    def deplanarize(self, vp):
        return self.layout.deplanarize(np.asarray(vp))

    def pad_m(self, x, fill: float = 0.0):
        out = np.full((self.Mpad,), fill, dtype=np.float64)
        out[: self.M] = np.asarray(x)
        return jnp.asarray(out, self.dtype)

    @property
    def m_mask(self):
        return (jnp.arange(self.Mpad) < self.M).astype(self.dtype)

    def set_phen(self, y, standardize: bool = False):
        y = np.asarray(y, dtype=np.float64)
        isna = np.isnan(y)
        self.nonas = int((~isna).sum())
        if standardize:
            avg = float(np.nanmean(y))
            sqn = float(np.sqrt((self.nonas - 1) / np.nansum((y - avg) ** 2)))
            self.intercept, self.scale = avg, sqn
            y = y * sqn
        self.na_planar = jnp.asarray(self.layout.planarize((~isna).astype(np.float64)), self.dtype)
        self.y_planar = jnp.asarray(self.layout.planarize(np.where(isna, 0.0, y)), self.dtype)
        # marker stats depend on the phenotype NA mask (reference recomputes
        # them after every phen change, main_meth_ex.cpp -> data ctor)
        na = (~isna).astype(np.float64)
        X = np.asarray(self.X, np.float64)
        cnt = max(na.sum(), 1.0)
        mave = (X * na).sum(1) / cnt
        sumsqr = (((X - mave[:, None]) * na) ** 2).sum(1)
        sd = np.sqrt(sumsqr / max(self.nonas - 1.0, 1.0))
        msig = np.where(sumsqr != 0,
                        1.0 / np.power(np.where(sd == 0, 1.0, sd), self.alpha_scale), 1.0)
        mave[self.M:] = 0.0
        msig[self.M:] = 0.0
        self.mave = jnp.asarray(mave, self.dtype)
        self.msig = jnp.asarray(msig, self.dtype)

    @property
    def n_mask_planar(self):
        """f[4, Nb]: 1 on real individuals (API parity with GenoBed)."""
        return jnp.asarray(self.layout.planar_to_orig() >= 0, self.dtype)

    @property
    def covs_np(self):
        assert self.covs is not None, "no covariates loaded"
        return self.covs

    def read_covariates(self, path, n_cov):
        self.covs = plink.read_covariates(path, n_cov)

    def covs_planar(self):
        Z = self.covs_np
        return jnp.asarray(self.layout.planarize(Z.T).transpose(1, 2, 0),
                           self.dtype)

    def zx(self, eff):
        z = self.covs_np @ np.asarray(eff)
        return jnp.asarray(self.layout.planarize(z), self.dtype)

    def chromosomes(self):
        if self._chroms is None:
            assert self.bim_path
            self._chroms = plink.read_chromosomes(self.bim_path, self.M, self.S)
        return self._chroms
