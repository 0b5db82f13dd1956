"""Groth16 prover: QAP witness map + 4 MSMs on device, final combine on host.

Mirrors r1cs_gg_ppzksnark_prover (r1cs_gg_ppzksnark.tcc:391-506):

  H       = qap_witness_map(cs, primary, aux, 0, 0, 0)        [device NTT]
  At      = <A_query[0..n],  (1, wires)>                      [device MSM G1]
  Bt(kc)  = <B_query sparse, (1, wires)>                      [device MSM G2+G1]
  Ht      = <H_query,        H[0..deg-2]>                     [device MSM G1]
  Lt      = <L_query,        wires[num_inputs..]>             [device MSM G1]
  A  = alpha + At + r*delta          (G1)
  B  = beta + Bt + s*delta           (G2; B1 analog in G1)
  C  = Ht + Lt + s*A + r*B1 - rs*delta

r, s are random per proof (tcc:418-419) — pass them explicitly for
deterministic regression tests.
"""

from __future__ import annotations

import os
import secrets
import time
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import get_config
from ..curves import host_curve as HC
from ..curves import jcurve as jc
from ..fields import jfield as jf
from ..fields.constants import R_MOD
from ..msm import pippenger as pp
from ..serialization.libsnark_io import Proof
from ..utils.profiling import profiler
from . import qap
from .keys import DevicePK

FR = jf.FR


def _next_pow2(n: int) -> int:
    return 1 << (n - 1).bit_length()


def _to_device_points(t, pad_to: Optional[int] = None, mesh=None):
    """Move affine points to device, optionally padding with infinity rows so
    different queries share one compiled MSM graph shape (padding points are
    masked out by the kernel's infinity handling). With a mesh, the point
    rows are laid out sharded over the mesh's first axis (the MSM "pts"
    axis), so no resharding transfer happens at prove time."""
    x, y, inf = t
    if pad_to is not None and pad_to > x.shape[0]:
        padn = pad_to - x.shape[0]
        x = np.concatenate([x, np.zeros((padn,) + x.shape[1:], x.dtype)])
        y = np.concatenate([y, np.zeros((padn,) + y.shape[1:], y.dtype)])
        inf = np.concatenate([inf, np.ones(padn, bool)])
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        ax = mesh.axis_names[0]
        put = lambda a: jax.device_put(
            a, NamedSharding(mesh, P(ax, *([None] * (a.ndim - 1)))))
        return (put(jnp.asarray(x)), put(jnp.asarray(y)),
                put(jnp.asarray(inf)))
    return (jnp.asarray(x), jnp.asarray(y), jnp.asarray(inf))


def _pad_scalars(s, pad_to: int):
    n = s.shape[0]
    if pad_to > n:
        s = jnp.concatenate(
            [s, jnp.zeros((pad_to - n, s.shape[1]), jnp.uint32)])
    return s


class Prover:
    """Holds device-resident query tensors for one circuit's proving key.

    All MSM inputs are padded to powers of two: the A/H/L queries of one
    circuit — and of different circuits with equal padded sizes — then share a
    single compiled Pippenger graph (compile time dominates turnaround on
    CPU; on TPU it also maximises XLA program cache hits)."""

    def __init__(self, dpk: DevicePK, lanes: Optional[int] = None,
                 window: Optional[int] = None, mesh=None):
        cfg = get_config()
        self.dpk = dpk
        self.domain = dpk.domain
        self.lanes = (lanes or cfg.msm_lanes
                      or (32768 if jax.default_backend() == "tpu" else 2048))
        self.window = (window or cfg.msm_window
                       or pp.default_window(dpk.num_variables))
        self.mesh = mesh
        n_dev = mesh.devices.size if mesh is not None else 1

        def _pad(n):
            # with a mesh, padded sizes must also cover n_dev for even
            # sharding (powers of two, so max() suffices)
            return max(_next_pow2(n), n_dev)

        nA = _pad(dpk.num_variables + 1)
        self.nA = nA
        self.A = _to_device_points(dpk.A, nA, mesh)
        nB = _pad(len(dpk.B_idx))
        self.nB = nB
        self.B2 = _to_device_points(dpk.B2, nB, mesh)
        self.B1 = _to_device_points(dpk.B1, nB, mesh)
        H = tuple(v[: self.domain.m - 1] for v in dpk.H)
        nH = _pad(self.domain.m - 1)
        self.nH = nH
        self.H = _to_device_points(H, nH, mesh)
        nL = _pad(len(dpk.L[2]))
        self.nL = nL
        self.L = _to_device_points(dpk.L, nL, mesh)
        self.B_idx = jnp.asarray(dpk.B_idx)
        dom = self.domain
        meta = (dpk.num_constraints, dpk.primary_input_size)

        # constraint matrices live on device (uploading ~200 MB of COO per
        # proof through the host link dominated the QAP phase otherwise);
        # in mesh mode the term arrays are sharded over the pts axis
        use_sharded_qap = False
        if mesh is not None:
            from ..parallel import sqap
            use_sharded_qap = sqap.can_shard_domain(dom, n_dev)
        self._sharded_qap = use_sharded_qap

        def _coo_put(row, var, coeff):
            if use_sharded_qap:
                from jax.sharding import NamedSharding, PartitionSpec as P
                from ..parallel import sqap
                ax = mesh.axis_names[0]
                row, var, coeff = sqap._pad_terms(row, var, coeff, n_dev,
                                                  dom.m)
                sh1 = NamedSharding(mesh, P(ax))
                sh2 = NamedSharding(mesh, P(ax, None))
                return (jax.device_put(jnp.asarray(row), sh1),
                        jax.device_put(jnp.asarray(var), sh1),
                        jax.device_put(jnp.asarray(coeff), sh2))
            return (jnp.asarray(row), jnp.asarray(var), jnp.asarray(coeff))

        self.coos = (
            _coo_put(dpk.a_row, dpk.a_var, dpk.a_coeff),
            _coo_put(dpk.b_row, dpk.b_var, dpk.b_coeff),
            _coo_put(dpk.c_row, dpk.c_var, dpk.c_coeff),
        )

        # NTT tables ride as jit arguments too (jntt.qap_tables): baked-in
        # tables blow the lowered module to ~465 MB and make trace/lower the
        # dominant per-process cost on TPU
        if use_sharded_qap:
            from ..parallel import sntt
            self._tabs = jax.device_put(sntt.sqap_tables(dom, n_dev))
        else:
            from ..ntt import jntt
            self._tabs = jax.device_put(jntt.qap_tables(dom))

        if use_sharded_qap:
            from ..parallel import sqap

            def _qap_body(wires_mont, coos, tabs):
                H_mont = sqap.sharded_qap_h(mesh, dom, meta, coos,
                                            wires_mont, tabs)
                return jf.from_mont(FR, H_mont[: dom.m - 1])
        else:
            def _qap_body(wires_mont, coos, tabs):
                H_mont = qap.qap_h_arrays(dom, meta, coos, wires_mont,
                                          tables=tabs)
                return jf.from_mont(FR, H_mont[: dom.m - 1])

        # coos and NTT tables passed as arguments (NOT closed over):
        # closure-captured device arrays are baked into the jaxpr as
        # constants, defeating the persistent compile cache, the export
        # artifact cache, and cross-instance jit reuse
        self._qap_jit = [None]

        def _qap_fn(w):
            if self._qap_jit[0] is None:
                if mesh is None:
                    from ..utils import engine_cache as ec
                    self._qap_jit[0] = ec.cached_jit(
                        "qap", _qap_body, (w, self.coos, self._tabs))
                else:
                    self._qap_jit[0] = jax.jit(_qap_body)
            return self._qap_jit[0](w, self.coos, self._tabs)

        self._qap_fn = _qap_fn

        # MSM dispatch: points-sharded over the mesh (psum/all-gather fold
        # over ICI, parallel.mesh.sharded_msm) or the single-chip kernel.
        # Single-chip callables are shape-specialised and ride the export
        # artifact cache (utils.engine_cache) so fresh processes skip the
        # multi-minute Pippenger trace.
        c_, lanes_ = self.window, self.lanes
        if mesh is not None:
            from ..parallel import mesh as pm

            def _mk(curve):
                @jax.jit
                def run(pts, sc, blind):
                    return pm.sharded_msm(mesh, curve, pts, sc,
                                          c=c_, lanes=lanes_, blind=blind)
                return run

            self._msm = {"g1": _mk("g1"), "g2": _mk("g2")}
        else:
            from ..utils import engine_cache as ec
            mode = os.environ.get("BMTPU_MSM", "auto")

            def _mk(curve):
                by_shape = {}

                def call(pts, sc, blind):
                    k = (pts[0].shape, sc.shape)
                    if k not in by_shape:
                        fn = lambda p, s, b: pp.msm_auto(curve, p, s, c=c_,
                                                         lanes=lanes_,
                                                         blind=b)
                        by_shape[k] = ec.cached_jit(
                            f"msm_{curve}", fn, (pts, sc, blind),
                            statics=f"c{c_}l{lanes_}m{mode}")
                    return by_shape[k](pts, sc, blind)

                return call

            self._msm = {"g1": _mk("g1"), "g2": _mk("g2")}
        self.verbose = bool(os.environ.get("BMTPU_VERBOSE"))

    def warmup(self):
        """Compile/cache-load every graph the prover dispatches, in parallel.

        A fresh process pays one XLA executable load (persistent-cache hit,
        100-160 MB each on the tunnel backend) per distinct graph shape; a
        serial first prove strings 5-6 of those loads end-to-end (~116 s
        measured for mint). Issuing them from worker threads overlaps the
        loads (XLA compilation releases the GIL), cutting fresh-process
        first-proof latency to roughly the slowest single load. Reference
        analogue: the ~20 s pk deserialize (mintcgo.cpp:300-301) — here the
        pk npz load is ~3 s and THIS is the real warm-start cost."""
        import concurrent.futures as cf

        zb1 = self._zb("g1")
        zb2 = self._zb("g2")

        def _zs(n):
            return jnp.zeros((n, jf.N), jnp.uint32)

        jobs = [
            lambda: self._qap_fn(_zs(1 + self.dpk.primary_input_size
                                     + self.dpk.aux_input_size)),
            lambda: self._msm["g1"](self.A, _zs(self.nA), zb1),
            lambda: self._msm["g2"](self.B2, _zs(self.nB), zb2),
        ]
        # distinct g1 shapes only: nB/nH/nL often coincide with nA
        seen = {self.nA}
        for pts, n in ((self.B1, self.nB), (self.H, self.nH),
                       (self.L, self.nL)):
            if n not in seen:
                seen.add(n)
                jobs.append(lambda pts=pts, n=n:
                            self._msm["g1"](pts, _zs(n), zb1))
        def _run(j):
            # sync with a tiny host transfer: on the tunnel backend
            # block_until_ready returns before the server has actually
            # loaded+run the program, so only a device->host read brackets
            # the one-time server-side program load
            t0 = time.time()
            self._sync(j())
            return time.time() - t0

        t0 = time.time()
        # worker cap: on the TPU tunnel the jobs are IO/server-bound (one
        # thread per job overlaps the executable loads); on CPU backends the
        # jobs ARE the compiles — more threads than cores just thrash
        workers = (len(jobs) if jax.default_backend() == "tpu"
                   else max(1, min(len(jobs), (os.cpu_count() or 2))))
        with cf.ThreadPoolExecutor(max_workers=workers) as ex:
            times = list(ex.map(_run, jobs))
        if self.verbose or profiler.enabled:
            print(f"    [prover] warmup jobs: "
                  f"{['%.1fs' % x for x in times]}", flush=True)
        self._t("warmup (parallel compile/load)", t0)

    @staticmethod
    def _zb(curve):
        """Zero-blind placeholder with the right shapes for warmup."""
        _, b = pp.make_blind(curve)
        return (jnp.asarray(b[0]), jnp.asarray(b[1]))

    def _t(self, label, t0):
        """Phase bracket: records into the block profiler (the framework's
        enter_block/leave_block analogue — profiling.hpp:43-46 brackets the
        same prover phases in the reference) and prints when verbose."""
        dt = time.time() - t0
        profiler.totals[label] = profiler.totals.get(label, 0.0) + dt
        if self.verbose or profiler.enabled:
            print(f"    [prover] {label}: {dt:.2f}s", flush=True)
        return time.time()

    @staticmethod
    def _sync(t):
        """Force completion of a device value for phase timing: transfer one
        tiny slice (block_until_ready returns before execution finishes on
        the axon tunnel backend, so it cannot bracket phases). Slice on
        device FIRST so only a few bytes cross the host link."""
        np.asarray(jax.tree.leaves(t)[0][:1])

    def prove(self, primary: List[int], aux: List[int],
              r: Optional[int] = None, s: Optional[int] = None) -> Proof:
        dpk = self.dpk
        assert len(primary) == dpk.primary_input_size
        assert len(aux) == dpk.aux_input_size
        r = secrets.randbelow(R_MOD) if r is None else r
        s = secrets.randbelow(R_MOD) if s is None else s
        timing = self.verbose or profiler.enabled

        t0 = time.time()
        # const-padded assignment (1, wires...) in both forms
        wires = [1] + list(primary) + list(aux)
        wires_mont = jnp.asarray(jf.to_mont_host(FR, wires))
        wires_std = jnp.asarray(jf.ints_to_limbs(wires))
        # fresh per-proof blinds for the exception-free Pippenger stream
        # (pippenger.msm blind= docstring); ignored by the compact kernel
        R1_host, b1 = pp.make_blind("g1")
        R2_host, b2 = pp.make_blind("g2")
        b1 = (jnp.asarray(b1[0]), jnp.asarray(b1[1]))
        b2 = (jnp.asarray(b2[0]), jnp.asarray(b2[1]))
        t0 = self._t("wire conversion", t0)

        # --- QAP H coefficients -----------------------------------------
        H_std = self._qap_fn(wires_mont)
        if timing:
            self._sync(H_std)
        t0 = self._t("qap H (NTT pipeline)", t0)

        # --- 4 MSMs (dispatched asynchronously) -------------------------
        At = self._msm["g1"](self.A, _pad_scalars(wires_std, self.nA), b1)
        if timing:
            self._sync(At)
        t0 = self._t("MSM A", t0)
        b_scalars = jnp.take(wires_std, self.B_idx, axis=0)
        Bt2 = self._msm["g2"](self.B2, _pad_scalars(b_scalars, self.nB), b2)
        if timing:
            self._sync(Bt2)
        t0 = self._t("MSM B (G2)", t0)
        Bt1 = self._msm["g1"](self.B1, _pad_scalars(b_scalars, self.nB), b1)
        Ht = self._msm["g1"](self.H, _pad_scalars(H_std, self.nH), b1)
        Lt = self._msm["g1"](self.L,
                             _pad_scalars(wires_std[dpk.primary_input_size
                                                    + 1:], self.nL), b1)
        if timing:
            self._sync(Lt)
        t0 = self._t("MSM B1/H/L", t0)

        # --- host combine (a handful of scalar muls) --------------------
        def _g1(t):
            h = jc.g1_jacobian_to_host(tuple(v[None] for v in t[:3]))[0]
            return pp.unblind_msm("g1", h, np.asarray(t[3]), R1_host,
                                  self.window)

        At_h = _g1(At)
        Bt2_h = pp.unblind_msm(
            "g2", jc.g2_jacobian_to_host(tuple(v[None] for v in Bt2[:3]))[0],
            np.asarray(Bt2[3]), R2_host, self.window)
        Bt1_h = _g1(Bt1)
        Ht_h = _g1(Ht)
        Lt_h = _g1(Lt)
        t0 = self._t("device->host + combine", t0)

        g1_A = HC.g1_add(HC.g1_add(dpk.alpha_g1, At_h),
                         HC.g1_mul(dpk.delta_g1, r))
        g1_B = HC.g1_add(HC.g1_add(dpk.beta_g1, Bt1_h),
                         HC.g1_mul(dpk.delta_g1, s))
        g2_B = HC.g2_add(HC.g2_add(dpk.beta_g2, Bt2_h),
                         HC.g2_mul(dpk.delta_g2, s))
        g1_C = HC.g1_add(
            HC.g1_add(HC.g1_add(Ht_h, Lt_h), HC.g1_mul(g1_A, s)),
            HC.g1_add(HC.g1_mul(g1_B, r),
                      HC.g1_neg(HC.g1_mul(dpk.delta_g1, r * s % R_MOD))))
        return Proof(a=g1_A, b=g2_B, c=g1_C)

    # ------------------------------------------------------------------
    # Batched multi-proof throughput (BASELINE "batched multi-proof" config)
    # ------------------------------------------------------------------

    def prove_batch(self, instances, rs: Optional[List[int]] = None,
                    ss: Optional[List[int]] = None) -> List[Proof]:
        """Prove B independent witnesses of the same circuit in one device
        dispatch: the QAP pipeline and all four MSMs are vmapped over the
        batch axis (the pk query tensors are shared). This is the reference's
        per-process proof parallelism (§2.3: each geth node proves
        independently) collapsed onto one chip's vector lanes."""
        import jax

        dpk = self.dpk
        B = len(instances)
        rs = [secrets.randbelow(R_MOD) for _ in range(B)] if rs is None else rs
        ss = [secrets.randbelow(R_MOD) for _ in range(B)] if ss is None else ss

        wires_all = [[1] + list(p) + list(a) for p, a in instances]
        wires_mont = jnp.asarray(
            np.stack([jf.to_mont_host(FR, w) for w in wires_all]))
        wires_std = jnp.asarray(
            np.stack([jf.ints_to_limbs(w) for w in wires_all]))

        H_std = jax.vmap(self._qap_fn)(wires_mont)

        c, lanes = self.window, self.lanes
        R1_host, b1 = pp.make_blind("g1")
        R2_host, b2 = pp.make_blind("g2")
        b1 = (jnp.asarray(b1[0]), jnp.asarray(b1[1]))
        b2 = (jnp.asarray(b2[0]), jnp.asarray(b2[1]))

        def bmsm(curve, pts, scal, pad_to, blind):
            padded = jax.vmap(lambda s: _pad_scalars(s, pad_to))(scal)
            return jax.vmap(
                lambda s: pp.msm_auto(curve, pts, s, c=c, lanes=lanes,
                                      blind=blind))(padded)

        At = bmsm("g1", self.A, wires_std, self.nA, b1)
        b_scalars = jnp.take(wires_std, self.B_idx, axis=1)
        Bt2 = bmsm("g2", self.B2, b_scalars, self.nB, b2)
        Bt1 = bmsm("g1", self.B1, b_scalars, self.nB, b1)
        Ht = bmsm("g1", self.H, H_std, self.nH, b1)
        Lt = bmsm("g1", self.L, wires_std[:, dpk.primary_input_size + 1:],
                  self.nL, b1)

        def _hg1(t):
            pts = jc.g1_jacobian_to_host(t[:3])
            w = np.asarray(t[3])
            return [pp.unblind_msm("g1", p, w[i], R1_host, c)
                    for i, p in enumerate(pts)]

        At_h = _hg1(At)
        w2 = np.asarray(Bt2[3])
        Bt2_h = [pp.unblind_msm("g2", p, w2[i], R2_host, c)
                 for i, p in enumerate(jc.g2_jacobian_to_host(Bt2[:3]))]
        Bt1_h = _hg1(Bt1)
        Ht_h = _hg1(Ht)
        Lt_h = _hg1(Lt)

        proofs = []
        for i in range(B):
            r, s = rs[i], ss[i]
            g1_A = HC.g1_add(HC.g1_add(dpk.alpha_g1, At_h[i]),
                             HC.g1_mul(dpk.delta_g1, r))
            g1_B = HC.g1_add(HC.g1_add(dpk.beta_g1, Bt1_h[i]),
                             HC.g1_mul(dpk.delta_g1, s))
            g2_B = HC.g2_add(HC.g2_add(dpk.beta_g2, Bt2_h[i]),
                             HC.g2_mul(dpk.delta_g2, s))
            g1_C = HC.g1_add(
                HC.g1_add(HC.g1_add(Ht_h[i], Lt_h[i]), HC.g1_mul(g1_A, s)),
                HC.g1_add(HC.g1_mul(g1_B, r),
                          HC.g1_neg(HC.g1_mul(dpk.delta_g1,
                                              r * s % R_MOD))))
            proofs.append(Proof(a=g1_A, b=g2_B, c=g1_C))
        return proofs
