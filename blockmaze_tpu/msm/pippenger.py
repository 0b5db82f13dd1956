"""Pippenger multi-scalar multiplication for JAX/TPU.

The reference accumulates buckets with a serial scatter-add
(multiexp.tcc:166-284). TPUs have no atomics and XLA wants static shapes, so
bucket accumulation is reformulated sort-first (the standard throughput
formulation used by GPU/FPGA ZK accelerators):

  1. digit decomposition: every scalar contributes one c-bit digit per window;
     (window, digit) pairs become sort keys so every bucket's items are
     contiguous;
  2. tiled segmented reduction: the sorted item stream is split into T
     lane-chunks walked in lockstep by a fori_loop; each lane accumulates its
     current run with batched mixed-adds and flushes completed buckets with a
     conflict-free scatter (an interior bucket belongs to exactly one lane);
  3. chunk-boundary partial sums (≤ 2T, still key-sorted) are combined with a
     flag-based segmented-monoid associative scan and scattered into the
     remaining buckets;
  4. per window: a reverse associative scan of buckets gives the triangle
     weighting Σ d·S_d = Σ_j (Σ_{d≥j} S_d); windows are folded with c
     doublings each (Horner over 2^c).

Group-op count ≈ n·⌈254/c⌉ mixed-adds + 2^c·log(2^c)·W scan adds, all
executed as wide vector batches — the shape the VPU wants.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..curves import jcurve as jc
from ..curves import pcurve as pcv
from ..fields import jfield as jf
from ..fields import kfield as kf

SCALAR_BITS = 254


def _interpret() -> bool:
    return jax.default_backend() != "tpu"

# Pallas point kernels keep the limb arithmetic VMEM-resident (the XLA
# formulation is HBM-bound). Only used on real TPU backends: the interpret
# fallback is slower than the plain XLA path on CPU. BMTPU_PALLAS=0 forces
# the XLA path everywhere.
import os as _os


def USE_PALLAS():
    return (_os.environ.get("BMTPU_PALLAS", "1") != "0"
            and jax.default_backend() == "tpu")


def _k_add(curve, F, P, Q):
    if USE_PALLAS():
        return pcv.add(curve, P, Q)
    return jc.point_add(F, P, Q)


def _k_double(curve, F, P):
    if USE_PALLAS():
        return pcv.double(curve, P)
    return jc.point_double(F, P)


def _digits_for_window(limbs, w: int, c: int):
    """Extract c-bit digit at bit offset w*c from (n,16) uint32 16-bit limbs."""
    p = w * c
    li = p // 16
    off = p % 16
    lo = limbs[:, li].astype(jnp.uint32)
    hi = limbs[:, li + 1].astype(jnp.uint32) if li + 1 < 16 else jnp.zeros_like(lo)
    word = lo | (hi << 16)
    return (word >> off) & jnp.uint32((1 << c) - 1)


def stream_keys(curve: str, points, scalars, c: int):
    """Shared SORTED sort-phase front end (also used by scripts/msmbench.py
    so the benchmark cannot drift from the kernel): packs the affine points
    into single gather-friendly rows, builds the per-window digit keys with
    zero-digit / infinity items sent past the live digits, and sorts EACH
    WINDOW independently. Global bucket order is window-major then digit,
    so W independent n-item sorts produce exactly the global key order of
    one W·n-item sort — at n log n instead of (W·n) log(W·n) comparator
    depth (XLA sort cost is superlinear; measured win on the 2^19 stream).

    Returns (P_packed (n, CW), skeys (W*n,) sorted global keys with DROP
    sentinels, spid (W*n,) int32 point ids in stream order, DROP)."""
    X, Y, inf = points
    n = X.shape[0]
    n_windows = -(-SCALAR_BITS // c)
    n_buckets = 1 << c
    DROP = jnp.uint32(n_windows * n_buckets)
    digits = jnp.stack([_digits_for_window(scalars, w, c)
                        for w in range(n_windows)])        # (W, n)
    dead = (digits == 0) | inf[None, :]
    dsort = jnp.where(dead, jnp.uint32(n_buckets), digits)
    order = jnp.argsort(dsort, axis=1)                     # (W, n)
    sdig = jnp.take_along_axis(dsort, order, axis=1)
    win_base = (jnp.arange(n_windows, dtype=jnp.uint32) * n_buckets)[:, None]
    skeys = jnp.where(sdig < n_buckets, sdig + win_base, DROP).reshape(-1)
    spid = order.astype(jnp.int32).reshape(-1)
    coord_w = 16 if curve == "g1" else 32
    P = jnp.concatenate([X.reshape(n, coord_w), Y.reshape(n, coord_w),
                         inf.astype(jnp.uint32)[:, None]], axis=1)
    return P, skeys, spid, DROP


def default_window(n: int) -> int:
    """Window size tuned for the TPU formulation (bucket-scan cost grows with
    2^c, accumulation cost with 254/c)."""
    if n < (1 << 12):
        return 8
    if n < (1 << 16):
        return 10
    if n < (1 << 19):
        return 12
    return 13


def _zeros_pts(F, curve, batch):
    shape = (batch, 2, jf.N) if curve == "g2" else (batch, jf.N)
    zx = jnp.zeros(shape, jnp.uint32)
    return (zx, F.one_like(zx), jnp.zeros(shape, jnp.uint32))


def _unpack_item(curve, rows, key, DROPu):
    """One stream item from its LIMB-MAJOR (CW, B) row block: affine coords
    + infinity mask. Shared by the Pallas kernel and the XLA driver. (The
    (B, CW) gather layout is swapped to (CW, B) once per round by XLA —
    in-kernel per-item transposes measured ~4x slower than the point math.)"""
    if curve == "g1":
        px, py = rows[0:16], rows[16:32]
    else:
        px = jnp.stack([rows[0:16], rows[16:32]])
        py = jnp.stack([rows[32:48], rows[48:64]])
    pinf = (rows[rows.shape[0] - 1] != 0) | (key >= DROPu)
    return px, py, pinf


def _item_step(curve, use_blind, DROPu, key, px, py, pinf,
               acc, meta, head, binit, vm):
    """Semantics of ONE stream item for every lane of a block — run reset,
    head tracking, flush detection, mixed add. Pure function over limb-major
    values so the Pallas kernel (TPU) and the XLA fallback driver (CPU tests,
    virtual meshes) share one implementation.

    acc/head: coordinate triples (16, B) / (2, 16, B); meta: (cur_key,
    head_key, seen) uint32 (B,) each; binit: blind affine (Rx, Ry) broadcast
    to acc shape (ignored unless use_blind). Returns (acc, meta, head, fkey,
    fpack) with fpack the (B, packw) limb-minor packed flush candidate."""
    F = kf.KFqOps if curve == "g1" else kf.KFq2Ops
    cur, hk, seen = meta

    is_new = key != cur
    do_flush = is_new & (seen != 0) & (cur < DROPu)
    fkey = jnp.where(do_flush, cur, DROPu)
    # flush candidate = current acc, packed LIMB-MAJOR (packw, B) + blind
    # count 1; swapped to scatter-row layout once per round by XLA
    if curve == "g1":
        parts = [acc[0], acc[1], acc[2]]
    else:
        parts = [acc[0][0], acc[0][1], acc[1][0], acc[1][1],
                 acc[2][0], acc[2][1]]
    parts.append(jnp.ones((1,) + parts[0].shape[1:], jnp.uint32))
    fpack = jnp.concatenate(parts, axis=0)

    new_head = is_new & (seen == 0)
    hk = jnp.where(new_head, cur, hk)
    head = tuple(F.select(new_head, a, h) for a, h in zip(acc, head))
    seen = seen | is_new.astype(jnp.uint32)

    one = F.one_like(acc[2])
    if use_blind:
        init = (binit[0], binit[1], one)
    else:
        init = (F.zeros_like(acc[0]), one, F.zeros_like(acc[2]))
    acc = tuple(F.select(is_new, z, a) for z, a in zip(init, acc))
    if use_blind:
        acc = jc.point_mixed_add_noexc(F, acc, px, py, pinf, vm=vm)
    else:
        acc = jc.point_mixed_add(F, acc, px, py, pinf, vm=vm)
    return acc, (key, hk, seen), head, fkey, fpack


@lru_cache(maxsize=None)
def _round_kernel(curve: str, use_blind: bool, DROP: int):
    """Build the fused round kernel: one grid step processes ONE stream item
    for a block of BLK lanes; the K axis rides the (sequential) Pallas grid
    so the acc/head/meta out-refs persist in VMEM across a lane block's K
    items (standard revisited-block accumulation). All bookkeeping that the
    per-item formulation did in XLA glue — run reset, head tracking, flush
    detection, limb-major transposes — runs in VMEM here (straight-line
    formulas: vm=False — the VM's program arrays would be captured
    constants, and Mosaic fuses the straight-line form anyway).

    r5 negative result, kept for the record: walking the K items with an
    IN-KERNEL fori_loop (grid 16-32x smaller) measured the same wall clock
    while growing the compiled executable 2.5x (383 MB vs 150 MB — dynamic
    VMEM indexing makes Mosaic generate far more code), which costs every
    fresh process ~2 min of extra program-load on the tunnel backend. The
    per-item grid form is the better trade."""

    def kernel(keys_ref, rows_ref, ax_ref, ay_ref, az_ref, meta_ref,
               hx_ref, hy_ref, hz_ref, bx_ref, by_ref,
               ax_o, ay_o, az_o, meta_o, hx_o, hy_o, hz_o,
               fkey_o, fpack_o):
        k = pl.program_id(1)
        DROPu = jnp.uint32(DROP)

        @pl.when(k == 0)
        def _():
            ax_o[...] = ax_ref[...]
            ay_o[...] = ay_ref[...]
            az_o[...] = az_ref[...]
            meta_o[...] = meta_ref[...]
            hx_o[...] = hx_ref[...]
            hy_o[...] = hy_ref[...]
            hz_o[...] = hz_ref[...]

        key = keys_ref[0, 0, :]                    # (BLK,)
        rows = rows_ref[0]                         # (CW, BLK) limb-major
        px, py, pinf = _unpack_item(curve, rows, key, DROPu)
        if curve == "g1":
            binit = (jnp.broadcast_to(bx_ref[:, 0:1], ax_o.shape),
                     jnp.broadcast_to(by_ref[:, 0:1], ax_o.shape))
        else:
            binit = (jnp.broadcast_to(bx_ref[:, :, 0:1], ax_o.shape),
                     jnp.broadcast_to(by_ref[:, :, 0:1], ax_o.shape))

        acc = (ax_o[...], ay_o[...], az_o[...])
        meta = (meta_o[0, :], meta_o[1, :], meta_o[2, :])
        head = (hx_o[...], hy_o[...], hz_o[...])
        acc, meta, head, fkey, fpack = _item_step(
            curve, use_blind, DROPu, key, px, py, pinf, acc, meta, head,
            binit, vm=False)
        fkey_o[0, 0, :] = fkey
        fpack_o[0] = fpack
        ax_o[...], ay_o[...], az_o[...] = acc
        meta_o[0, :], meta_o[1, :], meta_o[2, :] = meta
        hx_o[...], hy_o[...], hz_o[...] = head

    return kernel


def _xla_round(curve, use_blind, DROP, K, packw,
               keys_r, rows, acc, meta, head, bx, by):
    """XLA fallback for one round (non-TPU backends): identical semantics to
    the Pallas kernel via the shared _item_step, driven by a fori_loop over
    the K items (formula-VM mixed adds keep the XLA:CPU graph small — the
    straight-line form costs minutes of CPU compile; jcurve.use_vm)."""
    DROPu = jnp.uint32(DROP)
    T = keys_r.shape[1]                              # keys_r is (K, T)
    if curve == "g1":
        binit = (jnp.broadcast_to(bx, (16, T)), jnp.broadcast_to(by, (16, T)))
    else:
        binit = (jnp.broadcast_to(bx, (2, 16, T)),
                 jnp.broadcast_to(by, (2, 16, T)))
    fkeys0 = jnp.full((K, T), DROPu, jnp.uint32)
    fpack0 = jnp.zeros((K, packw, T), jnp.uint32)
    meta = (meta[0], meta[1], meta[2])

    def kbody(k, carry):
        acc, meta, head, fkeys, fpacks = carry
        key = jax.lax.dynamic_index_in_dim(keys_r, k, axis=0, keepdims=False)
        row = jax.lax.dynamic_index_in_dim(rows, k, axis=0, keepdims=False)
        px, py, pinf = _unpack_item(curve, row, key, DROPu)
        acc, meta, head, fkey, fpack = _item_step(
            curve, use_blind, DROPu, key, px, py, pinf, acc, meta, head,
            binit, vm=None)
        fkeys = jax.lax.dynamic_update_index_in_dim(fkeys, fkey, k, axis=0)
        fpacks = jax.lax.dynamic_update_index_in_dim(fpacks, fpack[None],
                                                     k, axis=0)
        return acc, meta, head, fkeys, fpacks

    acc, meta, head, fkeys, fpacks = jax.lax.fori_loop(
        0, K, kbody, (acc, meta, head, fkeys0, fpack0))
    return acc, jnp.stack(meta), head, fkeys, fpacks


@lru_cache(maxsize=None)
def _fold_kernel(curve: str, c: int, W: int):
    """Single-kernel Horner fold over windows: res = Σ_w 2^{cw}·win_w.

    The XLA formulation executes (W-1)·(c+1) ≈ 270 separate batch-1 point-op
    kernels (measured ~100+ ms of the MSM combine phase is this fold alone);
    here the whole fold is ONE kernel with in-kernel fori_loops, the W window
    sums living in VMEM as a (3·coordwidth, W) limb-major pack."""
    F = kf.KFqOps if curve == "g1" else kf.KFq2Ops
    cw = 16 if curve == "g1" else 32

    def getw(ref, idx):
        # dynamic lane slicing must be 128-aligned on TPU; select the window
        # column with a mask + sum instead (W is tiny)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
        m = (lane == idx).astype(jnp.uint32)

        def pick(lo):
            # Mosaic: no unsigned reductions; sum in int32 (values are
            # masked u32 limbs < 2^16 except Montgomery limbs < 2^16: safe)
            v = (ref[lo:lo + 16, :] * m).astype(jnp.int32)
            return jnp.sum(v, axis=1, keepdims=True).astype(jnp.uint32)

        if curve == "g1":
            return (pick(0), pick(16), pick(32))
        return (jnp.stack([pick(0), pick(16)]),
                jnp.stack([pick(32), pick(48)]),
                jnp.stack([pick(64), pick(80)]))

    def kernel(win_ref, out_ref):
        res = getw(win_ref, W - 1)

        def wbody(w, res):
            res = jax.lax.fori_loop(
                0, c, lambda _, P: jc.point_double(F, P), res)
            Q = getw(win_ref, W - 1 - w)
            return jc.point_add(F, res, Q)

        res = jax.lax.fori_loop(1, W, wbody, res)
        if curve == "g1":
            out_ref[0:16, :] = res[0]
            out_ref[16:32, :] = res[1]
            out_ref[32:48, :] = res[2]
        else:
            out_ref[0:16, :] = res[0][0]
            out_ref[16:32, :] = res[0][1]
            out_ref[32:48, :] = res[1][0]
            out_ref[48:64, :] = res[1][1]
            out_ref[64:80, :] = res[2][0]
            out_ref[80:96, :] = res[2][1]

    return kernel


def _fold_pallas(curve: str, c: int, n_windows: int, win):
    """Pack the window sums limb-major and run the one-kernel Horner fold."""
    pw = 48 if curve == "g1" else 96
    if curve == "g1":
        packed = jnp.concatenate([w.T for w in win], axis=0)       # (48, W)
    else:
        packed = jnp.concatenate(
            [w.transpose(1, 2, 0).reshape(32, -1) for w in win], axis=0)
    res = pl.pallas_call(
        _fold_kernel(curve, c, n_windows),
        in_specs=[pl.BlockSpec((pw, n_windows), lambda: (0, 0))],
        out_specs=pl.BlockSpec((pw, 1), lambda: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((pw, 1), jnp.uint32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(packed)
    if curve == "g1":
        return (res[0:16, 0], res[16:32, 0], res[32:48, 0])
    return (res[0:32, 0].reshape(2, 16), res[32:64, 0].reshape(2, 16),
            res[64:96, 0].reshape(2, 16))


@partial(jax.jit, static_argnums=(0, 3, 4, 6))
def msm(curve: str, points, scalars, c: int = 13, lanes: int = 1024,
        blind=None, kitems: int = 32):
    """points = (X, Y, inf) affine Montgomery tensors; scalars = (n, 16)
    uint32 standard-form (non-Montgomery) limbs. curve in {"g1", "g2"}.
    Returns a single Jacobian point (coordinate tensors without batch dim).

    blind: optional affine Montgomery pair (Rx, Ry) of a RANDOM group element
    R (fresh per proof; generated host-side from secret randomness). When
    given, every accumulator run is seeded with R instead of infinity, which
    makes the exceptional cases of the hot mixed-add (acc == ±Q, acc == ∞)
    cryptographically impossible, so the stream loop runs the exception-free
    formula (point_mixed_add_noexc) — ~40% fewer field muls. The surplus
    R-multiples are tracked exactly with integer bucket counts riding the
    same scatter/scan/triangle pipeline; the per-window multiplicities are
    returned as a (n_windows,) uint32 vector and the caller subtracts
    (Σ_w 2^{cw}·wts[w])·R host-side (see unblind_msm). Return value becomes
    (X, Y, Z, wts)."""
    F = jc.FqOps if curve == "g1" else jc.Fq2Ops
    X, Y, inf = points
    n = X.shape[0]
    n_windows = -(-SCALAR_BITS // c)
    n_buckets = 1 << c
    total_buckets = n_windows * n_buckets
    total = n_windows * n

    # ---- 1. keys + physically reorder the PACKED point stream ----------
    # TPU gathers of 64-byte rows run ~3.5M rows/s (catastrophic); gathering
    # ONE packed (X‖Y‖inf) row of 132/260 bytes runs at near-HBM speed. So:
    # per-window key sort (stream_keys); the per-round packed gather below
    # then reads point rows in bucket order.
    P, skeys, spid, DROP = stream_keys(curve, points, scalars, c)
    CW = P.shape[1]

    # ---- 2. fused-round segmented reduction ----------------------------
    # Lane t walks the contiguous sorted range [t*L, (t+1)*L) in rounds of K
    # items. Each round is ONE Pallas kernel (grid (lane blocks, K)): the
    # run-reset / head-tracking / flush-detect selects, the limb-major
    # transposes, and the mixed-add all happen in VMEM, and the round's K*T
    # flush candidates leave packed for a single XLA scatter. This replaces
    # the per-item formulation (one scatter + layout transposes per stream
    # step) whose glue cost dominated the point math (PROFILE_r3.md).
    K = kitems
    T = min(lanes, total)
    BLK = min(int(_os.environ.get("BMTPU_MSM_BLK", "1024")), T)
    T = -(-T // BLK) * BLK                 # lane count, multiple of BLK
    L = -(-total // T)
    rounds = max(1, -(-L // K))
    if L < K:
        K = L
        rounds = 1
    L = rounds * K
    pad = T * L - total
    skeys = jnp.concatenate([skeys, jnp.full((pad,), DROP, jnp.uint32)])
    spid = jnp.concatenate([spid, jnp.zeros((pad,), jnp.int32)])
    skeys = skeys.reshape(T, rounds, K)
    spid = spid.reshape(T, rounds, K)

    use_blind = blind is not None
    if curve == "g1":
        cshape, packw = (16, T), 3 * 16 + 1
    else:
        cshape, packw = (2, 16, T), 3 * 32 + 1
    zero_c = jnp.zeros(cshape, jnp.uint32)
    one_c = (kf.KFqOps if curve == "g1" else kf.KFq2Ops).one_like(zero_c)
    if use_blind:
        bx, by = blind
        bx = bx.reshape(cshape[:-1] + (1,))
        by = by.reshape(cshape[:-1] + (1,))
    else:
        bx = jnp.zeros(cshape[:-1] + (1,), jnp.uint32)
        by = jnp.zeros(cshape[:-1] + (1,), jnp.uint32)

    kern = _round_kernel(curve, use_blind, total_buckets)
    nb = T // BLK
    cblk = cshape[:-1] + (BLK,)
    if curve == "g1":
        cmap = lambda b, k: (0, b)
        bmap = lambda b, k: (0, 0)
    else:
        cmap = lambda b, k: (0, 0, b)
        bmap = lambda b, k: (0, 0, 0)
    cspec = pl.BlockSpec(cblk, cmap)
    bspec = pl.BlockSpec(cshape[:-1] + (1,), bmap)
    mspec = pl.BlockSpec((3, BLK), lambda b, k: (0, b))
    kspec = pl.BlockSpec((1, 1, BLK), lambda b, k: (k, 0, b))
    rspec = pl.BlockSpec((1, CW, BLK), lambda b, k: (k, 0, b))
    fspec = pl.BlockSpec((1, packw, BLK), lambda b, k: (k, 0, b))

    acc0 = (jnp.broadcast_to(bx, cshape) if use_blind else zero_c,
            jnp.broadcast_to(by, cshape) if use_blind else one_c,
            one_c if use_blind else zero_c)
    meta0 = jnp.stack([skeys[:, 0, 0],
                       jnp.full((T,), DROP, jnp.uint32),
                       jnp.zeros((T,), jnp.uint32)])
    head0 = (zero_c, one_c, zero_c)
    bkt0 = jnp.zeros((total_buckets, packw), jnp.uint32)

    def round_body(r, state):
        bkt, acc, meta, head = state
        keys_r = jax.lax.dynamic_slice_in_dim(skeys, r, 1, axis=1)
        keys_r = keys_r.reshape(T, K).T                       # (K, T)
        idx_r = jax.lax.dynamic_slice_in_dim(spid, r, 1, axis=1)
        idx_r = idx_r.reshape(T, K).T                         # (K, T)
        rows = jnp.take(P, idx_r.reshape(-1), axis=0).reshape(K, T, CW)
        rows = jnp.swapaxes(rows, 1, 2)                       # (K, CW, T)
        if not USE_PALLAS():
            # XLA driver (CPU backends, BMTPU_PALLAS=0 escape hatch): same
            # semantics through the shared _item_step, but as plain XLA
            # (interpret-mode Pallas would still trace the straight-line
            # madd once per grid step: minutes of CPU compile)
            acc, meta, head, fkeys, fpack = _xla_round(
                curve, use_blind, total_buckets, K, packw,
                keys_r, rows, acc, meta, head, bx, by)
            fpack = jnp.swapaxes(fpack, 1, 2)                 # (K, T, packw)
        else:
            out = pl.pallas_call(
                kern,
                grid=(nb, K),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024),
                in_specs=[kspec, rspec, cspec, cspec, cspec, mspec,
                          cspec, cspec, cspec, bspec, bspec],
                out_specs=(cspec, cspec, cspec, mspec, cspec, cspec, cspec,
                           kspec, fspec),
                # outputs pinned to HBM: unconstrained custom-call results
                # get stack-allocated in scoped VMEM by XLA's memory-space
                # assignment, and the packed flush tensor alone (~34 MB
                # tile-padded) blows the 16 MB scoped limit
                out_shape=(
                    (pltpu.HBM(cshape, jnp.uint32),) * 3
                    + (pltpu.HBM((3, T), jnp.uint32),)
                    + (pltpu.HBM(cshape, jnp.uint32),) * 3
                    + (pltpu.HBM((K, 1, T), jnp.uint32),
                       pltpu.HBM((K, packw, T), jnp.uint32))),
            )(keys_r[:, None, :], rows, acc[0], acc[1], acc[2], meta,
              head[0], head[1], head[2], bx, by)
            acc = out[0:3]
            meta = out[3]
            head = out[4:7]
            fkeys, fpack = out[7], jnp.swapaxes(out[8], 1, 2)
        bkt = bkt.at[fkeys.reshape(-1)].set(fpack.reshape(-1, packw),
                                            mode="drop")
        return (bkt, acc, meta, head)

    # TPU: rounds unrolled in Python — a pallas_call inside a lax.while body
    # gets its result tuple stack-allocated in scoped VMEM by this XLA
    # version (46 MB > 16 MB limit at real sizes); unrolled, results are
    # plain HBM buffers, and rounds is ~10-40 so the traced graph stays
    # small. XLA driver (CPU / BMTPU_PALLAS=0): rolled fori_loop — the
    # XLA:CPU compile is superlinear in graph size (an unrolled 104-round
    # mesh shard measured >1 h to compile).
    if not USE_PALLAS():
        bkt, accM, meta, headM = jax.lax.fori_loop(
            0, rounds, round_body, (bkt0, acc0, meta0, head0))
    else:
        state = (bkt0, acc0, meta0, head0)
        for r in range(rounds):
            state = round_body(r, state)
        bkt, accM, meta, headM = state

    # unpack to the limb-minor layout the combine/triangle phases use
    def _unmajor(t):
        return (t.T if curve == "g1" else t.transpose(2, 0, 1))

    acc = tuple(_unmajor(t) for t in accM)
    head_sum = tuple(_unmajor(t) for t in headM)
    cur_key, head_key = meta[0], meta[1]
    seen_change = meta[2] != 0
    if curve == "g1":
        buckets = tuple(bkt[:, 16 * i:16 * (i + 1)] for i in range(3))
    else:
        buckets = tuple(bkt[:, 32 * i:32 * (i + 1)].reshape(-1, 2, 16)
                        for i in range(3))
    cnt = bkt[:, packw - 1]

    # ---- 3. boundary combine ------------------------------------------
    # per lane, in key-sorted order: (head_key, head_sum) then
    # (tail_key = cur_key, tail_sum = acc). Lanes with a single run emit an
    # identity head carrying the tail key so equal keys stay contiguous.
    head_key = jnp.where(seen_change, head_key, cur_key)
    ident = _zeros_pts(F, curve, T)
    head_sum = tuple(F.select(seen_change, h, i)
                     for h, i in zip(head_sum, ident))

    bkeys = jnp.stack([head_key, cur_key], axis=1).reshape(-1)      # (2T,)
    bpts = tuple(jnp.stack([h, a], axis=1).reshape((-1,) + h.shape[1:])
                 for h, a in zip(head_sum, acc))
    # flag-based segmented inclusive scan, Hillis-Steele over a fori_loop so
    # point_add is instantiated ONCE in the graph (associative_scan would
    # inline the combine ~2·log(n) times and blow up compile time). The
    # blind counts (one R per head partial iff the lane completed a first
    # run, one per tail accumulator) only ride the scan when blinding is on.
    flags = jnp.concatenate([jnp.array([True]), bkeys[1:] != bkeys[:-1]])
    nb = bkeys.shape[0]
    steps = max(1, (nb - 1).bit_length())
    pos = jnp.arange(nb)

    def seg_body(i, state):
        if use_blind:
            pts, cn, fl = state
        else:
            pts, fl = state
        shift = jnp.left_shift(jnp.int32(1), i)
        prev = tuple(jnp.roll(p, shift, axis=0) for p in pts)
        prev_fl = jnp.roll(fl, shift, axis=0)
        valid = pos >= shift
        s = _k_add(curve, F, prev, pts)
        take = valid & ~fl  # no segment start in (j-shift, j]
        pts = tuple(F.select(take, sv, pv) for sv, pv in zip(s, pts))
        fl2 = fl | (valid & prev_fl)
        if use_blind:
            cn = jnp.where(take, jnp.roll(cn, shift, axis=0) + cn, cn)
            return (pts, cn, fl2)
        return (pts, fl2)

    if use_blind:
        bcnt = jnp.stack([seen_change.astype(jnp.uint32),
                          jnp.ones((T,), jnp.uint32)], axis=1).reshape(-1)
        (bpts, bcnt, _) = jax.lax.fori_loop(0, steps, seg_body,
                                            (bpts, bcnt, flags))
    else:
        (bpts, _) = jax.lax.fori_loop(0, steps, seg_body, (bpts, flags))
    run_end = jnp.concatenate([bkeys[:-1] != bkeys[1:], jnp.array([True])])
    widx = jnp.where(run_end & (bkeys < DROP), bkeys, DROP).astype(jnp.int32)
    buckets = tuple(b.at[widx].set(v, mode="drop")
                    for b, v in zip(buckets, bpts))
    if use_blind:
        cnt = cnt.at[widx].set(bcnt, mode="drop")

    # ---- 4. triangle + window fold ------------------------------------
    bw = tuple(b.reshape((n_windows, n_buckets) + b.shape[1:])[:, 1:]
               for b in buckets)  # drop bucket 0 (weight 0)
    B1 = n_buckets - 1

    if USE_PALLAS():
        # weighted-pair tree: win_w = Σ_d d·S_d directly, ~5·2^c point ops
        # per window instead of the r4 suffix Hillis-Steele + halving tree
        # (14·2^c) — PROFILE_r4 lever #2. Each node of the pairwise tree
        # carries (s, t, w): s = Σ S over its block, t = blocksize·s,
        # w = Σ (local index)·S. Combine of two size-m blocks:
        #   w' = w_lo + w_hi + t_hi       (t_hi = m·s_hi shifts Hi indices)
        #   t' = 2·(t_lo + t_hi)          (= 2m·s')
        #   s' = s_lo + s_hi
        # Root: Σ j·S_j with 0-based j; win = root.w + root.s rebases to
        # d = j+1 (bucket 0 was dropped). Infinity-pad to 2^c: the pad's
        # weighted contribution is the identity.
        zx = _zeros_pts(F, curve, n_windows)
        s = tuple(jnp.concatenate([p, z[:, None]], axis=1)
                  for p, z in zip(bw, zx))                    # (W, 2^c, ...)
        t = s
        w = tuple(jnp.broadcast_to(z[:, None], p.shape)
                  for p, z in zip(s, zx))
        size = B1 + 1
        while size > 1:
            half = size // 2

            def _sp(p, which):
                v = p.reshape((n_windows, half, 2) + p.shape[2:])
                return v[:, :, which]

            s_lo = tuple(_sp(p, 0) for p in s)
            s_hi = tuple(_sp(p, 1) for p in s)
            t_hi = tuple(_sp(p, 1) for p in t)
            w_pair = _k_add(curve, F, tuple(_sp(p, 0) for p in w),
                            tuple(_sp(p, 1) for p in w))
            w = _k_add(curve, F, w_pair, t_hi)
            s = _k_add(curve, F, s_lo, s_hi)
            if half > 1:  # root's t is never read
                t = _k_double(curve, F,
                              _k_add(curve, F, tuple(_sp(p, 0) for p in t),
                                     t_hi))
            size = half
        win = _k_add(curve, F, tuple(p[:, 0] for p in w),
                     tuple(p[:, 0] for p in s))   # (W, ...) per window
    else:
        bpos = jnp.arange(B1)

        # suffix sums R_j = Σ_{d>=j} S_d (reverse Hillis-Steele, one add
        # instance) followed by the forward inclusive sum: a single
        # point_add instance per loop keeps the XLA CPU graph small
        # (compile time dominates there)
        def suf_body(i, pts):
            shift = jnp.left_shift(jnp.int32(1), i)
            nxt = tuple(jnp.roll(p, -shift, axis=1) for p in pts)
            sv = _k_add(curve, F, pts, nxt)
            take = bpos < (B1 - shift)
            return tuple(F.select(take[None, :], a, b)
                         for a, b in zip(sv, pts))

        suf = jax.lax.fori_loop(0, max(1, (B1 - 1).bit_length()),
                                suf_body, bw)

        def sum_body(i, pts):
            shift = jnp.left_shift(jnp.int32(1), i)
            prev = tuple(jnp.roll(p, shift, axis=1) for p in pts)
            sv = _k_add(curve, F, prev, pts)
            take = bpos >= shift
            return tuple(F.select(take[None, :], a, b)
                         for a, b in zip(sv, pts))

        tot = jax.lax.fori_loop(0, max(1, (B1 - 1).bit_length()), sum_body,
                                suf)
        win = tuple(p[:, -1] for p in tot)

    # Horner fold over windows, highest first
    if USE_PALLAS():
        # one kernel for the whole fold (the rolled XLA loop below executes
        # ~(W-1)(c+1) separate batch-1 point kernels)
        res = _fold_pallas(curve, c, n_windows, win)
    else:
        def fold_body(w, res):
            # res carries a leading batch dim of 1 (kernel-friendly shape)
            res = jax.lax.fori_loop(0, c,
                                    lambda _, P: _k_double(curve, F, P), res)
            idx = n_windows - 1 - w
            Q = tuple(jnp.take(x, idx, axis=0)[None] for x in win)
            return _k_add(curve, F, res, Q)

        res = tuple(x[n_windows - 1][None] for x in win)
        res = jax.lax.fori_loop(1, n_windows, fold_body, res)
        res = tuple(x[0] for x in res)
    if blind is None:
        return res
    # integer mirror of the triangle: window w's value carries
    # Σ_j Σ_{d>=j} cnt_d extra copies of R (suffix sums mirror `suf`,
    # their sum mirrors the window total); the Horner fold then weights
    # window w by 2^{cw} — applied host-side in unblind_msm
    cw_ = cnt.reshape(n_windows, n_buckets)[:, 1:]
    csuf = jnp.cumsum(cw_[:, ::-1], axis=1)[:, ::-1]
    wts = jnp.sum(csuf, axis=1).astype(jnp.uint32)       # (W,)
    return res + (wts,)


@partial(jax.jit, static_argnums=0)
def msm_compact(curve: str, points, scalars):
    """MSM as batched MSB-first double-and-add + rolled batch fold.

    Traced graph holds THREE point-op instances total (double, mixed-add,
    add) vs Pippenger's ~8 across six loop bodies — the variant for backends
    where compile time, not FLOPs, is the budget (XLA:CPU test meshes and the
    multi-chip dryrun). Bit-identical results to msm()."""
    F = jc.FqOps if curve == "g1" else jc.Fq2Ops
    X, Y, inf = points
    n = X.shape[0]
    acc = jc.points_zero(F, X)

    def bit_body(i, acc):
        acc = jc.point_double(F, acc)
        b = SCALAR_BITS - 1 - i
        limb = jax.lax.dynamic_index_in_dim(scalars, b // 16, axis=1,
                                            keepdims=False)
        bit = (limb >> (b % 16).astype(jnp.uint32)) & jnp.uint32(1)
        return jc.point_mixed_add(F, acc, X, Y, (bit == 0) | inf)

    acc = jax.lax.fori_loop(0, SCALAR_BITS, bit_body, acc)

    # inclusive Hillis-Steele fold over the batch: one point_add instance,
    # log2(n) iterations; element n-1 ends up holding the total
    pos = jnp.arange(n)
    steps = max(1, (n - 1).bit_length())

    def sum_body(i, pts):
        shift = jnp.left_shift(jnp.int32(1), i)
        prev = tuple(jnp.roll(p, shift, axis=0) for p in pts)
        s = jc.point_add(F, prev, pts)
        take = pos >= shift
        return tuple(F.select(take, sv, pv) for sv, pv in zip(s, pts))

    acc = jax.lax.fori_loop(0, steps, sum_body, acc)
    return tuple(p[-1] for p in acc)


def msm_auto(curve: str, points, scalars, c: int = 13, lanes: int = 1024,
             blind=None):
    """Kernel dispatch: Pippenger on TPU (throughput-optimal), compact
    double-and-add elsewhere (compile-time-optimal — XLA:CPU spends minutes
    optimizing the Pippenger while-op nest; see use_vm() in curves.jcurve).
    BMTPU_MSM={pippenger,compact} overrides.

    With blind=(Rx, Ry) the result is a 4-tuple (X, Y, Z, wts); the compact
    path needs no blinding (its double-and-add handles every exceptional
    case) and reports all-zero weights for a uniform caller contract."""
    mode = _os.environ.get("BMTPU_MSM", "auto")
    if mode == "pippenger" or (mode == "auto"
                               and jax.default_backend() == "tpu"):
        return msm(curve, points, scalars, c=c, lanes=lanes, blind=blind)
    res = msm_compact(curve, points, scalars)
    if blind is None:
        return res
    n_windows = -(-SCALAR_BITS // c)
    return res + (jnp.zeros((n_windows,), jnp.uint32),)


# ---------------------------------------------------------------------------
# Blinding helpers (host side)
# ---------------------------------------------------------------------------

def make_blind(curve: str):
    """Fresh random blind point R = k·G from secret host randomness.
    Returns (R_host_affine, (Rx_mont, Ry_mont) device-ready numpy limbs)."""
    import secrets as _secrets

    from ..curves import host_curve as HC
    from ..fields.constants import R_MOD as _R

    k = _secrets.randbelow(_R - 2) + 1
    if curve == "g1":
        R = HC.g1_mul(HC.g1_generator(), k)
        X, Y, _ = jc.g1_affine_to_device([R])
    else:
        R = HC.g2_mul(HC.g2_generator(), k)
        X, Y, _ = jc.g2_affine_to_device([R])
    return R, (X[0], Y[0])


def unblind_msm(curve: str, host_pt, wts, R_host, c: int):
    """Subtract the tracked blind multiples from a host affine MSM result:
    true = host_pt − (Σ_w 2^{cw}·wts[w])·R. wts may be (W,) or stacked
    (k, W) from gathered per-device partials (summed exactly as ints)."""
    from ..curves import host_curve as HC
    from ..fields.constants import R_MOD as _R

    w = np.asarray(wts, dtype=np.uint64)
    w = w.reshape(-1, w.shape[-1])
    m = 0
    for i in range(w.shape[1]):
        tot = sum(int(x) for x in w[:, i])
        m = (m + (tot << (c * i))) % _R
    if m == 0:
        return host_pt
    if curve == "g1":
        return HC.g1_add(host_pt, HC.g1_neg(HC.g1_mul(R_host, m)))
    return HC.g2_add(host_pt, HC.g2_neg(HC.g2_mul(R_host, m)))


# ---------------------------------------------------------------------------
# Host-side scalar conversion
# ---------------------------------------------------------------------------

def scalars_to_device(values) -> np.ndarray:
    """Python ints (standard form, < r) -> (n, 16) uint32 limbs."""
    return jf.ints_to_limbs(values)
