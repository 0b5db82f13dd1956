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

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..curves import jcurve as jc
from ..curves import pcurve as pcv
from ..fields import jfield as jf

SCALAR_BITS = 254

# Pallas point kernels keep the limb arithmetic VMEM-resident (the XLA
# formulation is HBM-bound). Only used on real TPU backends: the interpret
# fallback is slower than the plain XLA path on CPU. BMTPU_PALLAS=0 forces
# the XLA path everywhere.
import os as _os


def USE_PALLAS():
    return (_os.environ.get("BMTPU_PALLAS", "1") != "0"
            and jax.default_backend() == "tpu")


def _k_mixed_add(curve, F, P, px, py, pinf):
    if USE_PALLAS():
        return pcv.mixed_add(curve, P, px, py, pinf)
    return jc.point_mixed_add(F, P, px, py, pinf)


def _k_mixed_add_noexc(curve, F, P, px, py, pinf):
    if USE_PALLAS():
        return pcv.mixed_add_noexc(curve, P, px, py, pinf)
    return jc.point_mixed_add_noexc(F, P, px, py, pinf)


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


@partial(jax.jit, static_argnums=(0, 3, 4))
def msm(curve: str, points, scalars, c: int = 13, lanes: int = 1024,
        blind=None):
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
    DROP = jnp.uint32(total_buckets)  # out-of-range -> dropped by scatter

    # ---- 1. keys -------------------------------------------------------
    digits = jnp.stack([_digits_for_window(scalars, w, c)
                        for w in range(n_windows)])        # (W, n)
    win_base = (jnp.arange(n_windows, dtype=jnp.uint32) * n_buckets)[:, None]
    keys = (digits + win_base).reshape(-1)                 # (W*n,)
    # zero digits and infinity points contribute nothing: send them to DROP
    dead = (digits.reshape(-1) == 0) | jnp.tile(inf, n_windows)
    keys = jnp.where(dead, DROP, keys)

    total = n_windows * n

    # ---- 2. physically reorder the PACKED point stream ------------------
    # TPU gathers of 64-byte rows run ~3.5M rows/s (catastrophic); gathering
    # ONE packed (X‖Y‖inf) row of 132/260 bytes runs at near-HBM speed. So:
    # argsort the keys, then move the whole stream into bucket order with a
    # single packed gather — the reduction loop below then only ever reads
    # contiguous slices.
    coord_w = 16 if curve == "g1" else 32
    P = jnp.concatenate([X.reshape(n, coord_w), Y.reshape(n, coord_w),
                         inf.astype(jnp.uint32)[:, None]], axis=1)
    CW = P.shape[1]
    order = jnp.argsort(keys)
    skeys = keys[order]
    spid = (order % n).astype(jnp.int32)

    # ---- 3. tiled segmented reduction ---------------------------------
    T = min(lanes, total)
    L = -(-total // T)
    pad = T * L - total
    skeys = jnp.concatenate([skeys, jnp.full((pad,), DROP, jnp.uint32)])
    spid = jnp.concatenate([spid, jnp.zeros((pad,), jnp.int32)])
    # lane t owns the contiguous sorted run [t*L, (t+1)*L); transpose once so
    # the loop's per-step slice [s] is a contiguous (T, CW) block
    skeys = skeys.reshape(T, L).T                          # (L, T)
    stream = jnp.take(P, spid, axis=0).reshape(T, L, CW).transpose(1, 0, 2)

    def _unpack(row, k):
        if curve == "g1":
            px, py = row[:, :16], row[:, 16:32]
        else:
            px = row[:, :32].reshape(T, 2, 16)
            py = row[:, 32:64].reshape(T, 2, 16)
        pinf = (row[:, CW - 1] != 0) | (k == DROP)
        return px, py, pinf

    buckets = _zeros_pts(F, curve, total_buckets)
    cnt = jnp.zeros((total_buckets,), jnp.uint32)
    if blind is None:
        lane_init = _zeros_pts(F, curve, T)
        madd = _k_mixed_add
    else:
        bx, by = blind
        Rx = jnp.broadcast_to(bx, (T,) + bx.shape)
        Ry = jnp.broadcast_to(by, (T,) + by.shape)
        lane_init = (Rx, Ry, F.one_like(Rx))
        madd = _k_mixed_add_noexc
    acc = lane_init
    head_sum = _zeros_pts(F, curve, T)
    init_key = skeys[0]
    head_key = jnp.full((T,), DROP, jnp.uint32)
    seen_change = jnp.zeros((T,), bool)

    def body(s, state):
        buckets, cnt, acc, cur_key, head_key, head_sum, seen_change = state
        k = skeys[s]
        px, py, pinf = _unpack(stream[s], k)

        is_new = k != cur_key
        flush = is_new & seen_change & (cur_key < DROP)
        widx = jnp.where(flush, cur_key, DROP).astype(jnp.int32)
        buckets = tuple(b.at[widx].set(a, mode="drop")
                        for b, a in zip(buckets, acc))
        if blind is not None:
            cnt = cnt.at[widx].set(jnp.ones((T,), jnp.uint32), mode="drop")

        new_head = is_new & ~seen_change
        head_key = jnp.where(new_head, cur_key, head_key)
        head_sum = tuple(F.select(new_head, a, h)
                         for a, h in zip(acc, head_sum))
        seen_change = seen_change | is_new

        acc = tuple(F.select(is_new, z, a) for z, a in zip(lane_init, acc))
        acc = madd(curve, F, acc, px, py, pinf)
        return (buckets, cnt, acc, k, head_key, head_sum, seen_change)

    state = (buckets, cnt, acc, init_key, head_key, head_sum, seen_change)
    (buckets, cnt, acc, cur_key, head_key, head_sum,
     seen_change) = jax.lax.fori_loop(0, L, body, state)

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
    # per-partial blind counts: the head partial carries one R iff the lane
    # completed a first run (seen_change); the tail accumulator always
    # carries one (dropped with its key if the lane never saw a live item)
    bcnt = jnp.stack([seen_change.astype(jnp.uint32),
                      jnp.ones((T,), jnp.uint32)], axis=1).reshape(-1)
    # flag-based segmented inclusive scan, Hillis-Steele over a fori_loop so
    # point_add is instantiated ONCE in the graph (associative_scan would
    # inline the combine ~2·log(n) times and blow up compile time)
    flags = jnp.concatenate([jnp.array([True]), bkeys[1:] != bkeys[:-1]])
    nb = bkeys.shape[0]
    steps = max(1, (nb - 1).bit_length())
    pos = jnp.arange(nb)

    def seg_body(i, state):
        pts, cn, fl = state
        shift = jnp.left_shift(jnp.int32(1), i)
        prev = tuple(jnp.roll(p, shift, axis=0) for p in pts)
        prev_cn = jnp.roll(cn, shift, axis=0)
        prev_fl = jnp.roll(fl, shift, axis=0)
        valid = pos >= shift
        s = _k_add(curve, F, prev, pts)
        take = valid & ~fl  # no segment start in (j-shift, j]
        pts = tuple(F.select(take, sv, pv) for sv, pv in zip(s, pts))
        cn = jnp.where(take, prev_cn + cn, cn)
        fl = fl | (valid & prev_fl)
        return (pts, cn, fl)

    (bpts, bcnt, _) = jax.lax.fori_loop(0, steps, seg_body,
                                        (bpts, bcnt, flags))
    run_end = jnp.concatenate([bkeys[:-1] != bkeys[1:], jnp.array([True])])
    widx = jnp.where(run_end & (bkeys < DROP), bkeys, DROP).astype(jnp.int32)
    buckets = tuple(b.at[widx].set(v, mode="drop")
                    for b, v in zip(buckets, bpts))
    if blind is not None:
        cnt = cnt.at[widx].set(bcnt, mode="drop")

    # ---- 4. triangle + window fold ------------------------------------
    bw = tuple(b.reshape((n_windows, n_buckets) + b.shape[1:])[:, 1:]
               for b in buckets)  # drop bucket 0 (weight 0)
    B1 = n_buckets - 1
    bpos = jnp.arange(B1)

    # suffix sums R_j = Σ_{d>=j} S_d (reverse Hillis-Steele, 1 add instance)
    def suf_body(i, pts):
        shift = jnp.left_shift(jnp.int32(1), i)
        nxt = tuple(jnp.roll(p, -shift, axis=1) for p in pts)
        s = _k_add(curve, F, pts, nxt)
        take = bpos < (B1 - shift)
        return tuple(F.select(take[None, :], sv, pv)
                     for sv, pv in zip(s, pts))

    suf = jax.lax.fori_loop(0, max(1, (B1 - 1).bit_length()), suf_body, bw)

    # window sum Σ_j R_j (forward inclusive Hillis-Steele, 1 add instance)
    def sum_body(i, pts):
        shift = jnp.left_shift(jnp.int32(1), i)
        prev = tuple(jnp.roll(p, shift, axis=1) for p in pts)
        s = _k_add(curve, F, prev, pts)
        take = bpos >= shift
        return tuple(F.select(take[None, :], sv, pv)
                     for sv, pv in zip(s, pts))

    # window total Σ_j R_j: only the reduction value is needed
    if USE_PALLAS():
        # pairwise halving tree: work B1 instead of B1·log B1 (13 kernel
        # shapes, cheap under Mosaic)
        pad1 = _zeros_pts(F, curve, n_windows)
        red = tuple(jnp.concatenate([p, z[:, None]], axis=1)
                    for p, z in zip(suf, pad1))  # (W, B1+1) with inf pad
        size = B1 + 1
        while size > 1:
            half = size // 2
            red = _k_add(curve, F,
                         tuple(p[:, :half] for p in red),
                         tuple(p[:, half:] for p in red))
            size = half
        win = tuple(p[:, 0] for p in red)  # (W, ...) one point per window
    else:
        # forward inclusive Hillis-Steele: a single point_add instance keeps
        # the XLA CPU graph small (compile time dominates there)
        def sum_body(i, pts):
            shift = jnp.left_shift(jnp.int32(1), i)
            prev = tuple(jnp.roll(p, shift, axis=1) for p in pts)
            s = _k_add(curve, F, prev, pts)
            take = bpos >= shift
            return tuple(F.select(take[None, :], sv, pv)
                         for sv, pv in zip(s, pts))

        tot = jax.lax.fori_loop(0, max(1, (B1 - 1).bit_length()), sum_body,
                                suf)
        win = tuple(p[:, -1] for p in tot)

    # Horner fold over windows, highest first (rolled loops: the unrolled
    # version costs ~250 point ops of traced graph and minutes of compile)
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
