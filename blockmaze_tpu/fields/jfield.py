"""Batched modular (Montgomery) arithmetic for JAX/TPU.

Field elements are structure-of-arrays uint32 tensors of shape (..., 16):
16 little-endian limbs of 16 bits each (values < 2**16 held in uint32 lanes).
Montgomery radix is R = 2**256, matching the reference's 4x64-bit layout
(libff/algebra/fields/fp.tcc mul_reduce), so Montgomery residues are
bit-identical to libsnark's in-memory representation.

Why 16-bit limbs: the TPU VPU has no 64-bit widening multiply; 16x16-bit
products (< 2**32) plus a limb and a carry still fit exactly in a uint32 lane,
which makes the CIOS inner loop carry-exact with native int32/uint32 ops
(see SURVEY.md §7 "Hard parts").

All functions are shape-polymorphic over leading batch dims and jit-safe.
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import constants as C

U32 = jnp.uint32
MASK = np.uint32(C.LIMB_MASK)
N = C.N_LIMBS
W = C.LIMB_BITS


# ---------------------------------------------------------------------------
# Host <-> limb conversion (numpy, not traced)
# ---------------------------------------------------------------------------

def ints_to_limbs(xs) -> np.ndarray:
    """List/array of Python ints -> (len, 16) uint32 limb array.

    Via to_bytes + frombuffer: ~20x faster than a per-limb Python loop
    (witness conversion is on the prover's critical path)."""
    xs = list(xs)
    buf = b"".join(int(x).to_bytes(32, "little") for x in xs)
    u16 = np.frombuffer(buf, dtype="<u2").reshape(len(xs), N)
    return u16.astype(np.uint32)


def limbs_to_ints(a) -> list:
    a = np.asarray(a, dtype=np.uint64)
    flat = a.reshape(-1, N)
    out = []
    for row in flat:
        x = 0
        for j in reversed(range(N)):
            x = (x << W) | int(row[j])
        out.append(x)
    return out


# ---------------------------------------------------------------------------
# Field spec
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class FieldSpec:
    """Static per-field constants (hashable; usable as a jit static arg)."""
    name: str
    modulus: int          # p as a Python int
    inv: int              # -p^-1 mod 2^16
    r_mod: int            # R mod p  (Montgomery one)
    r2_mod: int           # R^2 mod p

    @property
    def p_limbs(self) -> np.ndarray:
        return np.array(C.to_limbs(self.modulus), dtype=np.uint32)

    @property
    def one_mont(self) -> np.ndarray:
        return np.array(C.to_limbs(self.r_mod), dtype=np.uint32)

    @property
    def r2_limbs(self) -> np.ndarray:
        return np.array(C.to_limbs(self.r2_mod), dtype=np.uint32)

    @property
    def zero(self) -> np.ndarray:
        return np.zeros(N, dtype=np.uint32)


FR = FieldSpec("Fr", C.R_MOD, C.FR_INV, C.FR_R, C.FR_R2)
FQ = FieldSpec("Fq", C.Q_MOD, C.FQ_INV, C.FQ_R, C.FQ_R2)


def to_mont_host(spec: FieldSpec, xs) -> np.ndarray:
    """Python ints -> Montgomery-form limb array (host-side)."""
    return ints_to_limbs([(x % spec.modulus) * C.R_MONT % spec.modulus for x in xs])


def from_mont_host(spec: FieldSpec, a) -> list:
    """Montgomery-form limb array -> Python ints (host-side)."""
    rinv = pow(C.R_MONT, -1, spec.modulus)
    return [x * rinv % spec.modulus for x in limbs_to_ints(a)]


# ---------------------------------------------------------------------------
# Core kernels (jnp; unrolled CIOS)
# ---------------------------------------------------------------------------

def _split(x):
    return x & MASK, x >> W


def const_row(vals):
    """A (16,) uint32 constant limb row built from scalar literals.

    jnp.asarray(np_array) captured inside a Pallas kernel trips the
    "captures constants" check; a stack of scalar literals is computation,
    which Pallas accepts and XLA constant-folds to the same thing."""
    return jnp.stack([jnp.uint32(int(v)) for v in vals])


@partial(jax.jit, static_argnums=0)
def mont_mul(spec: FieldSpec, a, b):
    """Batched Montgomery product a*b*R^-1 mod p.

    Requires at least one operand canonical (< p); the other may be any
    16-limb value < 2^256 (the bound t < p + a*b/R < 2p then holds, so one
    conditional subtraction canonicalises).

    Two algebraically identical formulations:
      * TPU: flat elementwise graph (no lax loops) that XLA/Mosaic fuses into
        surrounding ops at full VPU width;
      * other backends: rolled lax.fori_loop body — a ~16x smaller HLO graph.
        The unrolled form makes XLA:CPU's optimization passes blow up
        superlinearly (a single G2 point add took ~46 s to compile).

      1. full 16x16 limb outer product, each 16x16-bit product split lo/hi;
      2. diagonal (convolution) sums via shifted adds -> 32 redundant limbs,
         each < 2^21 (safe in uint32);
      3. 16 Montgomery reduction steps on redundant limbs: m_i only needs
         t_i mod 2^16, so carries stay lazy (every limb < 2^22);
      4. one carry propagation + one conditional subtraction.
    """
    if jax.default_backend() != "tpu":
        # the flat form measured ~10x SLOWER to execute on XLA:CPU (the
        # (...,16,16) outer product + 32 pad/add chains), on top of the
        # compile blowup — r5 negative result; keep the rolled CIOS
        return _mont_mul_compact(spec, a, b)
    inv = np.uint32(spec.inv)
    qv = const_row(spec.p_limbs)  # (16,)
    batch = a.shape[:-1]

    def shifted(row, k, width):
        """Pad a (..., 16) row to (..., width) with k leading zeros."""
        pad = [(0, 0)] * row.ndim
        pad[-1] = (k, width - N - k)
        return jnp.pad(row, pad)

    # --- 1+2: limb convolution, lazily carried (33 redundant limbs) ----
    P = a[..., :, None] * b[..., None, :]          # (..., 16, 16) exact u32
    t = jnp.zeros(batch + (2 * N + 1,), jnp.uint32)
    for i in range(N):
        row = P[..., i, :]
        t = t + shifted(row & MASK, i, 2 * N + 1)
        t = t + shifted(row >> W, i + 1, 2 * N + 1)

    # --- 3: Montgomery reduction (16 vectorized steps) -----------------
    def col_shifted(col, k):
        """Pad a (...,) column to (..., 2N+1) at offset k (scatter-free:
        Mosaic has no scatter-add lowering, pads fuse fine)."""
        pad = [(0, 0)] * col.ndim + [(k, 2 * N - k)]
        return jnp.pad(col[..., None], pad)

    for i in range(N):
        m = (t[..., i] * inv) & MASK
        mq = m[..., None] * qv                      # (..., 16)
        t = t + shifted(mq & MASK, i, 2 * N + 1)
        t = t + shifted(mq >> W, i + 1, 2 * N + 1)
        # t_i is now ≡ 0 mod 2^16: roll its upper bits into t_{i+1}
        t = t + col_shifted(t[..., i] >> W, i + 1)

    # --- 4: carry propagation over the high half -----------------------
    res = []
    c = jnp.zeros(batch, jnp.uint32)
    for j in range(N, 2 * N):
        s = t[..., j] + c
        res.append(s & MASK)
        c = s >> W
    # t < 2p < 2^255 so limb 32 plus the final carry is always zero
    res = jnp.stack(res, axis=-1)
    return _cond_sub_p(spec, res, c)


def _mont_mul_compact(spec: FieldSpec, a, b):
    """mont_mul with the CIOS loop rolled (small graph; see mont_mul
    docstring). Bit-identical results.

    Classic shifting CIOS: convolution and Montgomery reduction are
    interleaved, and instead of placing row i at a loop-counter offset
    (a DYNAMIC jnp.roll — lowered as a gather, the dominant cost of the
    r4 form on XLA:CPU), the accumulator t is shifted right by one limb
    with a STATIC slice each iteration:

        t += a_i*b + m_i*q   (offsets 0/1, static)
        t  = t >> 16 limbwise (static slice), carry folded lazily

    After 16 iterations t IS the high half. One fori_loop, ~12 static
    ops per iteration, no dynamic roll."""
    inv = np.uint32(spec.inv)
    qv = const_row(spec.p_limbs)
    batch = a.shape[:-1]
    WIDTH = N + 2  # N live limbs + carry headroom (lazy limbs < 2^22)

    def at0(row):
        pad = [(0, 0)] * row.ndim
        pad[-1] = (0, WIDTH - row.shape[-1])
        return jnp.pad(row, pad)

    def at1(row):
        pad = [(0, 0)] * row.ndim
        pad[-1] = (1, WIDTH - 1 - row.shape[-1])
        return jnp.pad(row, pad)

    def cios_body(i, t):
        ai = jnp.take(a, i, axis=-1)
        row = ai[..., None] * b                       # (..., 16) exact u32
        t = t + at0(row & MASK) + at1(row >> W)
        m = ((jnp.take(t, 0, axis=-1)) * inv) & MASK
        mq = m[..., None] * qv
        t = t + at0(mq & MASK) + at1(mq >> W)
        # t_0 ≡ 0 mod 2^16: shift one limb right, roll its carry into the
        # (new) lowest limb — all offsets static
        carry = jnp.take(t, 0, axis=-1) >> W
        t = jnp.concatenate(
            [t[..., 1:], jnp.zeros(batch + (1,), jnp.uint32)], axis=-1)
        t = t.at[..., 0].add(carry)
        return t

    t = jax.lax.fori_loop(
        0, N, cios_body, jnp.zeros(batch + (WIDTH,), jnp.uint32))

    res = []
    c = jnp.zeros(batch, jnp.uint32)
    for j in range(N):
        s = t[..., j] + c
        res.append(s & MASK)
        c = s >> W
    c = c + t[..., N]  # carry headroom limb
    return _cond_sub_p(spec, jnp.stack(res, axis=-1), c)


def _cond_sub_p(spec: FieldSpec, x, extra):
    """Subtract p if (extra, x) >= p, where extra is a (batch,) high limb."""
    q = spec.p_limbs
    borrow = jnp.zeros_like(x[..., 0])
    diff = []
    for j in range(N):
        s = x[..., j] - np.uint32(q[j]) - borrow
        diff.append(s & MASK)
        borrow = (s >> W) & np.uint32(1)  # 1 iff borrowed (wraparound)
    diff = jnp.stack(diff, axis=-1)
    need_sub = ((extra > 0) | (borrow == 0)).astype(jnp.uint32)
    return jnp.where(need_sub[..., None] != 0, diff, x)


@partial(jax.jit, static_argnums=0)
def add(spec: FieldSpec, a, b):
    """Batched modular addition (operands canonical, result canonical)."""
    c = jnp.zeros_like(a[..., 0])
    s = []
    for j in range(N):
        t = a[..., j] + b[..., j] + c
        s.append(t & MASK)
        c = t >> W
    s = jnp.stack(s, axis=-1)
    return _cond_sub_p(spec, s, c)


@partial(jax.jit, static_argnums=0)
def sub(spec: FieldSpec, a, b):
    """Batched modular subtraction."""
    borrow = jnp.zeros_like(a[..., 0])
    d = []
    for j in range(N):
        t = a[..., j] - b[..., j] - borrow
        d.append(t & MASK)
        borrow = (t >> W) & np.uint32(1)
    d = jnp.stack(d, axis=-1)
    # if borrowed, add p back
    q = spec.p_limbs
    c = jnp.zeros_like(borrow)
    dp = []
    for j in range(N):
        t = d[..., j] + np.uint32(q[j]) + c
        dp.append(t & MASK)
        c = t >> W
    dp = jnp.stack(dp, axis=-1)
    return jnp.where((borrow == 1).astype(jnp.uint32)[..., None] != 0, dp, d)


@partial(jax.jit, static_argnums=0)
def neg(spec: FieldSpec, a):
    zero = jnp.zeros_like(a)
    r = sub(spec, zero, a)
    return jnp.where(is_zero(a).astype(jnp.uint32)[..., None] != 0, zero, r)


def is_zero(a):
    return jnp.all(a == 0, axis=-1)


def eq(a, b):
    return jnp.all(a == b, axis=-1)


def mont_sqr(spec: FieldSpec, a):
    return mont_mul(spec, a, a)


def to_mont(spec: FieldSpec, a):
    r2 = jnp.asarray(spec.r2_limbs)
    return mont_mul(spec, a, jnp.broadcast_to(r2, a.shape))


def from_mont(spec: FieldSpec, a):
    one = jnp.zeros_like(a).at[..., 0].set(1)
    return mont_mul(spec, a, one)


@partial(jax.jit, static_argnums=(0, 2))
def pow_fixed(spec: FieldSpec, a, e: int):
    """a^e for a host-known exponent (left-to-right square-and-multiply,
    rolled into a lax.scan over the exponent bits for fast compilation)."""
    one = jnp.broadcast_to(jnp.asarray(spec.one_mont), a.shape)
    if e == 0:
        return one
    bits = np.array([int(bit) for bit in bin(e)[2:]], dtype=np.uint32)

    def body(r, bit):
        r = mont_sqr(spec, r)
        r = jnp.where(bit > 0, mont_mul(spec, r, a), r)
        return r, None

    r, _ = jax.lax.scan(body, one, jnp.asarray(bits))
    return r


@partial(jax.jit, static_argnums=0)
def inv(spec: FieldSpec, a):
    """Batched inversion via Fermat: a^(p-2). (0 maps to 0.)"""
    return pow_fixed(spec, a, spec.modulus - 2)


def batch_inv(spec: FieldSpec, a):
    """Montgomery batch inversion over the last batch axis.

    Computes elementwise inverses with a single Fermat inversion via prefix
    products (mirrors the role of libff's batch_to_special batch inversion,
    multiexp.tcc). Zero entries are passed through as zero.
    """
    n = a.shape[0]
    one = jnp.broadcast_to(jnp.asarray(spec.one_mont), a.shape[1:] + (N,))[..., :]

    az = jnp.where(is_zero(a)[..., None], jnp.asarray(spec.one_mont), a)

    def scan_fwd(carry, x):
        nxt = mont_mul(spec, carry, x)
        return nxt, carry

    total, prefix = jax.lax.scan(scan_fwd, jnp.asarray(spec.one_mont) * jnp.ones_like(a[0]), az)
    tinv = inv(spec, total)

    def scan_bwd(carry, xs):
        x, pre = xs
        out = mont_mul(spec, carry, pre)
        nxt = mont_mul(spec, carry, x)
        return nxt, out

    _, invs = jax.lax.scan(scan_bwd, tinv, (az, prefix), reverse=True)
    return jnp.where(is_zero(a)[..., None], jnp.zeros_like(a), invs)


def select(mask, a, b):
    """Elementwise field select: mask ? a : b. mask shape = batch shape.
    (Mask widened before the minor-dim insert: Mosaic has no i1 reshape.)"""
    m = mask.astype(jnp.uint32)[..., None] != 0
    return jnp.where(m, a, b)


@partial(jax.jit, static_argnums=0)
def batch_inv_parallel(spec: FieldSpec, a):
    """Elementwise inversion of a (n, 16) batch with O(log n) depth:
    Hillis-Steele prefix/suffix products + ONE Fermat inversion.

    inv_i = prefix_{i-1} * suffix_{i+1} * total^-1. Zero entries map to zero.
    ~3*n*log2(n) muls total vs n*380 for per-element Fermat — the win grows
    with batch size (keygen normalises millions of points)."""
    n = a.shape[0]
    one = jnp.asarray(spec.one_mont)
    az = jnp.where(is_zero(a)[..., None], one, a)

    def scan_mul(x, reverse):
        steps = max(1, (n - 1).bit_length())
        pos = jnp.arange(n)

        def body(i, v):
            shift = jnp.left_shift(jnp.int32(1), i)
            rolled = jnp.roll(v, -shift if reverse else shift, axis=0)
            prod = mont_mul(spec, v, rolled)
            valid = (pos < n - shift) if reverse else (pos >= shift)
            return jnp.where(valid[..., None], prod, v)

        return jax.lax.fori_loop(0, steps, body, x)

    prefix = scan_mul(az, reverse=False)   # prefix[i] = a_0 * ... * a_i
    suffix = scan_mul(az, reverse=True)    # suffix[i] = a_i * ... * a_{n-1}
    total_inv = inv(spec, prefix[-1])

    pre = jnp.concatenate([one[None], prefix[:-1]])
    suf = jnp.concatenate([suffix[1:], one[None]])
    out = mont_mul(spec, mont_mul(spec, pre, suf),
                   jnp.broadcast_to(total_inv, a.shape))
    return jnp.where(is_zero(a)[..., None], jnp.zeros_like(a), out)


@partial(jax.jit, static_argnums=0)
def canon_wide(spec: FieldSpec, wide):
    """Reduce a lazily-accumulated limb tensor to canonical form.

    `wide` holds sums of up to 2^16 canonical 16-bit limbs per lane (uint32,
    values < 2^32): the result of e.g. jax.ops.segment_sum over Montgomery
    residues. Split limbs as lo + 2^16*hi and fold each through one Montgomery
    product with a constant < p (so the CIOS 2p bound holds):
        lo * (R mod p) * R^-1 = lo mod p
        hi * (2^16 R mod p) * R^-1 = hi * 2^16 mod p
    This turns unbounded-fan-in field addition into plain integer segment_sum
    + one constant-time normalisation — the TPU-friendly shape.
    """
    lo = wide & MASK
    hi = wide >> W
    one_r = jnp.asarray(spec.one_mont)
    c16 = jnp.asarray(
        np.array(C.to_limbs((1 << W) * spec.r_mod % spec.modulus),
                 dtype=np.uint32))
    lo_m = mont_mul(spec, lo, jnp.broadcast_to(one_r, lo.shape))
    hi_m = mont_mul(spec, hi, jnp.broadcast_to(c16, hi.shape))
    return add(spec, lo_m, hi_m)
