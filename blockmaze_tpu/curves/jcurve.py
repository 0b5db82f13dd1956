"""Batched elliptic-curve group law for JAX/TPU.

Points are structure-of-arrays Jacobian triples (X, Y, Z) of Montgomery limb
tensors; G1 coordinates have shape (..., 16) over Fq, G2 coordinates
(..., 2, 16) over Fq2. Infinity is encoded as Z == 0 (the reference's zero is
(0, 1, 0): alt_bn128_init.cpp:201).

Formulas are the standard a=0 Jacobian add-2007-bl / mixed-add / dbl-2009-l
used by the reference (alt_bn128_g1.cpp:208-350), implemented branchlessly:
edge cases (either operand at infinity, P == Q, P == -Q) are resolved with
vector selects so the same traced graph serves every lane.
"""

from __future__ import annotations

import os
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import jfield as jf
from ..fields.constants import Q_MOD

FQ = jf.FQ


def use_vm() -> bool:
    """Whether point formulas run through the rolled formula-VM scan.

    XLA:CPU's optimization passes are superlinear in the count of while ops:
    a straight-line Jacobian add (~30 field ops, each mont_mul = 2 fori_loops)
    costs 13 s (G1) / 53 s (G2) to compile, and the full Pippenger graph blew
    past the 9.5-minute driver budget. Recording each formula once as an SSA
    program and executing it with ONE lax.scan instance cuts that ~15x at
    identical results. TPU keeps the straight-line form (Mosaic/Pallas fuses
    it; the VM's dynamic register indexing would defeat that)."""
    return (os.environ.get("BMTPU_VM", "1") != "0"
            and jax.default_backend() != "tpu")


# ---------------------------------------------------------------------------
# Field adapters: Fq (limbs at axis -1) and Fq2 (limb pairs at axes (-2,-1))
# ---------------------------------------------------------------------------

class FqOps:
    """Base-field ops on (..., 16) uint32 tensors."""

    ndim_tail = 1

    @staticmethod
    def mul(a, b):
        return jf.mont_mul(FQ, a, b)

    @staticmethod
    def sqr(a):
        return jf.mont_mul(FQ, a, a)

    @staticmethod
    def add(a, b):
        return jf.add(FQ, a, b)

    @staticmethod
    def sub(a, b):
        return jf.sub(FQ, a, b)

    @staticmethod
    def neg(a):
        return jf.neg(FQ, a)

    @staticmethod
    def is_zero(a):
        return jf.is_zero(a)

    @staticmethod
    def eq(a, b):
        return jf.eq(a, b)

    @staticmethod
    def select(mask, a, b):
        # Mosaic can't insert a minor dim on i1 vectors; widen first
        m = mask.astype(jnp.uint32)[..., None] != 0
        return jnp.where(m, a, b)

    @staticmethod
    def zeros_like(a):
        return jnp.zeros_like(a)

    @staticmethod
    def one_like(a):
        one = jf.const_row(FQ.one_mont)
        return jnp.broadcast_to(one, a.shape)


class Fq2Ops:
    """Quadratic-extension ops on (..., 2, 16) uint32 tensors; u^2 = -1."""

    ndim_tail = 2

    @staticmethod
    def mul(a, b):
        a0, a1 = a[..., 0, :], a[..., 1, :]
        b0, b1 = b[..., 0, :], b[..., 1, :]
        t0 = jf.mont_mul(FQ, a0, b0)
        t1 = jf.mont_mul(FQ, a1, b1)
        c0 = jf.sub(FQ, t0, t1)  # non_residue = -1
        s = jf.mont_mul(FQ, jf.add(FQ, a0, a1), jf.add(FQ, b0, b1))
        c1 = jf.sub(FQ, jf.sub(FQ, s, t0), t1)
        return jnp.stack([c0, c1], axis=-2)

    @staticmethod
    def sqr(a):
        a0, a1 = a[..., 0, :], a[..., 1, :]
        t = jf.mont_mul(FQ, jf.add(FQ, a0, a1), jf.sub(FQ, a0, a1))
        c1 = jf.mont_mul(FQ, a0, a1)
        c1 = jf.add(FQ, c1, c1)
        return jnp.stack([t, c1], axis=-2)

    @staticmethod
    def add(a, b):
        return jnp.stack([jf.add(FQ, a[..., 0, :], b[..., 0, :]),
                          jf.add(FQ, a[..., 1, :], b[..., 1, :])], axis=-2)

    @staticmethod
    def sub(a, b):
        return jnp.stack([jf.sub(FQ, a[..., 0, :], b[..., 0, :]),
                          jf.sub(FQ, a[..., 1, :], b[..., 1, :])], axis=-2)

    @staticmethod
    def neg(a):
        return jnp.stack([jf.neg(FQ, a[..., 0, :]),
                          jf.neg(FQ, a[..., 1, :])], axis=-2)

    @staticmethod
    def is_zero(a):
        return jnp.all(a == 0, axis=(-2, -1))

    @staticmethod
    def eq(a, b):
        return jnp.all(a == b, axis=(-2, -1))

    @staticmethod
    def select(mask, a, b):
        m = mask.astype(jnp.uint32)[..., None, None] != 0
        return jnp.where(m, a, b)

    @staticmethod
    def zeros_like(a):
        return jnp.zeros_like(a)

    @staticmethod
    def one_like(a):
        one = jnp.stack([jf.const_row(FQ.one_mont),
                         jnp.zeros(jf.N, dtype=jnp.uint32)])
        return jnp.broadcast_to(one, a.shape)


# ---------------------------------------------------------------------------
# Formula VM: record a straight-line field-op program once, run as ONE scan
# ---------------------------------------------------------------------------

class _RecF:
    """F-like recorder: values are register indices, ops append SSA steps."""

    def __init__(self, n_inputs: int):
        self.steps = []          # (opcode, src_a, src_b); dst = implicit SSA
        self.next = n_inputs

    def _emit(self, op, a, b):
        self.steps.append((op, a, b))
        r = self.next
        self.next += 1
        return r

    def mul(self, a, b):
        return self._emit(0, a, b)

    def sqr(self, a):
        return self._emit(0, a, a)

    def add(self, a, b):
        return self._emit(1, a, b)

    def sub(self, a, b):
        return self._emit(2, a, b)


@lru_cache(maxsize=None)
def _program(kind: str):
    """Record the SSA program for a point formula. Returns
    (steps, n_inputs, outputs) with outputs a dict of register ids."""
    if kind == "dbl":
        rec = _RecF(3)
        X3, Y3, Z3 = _dbl(rec, 0, 1, 2)
        return tuple(rec.steps), 3, {"X3": X3, "Y3": Y3, "Z3": Z3}
    if kind == "add":
        rec = _RecF(6)
        X3, Y3, Z3, H, r = _add_core(rec, 0, 1, 2, 3, 4, 5)
        DX, DY, DZ = _dbl(rec, 0, 1, 2)
        return tuple(rec.steps), 6, {"X3": X3, "Y3": Y3, "Z3": Z3, "H": H,
                                     "r": r, "DX": DX, "DY": DY, "DZ": DZ}
    if kind == "madd":
        rec = _RecF(5)
        X3, Y3, Z3, H, r = _madd_core(rec, 0, 1, 2, 3, 4)
        DX, DY, DZ = _dbl(rec, 0, 1, 2)
        return tuple(rec.steps), 5, {"X3": X3, "Y3": Y3, "Z3": Z3, "H": H,
                                     "r": r, "DX": DX, "DY": DY, "DZ": DZ}
    assert kind == "madd_noexc"
    rec = _RecF(5)
    X3, Y3, Z3, H, r = _madd_core(rec, 0, 1, 2, 3, 4)
    return tuple(rec.steps), 5, {"X3": X3, "Y3": Y3, "Z3": Z3}


def _run_program(F, kind: str, inputs):
    """Execute a recorded program with a single lax.scan whose body holds one
    instance of each field op (mul/add/sub selected by lax.switch)."""
    steps, n_in, outs = _program(kind)
    inputs = jnp.broadcast_arrays(*inputs)
    R = n_in + len(steps)
    regs = jnp.concatenate(
        [jnp.stack(inputs),
         jnp.zeros((len(steps),) + inputs[0].shape, inputs[0].dtype)])
    ops = jnp.asarray([s[0] for s in steps], jnp.int32)
    sa = jnp.asarray([s[1] for s in steps], jnp.int32)
    sb = jnp.asarray([s[2] for s in steps], jnp.int32)
    dst = jnp.arange(n_in, R, dtype=jnp.int32)

    def body(regs, x):
        # one lax.cond skips the (dominant) Montgomery mul on add/sub steps
        # — the r4 flat-where form paid a full mul on EVERY step; a 3-way
        # lax.switch measured ~10x more XLA:CPU compile time, but the
        # 2-way cond stays cheap and cuts execution ~40% (programs are
        # ~half add/sub steps)
        op, a, b, d = x
        va = jnp.take(regs, a, axis=0)
        vb = jnp.take(regs, b, axis=0)
        res = jax.lax.cond(
            op == 0,
            lambda va, vb: F.mul(va, vb),
            lambda va, vb: jnp.where(op == 1, F.add(va, vb),
                                     F.sub(va, vb)),
            va, vb)
        return jax.lax.dynamic_update_index_in_dim(regs, res, d, 0), None

    regs, _ = jax.lax.scan(body, regs, (ops, sa, sb, dst))
    return {k: regs[v] if v >= n_in else inputs[v] for k, v in outs.items()}


# ---------------------------------------------------------------------------
# Generic Jacobian group law
# ---------------------------------------------------------------------------

def _dbl(F, X, Y, Z):
    """dbl-2009-l (a = 0)."""
    A = F.sqr(X)
    B = F.sqr(Y)
    C = F.sqr(B)
    D = F.sub(F.sub(F.sqr(F.add(X, B)), A), C)
    D = F.add(D, D)
    E = F.add(F.add(A, A), A)
    Fv = F.sqr(E)
    X3 = F.sub(Fv, F.add(D, D))
    C8 = F.add(C, C)
    C8 = F.add(C8, C8)
    C8 = F.add(C8, C8)
    Y3 = F.sub(F.mul(E, F.sub(D, X3)), C8)
    YZ = F.mul(Y, Z)
    Z3 = F.add(YZ, YZ)
    return X3, Y3, Z3


def _add_core(F, X1, Y1, Z1, X2, Y2, Z2):
    """Straight-line part of add-2007-bl; also used by the formula recorder."""
    Z1Z1 = F.sqr(Z1)
    Z2Z2 = F.sqr(Z2)
    U1 = F.mul(X1, Z2Z2)
    U2 = F.mul(X2, Z1Z1)
    S1 = F.mul(Y1, F.mul(Z2, Z2Z2))
    S2 = F.mul(Y2, F.mul(Z1, Z1Z1))
    H = F.sub(U2, U1)
    r = F.sub(S2, S1)
    r = F.add(r, r)
    I = F.sqr(F.add(H, H))
    J = F.mul(H, I)
    V = F.mul(U1, I)
    X3 = F.sub(F.sub(F.sqr(r), J), F.add(V, V))
    SJ = F.mul(S1, J)
    Y3 = F.sub(F.mul(r, F.sub(V, X3)), F.add(SJ, SJ))
    Z3 = F.mul(F.sub(F.sub(F.sqr(F.add(Z1, Z2)), Z1Z1), Z2Z2), H)
    return X3, Y3, Z3, H, r


def _madd_core(F, X1, Y1, Z1, Qx, Qy):
    """Straight-line part of madd-2007-bl (Z2 = 1)."""
    Z1Z1 = F.sqr(Z1)
    U2 = F.mul(Qx, Z1Z1)
    S2 = F.mul(Qy, F.mul(Z1, Z1Z1))
    H = F.sub(U2, X1)
    HH = F.sqr(H)
    I = F.add(HH, HH)
    I = F.add(I, I)
    J = F.mul(H, I)
    r = F.sub(S2, Y1)
    r = F.add(r, r)
    V = F.mul(X1, I)
    X3 = F.sub(F.sub(F.sqr(r), J), F.add(V, V))
    YJ = F.mul(Y1, J)
    Y3 = F.sub(F.mul(r, F.sub(V, X3)), F.add(YJ, YJ))
    Z3 = F.sub(F.sub(F.sqr(F.add(Z1, H)), Z1Z1), HH)
    return X3, Y3, Z3, H, r


def point_double(F, P):
    X, Y, Z = P
    if use_vm():
        o = _run_program(F, "dbl", (X, Y, Z))
        return (o["X3"], o["Y3"], o["Z3"])
    X3, Y3, Z3 = _dbl(F, X, Y, Z)
    # doubling of infinity stays infinity automatically (Z3 = 2*Y*0 = 0)
    return (X3, Y3, Z3)


def point_add(F, P, Q):
    """Full Jacobian + Jacobian addition (add-2007-bl) with branchless
    handling of inf/equal/negated operands."""
    X1, Y1, Z1 = P
    X2, Y2, Z2 = Q
    if use_vm():
        o = _run_program(F, "add", (X1, Y1, Z1, X2, Y2, Z2))
        X3, Y3, Z3, H, r = o["X3"], o["Y3"], o["Z3"], o["H"], o["r"]
        DX, DY, DZ = o["DX"], o["DY"], o["DZ"]
    else:
        X3, Y3, Z3, H, r = _add_core(F, X1, Y1, Z1, X2, Y2, Z2)
        DX, DY, DZ = _dbl(F, X1, Y1, Z1)

    p_inf = F.is_zero(Z1)
    q_inf = F.is_zero(Z2)
    same_x = F.is_zero(H)
    same_y = F.is_zero(r)
    is_dbl = same_x & same_y & ~p_inf & ~q_inf

    X3 = F.select(is_dbl, DX, X3)
    Y3 = F.select(is_dbl, DY, Y3)
    Z3 = F.select(is_dbl, DZ, Z3)
    # P == -Q -> infinity: same_x & !same_y makes Z3 = ...*H = 0 already ✓
    X3 = F.select(p_inf, X2, X3)
    Y3 = F.select(p_inf, Y2, Y3)
    Z3 = F.select(p_inf, Z2, Z3)
    X3 = F.select(q_inf & ~p_inf, X1, X3)
    Y3 = F.select(q_inf & ~p_inf, Y1, Y3)
    Z3 = F.select(q_inf & ~p_inf, Z1, Z3)
    return (X3, Y3, Z3)


def point_mixed_add(F, P, Qx, Qy, q_inf, vm=None):
    """Jacobian + affine (Z2 = 1) addition (madd-2007-bl);
    q_inf is a bool tensor marking affine-infinity lanes.
    vm overrides use_vm() (Pallas kernels must pass vm=False: the VM's
    program arrays would be closure-captured constants)."""
    X1, Y1, Z1 = P
    if use_vm() if vm is None else vm:
        o = _run_program(F, "madd", (X1, Y1, Z1, Qx, Qy))
        X3, Y3, Z3, H, r = o["X3"], o["Y3"], o["Z3"], o["H"], o["r"]
        DX, DY, DZ = o["DX"], o["DY"], o["DZ"]
    else:
        X3, Y3, Z3, H, r = _madd_core(F, X1, Y1, Z1, Qx, Qy)
        DX, DY, DZ = _dbl(F, X1, Y1, Z1)

    p_inf = F.is_zero(Z1)
    same_x = F.is_zero(H)
    same_y = F.is_zero(r)
    is_dbl = same_x & same_y & ~p_inf & ~q_inf

    X3 = F.select(is_dbl, DX, X3)
    Y3 = F.select(is_dbl, DY, Y3)
    Z3 = F.select(is_dbl, DZ, Z3)
    one = F.one_like(Z1)
    X3 = F.select(p_inf, Qx, X3)
    Y3 = F.select(p_inf, Qy, Y3)
    Z3 = F.select(p_inf, one, Z3)
    # affine infinity lanes contribute nothing
    X3 = F.select(q_inf & ~p_inf, X1, X3)
    Y3 = F.select(q_inf & ~p_inf, Y1, Y3)
    Z3 = F.select(q_inf & ~p_inf, Z1, Z3)
    Z3 = F.select(q_inf & p_inf, F.zeros_like(Z1), Z3)
    return (X3, Y3, Z3)


def point_mixed_add_noexc(F, P, Qx, Qy, q_inf, vm=None):
    """Mixed add WITHOUT the doubling/infinity exceptional paths (saves the
    ~40% of field muls _dbl costs in point_mixed_add). Correct only when the
    accumulator P is never the affine point ±Q and never infinity — the
    blinded Pippenger accumulation (msm/pippenger.py) guarantees both except
    with cryptographically negligible probability by seeding every
    accumulator run with a random point R unknown to the input distribution
    (acc = R + partial, so acc == ±Q ⟺ R == ±Q - partial)."""
    X1, Y1, Z1 = P
    if use_vm() if vm is None else vm:
        o = _run_program(F, "madd_noexc", (X1, Y1, Z1, Qx, Qy))
        X3, Y3, Z3 = o["X3"], o["Y3"], o["Z3"]
    else:
        X3, Y3, Z3, _, _ = _madd_core(F, X1, Y1, Z1, Qx, Qy)
    X3 = F.select(q_inf, X1, X3)
    Y3 = F.select(q_inf, Y1, Y3)
    Z3 = F.select(q_inf, Z1, Z3)
    return (X3, Y3, Z3)


def point_neg(F, P):
    X, Y, Z = P
    return (X, F.neg(Y), Z)


def points_zero(F, X):
    """Batch of infinity points shaped like coordinate tensor X."""
    return (F.zeros_like(X), F.one_like(X), F.zeros_like(X))


# ---------------------------------------------------------------------------
# Host conversion helpers
# ---------------------------------------------------------------------------

def g1_affine_to_device(points) -> tuple:
    """List of host affine (x, y, is_zero) -> (X(n,16), Y(n,16), inf(n,)) in
    Montgomery form (numpy)."""
    xs = jf.to_mont_host(jf.FQ, [p[0] for p in points])
    ys = jf.to_mont_host(jf.FQ, [p[1] for p in points])
    inf = np.array([bool(p[2]) for p in points])
    return xs, ys, inf


def g2_affine_to_device(points) -> tuple:
    xs = np.stack([
        jf.to_mont_host(jf.FQ, [p[0][0] for p in points]),
        jf.to_mont_host(jf.FQ, [p[0][1] for p in points]),
    ], axis=1)  # (n, 2, 16)
    ys = np.stack([
        jf.to_mont_host(jf.FQ, [p[1][0] for p in points]),
        jf.to_mont_host(jf.FQ, [p[1][1] for p in points]),
    ], axis=1)
    inf = np.array([bool(p[2]) for p in points])
    return xs, ys, inf


def g1_jacobian_to_host(P) -> list:
    """Device Jacobian G1 batch -> list of host affine (x, y, is_zero)."""
    from ..fields.host import fp_inv

    X = jf.from_mont_host(jf.FQ, np.asarray(P[0]).reshape(-1, jf.N))
    Y = jf.from_mont_host(jf.FQ, np.asarray(P[1]).reshape(-1, jf.N))
    Z = jf.from_mont_host(jf.FQ, np.asarray(P[2]).reshape(-1, jf.N))
    out = []
    for x, y, z in zip(X, Y, Z):
        if z == 0:
            out.append((0, 0, 1))
        else:
            zi = fp_inv(z, Q_MOD)
            zi2 = zi * zi % Q_MOD
            out.append((x * zi2 % Q_MOD, y * zi2 % Q_MOD * zi % Q_MOD, 0))
    return out


def g2_jacobian_to_host(P) -> list:
    from ..fields import host as hf

    def unmont(arr):
        return jf.from_mont_host(jf.FQ, np.asarray(arr).reshape(-1, jf.N))

    X0, X1 = unmont(P[0][..., 0, :]), unmont(P[0][..., 1, :])
    Y0, Y1 = unmont(P[1][..., 0, :]), unmont(P[1][..., 1, :])
    Z0, Z1 = unmont(P[2][..., 0, :]), unmont(P[2][..., 1, :])
    out = []
    for x0, x1, y0, y1, z0, z1 in zip(X0, X1, Y0, Y1, Z0, Z1):
        z = (z0, z1)
        if z == (0, 0):
            out.append((hf.FQ2_ZERO, hf.FQ2_ZERO, 1))
        else:
            zi = hf.fq2_inv(z)
            zi2 = hf.fq2_sqr(zi)
            zi3 = hf.fq2_mul(zi2, zi)
            out.append((hf.fq2_mul((x0, x1), zi2), hf.fq2_mul((y0, y1), zi3), 0))
    return out
