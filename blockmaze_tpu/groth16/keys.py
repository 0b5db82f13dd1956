"""Device-resident proving-key representation with npz caching.

Parsing the reference decimal pk text (85-253 MB) costs minutes (point
decompression sqrt per point); the converted limb-tensor form loads in
seconds, so it is cached alongside the .txt file. Cached arrays are exactly
the tensors the prover kernels consume:

  A/H/L queries : dense affine G1 (x, y (Montgomery limbs), inf mask)
  B query       : sparse indices + affine G2 and G1 values (kc pairs,
                  r1cs_gg_ppzksnark.hpp:79)
  constraint system : per-matrix COO (row, var, coeff) with Montgomery coeffs
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np

from ..fields import jfield as jf
from ..curves import jcurve as jc
from ..ntt import domain as D
from ..serialization import libsnark_io as io

CACHE_VERSION = 1


@dataclasses.dataclass
class DevicePK:
    # scalars / metadata
    primary_input_size: int
    aux_input_size: int
    num_constraints: int
    domain_size: int
    # group constants (host affine ints)
    alpha_g1: tuple
    beta_g1: tuple
    beta_g2: tuple
    delta_g1: tuple
    delta_g2: tuple
    # query tensors (numpy; moved to device lazily)
    A: tuple      # (x (n,16), y (n,16), inf (n,))
    B_idx: np.ndarray
    B2: tuple     # G2 affine (x (nb,2,16), y, inf)
    B1: tuple     # G1 affine
    H: tuple
    L: tuple
    # constraint matrices, COO
    a_row: np.ndarray
    a_var: np.ndarray
    a_coeff: np.ndarray  # (nnz,16) Montgomery
    b_row: np.ndarray
    b_var: np.ndarray
    b_coeff: np.ndarray
    c_row: np.ndarray
    c_var: np.ndarray
    c_coeff: np.ndarray

    @property
    def num_variables(self):
        return self.primary_input_size + self.aux_input_size

    @property
    def domain(self):
        return D.get_evaluation_domain(
            self.num_constraints + self.primary_input_size + 1)


def _cs_to_coo(cs: io.ConstraintSystem):
    """Three COO matrices from the parsed constraint list."""
    out = []
    for sel in range(3):
        rows, vars_, coeffs = [], [], []
        for i, cons in enumerate(cs.constraints):
            for idx, coeff in cons[sel]:
                rows.append(i)
                vars_.append(idx)
                coeffs.append(coeff)
        out.append((
            np.asarray(rows, np.int32),
            np.asarray(vars_, np.int32),
            jf.to_mont_host(jf.FR, coeffs),
        ))
    return out


def build_device_pk(pk: io.ProvingKey) -> DevicePK:
    (a_row, a_var, a_coeff), (b_row, b_var, b_coeff), (c_row, c_var, c_coeff) = \
        _cs_to_coo(pk.cs)
    cs = pk.cs
    return DevicePK(
        primary_input_size=cs.primary_input_size,
        aux_input_size=cs.auxiliary_input_size,
        num_constraints=cs.num_constraints,
        domain_size=D.get_evaluation_domain(
            cs.num_constraints + cs.primary_input_size + 1).m,
        alpha_g1=pk.alpha_g1,
        beta_g1=pk.beta_g1,
        beta_g2=pk.beta_g2,
        delta_g1=pk.delta_g1,
        delta_g2=pk.delta_g2,
        A=jc.g1_affine_to_device(pk.A_query),
        B_idx=np.asarray(pk.B_indices, np.int32),
        B2=jc.g2_affine_to_device(pk.B_g2),
        B1=jc.g1_affine_to_device(pk.B_g1),
        H=jc.g1_affine_to_device(pk.H_query),
        L=jc.g1_affine_to_device(pk.L_query),
        a_row=a_row, a_var=a_var, a_coeff=a_coeff,
        b_row=b_row, b_var=b_var, b_coeff=b_coeff,
        c_row=c_row, c_var=c_var, c_coeff=c_coeff,
    )


_POINT_FIELDS = ["A", "B2", "B1", "H", "L"]
_INT_FIELDS = ["primary_input_size", "aux_input_size", "num_constraints",
               "domain_size"]
_G1_CONSTS = ["alpha_g1", "beta_g1", "delta_g1"]
_G2_CONSTS = ["beta_g2", "delta_g2"]
_COO_FIELDS = ["a_row", "a_var", "a_coeff", "b_row", "b_var", "b_coeff",
               "c_row", "c_var", "c_coeff"]


def save_device_pk(dpk: DevicePK, path: str):
    data = {"version": np.int64(CACHE_VERSION)}
    for f in _INT_FIELDS:
        data[f] = np.int64(getattr(dpk, f))
    for f in _G1_CONSTS:
        x, y, z = getattr(dpk, f)
        data[f] = np.array([str(x), str(y), str(z)])
    for f in _G2_CONSTS:
        (x0, x1), (y0, y1), z = getattr(dpk, f)
        data[f] = np.array([str(x0), str(x1), str(y0), str(y1), str(z)])
    for f in _POINT_FIELDS:
        x, y, inf = getattr(dpk, f)
        data[f + "_x"], data[f + "_y"], data[f + "_inf"] = x, y, inf
    data["B_idx"] = dpk.B_idx
    for f in _COO_FIELDS:
        data[f] = getattr(dpk, f)
    np.savez_compressed(path, **data)


def load_device_pk(path: str) -> DevicePK:
    z = np.load(path)
    assert int(z["version"]) == CACHE_VERSION
    kw = {f: int(z[f]) for f in _INT_FIELDS}
    for f in _G1_CONSTS:
        x, y, i = z[f]
        kw[f] = (int(x), int(y), int(i))
    for f in _G2_CONSTS:
        x0, x1, y0, y1, i = z[f]
        kw[f] = ((int(x0), int(x1)), (int(y0), int(y1)), int(i))
    for f in _POINT_FIELDS:
        kw[f] = (z[f + "_x"], z[f + "_y"], z[f + "_inf"])
    kw["B_idx"] = z["B_idx"]
    for f in _COO_FIELDS:
        kw[f] = z[f]
    return DevicePK(**kw)


def build_device_pk_native(pk_txt_path: str) -> "DevicePK | None":
    """Parse via the C++/GMP native module (native/keyparse.cpp): decimal
    parse + point decompression + Montgomery limb conversion in one pass,
    ~50x faster than the Python path on the 85-253 MB key files."""
    from ..serialization import native_io
    d = native_io.parse_pk_native(pk_txt_path)
    if d is None:
        return None
    return DevicePK(
        primary_input_size=d["primary_input_size"],
        aux_input_size=d["aux_input_size"],
        num_constraints=d["num_constraints"],
        domain_size=D.get_evaluation_domain(
            d["num_constraints"] + d["primary_input_size"] + 1).m,
        alpha_g1=d["alpha_g1"], beta_g1=d["beta_g1"], beta_g2=d["beta_g2"],
        delta_g1=d["delta_g1"], delta_g2=d["delta_g2"],
        A=d["A"], B_idx=d["B_idx"], B2=d["B2"], B1=d["B1"],
        H=d["H"], L=d["L"],
        a_row=d["a_coo"][0], a_var=d["a_coo"][1], a_coeff=d["a_coo"][2],
        b_row=d["b_coo"][0], b_var=d["b_coo"][1], b_coeff=d["b_coo"][2],
        c_row=d["c_coo"][0], c_var=d["c_coo"][1], c_coeff=d["c_coo"][2],
    )


def load_or_build(pk_txt_path: str, cache_dir: str | None = None) -> DevicePK:
    """Load the npz cache next to the pk text file, building it on miss
    (native C++ parser when built, Python fallback otherwise)."""
    cache_dir = cache_dir or os.path.dirname(pk_txt_path)
    base = os.path.splitext(os.path.basename(pk_txt_path))[0]
    cache = os.path.join(cache_dir, base + f".v{CACHE_VERSION}.npz")
    if os.path.exists(cache) and (
            not os.path.exists(pk_txt_path)
            or os.path.getmtime(cache) >= os.path.getmtime(pk_txt_path)):
        return load_device_pk(cache)
    dpk = build_device_pk_native(pk_txt_path)
    if dpk is None:
        dpk = build_device_pk(io.load_proving_key(pk_txt_path))
    save_device_pk(dpk, cache)
    return dpk
