"""Export artifact cache: round-trip through a serialized jax.export
artifact must produce identical results to direct jit, artifacts must be
keyed by code fingerprint + shapes, and the host-keyed XLA cache dir must
be stable per host."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blockmaze_tpu.utils import cachedirs, engine_cache as ec


def test_host_fingerprint_stable():
    assert cachedirs.host_fingerprint() == cachedirs.host_fingerprint()
    assert len(cachedirs.host_fingerprint()) == 10


def test_host_fingerprint_covers_model_identity():
    """The r4 poisoning incident: identical flags lines on two hosts still
    produced incompatible XLA:CPU executables (model-derived tuning
    features). The fingerprint must hash the model identity lines too."""
    with open("/proc/cpuinfo") as f:
        keys = {ln.split(":", 1)[0].strip() for ln in f if ":" in ln}
    covered = set(cachedirs._ID_KEYS) | {"flags", "Features"}
    assert covered & keys, "no cpuinfo identity lines found at all"
    if "model name" in keys:
        assert "model name" in covered


def test_cache_dir_partitioned_by_platform():
    """CPU executables embed host features -> host-keyed dir; TPU programs
    are host-independent -> shared per-platform dir."""
    cpu = cachedirs.cache_dir("cpu")
    tpu = cachedirs.cache_dir("tpu")
    assert cpu != tpu
    assert os.path.basename(cpu).startswith("cpu-")
    assert os.path.basename(cpu).endswith(cachedirs.host_fingerprint())
    assert os.path.basename(tpu) == "tpu"


def test_code_fingerprint_covers_compute_sources():
    # per-family fingerprints (a Pippenger edit must not invalidate QAP
    # artifacts): both families hash, and differ from each other
    fp_msm = ec.code_fingerprint("msm_g1")
    fp_qap = ec.code_fingerprint("qap")
    assert len(fp_msm) == 16 and len(fp_qap) == 16
    assert fp_msm != fp_qap
    # every named source must exist (a rename would silently stop
    # invalidating artifacts)
    import blockmaze_tpu
    root = os.path.dirname(os.path.abspath(blockmaze_tpu.__file__))
    for fam in ec._SOURCES:
        for rel in ec._SOURCES[fam]:
            assert os.path.exists(os.path.join(root, rel)), rel


def test_arg_hash_distinguishes_shapes_and_statics():
    a = jnp.zeros((4, 16), jnp.uint32)
    b = jnp.zeros((8, 16), jnp.uint32)
    h1 = ec._arg_hash((a,), "c13")
    assert h1 == ec._arg_hash((a,), "c13")
    assert h1 != ec._arg_hash((b,), "c13")
    assert h1 != ec._arg_hash((a,), "c12")


def test_cached_jit_roundtrip(tmp_path, monkeypatch):
    """Force-enable on CPU: second cached_jit call must load the artifact
    from disk and compute the same values."""
    monkeypatch.setattr(ec, "CACHE_DIR", str(tmp_path))
    monkeypatch.setattr(ec, "enabled", lambda: True)

    calls = []

    def fn(x, y):
        calls.append(1)
        return jnp.dot(x, y) + 1.0

    x = jnp.arange(12.0).reshape(3, 4)
    y = jnp.arange(8.0).reshape(4, 2)
    f1 = ec.cached_jit("t_dot", fn, (x, y))
    r1 = f1(x, y)
    files = list(tmp_path.iterdir())
    assert len(files) == 1 and files[0].name.endswith(".jaxexport")

    # fresh wrapper: loads from disk, fn must NOT be traced again
    calls.clear()
    f2 = ec.cached_jit("t_dot", fn, (x, y))
    r2 = f2(x, y)
    assert not calls, "artifact load must not re-trace the function"
    assert np.array_equal(np.asarray(r1), np.asarray(r2))
    assert np.array_equal(np.asarray(r1), np.asarray(fn(x, y)))


def test_cached_jit_corrupt_artifact_recovers(tmp_path, monkeypatch):
    monkeypatch.setattr(ec, "CACHE_DIR", str(tmp_path))
    monkeypatch.setattr(ec, "enabled", lambda: True)

    def fn(x):
        return x * 2

    x = jnp.ones((4,))
    ec.cached_jit("t_mul", fn, (x,))
    art = next(tmp_path.iterdir())
    art.write_bytes(b"garbage")
    f = ec.cached_jit("t_mul", fn, (x,))
    assert np.array_equal(np.asarray(f(x)), np.asarray(x * 2))
