"""Native C++ library bindings vs numpy fallbacks."""
import numpy as np
import pytest

from mcrat_tpu import native


def test_native_library_loads():
    # the library ships prebuilt in native/; build with `make -C native`
    assert native.available(), "libmcrat_native.so missing — run make -C native"


def test_binned_index_matches_fallback():
    rng = np.random.default_rng(0)
    n = 5000
    r0 = rng.uniform(0, 10, n)
    r1 = rng.uniform(0, 5, n)
    r2 = rng.uniform(0, 2, n)
    lo = np.array([0.0, 0.0, 0.0])
    inv = np.array([1.6, 3.2, 4.0])
    dims = np.array([16, 16, 8])
    ids_n, st_n, ct_n = native.build_binned_index(r0, r1, r2, lo, inv, dims)
    # force the numpy fallback by calling the module-private path
    lib = native._LIB
    native._LIB = None
    try:
        ids_p, st_p, ct_p = native.build_binned_index(r0, r1, r2, lo, inv, dims)
    finally:
        native._LIB = lib
    np.testing.assert_array_equal(ct_n, ct_p)
    np.testing.assert_array_equal(st_n, st_p)
    np.testing.assert_array_equal(ids_n, ids_p)  # both stable sorts


def test_read_dbl_roundtrip(tmp_path):
    data = np.random.default_rng(1).normal(size=4096)
    path = tmp_path / "x.dbl"
    data.tofile(path)
    out = native.read_dbl(str(path), 4096)
    np.testing.assert_array_equal(out, data)
    with pytest.raises(IOError):
        native.read_dbl(str(path), 8192)


def test_gather_rows():
    src = np.arange(40, dtype=np.float64).reshape(10, 4)
    idx = np.array([7, 0, 3])
    out = native.gather_rows(src, idx)
    np.testing.assert_array_equal(out, src[idx])
