"""Reference .mat (v7.3/HDF5) reader test against a synthetic file laid
out exactly like MATLAB's save -v7.3 output (object-reference cell
arrays, compound complex dtype, transposed axes)."""

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

from mamimo_tpu.data.matlab_io import load_reference_mat


def _complex_compound(arr):
    out = np.empty(arr.shape, dtype=[("real", "<f8"), ("imag", "<f8")])
    out["real"] = arr.real
    out["imag"] = arr.imag
    return out


def test_load_reference_mat(tmp_path):
    rng = np.random.default_rng(0)
    B, L, R, T, C = 3, 40, 2, 4, 234
    rx = (rng.standard_normal((B, L, R))
          + 1j * rng.standard_normal((B, L, R)))
    h_ls = (rng.standard_normal((B, C, T, R))
            + 1j * rng.standard_normal((B, C, T, R)))
    snr = rng.standard_normal((B, 1, R))
    P = np.sign(rng.standard_normal((T, T)))

    path = str(tmp_path / "maMIMO_3___test.mat")
    with h5py.File(path, "w") as f:
        # MATLAB v7.3 stores arrays transposed (column-major layout)
        d_x = f.create_dataset("d_x", data=_complex_compound(
            rx.transpose(2, 1, 0)))                   # (R, L, B)
        d_y = f.create_dataset("d_y", data=_complex_compound(
            h_ls.transpose(3, 2, 1, 0)))              # (R, T, C, B)
        d_s = f.create_dataset("d_s", data=snr.transpose(2, 1, 0))
        usr = f.create_dataset("usr_data", (3, 1),
                               dtype=h5py.ref_dtype)
        usr[0, 0] = d_x.ref
        usr[1, 0] = d_y.ref
        usr[2, 0] = d_s.ref
        f.create_dataset("P", data=P.T)
        prm = f.create_group("prm")
        prm.create_dataset("FFTLength", data=np.asarray([[256.0]]))
        prm.create_dataset("CyclicPrefixLength", data=np.asarray([[64.0]]))

    d = load_reference_mat(path)
    np.testing.assert_allclose(d["rx"], rx.astype(np.complex64), rtol=1e-6)
    np.testing.assert_allclose(d["h_ls"], h_ls.astype(np.complex64),
                               rtol=1e-6)
    np.testing.assert_array_equal(d["P"], P.astype(np.float32))
    assert d["sim_params"]["FFTLength"] == 256
    assert d["sim_params"]["nTX"] == T and d["sim_params"]["nRX"] == R
    assert d["snr_cs"].shape == (B, R)
