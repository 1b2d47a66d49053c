"""Native (C++/ctypes) host helper tests."""

import numpy as np
import pytest

from read_tpu import native


@pytest.fixture(scope="module")
def lib():
    lb = native.load()
    if lb is None:
        pytest.skip("native toolchain unavailable")
    return lb


def test_parse_ascii_floats(lib, rng):
    vals = rng.normal(size=(1000, 3)).astype(np.float32)
    buf = "\n".join(" ".join(f"{v:.6f}" for v in r) for r in vals).encode()
    out = native.parse_ascii_floats(buf, vals.size)
    np.testing.assert_allclose(out.reshape(vals.shape), vals, atol=1e-6)


def test_parse_ascii_short_buffer_returns_none(lib):
    assert native.parse_ascii_floats(b"1.0 2.0", 5) is None


def test_unpack_strided(lib, rng):
    rec = np.zeros(5000, dtype=[("x", "<f4"), ("y", "<f4"), ("r", "u1")])
    rec["x"] = rng.normal(size=5000)
    rec["y"] = rng.normal(size=5000)
    ys = native.unpack_strided(rec.tobytes(), 4, 5000,
                               rec.dtype.itemsize, np.float32)
    np.testing.assert_allclose(ys, rec["y"])


def test_ascii_ply_uses_native_path(lib, rng, tmp_path):
    from read_tpu.scene import io as IO
    xyz = rng.normal(size=(2000, 3)).astype(np.float32)
    p = str(tmp_path / "a.ply")
    IO.write_ply(p, xyz, binary=False)
    m = IO.import_model3d(p)
    np.testing.assert_allclose(m["xyz"], xyz, atol=1e-4)
