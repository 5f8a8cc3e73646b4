"""Native loader vs numpy fallback parity."""

import numpy as np

from insmos_tpu import native


def _write_scan(path, n, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-50, 50, size=(n, 4)).astype(np.float32)
    pts.tofile(path)
    return pts


def test_native_builds():
    assert native.available(), "g++ build of the native loader failed"


def test_load_scan_transformed(tmp_path):
    pts = _write_scan(tmp_path / "s.bin", 1000)
    tf = np.eye(4, dtype=np.float32)
    tf[:3, 3] = [1.0, -2.0, 0.5]
    buf, n = native.load_scan_transformed(str(tmp_path / "s.bin"), tf, 2048)
    assert n == 1000
    np.testing.assert_allclose(buf[:n, :3], pts[:, :3] + tf[:3, 3], atol=1e-5)
    np.testing.assert_array_equal(buf[:n, 3], pts[:, 3])
    assert (buf[n:] == 0).all()


def test_load_scan_truncation(tmp_path):
    _write_scan(tmp_path / "big.bin", 500)
    buf, n = native.load_scan_transformed(
        str(tmp_path / "big.bin"), np.eye(4, dtype=np.float32), 100
    )
    assert n == 100


def test_load_window_parallel(tmp_path):
    rng = np.random.default_rng(1)
    paths, tfs, refs = [], [], []
    for i in range(6):
        p = str(tmp_path / f"{i}.bin")
        refs.append(_write_scan(p, 300 + 17 * i, seed=i))
        paths.append(p)
        tf = np.eye(4, dtype=np.float32)
        tf[:3, 3] = rng.uniform(-5, 5, 3)
        tfs.append(tf)
    out, counts = native.load_window(paths, np.stack(tfs), 512)
    for i in range(6):
        assert counts[i] == 300 + 17 * i
        np.testing.assert_allclose(
            out[i, : counts[i], :3], refs[i][:, :3] + tfs[i][:3, 3], atol=1e-5
        )
