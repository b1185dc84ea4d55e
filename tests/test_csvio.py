"""CSV trajectory IO (utils/csvio.py; gato/utils/utils.h:9-51 analogues)."""

import numpy as np
import pytest

from gato_tpu.utils.csvio import (read_csv_flat, read_csv_matrix,
                                  read_csv_rows, write_csv_matrix)


def test_roundtrip_matrix(tmp_path):
    p = tmp_path / "traj.csv"
    a = np.arange(12, dtype=np.float32).reshape(4, 3) * 0.25 - 1.0
    write_csv_matrix(p, a)
    b = read_csv_matrix(p)
    np.testing.assert_array_equal(a, b)
    flat = read_csv_flat(p)
    np.testing.assert_array_equal(flat, a.ravel())


def test_ragged_rows(tmp_path):
    p = tmp_path / "ragged.csv"
    p.write_text("1,2,3\n\n4,5\n")
    rows = read_csv_rows(p)
    assert [r.shape[0] for r in rows] == [3, 2]
    with pytest.raises(ValueError, match="ragged"):
        read_csv_matrix(p)


def test_empty_and_shape_errors(tmp_path):
    p = tmp_path / "empty.csv"
    p.write_text("")
    assert read_csv_matrix(p).shape == (0, 0)
    assert read_csv_flat(p).shape == (0,)
    with pytest.raises(ValueError, match="2-D"):
        write_csv_matrix(tmp_path / "x.csv", np.zeros(3))


def test_reference_window_consumable(tmp_path):
    """A CSV trajectory loads straight into the solver's (N, 6) reference
    window shape (what the reference's example binary does with its fig-8
    CSV, examples/*.csv -> readCSVToVecVec)."""
    from gato_tpu.api.common import figure8

    traj = figure8(0.01).reshape(-1, 6)[:64]
    p = tmp_path / "fig8.csv"
    write_csv_matrix(p, traj)
    loaded = read_csv_matrix(p)
    np.testing.assert_allclose(loaded, traj, rtol=1e-6)
    window = loaded[:32]  # an (N, 6) reference window
    assert window.shape == (32, 6)
