"""CSV record-and-replay serialization.

Equivalent of the reference's EigenSerialize (utils.cpp:21-61, utils.h:21-49):
save/load lists of vectors (e.g. a solved control sequence) as plain CSV so
trajectories can be replayed on a robot-side consumer.
"""

import numpy as np

__all__ = ["save_csv", "load_csv"]


def save_csv(rows, filename: str) -> bool:
    """Save a 2-D array (or list of 1-D vectors) as CSV, one vector per line."""
    arr = np.asarray(rows, dtype=float)
    if arr.ndim == 1:
        arr = arr[:, None]
    np.savetxt(filename, arr, delimiter=",", fmt="%.18g")
    return True


def load_csv(filename: str) -> np.ndarray:
    """Load a CSV saved by save_csv; returns (n_rows, n_cols) float64."""
    return np.atleast_2d(np.loadtxt(filename, delimiter=","))


_MATRIX_SEP = "=================================== "


def save_matrix_list(mats, filename: str) -> bool:
    """Save a list of matrices, '=' separator between blocks — the format of
    EigenSerialize::save(vector<MatrixXd>) (utils.cpp:33-44)."""
    with open(filename, "w") as f:
        for m in mats:
            for row in np.atleast_2d(np.asarray(m, dtype=float)):
                f.write(",".join(f"{v:.18g}" for v in row) + "\n")
            f.write(_MATRIX_SEP + "\n")
    return True


def load_matrix_list(filename: str):
    """Load a file written by save_matrix_list."""
    mats, rows = [], []
    with open(filename) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            if line.startswith("="):
                if rows:
                    mats.append(np.array(rows))
                rows = []
            else:
                rows.append([float(v) for v in line.split(",")])
    if rows:
        mats.append(np.array(rows))
    return mats
