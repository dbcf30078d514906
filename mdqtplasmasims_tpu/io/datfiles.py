"""Reference-compatible .dat file emission.

Every observable in the reference is appended to tab-separated ASCII files
with ``%lg`` (= ``%g``, 6 significant digits) formatting; schema documented
in README.md:103-142 of the reference.  A fast C codec (native/datio) is
used when built; the Python fallback is always available.
"""

from __future__ import annotations

import os

import numpy as np

try:
    from . import _datio_native as _native   # C extension, optional
except Exception:  # pragma: no cover
    _native = None


def format_rows(arr: np.ndarray) -> str:
    """Tab-separated %g rows, one trailing newline per row."""
    arr = np.asarray(arr)
    if _native is not None:
        return _native.format_rows(np.ascontiguousarray(arr, dtype=np.float64))
    arr = np.atleast_1d(arr)
    if arr.ndim == 1:
        arr = arr[:, None]
    return "".join("\t".join("%g" % v for v in row) + "\n" for row in arr)


def append_rows(path: str, arr: np.ndarray) -> None:
    with open(path, "a") as f:
        f.write(format_rows(arr))


def write_rows(path: str, arr: np.ndarray) -> None:
    with open(path, "w") as f:
        f.write(format_rows(arr))


def read_rows(path: str, expect_cols: int | None = None) -> np.ndarray:
    """Whitespace-separated float table (fscanf-compatible).

    Unlike the reference's ``fscanf`` loops — which silently misparse a
    truncated or column-mangled file — every defect raises a
    ``ValueError`` naming the file and the problem (SURVEY §5's
    failure-detection gap).  ``expect_cols`` additionally pins the
    column count (checkpoint schemas have fixed widths)."""
    if _native is not None:
        with open(path) as f:
            text = f.read()
        first = text.split("\n", 1)[0]
        ncol = len(first.split())
        # parse_floats returns a bytearray (mutable), so frombuffer gives
        # a writable array with no extra copy of the float payload
        flat = np.frombuffer(_native.parse_floats(text), np.float64)
        if ncol == 0 or flat.size == 0:
            raise ValueError(f"{path}: empty or non-numeric table")
        if flat.size % ncol:
            raise ValueError(
                f"{path}: ragged/truncated table — {flat.size} values do "
                f"not fill rows of {ncol} columns (file cut mid-row or "
                "mixed column counts)")
        arr = flat.reshape(-1, ncol)
    else:
        try:
            arr = np.loadtxt(path, ndmin=2)
        except FileNotFoundError:
            raise
        except Exception as e:
            raise ValueError(f"{path}: unreadable float table ({e})") from e
        if arr.size == 0:
            raise ValueError(f"{path}: empty or non-numeric table")
    if expect_cols is not None and arr.shape[1] != expect_cols:
        raise ValueError(
            f"{path}: expected {expect_cols} columns, found "
            f"{arr.shape[1]} — wrong schema or corrupted rows")
    return arr


class DatWriter:
    """Output-file manager bound to one run directory."""

    def __init__(self, directory: str):
        self.dir = directory
        os.makedirs(directory, exist_ok=True)

    def path(self, name: str) -> str:
        return os.path.join(self.dir, name)

    def append(self, name: str, arr) -> None:
        append_rows(self.path(name), np.asarray(arr))

    def write(self, name: str, arr) -> None:
        write_rows(self.path(name), np.asarray(arr))

    def write_text(self, name: str, text: str) -> None:
        with open(self.path(name), "w") as f:
            f.write(text)
