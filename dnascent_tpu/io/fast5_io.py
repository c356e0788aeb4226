"""fast5 signal I/O via HDF5 (h5py).

Mirrors the reference's raw HDF5 access (reference: src/fast5.cpp):
``/read_<ID>/Raw/Signal`` plus channel calibration
digitisation/offset/range -> pA = (raw + offset) * range / digitisation
(fast5.cpp:100-107).  Also provides spec-compliant writing so tests and the
simulator can round-trip through real container files.
"""

from __future__ import annotations

import numpy as np

try:
    import h5py
    HAVE_H5PY = True
except Exception:  # pragma: no cover
    HAVE_H5PY = False


def _require_h5py():
    if not HAVE_H5PY:
        raise RuntimeError("h5py unavailable; fast5 support disabled")


def fast5_get_signal(path: str, read_id: str) -> np.ndarray:
    """Raw signal in pA for one read (fast5_getSignal, fast5.cpp:45-123)."""
    _require_h5py()
    with h5py.File(path, "r") as fh:
        grp = fh[f"read_{read_id}"]
        raw = grp["Raw/Signal"][()]
        ch = grp["channel_id"].attrs
        digitisation = float(ch["digitisation"])
        offset = float(ch["offset"])
        rng = float(ch["range"])
    return (raw.astype(np.float64) + offset) * rng / digitisation


def fast5_extract_read_ids(path: str) -> list[str]:
    """Enumerate readIDs (fast5_extract_readIDs, fast5.cpp:185-236)."""
    _require_h5py()
    out = []
    with h5py.File(path, "r") as fh:
        for key in fh.keys():
            if key.startswith("read_"):
                out.append(key[len("read_"):])
    return out


def write_fast5(path: str, reads: list[tuple[str, np.ndarray]],
                digitisation: float = 8192.0, offset: float = 0.0,
                rng: float = 1536.0) -> None:
    """Write a multi-read fast5 with int16 raw signal.

    ``reads``: list of (read_id, signal_pA).  The pA values are quantised to
    the int16 DAC domain via the inverse calibration.
    """
    _require_h5py()
    with h5py.File(path, "w") as fh:
        fh.attrs["file_version"] = "2.0"
        for read_id, pa in reads:
            raw = np.round(pa * digitisation / rng - offset).astype(np.int16)
            grp = fh.create_group(f"read_{read_id}")
            rawg = grp.create_group("Raw")
            rawg.create_dataset("Signal", data=raw, dtype=np.int16)
            ch = grp.create_group("channel_id")
            ch.attrs["digitisation"] = digitisation
            ch.attrs["offset"] = offset
            ch.attrs["range"] = rng
            ch.attrs["sampling_rate"] = 5000.0
