"""Spike-event binning — native C fast path with a numpy fallback.

``bin_spikes(times, neurons, T, dt, N)`` turns event-format spike data into
the dense (T, N) count matrix that ``Population.prepare_data`` consumes. The
C kernel (native/fastbin.c) is compiled on first use with the system C
compiler and loaded through ctypes; if no toolchain is available the numpy
``np.add.at`` scatter path is used (bit-identical results).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

__all__ = ["bin_spikes", "native_available"]

_lock = threading.Lock()
_lib = None
_tried = False

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native", "fastbin.c")
_SO = os.path.join(os.path.dirname(_SRC), "_fastbin.so")


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if (not os.path.exists(_SO)) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
                cc = os.environ.get("CC", "cc")
                subprocess.run(
                    [cc, "-O3", "-shared", "-fPIC", "-o", _SO, _SRC],
                    check=True,
                    capture_output=True,
                )
            lib = ctypes.CDLL(_SO)
            lib.bin_events.argtypes = [
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_longlong),
                ctypes.c_longlong,
                ctypes.c_double,
                ctypes.c_longlong,
                ctypes.c_longlong,
                ctypes.POINTER(ctypes.c_float),
            ]
            lib.bin_events.restype = None
            _lib = lib
        except Exception:
            _lib = None
    return _lib


def native_available() -> bool:
    return _load() is not None


def _bin_numpy(times, neurons, T, dt, N):
    out = np.zeros((T, N), dtype=np.float32)
    # Same expression as the C kernel (times * (1/dt), truncating cast) —
    # multiply-by-reciprocal vs divide can round boundary events into
    # adjacent bins, so both paths must use the identical form for the
    # bit-identical guarantee to hold.
    t = (times * (1.0 / dt)).astype(np.int64)
    ok = (t >= 0) & (t < T) & (neurons >= 0) & (neurons < N)
    np.add.at(out, (t[ok], neurons[ok].astype(np.int64)), 1.0)
    return out


def bin_spikes(times, neurons, T: int, dt: float, N: int, use_native: bool = True):
    """Bin spike events into (T, N) float32 counts.

    Args:
      times: (n_events,) spike times in seconds.
      neurons: (n_events,) integer neuron ids.
      T: number of bins; dt: bin width (s); N: number of neurons.
      use_native: prefer the C kernel (falls back to numpy automatically).
    """
    times = np.ascontiguousarray(np.asarray(times, dtype=np.float64))
    neurons = np.ascontiguousarray(np.asarray(neurons, dtype=np.int64))
    if times.shape != neurons.shape or times.ndim != 1:
        raise ValueError("times and neurons must be 1-D arrays of equal length")

    lib = _load() if use_native else None
    if lib is None:
        return _bin_numpy(times, neurons, T, dt, N)

    out = np.zeros((T, N), dtype=np.float32)
    lib.bin_events(
        times.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        neurons.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
        ctypes.c_longlong(times.shape[0]),
        ctypes.c_double(dt),
        ctypes.c_longlong(T),
        ctypes.c_longlong(N),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out
