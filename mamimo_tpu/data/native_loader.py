"""ctypes binding for the native (C++) streaming dataset loader.

Builds ``native/src/dataloader.cpp`` on first use (g++ or cmake+ninja)
and caches the shared library under ``native/build/``. Falls back to a
pure-NumPy gather with identical semantics when no toolchain is
available, so the Python API never breaks.

Raw container format: see CSIDataset.save_raw / dataloader.cpp header.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_MAGIC = b"MMIMORAW"
_LIB: Optional[ctypes.CDLL] = None
_LIB_TRIED = False


def _native_dir() -> str:
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), "native")


def _build_lib() -> Optional[str]:
    nd = _native_dir()
    build = os.path.join(nd, "build")
    os.makedirs(build, exist_ok=True)
    so = os.path.join(build, "libmamimo_dataloader.so")
    src = os.path.join(nd, "src", "dataloader.cpp")
    if os.path.exists(so) and os.path.getmtime(so) >= os.path.getmtime(src):
        return so
    try:
        subprocess.run(
            ["g++", "-O3", "-Wall", "-shared", "-fPIC", "-std=c++17",
             src, "-o", so, "-lpthread"],
            check=True, capture_output=True,
        )
        return so
    except Exception:
        return None


def _get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    so = _build_lib()
    if so is None:
        return None
    lib = ctypes.CDLL(so)
    lib.dl_open.restype = ctypes.c_void_p
    lib.dl_open.argtypes = [ctypes.c_char_p]
    lib.dl_meta.restype = ctypes.c_int
    lib.dl_meta.argtypes = [ctypes.c_void_p,
                            ctypes.POINTER(ctypes.c_int64)]
    lib.dl_gather.restype = ctypes.c_int
    lib.dl_gather.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
    ]
    if hasattr(lib, "dl_gather_packets"):
        lib.dl_gather_packets.restype = ctypes.c_int
        lib.dl_gather_packets.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ]
    lib.dl_prefetch.restype = ctypes.c_int
    lib.dl_prefetch.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.c_int,
    ]
    lib.dl_wait.restype = ctypes.c_int64
    lib.dl_wait.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.dl_close.restype = None
    lib.dl_close.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return lib


def write_raw(path: str, rx: np.ndarray, h_ls: np.ndarray) -> None:
    """Write the raw container (CSIDataset.save_raw backend)."""
    B, L, R = rx.shape
    _, C, T, _ = h_ls.shape
    header = _MAGIC + np.asarray([B, L, R, C, T, 0], np.int64).tobytes()
    with open(path, "wb") as f:
        f.write(header)
        f.write(np.ascontiguousarray(rx, np.complex64).tobytes())
        f.write(np.ascontiguousarray(h_ls, np.complex64).tobytes())


class NativeBatchLoader:
    """Gather (sig planes, label planes) batches by sample index from a
    raw container, via the C++ loader when available."""

    def __init__(self, path: str, n_threads: Optional[int] = None):
        self.path = path
        self.n_threads = n_threads or (os.cpu_count() or 1)
        self._lib = _get_lib()
        self._handle = None
        self._np = None
        if self._lib is not None:
            h = self._lib.dl_open(path.encode())
            if h:
                self._handle = ctypes.c_void_p(h)
                meta = (ctypes.c_int64 * 6)()
                self._lib.dl_meta(self._handle, meta)
                (self.B, self.L, self.R, self.C, self.T,
                 self.num_samples) = [int(meta[i]) for i in range(6)]
        if self._handle is None:
            self._open_numpy()

    @property
    def using_native(self) -> bool:
        return self._handle is not None

    def _open_numpy(self) -> None:
        with open(self.path, "rb") as f:
            head = f.read(56)
        assert head[:8] == _MAGIC, "bad raw container"
        B, L, R, C, T, _ = np.frombuffer(head[8:], np.int64)
        self.B, self.L, self.R, self.C, self.T = map(int, (B, L, R, C, T))
        self.num_samples = self.B * self.R * self.T
        rx_n = self.B * self.L * self.R
        h_n = self.B * self.C * self.T * self.R
        m = np.memmap(self.path, np.complex64, mode="r", offset=56,
                      shape=(rx_n + h_n,))
        self._np = (
            m[:rx_n].reshape(self.B, self.L, self.R),
            m[rx_n:].reshape(self.B, self.C, self.T, self.R),
        )

    def gather(self, idx: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """idx (n,) int64 -> (sig (n,2,L) f32, y (n,2,C) f32)."""
        idx = np.ascontiguousarray(idx, np.int64)
        n = len(idx)
        sig = np.empty((n, 2, self.L), np.float32)
        y = np.empty((n, 2, self.C), np.float32)
        if self._handle is not None:
            rc = self._lib.dl_gather(
                self._handle,
                idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                n,
                sig.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                y.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                self.n_threads,
            )
            if rc != 0:
                raise IndexError(f"dl_gather failed with code {rc}")
            return sig, y
        rx, h = self._np
        per_pkt = self.R * self.T
        p = idx // per_pkt
        r = (idx % per_pkt) // self.T
        t = idx % self.T
        s = rx[p, :, r]
        lab = h[p, :, t, r]
        sig[:, 0] = np.real(s)
        sig[:, 1] = np.imag(s)
        y[:, 0] = np.real(lab)
        y[:, 1] = np.imag(lab)
        return sig, y

    def gather_packets(
            self, pkts: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """Whole-packet plane gather — the window-streaming IO path:
        pkts (n,) int64 -> (rx planes (2, n, L, R) f32,
        h planes (2, n, C, T, R) f32). Ships each packet's preamble
        ONCE (a per-sample stream ships it T times per epoch — see
        dataloader.cpp::dl_gather_packets)."""
        pkts = np.ascontiguousarray(pkts, np.int64)
        n = len(pkts)
        sig = np.empty((2, n, self.L, self.R), np.float32)
        y = np.empty((2, n, self.C, self.T, self.R), np.float32)
        if (self._handle is not None
                and hasattr(self._lib, "dl_gather_packets")):
            rc = self._lib.dl_gather_packets(
                self._handle,
                pkts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                n,
                sig.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                y.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                self.n_threads,
            )
            if rc != 0:
                raise IndexError(f"dl_gather_packets failed ({rc})")
            return sig, y
        if self._np is None:
            self._open_numpy()
        rx, h = self._np
        s = rx[pkts]
        lab = h[pkts]
        sig[0], sig[1] = np.real(s), np.imag(s)
        y[0], y[1] = np.real(lab), np.imag(lab)
        return sig, y

    def prefetch(self, idx: np.ndarray) -> None:
        """Start an ASYNC gather of the next batch on a background C++
        thread (double buffer) — overlaps host gather with device
        compute. Falls back to an immediate gather without the native
        library. Exactly one prefetch may be in flight."""
        idx = np.ascontiguousarray(idx, np.int64)
        if self._handle is not None:
            rc = self._lib.dl_prefetch(
                self._handle,
                idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                len(idx), self.n_threads)
            if rc != 0:
                raise RuntimeError(f"dl_prefetch failed with code {rc}")
            self._pending = len(idx)
        else:
            self._pending = self.gather(idx)

    def wait(self) -> Tuple[np.ndarray, np.ndarray]:
        """Block for the in-flight prefetch and return (sig, y)."""
        pending = getattr(self, "_pending", None)
        assert pending is not None, "no prefetch in flight"
        self._pending = None
        if self._handle is not None:
            n = int(pending)
            sig = np.empty((n, 2, self.L), np.float32)
            y = np.empty((n, 2, self.C), np.float32)
            rc = self._lib.dl_wait(
                self._handle,
                sig.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                y.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
            if rc != n:
                raise RuntimeError(f"dl_wait failed with code {rc}")
            return sig, y
        return pending

    def close(self) -> None:
        if self._handle is not None and self._lib is not None:
            self._lib.dl_close(self._handle)
            self._handle = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass
