"""ctypes bindings for the native host-data runtime (diagan_io.cpp).

The shared library is JIT-compiled with g++ on first use and cached next
to this file — mirroring the reference's torch cpp_extension
load-at-import pattern (reference op/fused_act.py:11-17). When no C++
toolchain is available everything degrades to numpy fallbacks with the
same API.
"""
from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path

import numpy as np

_HERE = Path(__file__).resolve().parent
_SO = _HERE / "libdiagan_io.so"
_LOCK = threading.Lock()
_LIB = None
_TRIED = False


def _build():
    src = _HERE / "diagan_io.cpp"
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        "-pthread", str(src), "-o", str(_SO),
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def _load():
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        try:
            if not _SO.exists() or _SO.stat().st_mtime < (
                _HERE / "diagan_io.cpp"
            ).stat().st_mtime:
                _build()
            lib = ctypes.CDLL(str(_SO))
        except Exception as e:  # no toolchain / unsupported platform
            print(f"WARNING: native diagan_io unavailable ({e}); numpy fallback")
            return None
        lib.ws_create.restype = ctypes.c_void_p
        lib.ws_create.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                  ctypes.c_uint64]
        lib.ws_sample.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                  ctypes.c_int64]
        lib.ws_destroy.argtypes = [ctypes.c_void_p]
        lib.dl_create.restype = ctypes.c_void_p
        lib.dl_create.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_uint64,
        ]
        lib.dl_next.restype = ctypes.c_int
        lib.dl_next.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                ctypes.c_void_p]
        lib.dl_destroy.argtypes = [ctypes.c_void_p]
        lib.normalize_u8_f32.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                         ctypes.c_int64, ctypes.c_int]
        lib.gather_u8.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                  ctypes.c_void_p, ctypes.c_int64,
                                  ctypes.c_void_p, ctypes.c_int]
        _LIB = lib
        return _LIB


def native_available() -> bool:
    return _load() is not None


class NativeWeightedSampler:
    """O(1)-per-draw alias-method sampler (WeightedRandomSampler parity)."""

    def __init__(self, weights, seed=0):
        self._w = np.ascontiguousarray(weights, np.float64)
        lib = _load()
        self._lib = lib
        if lib is not None:
            self._h = lib.ws_create(
                self._w.ctypes.data_as(ctypes.c_void_p), len(self._w),
                ctypes.c_uint64(seed),
            )
        else:
            self._rng = np.random.default_rng(seed)
            self._p = self._w / self._w.sum()

    def sample(self, count) -> np.ndarray:
        if self._lib is not None:
            out = np.empty(count, np.int64)
            self._lib.ws_sample(self._h, out.ctypes.data_as(ctypes.c_void_p),
                                count)
            return out
        return self._rng.choice(len(self._p), size=count, p=self._p)

    def __del__(self):
        if getattr(self, "_lib", None) is not None and hasattr(self, "_h"):
            self._lib.ws_destroy(self._h)


class NativeLoader:
    """Threaded prefetching (batch, idx) stream over a uint8 array.

    Yields (float32 [B, ...] in [-1,1], int64 [B]) — the same batch
    contract as DeviceDataSource.batch, for host-streaming datasets.
    """

    def __init__(self, images: np.ndarray, batch_size: int, weights=None,
                 n_threads: int = 4, queue_cap: int = 8, seed: int = 0):
        self.images = np.ascontiguousarray(images)
        assert self.images.dtype == np.uint8
        self.item_shape = self.images.shape[1:]
        self.item_elems = int(np.prod(self.item_shape))
        self.batch_size = batch_size
        lib = _load()
        self._lib = lib
        if lib is not None:
            w = None
            if weights is not None:
                self._wbuf = np.ascontiguousarray(weights, np.float64)
                w = self._wbuf.ctypes.data_as(ctypes.c_void_p)
            self._h = lib.dl_create(
                self.images.ctypes.data_as(ctypes.c_void_p),
                len(self.images), self.item_elems, w, batch_size, n_threads,
                queue_cap, ctypes.c_uint64(seed),
            )
        else:
            self._rng = np.random.default_rng(seed)
            self._p = None
            if weights is not None:
                w = np.asarray(weights, np.float64)
                self._p = w / w.sum()

    def next(self):
        if self._lib is not None:
            data = np.empty((self.batch_size, self.item_elems), np.float32)
            idx = np.empty(self.batch_size, np.int64)
            ok = self._lib.dl_next(
                self._h, data.ctypes.data_as(ctypes.c_void_p),
                idx.ctypes.data_as(ctypes.c_void_p),
            )
            if not ok:
                raise StopIteration
            return data.reshape((self.batch_size,) + self.item_shape), idx
        idx = (
            self._rng.choice(len(self.images), self.batch_size, p=self._p)
            if self._p is not None
            else self._rng.integers(0, len(self.images), self.batch_size)
        )
        return (
            self.images[idx].astype(np.float32) / 127.5 - 1.0,
            idx.astype(np.int64),
        )

    def __iter__(self):
        while True:
            yield self.next()

    def close(self):
        if getattr(self, "_lib", None) is not None and hasattr(self, "_h"):
            self._lib.dl_destroy(self._h)
            del self._h

    def __del__(self):
        self.close()


def gather_u8(images: np.ndarray, idx: np.ndarray, threads: int = 4
              ) -> np.ndarray:
    """out[i] = images[idx[i]] via the threaded native gather (numpy
    fancy-index fallback). `images` may be a np.memmap — only the touched
    pages are read, which is what makes host-streaming over a
    larger-than-HBM dataset cheap."""
    lib = _load()
    idx = np.ascontiguousarray(idx, np.int64)
    if lib is None:
        return np.ascontiguousarray(images[idx])
    assert images.dtype == np.uint8
    item_elems = int(np.prod(images.shape[1:]))
    # no-copy when already C-contiguous (incl. np.memmap)
    base = np.ascontiguousarray(images)
    out = np.empty((len(idx),) + images.shape[1:], np.uint8)
    lib.gather_u8(
        base.ctypes.data_as(ctypes.c_void_p), item_elems,
        idx.ctypes.data_as(ctypes.c_void_p), len(idx),
        out.ctypes.data_as(ctypes.c_void_p), threads,
    )
    return out


def normalize_u8(images: np.ndarray, threads: int = 8) -> np.ndarray:
    """uint8 -> float32 in [-1, 1], multithreaded natively when available."""
    lib = _load()
    flat = np.ascontiguousarray(images).reshape(-1)
    if lib is None:
        return (images.astype(np.float32) / 127.5 - 1.0)
    out = np.empty(flat.shape, np.float32)
    lib.normalize_u8_f32(
        flat.ctypes.data_as(ctypes.c_void_p),
        out.ctypes.data_as(ctypes.c_void_p), len(flat), threads,
    )
    return out.reshape(images.shape)
