"""ctypes binding for the native event ring buffer / packetizer.

The reference's event buffering lives in the external orogen driver task
(SURVEY §0 L7 — it owns "the dataflow loop, buffering of events/images");
this framework ships it natively: native/event_runtime.cpp implements a
single-producer single-consumer ring with monotonic-timestamp repair
(reference hard-throws instead, src/tracking/EventFrame.cpp:204-208) and
one-pass packetization into the fixed-capacity padded arrays the jitted
raster kernel consumes (utils/events.build_event_frame).

The shared library is built on demand with `make` (g++ is in the image; no
pybind11 — plain C ABI + ctypes). If the toolchain is unavailable the
import still succeeds and `available()` returns False; PurePythonRing is a
behavior-identical fallback so the pipeline never hard-depends on the
native build.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libevent_runtime.so")

_lib = None
_build_error: Optional[str] = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_error
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception as e:  # toolchain absent / build failure
            _build_error = str(e)
            return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.event_ring_create.restype = ctypes.c_void_p
    lib.event_ring_create.argtypes = [ctypes.c_int64]
    lib.event_ring_destroy.argtypes = [ctypes.c_void_p]
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    lib.event_ring_push.restype = ctypes.c_int64
    lib.event_ring_push.argtypes = [ctypes.c_void_p, f32p, f32p, f64p, f32p,
                                    ctypes.c_int64]
    lib.event_ring_size.restype = ctypes.c_int64
    lib.event_ring_size.argtypes = [ctypes.c_void_p]
    lib.event_ring_pop_packet.restype = ctypes.c_int64
    lib.event_ring_pop_packet.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, f32p, f32p, f64p,
        f32p, ctypes.POINTER(ctypes.c_double)]
    lib.event_ring_pop_until.restype = ctypes.c_int64
    lib.event_ring_pop_until.argtypes = [
        ctypes.c_void_p, ctypes.c_double, ctypes.c_int64, f32p, f32p, f64p,
        f32p, ctypes.POINTER(ctypes.c_double)]
    lib.event_ring_dropped.restype = ctypes.c_int64
    lib.event_ring_dropped.argtypes = [ctypes.c_void_p]
    lib.event_ring_nonmonotonic.restype = ctypes.c_int64
    lib.event_ring_nonmonotonic.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


class EventRing:
    """Native SPSC event ring. push() from the reader thread, pop_packet()/
    pop_until() from the pipeline loop."""

    def __init__(self, capacity: int = 1 << 20):
        lib = _load()
        if lib is None:
            raise RuntimeError(f"native event runtime unavailable: "
                               f"{_build_error}")
        self._lib = lib
        self._ring = ctypes.c_void_p(lib.event_ring_create(capacity))

    def __del__(self):
        if getattr(self, "_ring", None):
            self._lib.event_ring_destroy(self._ring)
            self._ring = None

    def push(self, xs, ys, ts, ps) -> int:
        xs = np.ascontiguousarray(xs, np.float32)
        ys = np.ascontiguousarray(ys, np.float32)
        ts = np.ascontiguousarray(ts, np.float64)
        ps = np.ascontiguousarray(ps, np.float32)
        return int(self._lib.event_ring_push(self._ring, xs, ys, ts, ps,
                                             len(xs)))

    def __len__(self) -> int:
        return int(self._lib.event_ring_size(self._ring))

    def _alloc(self, capacity: int):
        return (np.empty(capacity, np.float32), np.empty(capacity, np.float32),
                np.empty(capacity, np.float64), np.empty(capacity, np.float32))

    def pop_packet(self, count: int, capacity: int):
        """-> (xs, ys, ts, ps, n_valid, median_t), arrays padded to
        `capacity` (last event repeated with zero polarity)."""
        xs, ys, ts, ps = self._alloc(capacity)
        med = ctypes.c_double(0.0)
        n = int(self._lib.event_ring_pop_packet(
            self._ring, count, capacity, xs, ys, ts, ps, ctypes.byref(med)))
        return xs, ys, ts, ps, n, med.value

    def pop_until(self, t_end: float, capacity: int):
        xs, ys, ts, ps = self._alloc(capacity)
        med = ctypes.c_double(0.0)
        n = int(self._lib.event_ring_pop_until(
            self._ring, float(t_end), capacity, xs, ys, ts, ps,
            ctypes.byref(med)))
        return xs, ys, ts, ps, n, med.value

    @property
    def dropped(self) -> int:
        return int(self._lib.event_ring_dropped(self._ring))

    @property
    def nonmonotonic(self) -> int:
        return int(self._lib.event_ring_nonmonotonic(self._ring))


class PurePythonRing:
    """numpy fallback with identical semantics (for images without g++)."""

    def __init__(self, capacity: int = 1 << 20):
        self._cap = capacity
        self._chunks = []
        self._n = 0
        self.dropped = 0
        self.nonmonotonic = 0
        self._last_t = -np.inf

    def push(self, xs, ys, ts, ps) -> int:
        ts = np.asarray(ts, np.float64).copy()
        bad = np.where(np.diff(np.concatenate([[self._last_t], ts])) < 0)[0]
        self.nonmonotonic += len(bad)
        ts = np.maximum.accumulate(np.concatenate([[self._last_t], ts]))[1:]
        take = min(len(xs), self._cap - self._n)
        self.dropped += len(xs) - take
        if take > 0:
            self._chunks.append((np.asarray(xs[:take], np.float32),
                                 np.asarray(ys[:take], np.float32),
                                 ts[:take],
                                 np.asarray(ps[:take], np.float32)))
            self._n += take
            self._last_t = float(ts[take - 1])
        return take

    def __len__(self):
        return self._n

    def _consolidate(self):
        if len(self._chunks) > 1:
            self._chunks = [tuple(np.concatenate([c[i] for c in self._chunks])
                                  for i in range(4))]

    def _pop_n(self, n: int, capacity: int):
        self._consolidate()
        xs_o = np.empty(capacity, np.float32)
        ys_o = np.empty(capacity, np.float32)
        ts_o = np.empty(capacity, np.float64)
        ps_o = np.empty(capacity, np.float32)
        if n == 0:
            return xs_o, ys_o, ts_o, ps_o, 0, 0.0
        xs, ys, ts, ps = self._chunks[0]
        xs_o[:n], ys_o[:n], ts_o[:n], ps_o[:n] = xs[:n], ys[:n], ts[:n], ps[:n]
        xs_o[n:], ys_o[n:], ts_o[n:] = xs[n - 1], ys[n - 1], ts[n - 1]
        ps_o[n:] = 0.0
        self._chunks[0] = (xs[n:], ys[n:], ts[n:], ps[n:])
        self._n -= n
        return xs_o, ys_o, ts_o, ps_o, n, float(ts_o[n // 2])

    def pop_packet(self, count: int, capacity: int):
        return self._pop_n(min(count, self._n, capacity), capacity)

    def pop_until(self, t_end: float, capacity: int):
        self._consolidate()
        if not self._chunks:
            return self._pop_n(0, capacity)
        ts = self._chunks[0][2]
        n = int(np.searchsorted(ts, t_end, side="left"))
        return self._pop_n(min(n, capacity), capacity)


def make_ring(capacity: int = 1 << 20):
    """Native ring when buildable, pure-python fallback otherwise."""
    return EventRing(capacity) if available() else PurePythonRing(capacity)
