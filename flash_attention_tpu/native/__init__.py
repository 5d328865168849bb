"""Native (C++) runtime components, built on demand and loaded via ctypes.

Mirrors the reference's host-runtime split: device compute lives in
Pallas/XLA, host-side runtime (request scheduling, oracle checking) is C++
(the reference's host runtime is the C++ half of flash_attention.cu). The
shared library is compiled once per source change (content-hashed) with the
ambient g++ and cached under the user cache dir.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import pathlib
import subprocess
import tempfile
import threading

_SRC_DIR = pathlib.Path(__file__).resolve().parent / "src"
_SOURCES = ["scheduler.cpp", "oracle.cpp", "allocator.cpp"]
_LOCK = threading.Lock()
_LIB: ctypes.CDLL | None = None


def _cache_dir() -> pathlib.Path:
    base = os.environ.get("XDG_CACHE_HOME") or os.path.join(
        os.path.expanduser("~"), ".cache"
    )
    d = pathlib.Path(base) / "flash_attention_tpu"
    d.mkdir(parents=True, exist_ok=True)
    return d


def _build() -> pathlib.Path:
    srcs = [_SRC_DIR / s for s in _SOURCES]
    digest = hashlib.sha256(
        b"\0".join(p.read_bytes() for p in srcs)
    ).hexdigest()[:16]
    out = _cache_dir() / f"libfat_native_{digest}.so"
    if out.exists():
        return out
    # Build into a temp file in the DESTINATION directory so the final
    # os.replace is same-filesystem (rename across mounts raises EXDEV) and
    # stays atomic across processes.
    fd, tmp_name = tempfile.mkstemp(
        prefix=out.stem + ".", suffix=".tmp.so", dir=out.parent
    )
    os.close(fd)
    tmp = pathlib.Path(tmp_name)
    try:
        cmd = [
            "g++", "-O2", "-std=c++17", "-shared", "-fPIC",
            *[str(p) for p in srcs], "-o", str(tmp),
        ]
        subprocess.run(cmd, check=True, capture_output=True, text=True)
        os.replace(tmp, out)  # atomic publish; safe across processes
    finally:
        tmp.unlink(missing_ok=True)
    return out


def _declare(lib: ctypes.CDLL) -> None:
    c = ctypes
    lib.fat_sched_create.restype = c.c_void_p
    lib.fat_sched_create.argtypes = [c.c_int32, c.c_int32]
    lib.fat_sched_destroy.restype = None
    lib.fat_sched_destroy.argtypes = [c.c_void_p]
    lib.fat_sched_submit.restype = c.c_int32
    lib.fat_sched_submit.argtypes = [c.c_void_p, c.c_int64, c.c_int32, c.c_int32]
    lib.fat_sched_admit.restype = c.c_int32
    lib.fat_sched_admit.argtypes = [
        c.c_void_p, c.POINTER(c.c_int64), c.POINTER(c.c_int32), c.c_int32,
    ]
    lib.fat_sched_prefill_done.restype = c.c_int32
    lib.fat_sched_prefill_done.argtypes = [c.c_void_p, c.c_int32]
    lib.fat_sched_active_slots.restype = c.c_int32
    lib.fat_sched_active_slots.argtypes = [
        c.c_void_p, c.POINTER(c.c_int32), c.c_int32,
    ]
    lib.fat_sched_record_token.restype = c.c_int32
    lib.fat_sched_record_token.argtypes = [c.c_void_p, c.c_int32, c.c_int32]
    lib.fat_sched_slot_request.restype = c.c_int64
    lib.fat_sched_slot_request.argtypes = [c.c_void_p, c.c_int32]
    lib.fat_sched_stats.restype = None
    lib.fat_sched_stats.argtypes = [c.c_void_p, c.POINTER(c.c_int64)]
    lib.fat_alloc_create.restype = c.c_void_p
    lib.fat_alloc_create.argtypes = [c.c_int32]
    lib.fat_alloc_destroy.restype = None
    lib.fat_alloc_destroy.argtypes = [c.c_void_p]
    lib.fat_alloc_acquire.restype = c.c_int32
    lib.fat_alloc_acquire.argtypes = [c.c_void_p, c.c_int32, c.POINTER(c.c_int32)]
    lib.fat_alloc_release.restype = None
    lib.fat_alloc_release.argtypes = [c.c_void_p, c.POINTER(c.c_int32), c.c_int32]
    lib.fat_alloc_free_count.restype = c.c_int32
    lib.fat_alloc_free_count.argtypes = [c.c_void_p]
    lib.fat_oracle_attention.restype = None
    lib.fat_oracle_attention.argtypes = [
        c.POINTER(c.c_float), c.POINTER(c.c_float), c.POINTER(c.c_float),
        c.POINTER(c.c_float),
        c.c_int32, c.c_int32, c.c_int32, c.c_int32, c.c_int32, c.c_int32,
        c.c_int32, c.c_float, c.POINTER(c.c_int32),
    ]


def load() -> ctypes.CDLL:
    """Build (if needed) and load the native library. Thread-safe, cached."""
    global _LIB
    with _LOCK:
        if _LIB is None:
            lib = ctypes.CDLL(str(_build()))
            _declare(lib)
            _LIB = lib
        return _LIB
