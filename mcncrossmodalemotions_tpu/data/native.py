"""ctypes bindings for the C++ data service (native/libdataservice.so).

Provides the threaded fast path for wav segment reads and JPEG face
decodes (the reference's native vl_imreadjpeg / audioread layer). Falls
back transparently to the pure-Python implementations in data/audio.py
and data/images.py when the library is not built; semantics are
identical and tested for agreement (tests/test_native.py).

Build: ``make -C native``.
"""

from __future__ import annotations

import ctypes
from pathlib import Path
from typing import Optional, Sequence, Tuple

import numpy as np

_LIB_PATH = Path(__file__).resolve().parents[2] / "native" / "libdataservice.so"
_lib: Optional[ctypes.CDLL] = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    import os

    if os.environ.get("MCNCME_DISABLE_NATIVE"):
        # Soft kill-switch (inherited by worker subprocesses): used by
        # bench.py when the health probe is inconclusive (e.g. timeout
        # on a loaded host) — the committed .so stays in place.
        return None
    if not _LIB_PATH.exists():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.ds_wav_info.restype = ctypes.c_int
    lib.ds_wav_info.argtypes = [ctypes.c_char_p,
                                ctypes.POINTER(ctypes.c_int64)]
    lib.ds_read_wav.restype = ctypes.c_int64
    lib.ds_read_wav.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                                ctypes.c_int64,
                                ctypes.POINTER(ctypes.c_float),
                                ctypes.POINTER(ctypes.c_int32)]
    lib.ds_read_crops.restype = ctypes.c_int
    lib.ds_read_crops.argtypes = [ctypes.POINTER(ctypes.c_char_p),
                                  ctypes.POINTER(ctypes.c_int64),
                                  ctypes.c_int64, ctypes.c_int, ctypes.c_int,
                                  ctypes.POINTER(ctypes.c_float)]
    if hasattr(lib, "ds_read_crops_packed"):  # newer native builds
        lib.ds_read_crops_packed.restype = ctypes.c_int
        lib.ds_read_crops_packed.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p]
    lib.ds_decode_face.restype = ctypes.c_int
    lib.ds_decode_face.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                   ctypes.c_double,
                                   ctypes.POINTER(ctypes.c_ubyte)]
    lib.ds_decode_faces.restype = ctypes.c_int
    lib.ds_decode_faces.argtypes = [ctypes.POINTER(ctypes.c_char_p),
                                    ctypes.c_int, ctypes.c_int,
                                    ctypes.c_double, ctypes.c_int,
                                    ctypes.POINTER(ctypes.c_ubyte)]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def wav_info(path: str) -> Tuple[int, int, int, int]:
    """(num_samples, sample_rate, channels, bits) via the native parser."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native data service not built (make -C native)")
    out = (ctypes.c_int64 * 4)()
    rc = lib.ds_wav_info(str(path).encode(), out)
    if rc != 0:
        raise IOError(f"ds_wav_info({path}) failed: {rc}")
    return tuple(int(v) for v in out)  # type: ignore[return-value]


def read_wav(path: str, start: int = 0, num_samples: int = -1):
    """Native segment read -> (float32 mono [n], sample_rate)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native data service not built")
    if num_samples < 0:
        total = wav_info(path)[0]
        num_samples = total - start
    out = np.zeros(num_samples, np.float32)
    rate = ctypes.c_int32(0)
    got = lib.ds_read_wav(
        str(path).encode(), start, num_samples,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.byref(rate),
    )
    if got < 0:
        raise IOError(f"ds_read_wav({path}) failed")
    return out, int(rate.value)


def read_crops(paths: Sequence[str], starts: Sequence[int],
               num_samples: int, num_threads: int = 8) -> np.ndarray:
    """Threaded batched segment reads -> [count, num_samples] float32.

    Short files are zero-padded (the reference's short-clip behavior,
    getBatchEmoVoxCeleb.m:115-119)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native data service not built")
    count = len(paths)
    out = np.zeros((count, num_samples), np.float32)
    c_paths = (ctypes.c_char_p * count)(*[str(p).encode() for p in paths])
    c_starts = (ctypes.c_int64 * count)(*[int(s) for s in starts])
    failures = lib.ds_read_crops(
        c_paths, c_starts, num_samples, count, num_threads,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if failures:
        raise IOError(f"ds_read_crops: {failures}/{count} files failed")
    return out


def packed_reads_available() -> bool:
    """True when the built library has the fused read+quantise entry."""
    lib = _load()
    return lib is not None and hasattr(lib, "ds_read_crops_packed")


def read_crops_packed(paths: Sequence[str], starts: Sequence[int],
                      num_samples: int, fmt: str = "int16",
                      num_threads: int = 8) -> np.ndarray:
    """Threaded segment reads fused with device-feed quantisation.

    ``fmt='int16'`` -> [count, n] int16 PCM (data/audio.pack_pcm16 twin);
    ``fmt='mulaw8'`` -> [count, n] uint8 mu-law (pack_mulaw8 twin).
    Bit-identical to reading floats and packing on the host (same
    to-nearest-even rounding, same 64K lin->ulaw table), but the pack
    runs on the C++ reader threads — the Python producer ships
    device-ready bytes without a numpy pass over the samples.
    """
    lib = _load()
    if lib is None or not hasattr(lib, "ds_read_crops_packed"):
        raise RuntimeError("native packed reads not built (make -C native)")
    mode = {"int16": 0, "mulaw8": 1}[fmt]
    count = len(paths)
    out = np.zeros((count, num_samples),
                   np.int16 if mode == 0 else np.uint8)
    c_paths = (ctypes.c_char_p * count)(*[str(p).encode() for p in paths])
    c_starts = (ctypes.c_int64 * count)(*[int(s) for s in starts])
    failures = lib.ds_read_crops_packed(
        c_paths, c_starts, num_samples, count, num_threads, mode,
        out.ctypes.data_as(ctypes.c_void_p))
    if failures:
        raise IOError(f"ds_read_crops_packed: {failures}/{count} files failed")
    return out


def decode_faces(paths: Sequence[str], out_size: int = 224,
                 crop_ratio: float = 1.0 / 1.6,
                 num_threads: int = 8) -> np.ndarray:
    """Threaded JPEG decode+crop+resize+gray -> [count, S, S, 1] uint8."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native data service not built")
    count = len(paths)
    out = np.zeros((count, out_size, out_size), np.uint8)
    c_paths = (ctypes.c_char_p * count)(*[str(p).encode() for p in paths])
    failures = lib.ds_decode_faces(
        c_paths, count, out_size, crop_ratio, num_threads,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
    )
    if failures:
        raise IOError(f"ds_decode_faces: {failures}/{count} files failed")
    return out[..., None]
