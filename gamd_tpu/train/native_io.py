"""ctypes binding for the native dataset packer (csrc/gamd_io.cpp).

Packs a directory of data_{seed}_{t}.npz trajectory frames into contiguous
[n_frames, n_atoms, 3] float32 arrays using all hardware threads — the
host-IO replacement for the reference's torch DataLoader worker processes
re-opening thousands of npz files per epoch
(reference: /root/reference/code/train_network_lj.py:256-268).

The shared library is built on demand with `make -C csrc` (g++ only, no
pybind11). Falls back to the pure-numpy path when the toolchain is missing.
"""

import ctypes
import os
import subprocess

import numpy as np

_CSRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc")
_LIB_PATH = os.path.join(_CSRC, "libgamd_io.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _CSRC], check=True,
                           capture_output=True)
        except (subprocess.CalledProcessError, FileNotFoundError) as e:
            raise RuntimeError(f"could not build libgamd_io.so: {e}") from e
    lib = ctypes.CDLL(_LIB_PATH)
    lib.gamd_pack_trajectory.restype = ctypes.c_int64
    lib.gamd_pack_trajectory.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int64),
    ]
    _lib = lib
    return lib


def available() -> bool:
    try:
        _load()
        return True
    except RuntimeError:
        return False


def pack_trajectory(dataset_dir, seed_num, sample_num, n_atoms,
                    drop_m_site=False, prefix="data_"):
    """Pack all frames into (pos, forces) float32 arrays.

    Returns:
        pos:    [seed_num * sample_num, n_atoms, 3]
        forces: same shape
    Raises RuntimeError if any frame failed to parse.
    """
    lib = _load()
    n_frames = seed_num * sample_num
    pos = np.empty((n_frames, n_atoms, 3), np.float32)
    forces = np.empty((n_frames, n_atoms, 3), np.float32)
    n_failed = ctypes.c_int64(0)
    done = lib.gamd_pack_trajectory(
        dataset_dir.encode(), prefix.encode(),
        seed_num, sample_num, n_atoms, int(drop_m_site),
        pos.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        forces.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.byref(n_failed))
    if done != n_frames or n_failed.value:
        raise RuntimeError(
            f"packed {done}/{n_frames} frames, {n_failed.value} failed "
            f"(dir={dataset_dir})")
    return pos, forces
