"""Host-side oracle bridge: batched REAL MuJoCo stepping.

Python face of native/mujoco_batch.cpp (C++ thread-pooled mj_step across a
batch of envs; see that file's header for the role). Loaded via ctypes —
no pybind11 dependency. Used by parity tests, CPU-reference throughput
measurement (BASELINE denominator), and ground-truth eval rollouts/videos.
Never used in the TPU training path.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "..", "..", "native", "libmjbatch.so")


class BatchedOracle:
    """Batched MuJoCo envs stepped by a native thread pool."""

    def __init__(self, xml_path: str, n_envs: int, n_threads: int = 0):
        if not os.path.exists(_LIB_PATH):
            raise FileNotFoundError(
                f"{_LIB_PATH} not built — run `python tools/build_native.py`"
            )
        lib = ctypes.CDLL(_LIB_PATH)
        lib.mjb_create.restype = ctypes.c_void_p
        lib.mjb_create.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int]
        lib.mjb_error.restype = ctypes.c_char_p
        for name in ("mjb_nq", "mjb_nv", "mjb_nu", "mjb_nsensordata"):
            getattr(lib, name).restype = ctypes.c_int
            getattr(lib, name).argtypes = [ctypes.c_void_p]
        dptr = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
        lib.mjb_set_state.argtypes = [ctypes.c_void_p, dptr, dptr]
        lib.mjb_step.argtypes = [ctypes.c_void_p, dptr, ctypes.c_int]
        lib.mjb_get_state.argtypes = [ctypes.c_void_p, dptr, dptr]
        lib.mjb_get_sensordata.argtypes = [ctypes.c_void_p, dptr]
        lib.mjb_forward.argtypes = [ctypes.c_void_p]
        lib.mjb_destroy.argtypes = [ctypes.c_void_p]
        self._lib = lib
        self._h = lib.mjb_create(xml_path.encode(), n_envs, n_threads)
        if not self._h:
            raise RuntimeError(f"mjb_create failed: {lib.mjb_error().decode()}")
        self.n_envs = n_envs
        self.nq = lib.mjb_nq(self._h)
        self.nv = lib.mjb_nv(self._h)
        self.nu = lib.mjb_nu(self._h)
        self.nsensordata = lib.mjb_nsensordata(self._h)

    @classmethod
    def for_domain(cls, domain: str, n_envs: int, n_threads: int = 0) -> "BatchedOracle":
        """Load a dm_control suite domain's XML (resolved from the installed
        dm_control package; assets are alongside)."""
        from dm_control import suite as dm_suite

        xml = os.path.join(os.path.dirname(dm_suite.__file__), f"{domain}.xml")
        return cls(xml, n_envs, n_threads)

    def set_state(self, qpos: np.ndarray, qvel: np.ndarray) -> None:
        qpos = np.ascontiguousarray(qpos, np.float64).reshape(self.n_envs, self.nq)
        qvel = np.ascontiguousarray(qvel, np.float64).reshape(self.n_envs, self.nv)
        self._lib.mjb_set_state(self._h, qpos, qvel)

    def step(self, ctrl: np.ndarray, nsteps: int = 1) -> None:
        ctrl = np.ascontiguousarray(ctrl, np.float64).reshape(self.n_envs, self.nu)
        self._lib.mjb_step(self._h, ctrl, nsteps)

    def get_state(self) -> tuple[np.ndarray, np.ndarray]:
        qpos = np.empty((self.n_envs, self.nq), np.float64)
        qvel = np.empty((self.n_envs, self.nv), np.float64)
        self._lib.mjb_get_state(self._h, qpos, qvel)
        return qpos, qvel

    def sensordata(self) -> np.ndarray:
        out = np.empty((self.n_envs, self.nsensordata), np.float64)
        self._lib.mjb_get_sensordata(self._h, out)
        return out

    def close(self) -> None:
        if self._h:
            self._lib.mjb_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
