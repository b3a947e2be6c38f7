"""Batched policy inference service.

Role of the reference's "batch agent" (SURVEY.md §2D: one process serving
many envs' observations with a single batched GPU forward): a jitted
batched act function over checkpointed params, plus a minimal
length-prefixed TCP loop for out-of-process clients (external simulators,
demo UIs). On-device users should call `PolicyService.act` directly — it is
just the jitted forward.
"""

from __future__ import annotations

import json
import socket
import socketserver
import struct
import threading
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from surreal_tpu.models.distributions import DiagGauss
from surreal_tpu.models.z_filter import zfilter_normalize


class PolicyService:
    def __init__(self, apply_fn: Callable, params, zfilter=None, stochastic: bool = False,
                 seed: int = 0):
        self._params = params
        self._zf = zfilter
        self._stochastic = stochastic
        self._key = jax.random.PRNGKey(seed)

        def act(params, obs, key):
            o = zfilter_normalize(zfilter, obs) if zfilter is not None else obs
            mean, log_std, _ = apply_fn(params, o)
            if stochastic:
                return DiagGauss.sample(key, mean, log_std)
            return mean

        self._act = jax.jit(act)

    def act(self, obs: np.ndarray) -> np.ndarray:
        """(B, D) observations -> (B, A) actions."""
        self._key, sub = jax.random.split(self._key)
        return np.asarray(self._act(self._params, jnp.asarray(obs), sub))

    def update_params(self, params) -> None:
        """Hot-swap parameters (the reference's mid-episode param refresh)."""
        self._params = params

    # ---- wire protocol: 4-byte big-endian length + JSON {obs: [[...]]} ----
    def serve(self, host: str = "127.0.0.1", port: int = 0):
        """Starts a daemon TCP server; returns (server, (host, port))."""
        service = self

        class Handler(socketserver.BaseRequestHandler):
            def handle(self):
                while True:
                    hdr = _recv_exact(self.request, 4)
                    if hdr is None:
                        return
                    (n,) = struct.unpack(">I", hdr)
                    payload = _recv_exact(self.request, n)
                    if payload is None:
                        return
                    msg = json.loads(payload)
                    actions = service.act(np.asarray(msg["obs"], np.float32))
                    out = json.dumps({"action": actions.tolist()}).encode()
                    self.request.sendall(struct.pack(">I", len(out)) + out)

        server = socketserver.ThreadingTCPServer((host, port), Handler)
        server.daemon_threads = True
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        return server, server.server_address


def _recv_exact(sock: socket.socket, n: int) -> bytes | None:
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            return None
        buf += chunk
    return buf


def request_actions(addr, obs: np.ndarray) -> np.ndarray:
    """Client helper for the wire protocol above."""
    with socket.create_connection(addr) as s:
        payload = json.dumps({"obs": np.asarray(obs).tolist()}).encode()
        s.sendall(struct.pack(">I", len(payload)) + payload)
        (n,) = struct.unpack(">I", _recv_exact(s, 4))
        msg = json.loads(_recv_exact(s, n))
    return np.asarray(msg["action"], np.float32)
