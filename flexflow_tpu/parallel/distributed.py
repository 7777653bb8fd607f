"""Multi-host (multi-process) serving/training scaffolding.

TPU-native replacement for the reference's multi-node story
(/root/reference/MULTI-NODE.md: mpirun launch + GASNet/UCX data movement +
NCCL collectives): here every host runs the same Python program,
``jax.distributed`` forms the global runtime, one ``jax.sharding.Mesh`` spans
all processes (DCN between hosts, ICI within), and GSPMD collectives ride the
right fabric from the sharding layout alone.

Serving model (reference: ONE background scheduler task + BatchConfigs
broadcast by-value to every shard via Legion futures,
request_manager.cc:2936 + request_manager.cu:81): host 0 is the controller —
it owns the request queue; follower hosts run the SAME RequestManager code
against the same engine, fed the same request stream through
:class:`RequestBroadcaster` (a length-prefixed pickle TCP fanout). Because
the scheduler is deterministic given (requests, seed), every process issues
identical jit calls with identical host values — exactly what a
multi-controller JAX program requires.

Validated by tests/test_distributed.py: two real jax.distributed processes on
CPU serve the same batch and produce identical tokens.
"""

from __future__ import annotations

import os
import pickle
import socket
import struct
from typing import Any, Optional

import jax


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids=None,
) -> None:
    """Form the global JAX runtime (reference: mpirun rendezvous).

    Arguments default from the environment: ``FF_COORDINATOR_ADDRESS``,
    ``FF_NUM_PROCESSES``, ``FF_PROCESS_ID`` (mirroring the reference's
    ``--nodes`` + MPI env). No-op when num_processes <= 1.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "FF_COORDINATOR_ADDRESS"
    )
    if num_processes is None:
        num_processes = int(os.environ.get("FF_NUM_PROCESSES", "1"))
    if process_id is None:
        process_id = int(os.environ.get("FF_PROCESS_ID", "0"))
    if num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )


def is_controller() -> bool:
    return jax.process_index() == 0


class RequestBroadcaster:
    """Host-0 -> followers fanout of (prompts, config, seed) tuples.

    The reference ships BatchConfigs through Legion futures; with a
    multi-controller JAX runtime the equivalent control-plane primitive is
    "every process sees the same request stream". Controller calls
    ``broadcast(obj)``; followers call ``recv()``. Messages are pickled with
    a 8-byte length prefix. ``None`` is the shutdown sentinel.
    """

    def __init__(self, port: int = 47551, host: Optional[str] = None):
        self.port = port
        self._conns = []
        if is_controller():
            n_follow = jax.process_count() - 1
            if n_follow:
                srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
                srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
                srv.bind(("0.0.0.0", port))
                srv.listen(n_follow)
                for _ in range(n_follow):
                    conn, _ = srv.accept()
                    self._conns.append(conn)
                srv.close()
        else:
            host = host or os.environ.get(
                "FF_COORDINATOR_ADDRESS", "127.0.0.1"
            ).split(":")[0]
            conn = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
            # the controller may bind a moment later than followers connect
            for _ in range(600):
                try:
                    conn.connect((host, port))
                    break
                except OSError:
                    import time

                    time.sleep(0.1)
            else:
                raise ConnectionError(f"controller at {host}:{port} not up")
            self._conns.append(conn)

    def broadcast(self, obj: Any) -> Any:
        assert is_controller()
        blob = pickle.dumps(obj)
        hdr = struct.pack("<Q", len(blob))
        for c in self._conns:
            c.sendall(hdr + blob)
        return obj

    def recv(self) -> Any:
        assert not is_controller()
        c = self._conns[0]
        hdr = b""
        while len(hdr) < 8:
            chunk = c.recv(8 - len(hdr))
            if not chunk:
                raise ConnectionError("controller closed")
            hdr += chunk
        (n,) = struct.unpack("<Q", hdr)
        blob = b""
        while len(blob) < n:
            chunk = c.recv(min(1 << 20, n - len(blob)))
            if not chunk:
                raise ConnectionError("controller closed mid-message")
            blob += chunk
        return pickle.loads(blob)

    def close(self) -> None:
        for c in self._conns:
            try:
                c.close()
            except OSError:
                pass


def serve_distributed(rm, broadcaster: RequestBroadcaster, prompts=None,
                      config=None):
    """One distributed generate(): controller broadcasts the workload, every
    process runs the identical deterministic scheduler loop.

    Controller passes real (prompts, config); followers pass None and receive
    them. Returns the requests list on every process (outputs identical)."""
    if is_controller():
        payload = (prompts, config)
        broadcaster.broadcast(payload)
    else:
        prompts, config = broadcaster.recv()
    return rm.generate(prompts, config)
