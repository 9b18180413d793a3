"""Live per-input log streaming for remote_parallel_map.

The reference streams each input's stdout to the client WHILE the job
runs (node_service/src/node_service/worker_client.py:154-338 —
JobLogWriter tails worker pipes and relays lines live); rounds 1-2 only
delivered stdout WITH the result rows, so a user watching a 2-hour job
saw nothing until tasks finished.

Spark's own channels can't do better: accumulator updates and task
metrics reach the driver only at task COMPLETION. So the engine opens
its own side-channel — a tiny length-prefixed TCP listener on the
driver; each worker pushes (input_index, stdout_text) right after the
input finishes, inside the running task. Executors can always reach
the driver host (they already hold RPC/shuffle connections to it), so
the channel works in local mode and on a real cluster alike.

Delivery contract: exactly-once per input. A successful live push
CLEARS the stdout field in the result row (the worker owns that
decision, so there is no double-delivery race); a failed push — driver
unreachable, channel disabled — leaves stdout in the row and it is
delivered with the result, the round-1 behavior. Log delivery must
never fail a job: every socket operation is wrapped and silently falls
back.
"""

from __future__ import annotations

import pickle
import socket
import struct
import threading
from collections.abc import Callable

_LEN = struct.Struct(">I")
_MAX_MSG = 1_000_000  # mirror the reference's 1 MB log-response cap


class MessageStreamServer:
    """Driver-side listener: accepts worker connections and invokes
    ``sink(obj)`` for each pickled message as it arrives (from listener
    threads — the sink must be thread-safe; appending to a list or
    putting on a queue.Queue both are).

    Use as a context manager around the job action; ``advertise`` is
    the (host, port) workers should connect to."""

    def __init__(self, sink: Callable[[object], None], host: str, max_msg: int = _MAX_MSG):
        self._obj_sink = sink
        self._host = host
        self._max_msg = max_msg
        self._srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._srv.bind(("0.0.0.0", 0))
        self._srv.listen(128)
        self._port = self._srv.getsockname()[1]
        self._closed = False
        self._threads: list[threading.Thread] = []

    @property
    def advertise(self) -> tuple[str, int]:
        return (self._host, self._port)

    def __enter__(self) -> "LogStreamServer":
        t = threading.Thread(target=self._accept_loop, daemon=True)
        t.start()
        self._threads.append(t)
        return self

    def _accept_loop(self) -> None:
        while not self._closed:
            try:
                conn, _ = self._srv.accept()
            except OSError:
                return  # closed
            t = threading.Thread(target=self._read_loop, args=(conn,), daemon=True)
            t.start()
            self._threads.append(t)

    def _read_loop(self, conn: socket.socket) -> None:
        try:
            with conn:
                while True:
                    head = self._recv_exact(conn, _LEN.size)
                    if head is None:
                        return
                    (size,) = _LEN.unpack(head)
                    if size > self._max_msg:
                        return
                    body = self._recv_exact(conn, size)
                    if body is None:
                        return
                    obj = pickle.loads(body)
                    try:
                        self._obj_sink(obj)
                    except Exception:  # noqa: BLE001 — sink bugs can't kill the reader
                        pass
        except Exception:  # noqa: BLE001 — message channel is best-effort
            pass

    @staticmethod
    def _recv_exact(conn: socket.socket, n: int) -> bytes | None:
        buf = b""
        while len(buf) < n:
            chunk = conn.recv(n - len(buf))
            if not chunk:
                return None
            buf += chunk
        return buf

    def __exit__(self, *exc) -> None:
        self._closed = True
        try:
            self._srv.close()
        except OSError:
            pass


class LogStreamServer(MessageStreamServer):
    """MessageStreamServer specialized to (input_index, stdout_text)
    log messages: invokes ``sink(idx, text)``."""

    def __init__(self, sink: Callable[[int, str], None], host: str):
        super().__init__(lambda obj: sink(int(obj[0]), obj[1]), host)


class MessageStreamClient:
    """Worker-side push channel: one lazy connection per task. Every
    method is failure-proof — a dead driver socket degrades to the
    fallback delivery path, never to a task failure."""

    def __init__(self, host: str, port: int, max_msg: int = _MAX_MSG):
        self._addr = (host, port)
        self._max_msg = max_msg
        self._sock: socket.socket | None = None
        self._dead = False

    def send_obj(self, obj: object) -> bool:
        """Push one pickled message; True iff delivered."""
        if self._dead:
            return False
        try:
            if self._sock is None:
                self._sock = socket.create_connection(self._addr, timeout=2)
            body = pickle.dumps(obj)
            if len(body) > self._max_msg:
                return False
            self._sock.sendall(_LEN.pack(len(body)) + body)
            return True
        except Exception:  # noqa: BLE001
            self._dead = True
            try:
                if self._sock is not None:
                    self._sock.close()
            except Exception:  # noqa: BLE001
                pass
            self._sock = None
            return False

    def close(self) -> None:
        try:
            if self._sock is not None:
                self._sock.close()
        except Exception:  # noqa: BLE001
            pass
        self._sock = None


class LogStreamClient(MessageStreamClient):
    """MessageStreamClient specialized to (input_index, stdout_text)."""

    def send(self, idx: int, text: str) -> bool:
        if not text:
            return False
        return self.send_obj((idx, text))
