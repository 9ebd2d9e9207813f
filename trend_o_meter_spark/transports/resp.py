"""RESP2 — the Redis serialization protocol (public spec:
https://redis.io/docs/reference/protocol-spec/), dependency-free.

Five frame types, all CRLF-terminated:

* simple string  ``+OK\\r\\n``
* error          ``-ERR msg\\r\\n``
* integer        ``:42\\r\\n``
* bulk string    ``$5\\r\\nhello\\r\\n`` (``$-1\\r\\n`` = null)
* array          ``*2\\r\\n<frame><frame>`` (``*-1\\r\\n`` = null)

Commands encode as arrays of bulk strings.  :class:`RespConnection`
wraps a TCP socket with a buffered reader; pub/sub *push* frames arrive
as ordinary arrays, read with the same :meth:`RespConnection.read_reply`.
"""

from __future__ import annotations

import socket

CRLF = b"\r\n"


def encode_command(*args: str | bytes | int) -> bytes:
    """Encode a command as a RESP array of bulk strings."""
    out = [b"*%d" % len(args), CRLF]
    for a in args:
        if isinstance(a, int):
            a = str(a).encode()
        elif isinstance(a, str):
            a = a.encode()
        out += [b"$%d" % len(a), CRLF, a, CRLF]
    return b"".join(out)


class RespError(Exception):
    """Server-side ``-ERR`` reply."""


class RespConnection:
    """Minimal blocking RESP2 client connection."""

    def __init__(self, host: str, port: int, timeout: float = 10.0):
        self.sock = socket.create_connection((host, port), timeout=timeout)
        self._buf = b""
        # Monotonic count of framing units (lines / bulk payloads) split off
        # the stream.  A caller whose read_reply() raised mid-frame compares
        # this against a pre-call snapshot: unchanged => every received byte
        # is still in _buf and the stream is frame-aligned; changed => the
        # frame header / early elements are gone and the connection can only
        # resync by reconnecting (firehose_bridge._drain's desync guard).
        self._consumed = 0

    # -- framing ---------------------------------------------------------

    def _read_line(self) -> bytes:
        while CRLF not in self._buf:
            chunk = self.sock.recv(65536)
            if not chunk:
                raise ConnectionError("connection closed mid-frame")
            self._buf += chunk
        line, self._buf = self._buf.split(CRLF, 1)
        self._consumed += 1
        return line

    def _read_exact(self, n: int) -> bytes:
        while len(self._buf) < n + 2:  # payload + trailing CRLF
            chunk = self.sock.recv(65536)
            if not chunk:
                raise ConnectionError("connection closed mid-bulk")
            self._buf += chunk
        data, self._buf = self._buf[:n], self._buf[n + 2 :]
        self._consumed += 1
        return data

    def read_reply(self):
        """One frame -> python value (bytes / int / list / None)."""
        line = self._read_line()
        kind, rest = line[:1], line[1:]
        if kind == b"+":
            return rest
        if kind == b"-":
            raise RespError(rest.decode(errors="replace"))
        if kind == b":":
            return int(rest)
        if kind == b"$":
            n = int(rest)
            return None if n == -1 else self._read_exact(n)
        if kind == b"*":
            n = int(rest)
            return None if n == -1 else [self.read_reply() for _ in range(n)]
        raise RespError(f"unknown RESP type byte {kind!r}")

    # -- request/response ------------------------------------------------

    def command(self, *args: str | bytes | int):
        self.sock.sendall(encode_command(*args))
        return self.read_reply()

    def close(self) -> None:
        try:
            self.sock.close()
        except OSError:
            pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
