"""On-demand MVT→MLT encode server.

Line-protocol parity with the reference's ``cli/Server.java:10-61``: a TCP
server accepts one command line per connection, runs the CLI encoder with
those arguments in a handler thread, and prints any failure back to the
client (the reference's ``e.printStackTrace(out)``); ``run(port)`` returns
True immediately when a server is already listening (``isRunning`` probe).

The supported argument surface is the encode subset of the reference's
``Encode.java:1163-1196`` option names this repo implements:
``-mvt <path>`` (input tile), ``-mlt <path>`` (output file, default
input + ``.mlt``), ``-noids``, ``-enable-fastpfor``, ``-enable-fsst``.
Unknown options raise, and the error text goes to the client — the caller
sees the same failure surface as the reference. Each connection is served
on its own thread (``ThreadingTCPServer`` ≈ the reference's
``new Thread(() -> handleClient(client))``).

This is a serving-layer convenience around the same ``convert_mvt`` used
by the byte-exact CLI parity tests — nothing here touches the encode
semantics; at cluster scale the distributed ``tiler.transcode_tiles``
path is the real engine and this server exists for tooling parity.
"""

from __future__ import annotations

import shlex
import socket
import socketserver
import threading


def run_encode_command(argv: list[str]) -> str:
    """Execute one encode command (the reference's ``Encode.run(args)``).
    Returns a short status line (written back to the client on success)."""
    from maplibre_tile_spec_spark.functions.mlt_cli import convert_mvt

    src = None
    dst = None
    include_ids = True
    use_fastpfor = False
    use_fsst = False
    i = 0
    while i < len(argv):
        a = argv[i]
        if a in ("-mvt", "--mvt"):
            src = argv[i + 1]
            i += 2
        elif a in ("-mlt", "--mlt"):
            dst = argv[i + 1]
            i += 2
        elif a in ("-noids", "--noids"):
            include_ids = False
            i += 1
        elif a in ("-enable-fastpfor", "--enable-fastpfor"):
            use_fastpfor = True
            i += 1
        elif a in ("-enable-fsst", "--enable-fsst"):
            use_fsst = True
            i += 1
        else:
            raise ValueError(f"unsupported encode option: {a}")
    if src is None:
        raise ValueError("missing -mvt <input tile>")
    if dst is None:
        dst = src + ".mlt"
    with open(src, "rb") as f:
        data = f.read()
    out = convert_mvt(
        data, include_ids=include_ids, use_fastpfor=use_fastpfor, use_fsst=use_fsst
    )
    with open(dst, "wb") as f:
        f.write(out)
    return f"OK {dst} {len(out)}"


class _Handler(socketserver.StreamRequestHandler):
    def handle(self) -> None:  # one command line per connection
        line = self.rfile.readline().decode("utf-8", "replace").strip()
        if not line:
            return
        try:
            status = run_encode_command(shlex.split(line))
            self.wfile.write((status + "\n").encode())
        except Exception as e:  # error text to the client, like the reference
            self.wfile.write(f"ERROR {type(e).__name__}: {e}\n".encode())


class EncodeServer:
    """``run(port)`` semantics of the reference Server: no-op True when a
    server already answers on the port, else bind and serve."""

    def __init__(self) -> None:
        self._server: socketserver.ThreadingTCPServer | None = None
        self._thread: threading.Thread | None = None

    @staticmethod
    def is_running(port: int) -> bool:
        try:
            with socket.create_connection(("localhost", port), timeout=0.5):
                return True
        except OSError:
            return False

    def run(self, port: int = 3001, background: bool = True) -> bool:
        if self.is_running(port):
            return True
        try:
            socketserver.ThreadingTCPServer.allow_reuse_address = True
            self._server = socketserver.ThreadingTCPServer(("localhost", port), _Handler)
        except OSError:
            return False
        if background:
            self._thread = threading.Thread(target=self._server.serve_forever, daemon=True)
            self._thread.start()
        else:
            self._server.serve_forever()
        return True

    def shutdown(self) -> None:
        if self._server is not None:
            self._server.shutdown()
            self._server.server_close()
            self._server = None
