"""HTTP verification service.

Counterpart of the reference's Go verifier server
(``recursive-verifier/cmd/server/main.go:19-120``): ``POST /api/v1/verify``
with a JSON body referencing a prepared scheme and carrying the proof
transcript; returns structured 400s on malformed input, 200 on success.

Run: ``python -m provekit_tpu.server --scheme scheme.nps [--port 8080]``
"""

from __future__ import annotations

import argparse
import json
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

MAX_BODY = 2 << 30  # 2 GB, matching the reference server's body limit


def make_handler(scheme):
    class Handler(BaseHTTPRequestHandler):
        def _reply(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Access-Control-Allow-Origin", "*")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):  # noqa: N802
            if self.path != "/api/v1/verify":
                self._reply(404, {"error": "not found"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                if length > MAX_BODY:
                    self._reply(400, {"error": "body too large"})
                    return
                doc = json.loads(self.rfile.read(length))
                transcript = bytes.fromhex(doc["transcript"])
            except (ValueError, KeyError) as e:
                self._reply(400, {"error": f"malformed request: {e}"})
                return
            try:
                from .compiler.scheme import NoirProof
                scheme.verify(NoirProof(transcript=transcript))
            except Exception as e:
                self._reply(400, {"error": f"verification failed: {e}"})
                return
            self._reply(200, {"status": "verified"})

        def log_message(self, fmt, *args):  # quiet
            pass

    return Handler


def main(argv=None):
    p = argparse.ArgumentParser(prog="provekit-tpu-server")
    p.add_argument("--scheme", required=True, help=".nps scheme file")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--host", default="127.0.0.1")
    args = p.parse_args(argv)

    from .io import files
    scheme = files.read(args.scheme)
    server = ThreadingHTTPServer((args.host, args.port), make_handler(scheme))
    print(f"verify server on http://{args.host}:{args.port}/api/v1/verify")
    server.serve_forever()


if __name__ == "__main__":
    main()
