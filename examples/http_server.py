"""Minimal HTTP serving front-end over the continuous batcher.

Stdlib-only (no web framework): POST /generate with a JSON body

    {"prompt": ["tok1", "tok2"],   # tokens or token ids
     "max_length": 64,
     "stream": false,              # true -> SSE token stream
     "stop": [["</s>"]],           # optional stop sequences
     "temperature": 0.8}           # optional (sampled batchers)

Non-streaming responses return {"tokens": [...], "token_ids": [...],
"score": ...}; streaming responses emit one `data: {json}` SSE line per
token. Requests from many clients share the fixed decode slots
(iteration-level batching).

    python examples/http_server.py --model gpt2_ct2 --port 8000
"""

import argparse
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


def make_handler(batcher):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):
            pass

        def _json(self, code, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/stats":
                self._json(200, batcher.stats())
            else:
                self._json(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/generate":
                self._json(404, {"error": "unknown path"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(length))
                prompt = req["prompt"]
                kwargs = dict(
                    max_length=int(req.get("max_length", 128)),
                    min_length=int(req.get("min_length", 0)),
                    stop_sequences=req.get("stop"),
                )
                if req.get("temperature") is not None:
                    kwargs["sampling_temperature"] = float(
                        req["temperature"])
            except Exception as e:  # noqa: BLE001
                self._json(400, {"error": str(e)})
                return

            try:
                if req.get("stream"):
                    # Pull the first event BEFORE committing to a 200:
                    # submit-time validation errors raise at the first
                    # iteration of the stream generator.
                    it = batcher.stream(prompt, **kwargs)
                    try:
                        first = next(it)
                    except StopIteration:
                        first = None
                    except Exception as e:  # noqa: BLE001
                        self._json(400, {"error": str(e)})
                        return
                    self.send_response(200)
                    self.send_header("Content-Type", "text/event-stream")
                    self.end_headers()

                    def emit(sr):
                        line = json.dumps({
                            "token": sr.token, "token_id": sr.token_id,
                            "step": sr.step, "is_last": sr.is_last})
                        self.wfile.write(f"data: {line}\n\n".encode())
                        self.wfile.flush()

                    if first is not None:
                        emit(first)
                        for sr in it:
                            emit(sr)
                    self.wfile.write(b"data: [DONE]\n\n")
                else:
                    r = batcher.submit(prompt, **kwargs).result()
                    self._json(200, {
                        "tokens": r.sequences[0],
                        "token_ids": r.sequences_ids[0],
                        "score": r.scores[0]})
            except Exception as e:  # noqa: BLE001
                try:
                    self._json(500, {"error": str(e)})
                except Exception:  # noqa: BLE001
                    pass

    return Handler


def serve(batcher, port: int = 8000, host: str = "127.0.0.1"):
    server = ThreadingHTTPServer((host, port), make_handler(batcher))
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    return server


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", required=True)
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--num_slots", type=int, default=8)
    p.add_argument("--capacity", type=int, default=1024)
    p.add_argument("--speculation_k", type=int, default=0)
    args = p.parse_args()

    import ctranslate2_tpu

    gen = ctranslate2_tpu.Generator(args.model)
    batcher = ctranslate2_tpu.ContinuousBatcher(
        gen, num_slots=args.num_slots, capacity=args.capacity,
        speculation_k=args.speculation_k)
    server = serve(batcher, port=args.port)
    print(f"serving on :{args.port} (POST /generate, GET /stats)")
    try:
        threading.Event().wait()
    except KeyboardInterrupt:
        server.shutdown()
        server.server_close()
        batcher.close()


if __name__ == "__main__":
    main()
