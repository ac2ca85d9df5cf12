#!/usr/bin/env python
"""HTTP demo server (reference: demo_server.py — SURVEY.md §2.12/§3.4).

The reference used falcon (unavailable here); this is stdlib http.server.
GET /synthesize?text=...&speaker_id=N → audio/wav
GET /            → minimal HTML form
"""

import argparse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from tacotron_multispeaker_tpu.config import get_config
from tacotron_multispeaker_tpu.synthesizer import Synthesizer

HTML = b"""<!doctype html><title>tacotron tpu demo</title>
<h3>tacotron-multispeaker-tpu</h3>
<form action=/synthesize>
<input name=text size=60 placeholder="Type something...">
<input name=speaker_id value=0 size=4>
<button>Speak</button></form>"""


class Handler(BaseHTTPRequestHandler):
    synthesizer: Synthesizer = None

    def do_GET(self):
        url = urlparse(self.path)
        if url.path == "/":
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.end_headers()
            self.wfile.write(HTML)
            return
        if url.path == "/synthesize":
            q = parse_qs(url.query)
            text = (q.get("text") or [""])[0]
            sid = int((q.get("speaker_id") or ["0"])[0])
            if not text:
                self.send_error(400, "missing text")
                return
            wav = self.synthesizer.synthesize(text, sid)
            self.send_response(200)
            self.send_header("Content-Type", "audio/wav")
            self.send_header("Content-Length", str(len(wav)))
            self.end_headers()
            self.wfile.write(wav)
            return
        self.send_error(404)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint_dir", required=True)
    p.add_argument("--preset", default="single_speaker")
    p.add_argument("--hparams", default="")
    p.add_argument("--port", type=int, default=9000)
    p.add_argument("--platform", default=None, choices=["cpu", "axon"],
                   help="force the JAX platform (e.g. cpu for fast tiny-"
                        "preset debug runs; this jaxlib ignores the "
                        "JAX_PLATFORMS env var)")
    args = p.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)


    cfg = get_config(args.preset, args.hparams)
    Handler.synthesizer = Synthesizer(cfg).load(args.checkpoint_dir)
    print(f"warming up compile cache (all input buckets)...")
    Handler.synthesizer.warmup()
    print(f"serving on http://localhost:{args.port}")
    ThreadingHTTPServer(("0.0.0.0", args.port), Handler).serve_forever()


if __name__ == "__main__":
    main()
