"""Measure end-to-end render-server throughput (ROADMAP "serving").

Starts a RenderServer in-process (random or saved weights), then drives it
with concurrent clients over the unix socket — the full production path:
socket framing + dynamic batching + device render + reply encode. Unlike
bench.py's device-only chain, this number includes every host-side cost a
real serving deployment pays.

Usage: python tools/bench_serve.py [n_clients] [reqs_per_client] [strings_per_req] [--int8] [--format raw|rle|zlib]
Prints one JSON line with strings/sec and glyphs/sec (end-to-end).
``--int8``: serve the quantized int8 x int8 projection (`afr serve --int8`
path) — the A/B against the default full-precision serve.
``--format``: reply encoding. The measured serve-loop ceiling is the
1-core host pushing raw reply bytes (~196 MB per bench run, RESULTS.md);
rle/zlib trade compress CPU for a ~10-50x smaller reply — this flag is
the A/B that decides whether that trade wins.
"""

from __future__ import annotations

import os as _os, sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import os
import sys
import threading
import time

import jax

from ai_font_renderer_tpu.config import ModelConfig
from ai_font_renderer_tpu.models import font_renderer
from ai_font_renderer_tpu.render.server import RenderServer, request_render

SOCK = "/tmp/afr_bench.sock"


def main() -> None:
    # Opt-in hang diagnostics: AFR_BENCH_DUMP_AFTER=<seconds> dumps every
    # thread's stack to stderr after that long, then exits — a watchdog for
    # deadlocks in the serve path that only reproduce under live load.
    dump_after = os.environ.get("AFR_BENCH_DUMP_AFTER")
    if dump_after:
        import faulthandler

        faulthandler.dump_traceback_later(float(dump_after), exit=True)
    int8 = "--int8" in sys.argv
    fmt = "raw"
    if "--format" in sys.argv:
        i = sys.argv.index("--format")
        if i + 1 >= len(sys.argv):
            raise SystemExit("--format needs a value (raw|rle|zlib|bmp, comma-separated)")
        fmt = sys.argv[i + 1]
    else:
        # --format=rle equals-form: catch it rather than silently
        # benchmarking raw (the A/B would measure the wrong thing after
        # the TPU warmup already ran).
        eq = [a for a in sys.argv if a.startswith("--format=")]
        if eq:
            fmt = eq[-1].split("=", 1)[1]
    # Comma-separated formats run the A/B inside ONE process/server: each
    # TPU process claims the device, and back-to-back processes serialize
    # behind the previous claim's ~10 min stale-grant timeout (measured:
    # a second bench process hung its warmup fetch for minutes; see
    # extended_runs/bench_serve_formats_r4.log history).
    fmts = [f.strip() for f in fmt.split(",") if f.strip()]
    argv = sys.argv[1:]
    if "--format" in argv:
        i = argv.index("--format")
        argv = argv[:i] + argv[i + 2 :]
    args = [a for a in argv if not a.startswith("--")]
    n_clients = int(args[0]) if len(args) > 0 else 8
    reqs = int(args[1]) if len(args) > 1 else 20
    per_req = int(args[2]) if len(args) > 2 else 64

    mcfg = ModelConfig()
    if os.path.exists("font_renderer.npz"):
        from ai_font_renderer_tpu.utils.checkpoint import load_params

        params = load_params("font_renderer.npz")
        mcfg = font_renderer.infer_model_config(params, mcfg)
    else:
        params = font_renderer.init(jax.random.PRNGKey(0), mcfg)

    if os.path.exists(SOCK):
        os.unlink(SOCK)
    server = RenderServer(params, mcfg, socket_path=SOCK, batch_size=256, int8=int8)
    server.start()

    strings = [
        ("HELLO WORLD " * 9)[: 10 + (i * 7) % 90] for i in range(per_req)
    ]
    glyphs_per_req = sum(len(s) for s in strings)

    for fmt in fmts:
        # Warm (compile + first batch) outside the timed window.
        _, warm = request_render(SOCK, strings[:4], fmt=fmt)
        assert len(warm) == 4

        done = [0] * n_clients

        def client(ci: int) -> None:
            for _ in range(reqs):
                _, sheets = request_render(SOCK, strings, fmt=fmt)
                assert len(sheets) == per_req
                done[ci] += 1

        threads = [
            threading.Thread(target=client, args=(i,)) for i in range(n_clients)
        ]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        dt = time.perf_counter() - t0

        total_strings = n_clients * reqs * per_req
        total_glyphs = n_clients * reqs * glyphs_per_req
        print(
            json.dumps(
                {
                    "metric": "serve_strings_per_sec",
                    "value": round(total_strings / dt, 1),
                    "unit": "strings/sec",
                    "glyphs_per_sec": round(total_glyphs / dt, 1),
                    "clients": n_clients,
                    "batch_size": 256,
                    "int8": int8,
                    "format": fmt,
                    "wall_s": round(dt, 2),
                }
            ),
            flush=True,
        )
    server.stop()


if __name__ == "__main__":
    main()
