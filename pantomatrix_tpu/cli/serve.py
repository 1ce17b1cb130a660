"""Run the motion-serving daemon (serve_http.MotionServer).

No reference equivalent: the reference's "serve" surface is a batch CLI over a
wav folder (/root/reference/test_emage_audio.py:71-105). This daemon serves
many concurrent interactive audio streams from one chip by batching their
window steps (PROFILE.md multi-client table).

Usage:
    python -m pantomatrix_tpu.cli.serve --model_path <ckpt_root> \
        [--host 0.0.0.0] [--port 8799] [--batch 8]
    python -m pantomatrix_tpu.cli.serve --random_init   # smoke/demo weights

Prints one JSON line with the bound address, then serves until SIGINT.
"""
import argparse
import json


def build_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=8799)
    p.add_argument("--batch", type=int, default=8,
                   help="pump-wave batch: max sessions stepped per device call")
    p.add_argument("--max_sessions", type=int, default=64,
                   help="opens beyond this get HTTP 503 (existing streams keep "
                        "their latency budget)")
    p.add_argument("--idle_timeout", type=float, default=600.0,
                   help="seconds of no feed/read before a session is evicted")
    p.add_argument("--model_path", type=str, default=None,
                   help="local checkpoint root (audio model + emage_vq/* subdirs)")
    p.add_argument("--random_init", action="store_true")
    return p


def main():
    args = build_parser().parse_args()

    from .test_emage import load_models
    from ..serve_http import MotionServer

    model, vq = load_models(args)
    server = MotionServer(model, vq, batch=args.batch,
                          host=args.host, port=args.port,
                          max_sessions=args.max_sessions,
                          idle_timeout_s=args.idle_timeout).start()
    print(json.dumps({"serving": True, "host": server.host,
                      "port": server.port, "batch": args.batch,
                      "max_sessions": args.max_sessions}), flush=True)
    try:
        import time

        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        server.stop()


if __name__ == "__main__":
    main()
