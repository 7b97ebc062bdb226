"""``python -m rt_rs_tpu.web --path scenes/default.json``"""

import argparse

from rt_rs_tpu.web import serve


def main() -> int:
    p = argparse.ArgumentParser(prog="rt_rs_tpu.web")
    p.add_argument("--path", default="/root/reference/scenes/default.json")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--handler", default="pbvh")
    p.add_argument("--width", type=int, default=320)
    p.add_argument("--height", type=int, default=240)
    args = p.parse_args()
    serve(
        args.path, host=args.host, port=args.port, handler=args.handler,
        size=(args.width, args.height),
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
