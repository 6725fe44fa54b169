#!/usr/bin/env python3
"""RaQuet tile server + browser viewer (see raquet_spark/serve.py for
the implementation; this example keeps the reference repo's layout —
reference examples/server_viewer.py — and stays runnable standalone).

Usage:
    python examples/server_viewer.py [--port 8000] [--file path.parquet]

Also available as: python -m raquet_spark serve --port 8000 --file ...
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from raquet_spark.serve import (  # noqa: E402,F401
    TileHandler,
    band_to_uint8,
    fetch_tile,
    get_metadata,
    make_server,
    render_tile,
)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--file", help="default RaQuet parquet path")
    args = ap.parse_args()
    srv = make_server(args.port, args.file)
    print(f"raquet_spark tile server at http://127.0.0.1:{srv.server_address[1]}")
    srv.serve_forever()


if __name__ == "__main__":
    main()
