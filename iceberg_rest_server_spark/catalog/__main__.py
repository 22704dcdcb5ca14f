"""CLI mirroring the reference binary's commands
(crates/iceberg-catalog-bin/src/main.rs:29-39: Migrate / Serve /
Healthcheck / Version).

    python -m iceberg_rest_server_spark.catalog serve [--port N]
    python -m iceberg_rest_server_spark.catalog healthcheck [--url U]
    python -m iceberg_rest_server_spark.catalog migrate
    python -m iceberg_rest_server_spark.catalog version

`serve` runs the catalog server in the foreground on the given port.
`migrate` is the schema-setup step; this implementation's store is
in-process (no Postgres), so there is no schema to migrate — it
validates configuration and exits 0, matching the reference's
idempotent-migrate contract (main.rs:125-133). `healthcheck` probes
GET /health exactly as main.rs:141-152 does and exits non-zero on
failure.
"""

from __future__ import annotations

import argparse
import json
import sys
import urllib.request


def _version() -> str:
    return "0.4.0"


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="iceberg-rest-server-spark")
    sub = parser.add_subparsers(dest="command")
    serve_p = sub.add_parser("serve", help="run the catalog server (foreground)")
    serve_p.add_argument("--port", type=int, default=8080)
    hc_p = sub.add_parser("healthcheck", help="probe GET /health")
    hc_p.add_argument("--url", default="http://127.0.0.1:8080")
    sub.add_parser("migrate", help="validate storage configuration (no-op: in-process store)")
    sub.add_parser("version", help="print the server version")
    args = parser.parse_args(argv)

    if args.command == "version":
        print(_version())
        return 0
    if args.command == "migrate":
        # the reference runs sqlx migrations here; the in-process store
        # needs none — succeed idempotently like main.rs:125-133
        print("migrate: nothing to do (in-process store)")
        return 0
    if args.command == "healthcheck":
        try:
            with urllib.request.urlopen(f"{args.url}/health", timeout=5) as resp:
                body = json.loads(resp.read() or b"{}")
                ok = resp.status == 200 and body.get("status") == "ok"
        except Exception as exc:  # connection refused, timeout, bad body
            print(f"unhealthy: {exc}", file=sys.stderr)
            return 1
        print("healthy" if ok else "unhealthy")
        return 0 if ok else 1
    if args.command == "serve":
        from .server import ServerThread

        server = ServerThread(port=args.port)
        print(f"serving on {server.base_url} (Ctrl-C to stop)", flush=True)
        try:
            # foreground: run the HTTP loop on this thread
            server.httpd.serve_forever()
        except KeyboardInterrupt:
            pass
        finally:
            server.httpd.server_close()
        return 0
    parser.print_help()
    return 2


if __name__ == "__main__":
    raise SystemExit(main())
