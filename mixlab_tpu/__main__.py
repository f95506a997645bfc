"""CLI entry point: ``python -m mixlab_tpu [--listen HOST:PORT] [--sample-rate N] workspace.mixlab``.

Rebuild of ``src/main.rs``: structopt-style options (--listen defaulting to
127.0.0.1:8000, positional workspace path), logging init, then the server
event loop on the single disambiguated port.
"""

from __future__ import annotations

import argparse
import os
import asyncio
import logging


def main():
    parser = argparse.ArgumentParser(prog="mixlab_tpu")
    parser.add_argument("--listen", default="127.0.0.1:8000", help="listen address")
    parser.add_argument(
        "--sample-rate", type=int, default=44_100, help="engine sample rate"
    )
    parser.add_argument("workspace_path", help="project file (.mixlab)")
    args = parser.parse_args()

    logging.basicConfig(level=logging.INFO)

    from mixlab_tpu.utils.platform import apply_env_platform

    apply_env_platform()

    from mixlab_tpu.engine.config import EngineConfig
    from mixlab_tpu.engine.project import open_or_create
    from mixlab_tpu.server.app import run_server

    host, _, port = args.listen.rpartition(":")
    project = open_or_create(
        args.workspace_path, EngineConfig(sample_rate=args.sample_rate)
    )

    async def amain():
        import signal

        tcp, _server = await run_server(project, host or "127.0.0.1", int(port))
        logging.info("mixlab-tpu listening on http://%s", args.listen)
        stop = asyncio.Event()
        # graceful SIGTERM: the fleet agent stops workers with terminate()
        # (server/fleet.py) and the coalescing persist writer must flush —
        # the default SIGTERM disposition would skip the finally block
        loop = asyncio.get_running_loop()
        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                loop.add_signal_handler(sig, stop.set)
            except (NotImplementedError, RuntimeError):
                pass
        async with tcp:
            await stop.wait()
        logging.info("mixlab-tpu shutting down")

    try:
        asyncio.run(amain())
    except KeyboardInterrupt:
        pass
    finally:
        project.engine.stop()
        project.close()
        # persistence is flushed; daemon threads may still be inside native
        # code (a device dispatch on a saturated backend) — normal
        # interpreter teardown races them and can SIGSEGV, so exit hard
        logging.shutdown()
        os._exit(0)


if __name__ == "__main__":
    main()
