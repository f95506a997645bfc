"""Deterministic asyncio-loop teardown for socket-server tests.

Closing a loop while handler coroutines are still pending leaves them to
be GC'd mid-await — surfacing as PytestUnraisableExceptionWarning noise
in *later* tests ("coroutine ignored GeneratorExit" / "Event loop is
closed").  These helpers cancel and drain every task first, so a test's
server dies inside the test that started it.
"""

from __future__ import annotations

import asyncio
import threading


def drain_and_close(loop: asyncio.AbstractEventLoop) -> None:
    """Cancel all pending tasks, let them unwind, then close the loop.
    Call from the thread that owns the loop (it must not be running)."""
    tasks = asyncio.all_tasks(loop)
    for task in tasks:
        task.cancel()
    if tasks:
        loop.run_until_complete(asyncio.gather(*tasks, return_exceptions=True))
    loop.run_until_complete(loop.shutdown_asyncgens())
    loop.run_until_complete(loop.shutdown_default_executor())
    loop.close()


def run_loop_thread(main_coro_factory, loop=None):
    """Run ``await main_coro_factory()`` on a dedicated loop thread.

    Returns ``(loop, thread)``.  Stop with :func:`stop_loop_thread`; the
    thread drains and closes its own loop on the way out.
    """
    loop = loop or asyncio.new_event_loop()

    def run():
        asyncio.set_event_loop(loop)
        try:
            loop.run_until_complete(main_coro_factory())
        except (asyncio.CancelledError, Exception):
            pass
        finally:
            drain_and_close(loop)

    t = threading.Thread(target=run, daemon=True)
    t.start()
    return loop, t


def stop_loop_thread(loop, thread, timeout: float = 10.0) -> None:
    """Cancel everything on a loop owned by another thread and join it."""

    def _cancel():
        for task in asyncio.all_tasks(loop):
            task.cancel()

    try:
        loop.call_soon_threadsafe(_cancel)
    except RuntimeError:
        pass  # loop already closed
    thread.join(timeout)
