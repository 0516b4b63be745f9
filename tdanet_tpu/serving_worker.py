"""Process-recycling host for the streaming serving engines.

The axon TPU client leaks ~250 KB of host RSS per dispatch (measured
round 2, docs/PERF.md soak section — plugin RPC layer, not repo code),
so a multi-hour streaming deployment in one process dies by OOM. The
documented recovery story is that serving state is reconstructible from
overlap tails; this module is the machinery that actually does it:

- ``_worker_main``: subprocess entry hosting a ``MultiStreamSeparator``
  (model rebuilt from the registry, params from a numpy pytree), driven
  over a multiprocessing Pipe with a tiny command protocol;
- ``RecyclingMultiStreamSeparator``: parent-side proxy with the same
  open/push/step/flush surface; ``recycle()`` exports the engine state
  from the old worker, spawns a fresh process, restores the state there,
  and retires the old one — ZERO dropped or repeated hops, bounded RSS
  per worker generation. ``max_steps_per_worker`` auto-recycles.

No reference counterpart (the reference's long-form path is a one-shot
offline loop, audio_test_css.py:104-137); this is production serving
hardening for the tunneled-TPU environment.
"""

from __future__ import annotations

import multiprocessing as mp
import os
from typing import Any, Dict, Optional

import numpy as np


def _worker_main(conn, model_name: str, model_kwargs: dict,
                 engine_kwargs: dict, params, state: Optional[dict],
                 platform: Optional[str]) -> None:
    """Child entry (spawn context): build the engine, serve the pipe."""
    try:
        import jax
        if platform:
            try:
                jax.config.update("jax_platforms", platform)
            except Exception:
                pass  # backend already initialized; use what's there
        from tdanet_tpu import models as zoo
        from tdanet_tpu.serving import MultiStreamSeparator

        model = zoo.get(model_name)(**model_kwargs)
        engine = MultiStreamSeparator(model, params, **engine_kwargs)
        if state:
            engine.restore_state(state)
        conn.send(("ready", os.getpid()))
    except Exception as e:  # startup failure must not hang the parent
        conn.send(("error", f"{type(e).__name__}: {e}"))
        return

    while True:
        try:
            cmd, args = conn.recv()
        except (EOFError, OSError):
            return
        try:
            if cmd == "open":
                engine.open(args)
                out = None
            elif cmd == "close":
                engine.close(args)
                out = None
            elif cmd == "push":
                engine.push(args[0], args[1])
                out = None
            elif cmd == "step":
                out = engine.step()
            elif cmd == "flush":
                out = engine.flush(args)
            elif cmd == "export_state":
                out = engine.export_state()
            elif cmd == "restore_state":
                engine.restore_state(args)
                out = None
            elif cmd == "rss_kb":
                import resource
                out = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
            elif cmd == "stop":
                conn.send(("ok", None))
                return
            else:
                raise ValueError(f"unknown command {cmd!r}")
            conn.send(("ok", out))
        except Exception as e:
            conn.send(("error", f"{type(e).__name__}: {e}"))


class WorkerError(RuntimeError):
    pass


class RecyclingMultiStreamSeparator:
    """MultiStreamSeparator surface over a recyclable subprocess worker.

    Streams survive worker recycles: buffered samples + overlap tails are
    handed off, so stitching continuity (permutation alignment against the
    previous segment's tails) is preserved across process generations.

    Args mirror MultiStreamSeparator; the model is specified by registry
    name + kwargs because it must be reconstructible in a fresh process.
    ``max_steps_per_worker`` (0 = never) auto-recycles BETWEEN hops.
    ``prewarm=True`` keeps a STANDBY worker compiled in the background,
    making a recycle a state handoff (~ms) instead of a cold spawn +
    trace (~1-2 min on a TPU) — use for tight hop deadlines.
    """

    def __init__(self, model_name: str, model_kwargs: dict, params,
                 max_steps_per_worker: int = 0, platform: Optional[str] =
                 None, start_timeout: float = 600.0, prewarm: bool = False,
                 **engine_kwargs):
        self._spec = (model_name, dict(model_kwargs), dict(engine_kwargs))
        import jax
        self._params = jax.tree_util.tree_map(np.asarray, params)
        self._platform = platform
        self._timeout = start_timeout
        self._max_steps = max_steps_per_worker
        self._prewarm = prewarm
        self._steps_this_worker = 0
        self.generation = 0
        self._ctx = mp.get_context("spawn")
        self._proc = None
        self._conn = None
        self._standby = None  # (proc, conn) launched but not yet adopted
        self._proc, self._conn = self._adopt(self._launch())
        self.generation += 1
        if self._prewarm:
            self._standby = self._launch()

    # -- lifecycle ---------------------------------------------------------

    def _launch(self):
        """Start a worker process (returns (proc, conn) immediately; the
        'ready' handshake is consumed at adoption time so a standby can
        compile in the background)."""
        name, model_kwargs, engine_kwargs = self._spec
        parent, child = self._ctx.Pipe()
        proc = self._ctx.Process(
            target=_worker_main,
            args=(child, name, model_kwargs, engine_kwargs, self._params,
                  None, self._platform),
            daemon=True)
        proc.start()
        child.close()
        return proc, parent

    def _adopt(self, launched):
        """Wait for a launched worker's ready handshake."""
        proc, conn = launched
        if not conn.poll(self._timeout):
            proc.terminate()
            raise WorkerError("worker startup timed out")
        try:
            status, payload = conn.recv()
        except (EOFError, OSError) as e:
            # pipe closed = the worker died before the handshake (spawn
            # failure, OOM); keep the module's WorkerError contract and
            # don't leak the process
            proc.join(timeout=5)
            if proc.is_alive():
                proc.terminate()
            raise WorkerError(
                f"worker died before ready handshake "
                f"(exitcode={proc.exitcode})") from e
        if status != "ready":
            proc.join(timeout=5)
            raise WorkerError(f"worker startup failed: {payload}")
        return proc, conn

    def _poison(self):
        """Kill a worker whose pipe can no longer be trusted. After a
        command times out, the wedged worker's LATE reply would be
        consumed as the response to the NEXT command — recycle() would
        restore a step dict as engine state, a retried step() would
        silently return the previous hop's audio. The only safe move is
        to kill the worker and force an explicit respawn()."""
        proc, conn = self._proc, self._conn
        self._proc = self._conn = None
        if conn is not None:
            try:
                conn.close()
            except OSError:
                pass
        if proc is not None:
            proc.terminate()
            proc.join(timeout=10)

    def _rpc(self, cmd: str, args: Any = None):
        if self._conn is None:
            raise WorkerError(
                f"no live worker for {cmd!r}: a previous command timed "
                f"out and the worker was killed — call respawn()")
        try:
            self._conn.send((cmd, args))
            if not self._conn.poll(self._timeout):
                self._poison()
                raise WorkerError(
                    f"worker timed out on {cmd!r}; worker killed to "
                    f"keep the pipe in sync (its late reply would be "
                    f"mistaken for the next command's) — call "
                    f"respawn(); streams restart from scratch")
            status, payload = self._conn.recv()
        except (BrokenPipeError, EOFError, OSError) as e:
            exitcode = self._proc.exitcode if self._proc is not None \
                else None
            raise WorkerError(
                f"worker died during {cmd!r} "
                f"(exitcode={exitcode})") from e
        if status == "error":
            raise WorkerError(payload)
        return payload

    def respawn(self) -> None:
        """Start a fresh worker after the current one was killed (RPC
        timeout poison) or died. Unlike recycle(), NO state is carried
        over — recycle needs a live worker to export from — so streams
        must be re-opened and stitch continuity restarts."""
        self._poison()
        nxt = self._standby if self._standby is not None else self._launch()
        self._standby = None
        self._proc, self._conn = self._adopt(nxt)
        self._steps_this_worker = 0
        self.generation += 1
        if self._prewarm:
            self._standby = self._launch()

    def recycle(self) -> None:
        """Hand the full engine state to a fresh worker process (the
        pre-warmed standby when available)."""
        state = self._rpc("export_state")
        old_proc, old_conn = self._proc, self._conn
        nxt = self._standby if self._standby is not None else self._launch()
        self._standby = None
        self._proc, self._conn = self._adopt(nxt)
        try:
            self._rpc("restore_state", state)
        finally:
            # retire the old worker even when restore fails (the engine
            # is then poisoned and needs respawn(), but the retiring
            # process — holding exactly the leaked RSS this machinery
            # exists to bound — must not outlive the failure)
            try:
                old_conn.send(("stop", None))
                # drain the ack so the retiring worker's send never hits
                # a closed pipe (it would die with BrokenPipeError noise
                # and a nonzero exit code instead of a clean stop)
                if old_conn.poll(10):
                    old_conn.recv()
                old_conn.close()
            except (BrokenPipeError, EOFError, OSError):
                pass
            old_proc.join(timeout=10)
            if old_proc.is_alive():
                old_proc.terminate()
        self._steps_this_worker = 0
        self.generation += 1
        if self._prewarm:
            self._standby = self._launch()

    def _kill_standby(self):
        if self._standby is None:
            return
        proc, conn = self._standby
        self._standby = None
        try:
            conn.close()
        except OSError:
            pass
        proc.terminate()
        proc.join(timeout=10)

    def shutdown(self) -> None:
        self._kill_standby()
        if self._proc is None:
            return
        try:
            self._rpc("stop")
        except WorkerError:
            # a timed-out stop already _poison()ed the worker (conn and
            # proc are None and the process was terminated) — nothing
            # left to close
            if self._proc is None:
                return
        self._conn.close()
        self._proc.join(timeout=10)
        if self._proc.is_alive():
            self._proc.terminate()
        self._proc = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.shutdown()

    # -- engine surface ----------------------------------------------------

    @property
    def worker_pid(self) -> int:
        if self._proc is None:
            raise WorkerError(
                "no live worker: a previous command timed out and the "
                "worker was killed — call respawn()")
        return self._proc.pid

    def worker_rss_kb(self) -> int:
        return int(self._rpc("rss_kb"))

    def open(self, stream_id) -> None:
        self._rpc("open", stream_id)

    def close(self, stream_id) -> None:
        self._rpc("close", stream_id)

    def push(self, stream_id, chunk: np.ndarray) -> None:
        self._rpc("push", (stream_id, np.asarray(chunk, np.float32)))

    def step(self) -> Dict[object, np.ndarray]:
        if self._max_steps and self._steps_this_worker >= self._max_steps:
            self.recycle()
        out = self._rpc("step")
        self._steps_this_worker += 1
        return out

    def flush(self, stream_id) -> np.ndarray:
        return self._rpc("flush", stream_id)

    def export_state(self) -> dict:
        return self._rpc("export_state")
