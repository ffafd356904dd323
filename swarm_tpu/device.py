"""Accelerator availability probe with a hang guard.

Relay-attached TPU backends can hang indefinitely inside device
enumeration when the relay is unhealthy. Engine auto-selection must
degrade to the host paths instead of wedging the whole run, so the
first device touch happens on a daemon thread with a wall-clock bound
(SWARM_TPU_DEVICE_TIMEOUT seconds, default 90): on timeout the probe
reports "unavailable", the daemon thread is abandoned (it cannot block
process exit), and every engine falls back to the native host path.

The verdict is cached for the process: one probe per run.
"""

import os
import threading

_verdict = None
_lock = threading.Lock()


def _apply_force_platform():
    """SWARM_TPU_FORCE_PLATFORM overrides any backend a site hook
    registered (the test harness and CPU-pinned runs rely on it);
    must happen before the first device touch in THIS module — the
    equivalent update in ops/neighbors_jax.py only runs when that
    module gets imported first."""
    fp = os.environ.get("SWARM_TPU_FORCE_PLATFORM")
    if fp:
        import jax

        try:
            jax.config.update("jax_platforms", fp)
        except RuntimeError:
            pass  # backend already initialized


def _probe_target(result):
    try:
        import jax

        _apply_force_platform()
        devs = jax.devices()
        result["n"] = len(devs)
        result["platform"] = devs[0].platform if devs else "none"
    except Exception:
        result["n"] = 0


def device_available(timeout: float = None) -> bool:
    """True when jax.devices() answers within the bound."""
    global _verdict
    with _lock:
        if _verdict is not None:
            return _verdict
        if os.environ.get("SWARM_TPU_FORCE_PLATFORM") == "cpu":
            # tests force the CPU platform: always available, never
            # hangs — but the jax config must actually be pinned to cpu
            # before anyone (incl. device_platform) touches devices
            _apply_force_platform()
            _verdict = True
            return True
        if timeout is None:
            timeout = float(os.environ.get("SWARM_TPU_DEVICE_TIMEOUT", "90"))
        result = {}
        t = threading.Thread(target=_probe_target, args=(result,), daemon=True)
        t.start()
        t.join(timeout)
        if t.is_alive() or result.get("n", 0) == 0:
            import sys

            sys.__stderr__.write(
                "swarm_tpu: accelerator probe "
                + ("timed out" if t.is_alive() else "found no devices")
                + "; using host engines (SWARM_TPU_DEVICE_TIMEOUT to tune)\n"
            )
            _verdict = False
        else:
            _verdict = True
        return _verdict


def device_platform() -> str:
    """Platform name once available (callers must check availability)."""
    import jax

    _apply_force_platform()
    return jax.devices()[0].platform
