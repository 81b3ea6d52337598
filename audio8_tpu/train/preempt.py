"""Preemption-safe training: checkpoint on SIGTERM and exit cleanly.

Production TPU slices are preemptible (maintenance events, autoscaling);
the reference's only answer to preemption is the periodic checkpoint +
``--restart_from`` (it loses up to ``steps_per_checkpoint`` of work and
exits however SIGTERM finds it — /root/reference/audio8/train.py:394-401).
Here every training driver polls a :class:`PreemptionGuard` each step
and, when a preemption notice arrives, saves a final checkpoint at a
step boundary and stops.

Single-process: a plain SIGTERM flag. Multi-process (``--distributed``):
``jax.experimental.multihost_utils.reached_preemption_sync_point`` — the
JAX coordination service propagates the notice to every host and agrees
on one safe step, so the collective orbax save cannot deadlock on a
notice that only one host received.
"""
from __future__ import annotations

import logging
import signal
import threading

import jax

logger = logging.getLogger("audio8_tpu")


class PreemptionGuard:
    """Poll ``should_save(step)`` once per optimizer step.

    Returns True exactly once, at the (globally agreed, under
    multi-process) step where the driver must checkpoint and stop.
    """

    def __init__(self, install_sigterm: bool = True):
        self._flag = threading.Event()
        self._fired = False
        self._multiprocess = jax.process_count() > 1
        if install_sigterm and not self._multiprocess:
            # under jax.distributed the coordination service owns the
            # SIGTERM handler (jax.distributed.initialize registers it);
            # installing ours would shadow the cross-host propagation
            try:
                self._prev = signal.signal(signal.SIGTERM, self._on_signal)
            except ValueError:  # not the main thread (tests, servers)
                self._prev = None

    def _on_signal(self, signum, frame):
        logger.warning("SIGTERM received — checkpointing at the next step "
                       "boundary, then exiting")
        self._flag.set()

    def should_save(self, step: int) -> bool:
        """True when training must checkpoint-and-stop at ``step``."""
        if self._fired:
            return False  # fire once; the driver is already stopping
        if self._multiprocess:
            from jax.experimental import multihost_utils

            hit = bool(multihost_utils.reached_preemption_sync_point(step))
        else:
            hit = self._flag.is_set()
        self._fired = hit
        return hit
