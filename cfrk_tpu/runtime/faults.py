"""Deterministic fault injection for crash-consistency testing.

The reference has no fault-injection story (SURVEY.md §5: per-CUDA-call
printf-and-continue, ``executionRetries=0``); its only recovery
granularity is re-running a whole file shard.  This framework's
streaming drivers promise byte-identical output across a crash at ANY
checkpoint boundary — a promise that is only testable by actually
crashing there.  This module provides the trapdoor: production code
calls :func:`trip` at named sites, and tests/fuzzers arm a site to
raise after N passes.

Sites currently wired:

* ``"checkpoint"`` — fires just after a streaming checkpoint sidecar is
  durably saved (runtime/checkpoint.py ``StreamCheckpoint.save``),
  i.e. the worst-honest moment to die: the checkpoint claims progress
  the process never gets to act on.

Arming is explicit (:func:`arm`, for in-process tests/fuzzers) or via
the environment for subprocess tests::

    CFRK_FAULT_INJECT="checkpoint:2"   # raise at the 2nd checkpoint

A disarmed site costs one dict lookup — nothing in production pays for
this unless armed.
"""

from __future__ import annotations

import os

__all__ = ["InjectedFault", "arm", "disarm", "trip"]


class InjectedFault(RuntimeError):
    """Raised at an armed fault site; never raised in normal operation."""


_armed: dict[str, int] = {}


def _load_env() -> None:
    spec = os.environ.get("CFRK_FAULT_INJECT", "")
    for part in spec.split(","):
        if ":" in part:
            site, n = part.rsplit(":", 1)
            try:
                _armed[site.strip()] = int(n)
            except ValueError:
                raise ValueError(f"bad CFRK_FAULT_INJECT spec: {part!r}")


_load_env()


def arm(site: str, after: int) -> None:
    """Make the ``after``-th :func:`trip` of ``site`` raise
    :class:`InjectedFault` (1 = the very next one)."""
    if after < 1:
        raise ValueError("after must be >= 1")
    _armed[site] = after


def disarm(site: str | None = None) -> None:
    """Disarm one site, or every site when ``site`` is None."""
    if site is None:
        _armed.clear()
    else:
        _armed.pop(site, None)


def trip(site: str) -> None:
    """Fault point: raises iff ``site`` is armed and its counter expires.

    The site disarms itself when it fires, so cleanup/retry code running
    after the injected crash does not re-trip."""
    n = _armed.get(site)
    if n is None:
        return
    if n <= 1:
        del _armed[site]
        raise InjectedFault(site)
    _armed[site] = n - 1
