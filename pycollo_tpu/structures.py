"""Shared pytree structures passed to user endpoint functions."""

from __future__ import annotations

from typing import Any, NamedTuple, Tuple


class PhaseEndpoints(NamedTuple):
    """Endpoint values of one phase: y(t0), y(tF), q, t0, tF."""

    y0: Any   # (ny,)
    yF: Any   # (ny,)
    q: Any    # (nq,)
    t0: Any   # scalar
    tF: Any   # scalar


class Endpoints(NamedTuple):
    """Arguments to objective / endpoint-constraint functions.

    ``phase`` is a tuple of :class:`PhaseEndpoints` (one per phase) and
    ``s`` the problem parameter vector.  Mirrors the reference's endpoint
    variable set ``x_b = (y_t0, y_tF, q, t0, tF, s)``
    (``pycollo/backend.py:632-704``).
    """

    phase: Tuple[PhaseEndpoints, ...]
    s: Any    # (ns,)
