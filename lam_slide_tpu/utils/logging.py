"""Host-aware logging (RankedLogger equivalent, src/utils/pylogger.py)."""

import functools

import jax

_seen = set()


def host0_print(*args, **kwargs):
    """Print only on process 0 (multi-host safe)."""
    if jax.process_index() == 0:
        print(*args, **kwargs)


def log_once(msg: str):
    if msg not in _seen:
        _seen.add(msg)
        host0_print(msg)
