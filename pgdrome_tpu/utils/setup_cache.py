"""Persistent host-setup cache: assembled + preconditioned operator stacks.

Why this exists: on the 1-core, ~60-120 MB/s host, assembling the bench
problem and running the banded-Cholesky congruence transform costs 7-75 s
per fresh process (measured; the round-2 driver run spent 36 s in
preconditioning alone) — while the PRODUCTS are plain numpy arrays that
deserialize at disk speed (~2 s for the 170 MB bench stacks).  This mirrors
:mod:`pgdrome_tpu.utils.aot_cache` (which persists compiled TPU
executables) for the HOST half of time-to-first-solution: together a fresh
process goes from operators-on-disk to solving in seconds.

The cache key hashes the caller's parameters AND the source code of the
PASSED functions (builder + transforms) — their OWN source only, not
their callees' — so pass every function whose edits should invalidate
the snapshot (e.g. the fem assembly helpers a builder calls), or bump
key_data when touching deeper internals.  Values are arbitrary picklable pytrees —
:class:`~pgdrome_tpu.separated.SeparatedProblem` and
:class:`~pgdrome_tpu.separated.Dim0Transform` both pickle cleanly (the
transform stores its Cholesky factor data, not closures).

The reference has no analogue for this cost because dolfin/FFC cache
generated form code on disk (reference solver.py relies on FFC's JIT
cache); this is the equivalent capability for the numpy-assembly model.
"""

from __future__ import annotations

import hashlib
import inspect
import logging
import os
import pickle
import tempfile
import time

LOGGER = logging.getLogger(__name__)

_ENV_DIR = "PGDROME_SETUP_CACHE"
_VERSION = "setup-v1"


def default_cache_dir():
    """Cache dir from $PGDROME_SETUP_CACHE, or None (caching disabled)."""
    return os.environ.get(_ENV_DIR) or None


def _key(key_data, code_objects):
    h = hashlib.sha256()
    h.update(_VERSION.encode())
    for item in key_data:
        h.update(repr(item).encode())
    for fn in code_objects:
        try:
            h.update(inspect.getsource(fn).encode())
        except (OSError, TypeError):  # builtins / C funcs: name only
            h.update(getattr(fn, "__qualname__", repr(fn)).encode())
    return h.hexdigest()[:32]


def cached_setup(build_fn, key_data, code_objects=(), cache_dir=None):
    """``build_fn()`` with a persistent on-disk result cache.

    Returns ``(value, status)`` with status 'hit', 'miss' or 'off'.

    ``key_data``: reprable items that determine the value (builder
    parameters, shapes, dtypes).  ``code_objects``: functions whose SOURCE
    participates in the key — pass the builder and any transform functions
    so code changes invalidate the cache.  ``cache_dir=None`` defers to
    ``$PGDROME_SETUP_CACHE`` (unset = caching off, just build)."""
    cache_dir = cache_dir or default_cache_dir()
    if cache_dir is None:
        return build_fn(), "off"

    os.makedirs(cache_dir, exist_ok=True)
    path = os.path.join(cache_dir, _key(key_data, code_objects) + ".setup")
    if os.path.exists(path):
        try:
            t0 = time.perf_counter()
            with open(path, "rb") as f:
                value = pickle.load(f)
            LOGGER.info(
                "setup cache hit: %s (%.1f MB; read %.2fs)", path,
                os.path.getsize(path) / 1e6, time.perf_counter() - t0,
            )
            return value, "hit"
        except Exception as e:  # corrupt/stale format: rebuild
            LOGGER.warning("setup cache load failed (%s); rebuilding", e)
            try:
                os.unlink(path)
            except OSError:
                pass

    value = build_fn()
    tmp = None
    try:
        # atomic publish: a concurrent reader must never see a short file
        fd, tmp = tempfile.mkstemp(dir=cache_dir, suffix=".tmp")
        with os.fdopen(fd, "wb") as f:
            pickle.dump(value, f, protocol=pickle.HIGHEST_PROTOCOL)
        os.replace(tmp, path)
        tmp = None
        LOGGER.info(
            "setup cache store: %s (%.1f MB)", path,
            os.path.getsize(path) / 1e6,
        )
    except Exception as e:  # unpicklable value / full disk: keep going
        LOGGER.warning("setup cache store failed (%s); caching disabled", e)
    finally:
        if tmp is not None:  # failed store: don't leak the partial .tmp
            try:
                os.unlink(tmp)
            except OSError:
                pass
    return value, "miss"
