"""Persistent AOT-executable cache for remote/tunneled TPU backends.

Why this exists: the axon TPU plugin compiles remotely and jax's built-in
persistent compilation cache does not intercept it, so every fresh process
pays the full 100-1000 s server-side XLA compile of the fused PGD program
(PERF.md "Compile time").  PJRT executables ARE serializable, and loading
one through the tunnel takes ~1 s — so we persist the compiled executable
keyed by (program StableHLO, jax version, backend platform_version) and
reload it on the next run.

The backend fingerprint includes the libtpu build string, so a rolling
libtpu upgrade changes the key instead of loading a stale (and possibly
divergent) executable; any deserialization failure falls back to a fresh
compile.  This is the capability the reference gets from FFC's on-disk
form cache (reference solver.py relies on dolfin/FFC JIT caching), rebuilt
for the XLA compilation model.
"""

from __future__ import annotations

import hashlib
import logging
import os
import pickle
import tempfile

LOGGER = logging.getLogger(__name__)

# process-wide program accounting: how many distinct executable
# compiles/loads this process paid (each is an independent draw from the
# remote server's stall distribution — bench.py reports the counts so
# fresh-process variance is attributable)
STATS = {"hit": 0, "miss": 0, "off": 0}

_ENV_DIR = "PGDROME_AOT_CACHE"


def default_cache_dir():
    """Cache dir from $PGDROME_AOT_CACHE, or None (caching disabled)."""
    return os.environ.get(_ENV_DIR) or None


def _backend_fingerprint():
    import jax

    dev = jax.devices()[0]
    pv = getattr(dev.client, "platform_version", dev.platform)
    fp = f"jax={jax.__version__};{dev.platform};{pv}"
    if dev.platform == "cpu":
        # CPU AOT executables are ISA-specific and platform_version does
        # not capture the machine; key on the host identity too
        u = os.uname()
        fp += f";{u.nodename};{u.machine};{u.release}"
    return fp


def _key_from_lowered(lowered):
    h = hashlib.sha256()
    h.update(_backend_fingerprint().encode())
    h.update(lowered.as_text().encode())
    return h.hexdigest()[:32]


def _key_from_data(key_data):
    h = hashlib.sha256()
    h.update(_backend_fingerprint().encode())
    for item in key_data:
        if isinstance(item, bytes):
            h.update(item)
        else:
            h.update(repr(item).encode())
    return h.hexdigest()[:32]


def prune(cache_dir=None, max_age_days=30.0):
    """Delete cache entries not touched in ``max_age_days`` (by atime,
    falling back to mtime).  Keys embed code fingerprints, so edited
    builders orphan their old entries — long-lived hosts should prune
    periodically (``python -m pgdrome_tpu.warmup --prune-days N``).
    Returns (n_removed, bytes_removed)."""
    import time

    cache_dir = cache_dir or default_cache_dir()
    if cache_dir is None or not os.path.isdir(cache_dir):
        return 0, 0
    cutoff = time.time() - max_age_days * 86400.0
    n, freed = 0, 0
    for name in os.listdir(cache_dir):
        if not name.endswith(".pjrt"):
            continue
        path = os.path.join(cache_dir, name)
        try:
            st = os.stat(path)
            if max(st.st_atime, st.st_mtime) < cutoff:
                freed += st.st_size
                os.unlink(path)
                n += 1
        except OSError:  # concurrent removal
            pass
    if n:
        LOGGER.info("aot cache pruned: %d entries, %.1f MB", n, freed / 1e6)
    return n, freed


def aot_jit(jitted, key_data=None, cache_dir=None, max_shapes=16):
    """Per-shape persistent-AOT dispatch for fixed-shape serving programs.

    Wraps a ``jax.jit``-ed callable: on the first call with a given
    argument signature the executable is fetched from (or compiled into)
    the persistent cache via :func:`compile_cached`; later same-shape
    calls dispatch the loaded executable directly.  With caching disabled
    (no $PGDROME_AOT_CACHE) the plain jitted callable is returned
    unchanged — zero overhead, zero behavior change.

    ``key_data`` must uniquely determine the PROGRAM (the serving sweeps
    bake mode tables in as constants — hash their bytes into it); the
    call-shape signature is appended automatically.  Single-device
    programs only: loaded executables are pinned to device 0
    (sharded paths must pass the plain jitted fn instead)."""
    cache_dir = cache_dir or default_cache_dir()
    if cache_dir is None:
        return jitted

    table = {}

    def call(*args):
        import jax
        import jax.numpy as jnp

        if any(isinstance(a, jax.core.Tracer) for a in args):
            # under a JAX transformation (jacfwd/vmap/grad through a
            # serving fn, or an outer jit): a loaded Compiled executable
            # cannot accept tracers — dispatch the plain jitted callable,
            # which inlines into the enclosing trace
            return jitted(*args)
        args = tuple(jnp.asarray(a) for a in args)
        sig = tuple((a.shape, str(a.dtype)) for a in args)
        fn = table.get(sig)
        if fn is None:
            kd = list(key_data or []) + [repr(sig)]
            fn, call.last_status = compile_cached(
                jitted, args, cache_dir=cache_dir, key_data=kd
            )
            if len(table) >= max_shapes:
                table.clear()
            table[sig] = fn
        return fn(*args)

    call.last_status = None  # 'hit'/'miss' of the most recent compile
    return call


def array_fingerprint(*arrays):
    """sha256 over the raw bytes + shape/dtype of each array — the
    key_data entry for programs that close over array constants."""
    import numpy as np

    h = hashlib.sha256()
    for a in arrays:
        a = np.asarray(a)
        h.update(repr((a.shape, str(a.dtype))).encode())
        h.update(a.tobytes())
    return h.hexdigest()


def compile_cached(jitted, args, cache_dir=None, verbose=False, key_data=None):
    """``jitted.lower(*args).compile()`` with a persistent executable cache.

    Returns (compiled, status) where status is 'hit', 'miss' or 'off'.
    The compiled object is called with the same positional args as the
    jitted function.  Pass the traced-shape args (values are ignored
    beyond shape/dtype).  cache_dir=None (and no $PGDROME_AOT_CACHE)
    disables caching and just compiles.

    ``key_data``: optional sequence of bytes/reprable items that uniquely
    determines the program (problem arrays, solver knobs, shapes).  When
    given, the cache key is computed from it WITHOUT lowering — for
    programs with large embedded constants, ``lower()`` + hashing the
    StableHLO text costs minutes (measured 134 s on the bench program), so
    a hit must not pay it.  Without it, the key falls back to the lowered
    module text (value-exact but slow for constant-heavy programs)."""
    cache_dir = cache_dir or default_cache_dir()
    if cache_dir is None:
        STATS["off"] += 1
        return jitted.lower(*args).compile(), "off"

    from jax.experimental.serialize_executable import (
        deserialize_and_load,
        serialize,
    )

    os.makedirs(cache_dir, exist_ok=True)
    if key_data is not None:
        key = _key_from_data(key_data)
        lowered = None  # only lower on a miss
    else:
        lowered = jitted.lower(*args)
        key = _key_from_lowered(lowered)
    path = os.path.join(cache_dir, key + ".pjrt")
    if os.path.exists(path):
        try:
            import time

            import jax

            t0 = time.perf_counter()
            with open(path, "rb") as f:
                payload, in_tree, out_tree = pickle.load(f)
            t_read = time.perf_counter() - t0
            t0 = time.perf_counter()
            # cached programs are single-device (the fused solver): pin the
            # execution devices, else deserialization binds ALL backend
            # devices and execution demands an N-shard arg layout
            compiled = deserialize_and_load(
                payload, in_tree, out_tree,
                execution_devices=jax.devices()[:1],
            )
            LOGGER.info(
                "aot cache hit: %s (%.1f MB; read %.2fs, load %.2fs)",
                path, len(payload) / 1e6, t_read,
                time.perf_counter() - t0,
            )
            STATS["hit"] += 1
            try:
                # recency marker: scripts/pack_aot_cache.py packs the
                # most-recently-USED executables into the git-durable
                # states/aot_bench.tar.gz (VM-wipe insurance), so hits
                # must refresh mtime (reads alone do not, relatime)
                os.utime(path, None)
            except OSError:
                pass
            return compiled, "hit"
        except Exception as e:  # stale/foreign/corrupt: recompile
            LOGGER.warning("aot cache load failed (%s); recompiling", e)
            try:
                os.unlink(path)
            except OSError:
                pass

    if lowered is None:
        lowered = jitted.lower(*args)
    compiled = lowered.compile()
    try:
        payload, in_tree, out_tree = serialize(compiled)
        # atomic publish: a concurrent reader must never see a short file
        fd, tmp = tempfile.mkstemp(dir=cache_dir, suffix=".tmp")
        with os.fdopen(fd, "wb") as f:
            pickle.dump((payload, in_tree, out_tree), f)
        os.replace(tmp, path)
        if verbose:
            LOGGER.info("aot cache store: %s (%.1f MB)", path,
                        len(payload) / 1e6)
    except Exception as e:  # backends without executable serialization
        LOGGER.warning("aot cache store failed (%s); caching disabled", e)
    STATS["miss"] += 1
    return compiled, "miss"
