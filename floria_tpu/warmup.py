"""Background pre-compilation of recurring jit variants.

A fresh process pays ~1s per (function, shape) variant of trace +
executable-deserialize against the remote backend even when the XLA
persistent cache is hot — 8-12s across the pipeline's beam/UPEM/realign
variants, all serialized on the main thread between stages. Production
workloads re-use the same shape buckets run after run (that is what the
bucketing is FOR), so each run records the variants it actually
dispatched into a hints file, and the next run replays them through
``jax.jit(...).lower(...).compile()`` on a small daemon thread pool
while ingest is still reading the BAM. A compile() on a cache-hit is a
deserialize; a miss compiles work the run would have done anyway.

Correctness is untouched: lower/compile never executes anything, and a
wrong hint merely warms an unused variant.
"""

from __future__ import annotations

import json
import logging
import os
import threading
from typing import Dict, List, Tuple

log = logging.getLogger("floria_tpu")

_HINTS_ENV = "FLORIA_TPU_WARMUP_HINTS"
_seen: "list[Tuple[str, Tuple]]" = []  # pipeline order, deduped
_seen_set: set = set()
_lock = threading.Lock()
_started = False


def _hints_path() -> str:
    default = os.path.join(
        os.path.expanduser("~"), ".cache", "floria_tpu_xla",
        "shape_hints.json")
    return os.environ.get(_HINTS_ENV, default)


def record(kind: str, spec: Tuple) -> None:
    """Remember that variant `spec` of kernel `kind` was dispatched.
    First-seen order is preserved: it IS the pipeline's need order,
    which start() replays so the warm thread always works on the
    variant the pipeline will want next."""
    with _lock:
        if (kind, spec) not in _seen_set:
            _seen_set.add((kind, spec))
            _seen.append((kind, spec))


def save() -> None:
    """Merge this run's variants into the hints file (best effort).

    CPU runs (the test suite) never save: their tiny shape churn would
    queue pointless remote compiles on the next accelerator run."""
    if not _seen:
        return
    try:
        import jax

        if jax.default_backend() == "cpu":
            return
    except Exception:
        return
    path = _hints_path()
    try:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        old: List = []
        if os.path.exists(path):
            with open(path) as fh:
                old = json.load(fh)
        ordered: List = []
        seen: set = set()
        with _lock:
            mine = list(_seen)
        # This run's variants first (in pipeline order), then any prior
        # hints not re-seen (other workloads), capped.
        for k, s in mine + [(k, tuple(s)) for k, s in old]:
            key = (k, tuple(s))
            if key not in seen:
                seen.add(key)
                ordered.append([k, list(key[1])])
        with open(path, "w") as fh:
            json.dump(ordered[:128], fh)
    except Exception as e:  # pragma: no cover - advisory only
        log.debug("warmup hint save failed: %s", e)


def _compile_one(kind: str, spec: Tuple) -> None:
    import jax
    import jax.numpy as jnp

    sds = jax.ShapeDtypeStruct
    if kind == "beam_mixed":
        from .kernels import beam

        G, R, S, max_ploidy, beam_width, max_alleles, window, dedup = \
            spec
        beam.beam_search_batch_mixed.lower(
            sds((G, R, S), jnp.int8), sds((G, R, S), jnp.float32),
            sds((G,), jnp.int32), sds((G,), jnp.float32),
            sds((G,), jnp.int32), max_ploidy, beam_width, max_alleles,
            window, dedup).compile()
    elif kind == "upem":
        from .kernels import upem_batch

        G, R, S, ploidy, max_alleles = spec
        upem_batch.upem_optimize_device.lower(
            sds((G, R, S), jnp.int8), sds((G, R, S), jnp.float32),
            sds((G, R), jnp.int32), sds((G,), jnp.int32),
            sds((G,), jnp.float32), ploidy, max_alleles).compile()
    elif kind == "nw":
        from .kernels import realign

        n_pad, chunk, T_pad, A_tab, a_max = spec
        realign._nw_best_chunked.lower(
            sds((n_pad, chunk, realign.WINDOW // 2), jnp.uint8),
            sds((n_pad, chunk), jnp.int32),
            sds((T_pad, realign.WINDOW), jnp.uint8),
            sds((T_pad, A_tab), jnp.uint8), sds((T_pad,), jnp.int32),
            a_max).compile()
    else:
        raise ValueError(kind)


def start(skip_kinds=()) -> None:
    """Kick off background pre-compilation of the hinted variants.

    Call this where the main thread is about to block on device work
    (the realign flush), NOT at process start: jit tracing is
    GIL-bound Python, and a warm thread running during the host-heavy
    ingest stage was measured to slow ingest by more than the warmup
    saved. During device waits the GIL is free and the trace rides
    along. skip_kinds drops hints the caller is about to compile for
    real (avoids duplicate concurrent compiles of the same variant)."""
    global _started
    if _started:
        return
    _started = True
    try:
        import jax

        if jax.default_backend() == "cpu":
            return  # CPU compiles are fast and tests churn shapes
    except Exception:
        return
    path = _hints_path()
    if not os.path.exists(path):
        return
    try:
        with open(path) as fh:
            hints = [(k, tuple(s)) for k, s in json.load(fh)
                     if k not in skip_kinds]
    except Exception:
        return

    def _worker(items: List[Tuple[str, Tuple]]) -> None:
        for kind, spec in items:
            try:
                _compile_one(kind, spec)
            except Exception as e:  # stale hint; harmless
                log.debug("warmup %s%s failed: %s", kind, spec, e)

    # ONE thread, in recorded (pipeline) order: parallel warmup was
    # measured to STARVE the real first-call compiles on the remote
    # compile service; a single ordered thread is always either ahead
    # of the pipeline (pure win) or compiling the variant the pipeline
    # is about to block on anyway (no loss).
    threading.Thread(target=_worker, args=(hints,),
                     daemon=True).start()
    log.debug("warmup: %d hinted variants queued", len(hints))
