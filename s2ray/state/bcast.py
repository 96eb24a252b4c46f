"""Worker-process-level cache for broadcast objects (``ray.put`` refs).

One shared implementation for every broadcast-side lookup in the engine
(spatial-join region index, equi-join build table, quantile group info):
``ray.get`` + deserialize once per worker process, not once per task or
per ``map_groups`` group.  FIFO eviction of single entries — never a full
clear — so stages that alternate between two refs per batch (e.g. the
quantile select pass reading group-info and targets) keep both resident.
"""

from __future__ import annotations

_CACHE: dict = {}


def cached_get(ref, max_entries: int = 8):
    import ray

    key = ref.hex() if callable(getattr(ref, "hex", None)) else id(ref)
    hit = _CACHE.get(key)
    if hit is None:
        hit = ray.get(ref)
        while len(_CACHE) >= max_entries:
            _CACHE.pop(next(iter(_CACHE)))
        _CACHE[key] = hit
    return hit
