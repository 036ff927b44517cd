"""Bounded identity-keyed memoization for array-derived values.

Several hot paths derive values from weight buffers (quantized views, int8
casts, exactness bounds, mesh placements) and are called once per device
dispatch — run_model's p50 sampling alone is ~14 calls per evaluation.
Recomputing would mean a device->host fetch + host work + re-upload per
call; these caches key on the source arrays' identity instead.

Contract: `anchors` (the arrays) are held strongly inside the cache so their
ids cannot be recycled; `extra` must carry every hashable scalar the value
also depends on — a value keyed on one buffer alone goes stale for a pytree
`_replace` sharing that buffer.
"""

from __future__ import annotations


def id_memo(cache: dict, anchors: tuple, extra: tuple, build, max_entries: int = 16):
    """Return build() memoized under (ids of anchors) + extra, bounded at
    `max_entries` (FIFO eviction).  Caches whose values are DEVICE-resident
    (e.g. mesh placements of a large database) should pass a small
    max_entries — retained entries hold HBM, not just host RAM."""
    key = tuple(map(id, anchors)) + extra
    hit = cache.get(key)
    if hit is not None and all(h is a for h, a in zip(hit[0], anchors)):
        return hit[1]
    val = build()
    if len(cache) >= max_entries:
        cache.pop(next(iter(cache)))
    cache[key] = (anchors, val)
    return val
