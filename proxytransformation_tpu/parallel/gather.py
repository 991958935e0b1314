"""Cross-host object gather for eval metrics.

The reference gathers per-rank metric results with mmengine's
`collect_device='cpu'` object collection (reference:
eval/metrics/grounding_metric.py:43-44, via torch.distributed pickle
gather). TPU-native equivalent: pickle each host's results, allgather
the byte lengths, pad to the max, and allgather one uint8 array with
`jax.experimental.multihost_utils.process_allgather` — every host ends
up with the concatenated list, same as the reference's rank-0 gather
followed by broadcast.
"""
from __future__ import annotations

import pickle
from typing import List, Sequence

import numpy as np


def pack_objects(objs: Sequence) -> np.ndarray:
    """Pickle a list of objects into a uint8 vector."""
    raw = pickle.dumps(list(objs))
    return np.frombuffer(raw, np.uint8)


def unpack_objects(buf: np.ndarray, length: int) -> List:
    """Inverse of `pack_objects` for a (possibly padded) uint8 vector."""
    return pickle.loads(bytes(np.asarray(buf[:length], np.uint8)))


def allgather_objects(objs: Sequence) -> List:
    """Gather python objects from every host; returns the concatenated
    list (host order). No-op (returns `list(objs)`) on a single host."""
    import jax
    if jax.process_count() == 1:
        return list(objs)
    from jax.experimental import multihost_utils

    local = pack_objects(objs)
    lengths = multihost_utils.process_allgather(
        np.asarray([local.size], np.int64))
    lengths = np.asarray(lengths).reshape(-1)
    max_len = int(lengths.max())
    padded = np.zeros((max_len, ), np.uint8)
    padded[:local.size] = local
    gathered = np.asarray(multihost_utils.process_allgather(padded))
    gathered = gathered.reshape(len(lengths), max_len)
    out: List = []
    for host in range(len(lengths)):
        out.extend(unpack_objects(gathered[host], int(lengths[host])))
    return out
