"""Host->device prefetch: overlap H2D transfer with device compute.

Wraps a host batch iterator so the next batch's arrays are already on
device (async dispatch) when the train loop asks for them — the JAX
equivalent of a CUDA-stream double-buffered loader. With a mesh, batch
dims get the ``data`` sharding so the transfer lands directly on the
right shards.
"""

from __future__ import annotations

import collections
from typing import Callable, Iterable, Iterator, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vlm_clip_tpu.parallel.mesh import DATA_AXIS


def prefetch_to_device(iterator: Iterable, size: int = 2,
                       mesh: Optional[Mesh] = None,
                       transform: Optional[Callable] = None) -> Iterator:
    """Yield items with device transfer ``size`` steps ahead.

    ``transform`` maps the host item to a pytree of arrays before the
    put (e.g. lambda b: {'images': b.images, 'labels': b.labels}).
    """
    queue = collections.deque()

    def put(item):
        tree = transform(item) if transform is not None else item
        if mesh is not None:
            def place(x):
                spec = P(DATA_AXIS, *([None] * (getattr(x, "ndim", 1) - 1)))
                return jax.device_put(x, NamedSharding(mesh, spec))
        else:
            def place(x):
                return jax.device_put(x)
        return jax.tree.map(place, tree)

    it = iter(iterator)
    for item in it:
        queue.append(put(item))
        if len(queue) >= size:
            yield queue.popleft()
    while queue:
        yield queue.popleft()
