"""Background host-prepare prefetch.

The sparse-family models need per-batch host work before device transfer
(kernel-map building, `ops/sparse_maps.batch_build_backbone8x` — the analog
of the spconv rulebook build that the reference hides inside its CUDA model,
`pcdet/models/backbones_3d/spconv_backbone.py`). Running it inline in the
step loop serializes ~70 ms/sample of host work with the device step; this
module runs it on a worker thread instead, which genuinely overlaps even on
a single-core host: the builder's hot loop is a ctypes call (GIL released)
and the main thread mostly sleeps in device dispatch/result waits.
"""
from __future__ import annotations

import queue
import threading

_STOP = object()


def prefetch_batches(loader, host_prepare=None, depth=1):
    """Yield `host_prepare(batch)` for each batch of `loader`, preparing
    ahead on a daemon thread. With no `host_prepare` this is a plain
    iteration (no thread).

    `depth` bounds the ready queue. Keep the default 1 when the native
    ladder arena is in play: `csrc.batch_build_ladder_maps` triple-buffers
    its output arrays, which covers exactly the consumer-held, queued, and
    in-build batches alive at depth 1.

    A consumer that abandons the generator mid-epoch leaves the daemon
    thread parked on a full queue until process exit — harmless for the
    train/eval loops, which always drain."""
    if host_prepare is None:
        yield from loader
        return
    q = queue.Queue(maxsize=depth)

    def work():
        try:
            for b in loader:
                q.put(host_prepare(b))
        except BaseException as e:          # surfaced in the consumer
            q.put(e)
            return
        q.put(_STOP)

    threading.Thread(target=work, daemon=True).start()
    while True:
        item = q.get()
        if item is _STOP:
            break
        if isinstance(item, BaseException):
            raise item
        yield item
