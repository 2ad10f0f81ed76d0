"""Host-side batch pipeline: convert + transfer ahead of the device.

The reference forks loader worker processes
(ChainerDataLoader(num_workers=...), /root/reference/tts.py:509-530).  With
JAX the device runs async ahead of Python, so a single prefetch thread that
converts (numpy, GIL-releasing IO) and enqueues device transfers is enough
to hide host latency; depth>1 keeps the TPU fed across step boundaries.
"""

import queue
import threading


class PrefetchLoader:
    """Iterate device-ready batches with background conversion."""

    def __init__(self, batches, convert_fn, put_fn, depth=2):
        """batches: list of utterance lists; convert_fn: batch -> Batch
        (numpy); put_fn: Batch -> device Batch (e.g. mesh.shard_batch)."""
        self.batches = batches
        self.convert_fn = convert_fn
        self.put_fn = put_fn
        self.depth = depth

    def __len__(self):
        return len(self.batches)

    def __iter__(self):
        q = queue.Queue(maxsize=self.depth)
        stop = object()
        err = []

        def worker():
            try:
                for b in self.batches:
                    q.put(self.put_fn(self.convert_fn(b)))
            except BaseException as e:  # surface in consumer thread
                err.append(e)
            finally:
                q.put(stop)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            yield item
        t.join()
        if err:
            raise err[0]
