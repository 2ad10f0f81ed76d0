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
        abandoned = threading.Event()
        err = []

        def _put(item):
            # bounded put that gives up if the consumer went away (an
            # exception or break in the training loop must not leave the
            # worker blocked on a full queue forever)
            while not abandoned.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            try:
                for b in self.batches:
                    if not _put(self.put_fn(self.convert_fn(b))):
                        return
            except BaseException as e:  # surface in consumer thread
                err.append(e)
            finally:
                _put(stop)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is stop:
                    break
                if err:
                    break
                yield item
        finally:
            abandoned.set()
            t.join()
            if err:
                raise err[0]
