"""Worker pool: bounded job queue + worker threads backing the async APIs.

TPU-native reinterpretation of the reference's replica pool
(reference: include/ctranslate2/thread_pool.h:16-115,
include/ctranslate2/replica_pool.h:19-300). The reference binds one model
replica per worker because CUDA replicas each own streams/handles; under
JAX a single set of device arrays is shared by every thread and the XLA
runtime serializes device execution, so workers here overlap *host* work
(tokenization, batch assembly, result unpacking, beam bookkeeping) with
device compute and with each other. ``inter_threads`` maps to the number
of workers, matching the reference constructor semantics.
"""

from __future__ import annotations

import threading
from concurrent.futures import Future
from typing import Callable, List, Optional, Sequence

# Thread-local worker identity: lets task APIs route a job to the model
# replica owned by the executing worker (reference: one replica per
# worker thread, replica_pool.h:19-300 / models.cc get_model_replica).
_worker_tls = threading.local()

# Stack size for threads that trigger XLA compilation. XLA:CPU's
# compile pipeline (backend_compile_and_load) recurses deeply on the
# whole-generation device-loop graphs this engine builds; the platform
# default thread stack (RLIMIT_STACK, typically 8 MB) is marginal and
# overflows — reproducibly, late in a long-lived process — as a
# segfault inside the compiler. 64 MB gives an order-of-magnitude
# margin at negligible cost (virtual memory, faulted on demand).
_COMPILE_STACK_BYTES = 64 * 1024 * 1024
_stack_lock = threading.Lock()


def spawn_compile_thread(target, *, name: str,
                         args: tuple = ()) -> threading.Thread:
    """Start a daemon thread with an explicit large stack (the stack
    size is a process-global setting applied at start(), hence the
    lock). Use for any thread that may jit-compile device loops."""
    with _stack_lock:
        old = threading.stack_size()
        try:
            try:
                threading.stack_size(_COMPILE_STACK_BYTES)
            except (ValueError, RuntimeError):
                pass  # platform refuses: keep the default
            t = threading.Thread(target=target, args=args, daemon=True,
                                 name=name)
            t.start()
            return t
        finally:
            try:
                threading.stack_size(old)
            except (ValueError, RuntimeError):
                pass


def current_worker_index() -> Optional[int]:
    """Index of the WorkerPool thread running the caller, or None when
    called from outside any pool (e.g. the user's thread)."""
    return getattr(_worker_tls, "index", None)


def resolve_max_queued_batches(kwargs: dict, max_queued_batches: int) -> int:
    """Resolve the ctor arg, honoring the legacy ``max_queue_size`` alias
    with its ORIGINAL meaning (0 = unbounded, vs the reference convention's
    0 = automatic)."""
    if "max_queue_size" in kwargs:
        legacy = kwargs["max_queue_size"]
        return -1 if legacy == 0 else legacy
    return max_queued_batches


class WorkerPool:
    """Fixed set of worker threads draining a bounded FIFO job queue.

    Mirrors the blocking-put semantics of the reference JobQueue
    (reference: include/ctranslate2/thread_pool.h:16-60): when
    ``max_queued_batches`` jobs are pending, ``submit`` blocks, providing
    back-pressure for streaming producers. Reference value convention
    (replica_pool.h:252-255): 0 = automatic (4 per worker), -1 =
    unlimited, >0 = that bound.
    """

    def __init__(self, num_workers: int = 1, max_queued_batches: int = 0):
        import queue

        if max_queued_batches == 0:
            maxsize = 4 * max(1, num_workers)
        elif max_queued_batches < 0:
            maxsize = 0  # unbounded
        else:
            maxsize = max_queued_batches
        self._queue: "queue.Queue" = queue.Queue(maxsize=maxsize)
        self._closed = False
        self._active = 0
        self._lock = threading.Lock()
        self._workers = [
            spawn_compile_thread(self._run, args=(i,),
                                 name=f"ct2tpu-worker-{i}")
            for i in range(max(1, num_workers))
        ]

    @property
    def num_workers(self) -> int:
        return len(self._workers)

    @property
    def num_queued_batches(self) -> int:
        return self._queue.qsize()

    @property
    def num_active_batches(self) -> int:
        with self._lock:
            return self._active + self._queue.qsize()

    def submit(self, fn: Callable, /, *args, **kwargs) -> Future:
        """Queue ``fn(*args, **kwargs)``; the Future resolves with its
        return value or exception (reference promise/future plumbing:
        replica_pool.h:262-293)."""
        if self._closed:
            raise RuntimeError("The worker pool is closed")
        future: Future = Future()
        self._queue.put((future, fn, args, kwargs))
        return future

    def map_ordered(self, fn: Callable, items: Sequence) -> List:
        """Submit one job per item and wait; results keep input order."""
        futures = [self.submit(fn, item) for item in items]
        return [f.result() for f in futures]

    def close(self, timeout: Optional[float] = 5.0):
        if self._closed:
            return
        self._closed = True
        for _ in self._workers:
            # Never block on a full (bounded) queue at shutdown — workers
            # re-post the sentinel when they see _closed (see _run).
            try:
                self._queue.put_nowait(None)
            except Exception:
                break
        for w in self._workers:
            w.join(timeout=timeout)

    def __del__(self):
        try:
            self.close(timeout=0.1)
        except Exception:
            pass

    # ------------------------------------------------------------------

    def _run(self, index: int):
        import queue as _queue

        _worker_tls.index = index
        while True:
            try:
                job = self._queue.get(timeout=0.5)
            except _queue.Empty:
                # Sentinels may not fit in a full bounded queue at close();
                # the timeout makes shutdown sentinel-independent.
                if self._closed:
                    return
                continue
            if job is None:
                return
            future, fn, args, kwargs = job
            if not future.set_running_or_notify_cancel():
                continue
            with self._lock:
                self._active += 1
            try:
                future.set_result(fn(*args, **kwargs))
            except BaseException as e:  # noqa: BLE001
                future.set_exception(e)
            finally:
                with self._lock:
                    self._active -= 1
