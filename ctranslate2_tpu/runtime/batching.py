"""Host-side batching: length-sorted rebatching and shape bucketing.

Reproduces the reference semantics — sort by length descending so similar
lengths share a batch (reference: src/batch_reader.cc:174-227), split by
``max_batch_size`` in examples or tokens — and adds TPU bucketing: padded
shapes snap to coarse buckets so XLA compiles a small, reusable set of
executables instead of one per shape.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple


def round_up(x: int, multiple: int) -> int:
    return ((x + multiple - 1) // multiple) * multiple


def bucket_length(n: int, multiple: int = 16, minimum: int = 16) -> int:
    return max(round_up(n, multiple), minimum)


def bucket_batch_size(n: int, minimum: int = 1) -> int:
    """Next power of two (compile-cache friendly)."""
    b = max(n, minimum)
    return 1 << (b - 1).bit_length()


def rebatch_input(
    lengths: Sequence[int],
    max_batch_size: int = 0,
    batch_type: str = "examples",
) -> List[List[int]]:
    """Return batches of example indices, longest-first within and across
    batches (reference: src/batch_reader.cc:174-227).

    Uses the native core when available."""
    from ..native import available, rebatch as native_rebatch

    if available:
        return native_rebatch(list(lengths), max_batch_size, batch_type)
    order = sorted(range(len(lengths)), key=lambda i: -lengths[i])
    if max_batch_size <= 0:
        return [order] if order else []

    batches: List[List[int]] = []
    current: List[int] = []
    current_longest = 0
    for idx in order:
        if batch_type == "tokens":
            # Padding-aware: cost of adding this example is the padded size.
            longest = max(current_longest, lengths[idx])
            if current and longest * (len(current) + 1) > max_batch_size:
                batches.append(current)
                current = []
                current_longest = 0
            current.append(idx)
            current_longest = max(current_longest, lengths[idx])
        else:
            current.append(idx)
            if len(current) >= max_batch_size:
                batches.append(current)
                current = []
    if current:
        batches.append(current)
    return batches


def pad_batch(
    ids: Sequence[Sequence[int]],
    pad_id: int = 0,
    length_multiple: int = 1,
    min_length: int = 1,
) -> Tuple[List[List[int]], List[int]]:
    """Pad ragged id lists to a common (bucketed) length.

    Returns (padded, lengths).
    """
    lengths = [len(x) for x in ids]
    max_len = max(max(lengths), min_length)
    max_len = round_up(max_len, length_multiple)
    padded = [list(x) + [pad_id] * (max_len - len(x)) for x in ids]
    return padded, lengths


def default_read_batch_size(read_batch_size: int, max_batch_size: int):
    """The reference's read-window default: 16 batches worth, or the batch
    itself at batch size 1 (replica_pool.h:210-211). Returns None for an
    unbounded window (max_batch_size == 0)."""
    if read_batch_size > 0:
        return read_batch_size
    size = max_batch_size if max_batch_size == 1 else max_batch_size * 16
    return size if size > 0 else None


def consume_stream(read_window, submit, write, max_pending: int = 0):
    """The reference consume_batches loop (replica_pool.h:191-226): read a
    window of examples, submit it asynchronously, and drain finished
    results in submission order — overlapping read, compute and write.

    ``read_window()`` returns the next window (falsy at EOF); ``submit``
    maps a window to a sequence of AsyncResults; ``write`` consumes one
    resolved result. ``max_pending`` (>0) bounds in-flight results by
    blocking on the oldest — the analog of the reference's
    max_queued_batches backpressure.
    """
    import collections

    pending = collections.deque()

    def drain(blocking):
        while pending and (blocking or pending[0].done()):
            write(pending.popleft().result())

    try:
        while True:
            window = read_window()
            if not window:
                break
            pending.extend(submit(window))
            drain(blocking=False)
            while max_pending and len(pending) > max_pending:
                write(pending.popleft().result())
        drain(blocking=True)
    except BaseException:
        # Let in-flight work settle before propagating: tearing down the
        # interpreter while worker threads are mid-compute aborts inside
        # the XLA runtime.
        while pending:
            try:
                pending.popleft().result()
            except Exception:
                pass
        raise


def normalize_input_ids(inputs, vocab, lengths=None):
    """Coerce a forward_batch input — batch of token strings, batch of
    token ids, or a dense id array (the reference's BatchTokens/BatchIds/
    StorageView variants) — into a list of id lists.

    ``lengths`` (only meaningful for dense arrays, which carry no natural
    per-row length) trims each row to its true length so padding is not
    attended/scored as real tokens.
    """
    import numpy as np

    if hasattr(inputs, "shape"):
        rows = np.asarray(inputs).tolist()
        if lengths is not None:
            rows = [row[:int(n)] for row, n in zip(rows, lengths)]
        return rows
    if lengths is not None:
        raise ValueError(
            "lengths is only accepted with a dense id array input")
    return [
        [t if isinstance(t, (int, np.integer)) else vocab.to_id(t)
         for t in seq]
        for seq in inputs
    ]
