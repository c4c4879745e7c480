"""In-order batch submission/consumption (reference ``BatchHandler``,
``elfi/client.py:59-192``).

Inference methods submit batches (optionally with per-batch parameter
overrides, e.g. SMC proposal draws) and consume results strictly in
submission order — the determinism guarantee that makes every method's
output a pure function of its seed, regardless of backend."""

from __future__ import annotations

from collections import OrderedDict

from ..compile.compiler import compile_program
from .backends import get_client

__all__ = ["BatchHandler"]


class BatchHandler:
    def __init__(self, model, context, output_names, client=None):
        self.model = model
        self.context = context
        output_names = list(output_names)
        # auto-extend outputs with pooled nodes so they get computed and
        # stored (reference PoolLoader, ``elfi/loader.py:113-129``)
        if context.pool is not None:
            for name in context.pool.output_names:
                if name not in output_names and name in model:
                    output_names.append(name)
        self.output_names = tuple(output_names)
        self.client = client or get_client()
        self._pending = OrderedDict()   # batch_index -> task_id
        self._submitted_args = {}       # batch_index -> (program, overrides)
        self.next_index = 0
        from ..utils.profiling import Timers
        self.timers = Timers()

    @property
    def num_pending(self):
        return len(self._pending)

    @property
    def has_pending(self):
        return bool(self._pending)

    @property
    def total(self):
        """Number of batches submitted so far."""
        return self.next_index

    @property
    def pending_indices(self):
        return list(self._pending)

    def has_ready(self, any_batch=False):
        if not self._pending:
            return False
        if any_batch:
            return any(self.client.is_ready(t) for t in self._pending.values())
        first = next(iter(self._pending.values()))
        return self.client.is_ready(first)

    def submit(self, batch=None):
        """Submit the next batch; ``batch`` is a dict of node-name ->
        override values (loaded into the program in place of node ops,
        mirroring the reference loader phase ``client.py:146-170``)."""
        batch = dict(batch or {})
        index = self.next_index
        # pool replay: stored outputs override re-simulation (reference
        # PoolLoader, ``elfi/loader.py:95-112``)
        if self.context.pool is not None:
            stored = self.context.pool.get_batch(index)
            for k, v in stored.items():
                batch.setdefault(k, v)
        program = compile_program(self.model, self.output_names,
                                  override_names=tuple(sorted(batch)))
        with self.timers.time("submit"):
            tid = self.client.submit(program, self.context.seed, index,
                                     batch, self.context.batch_size)
        self._pending[index] = tid
        self._submitted_args[index] = (program, batch)
        self.next_index += 1
        self.context.num_submissions = max(self.context.num_submissions,
                                           self.next_index)
        return index

    def wait_next(self, max_retries=2):
        """Block for the OLDEST pending batch (in-order consumption,
        reference ``client.py:172-182``).

        Failure recovery: the counter-based RNG makes every batch index
        replayable by construction, so a failed batch is deterministically
        resubmitted up to ``max_retries`` times (the reference has no retry
        path, SURVEY.md §5)."""
        if not self._pending:
            raise ValueError("Cannot wait for a batch, no batches are pending")
        index, tid = self._pending.popitem(last=False)
        batch = None
        last_err = None
        with self.timers.time("wait"):
            for attempt in range(max_retries + 1):
                try:
                    batch = self.client.get_result(tid)
                    break
                except Exception as e:  # deterministic replay of the index
                    last_err = e
                    if attempt == max_retries:
                        raise RuntimeError(
                            f"Batch {index} failed after {max_retries} "
                            f"retries: {e}") from e
                    program, overrides = self._submitted_args[index]
                    tid = self.client.submit(program, self.context.seed,
                                             index, overrides,
                                             self.context.batch_size)
        self._submitted_args.pop(index, None)
        self.context.callback(batch, index)
        return batch, index

    def compute(self, batch_index=0, batch=None):
        """Blocking single-batch computation (reference ``client.py:268-274``)."""
        batch = batch or {}
        program = compile_program(self.model, self.output_names,
                                  override_names=tuple(sorted(batch)))
        import jax
        out = program.run(jax.random.key(self.context.seed), batch_index,
                          batch, self.context.batch_size)
        return jax.block_until_ready(out) if not program.host else out

    def cancel_pending(self):
        """Drop all not-yet-consumed batches (reference ``client.py:124-144``);
        ``next_index`` rewinds so the indices are resubmitted."""
        if not self._pending:
            return
        first = next(iter(self._pending))
        for idx, tid in self._pending.items():
            self.client.remove_task(tid)
            self._submitted_args.pop(idx, None)
        self._pending.clear()
        self.next_index = first

    def reset(self):
        self.cancel_pending()
        self.next_index = 0
