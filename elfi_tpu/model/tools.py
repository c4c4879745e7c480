"""Operation tools: vectorization helpers and external (native) simulators
(reference ``elfi/model/tools.py``).

Two vectorization paths:

- :func:`vectorize_traced` — the TPU-first path: wraps a per-realization
  JAX function with ``jax.vmap`` so the whole batch fuses into the XLA
  program (SURVEY.md maps the reference's loop-vectorizer to exactly this).
- :func:`vectorize` — reference-parity host loop for non-JAX scalar
  simulators; the produced op is host-only and routes the graph through
  the host executor automatically.

:func:`external_operation` wraps ANY shell command as a node op (the
file-handshake bridge that keeps native/C++ simulators first-class, e.g.
the BDM example, reference ``elfi/examples/bdm.py:19-68``).
"""

from __future__ import annotations

import subprocess
from functools import partial

import numpy as np

from ..utils import get_sub_seed, is_array

__all__ = ["vectorize", "vectorize_traced", "run_vectorized",
           "external_operation", "run_external", "stdout_to_array",
           "unpack_meta", "prepare_seed"]


def mark_host(fn):
    """Mark an operation as host-only (non-traceable); the node DSL reads
    this to route execution through the host executor."""
    fn._elfi_host = True
    return fn


def is_host_op(fn):
    return getattr(fn, "_elfi_host", False)


# ---------------------------------------------------------------------------
# traced vectorization (jax.vmap)
# ---------------------------------------------------------------------------

def vectorize_traced(operation, constants=None):
    """Vectorize a per-realization JAX function over the batch with vmap.

    ``operation(*single_inputs, key=subkey)`` must be traceable and operate
    on one realization; the returned op has the standard simulator
    signature ``(*batch_inputs, batch_size, key)``.
    """
    import jax
    constants = set(constants or ())

    def op(*inputs, batch_size, key):
        keys = jax.random.split(key, batch_size)
        in_axes = tuple(None if i in constants else 0
                        for i in range(len(inputs)))

        def single(k, *args):
            return operation(*args, key=k)

        return jax.vmap(single, in_axes=(0,) + in_axes)(keys, *inputs)

    return op


# ---------------------------------------------------------------------------
# host-loop vectorization (reference parity, ``tools.py:13-138``)
# ---------------------------------------------------------------------------

def run_vectorized(operation, *inputs, constants=None, dtype=None,
                   batch_size=None, **kwargs):
    """Run ``operation`` once per batch member (host loop)."""
    constants = [] if constants is None else list(constants)
    for i, inpt in enumerate(inputs):
        if i in constants:
            continue
        if is_array(inpt):
            length = len(inpt)
            if batch_size is None:
                batch_size = length
            elif batch_size != length:
                raise ValueError(
                    f"Batch size {batch_size} does not match input {i} "
                    f"length {length}; check the `constants` mask.")
        else:
            constants.append(i)
    if batch_size is None:
        batch_size = 1

    runs = np.empty(batch_size, dtype=object) if dtype is False else []
    for index_in_batch in range(batch_size):
        inputs_i = [inpt if i in constants else inpt[index_in_batch]
                    for i, inpt in enumerate(inputs)]
        if "meta" in kwargs:
            kwargs["meta"]["index_in_batch"] = index_in_batch
        output = operation(*inputs_i, **kwargs)
        if dtype is False:
            runs[index_in_batch] = output
        else:
            runs.append(output)
    if dtype is not False:
        runs = np.array(runs, dtype=dtype)
    return runs


def vectorize(operation, constants=None, dtype=None):
    """Loop-vectorize a scalar host operation (reference
    ``tools.py:96-138``)."""
    return mark_host(partial(run_vectorized, operation, constants=constants,
                             dtype=dtype))


# ---------------------------------------------------------------------------
# external operations (reference ``tools.py:141-286``)
# ---------------------------------------------------------------------------

def unpack_meta(*inputs, **kwinputs):
    """Lift the ``meta`` dict entries into keyword inputs."""
    if "meta" in kwinputs:
        new_kwinputs = kwinputs["meta"].copy()
        new_kwinputs.update(kwinputs)
        kwinputs = new_kwinputs
    return inputs, kwinputs


def prepare_seed(*inputs, **kwinputs):
    """Derive an integer ``seed`` for the external process from the numpy
    random_state (reference ``tools.py:151-163``)."""
    if "random_state" in kwinputs:
        seed = kwinputs["random_state"].get_state()[1][0]
        sub_seed_index = kwinputs.get("index_in_batch") or 0
        kwinputs["seed"] = get_sub_seed(int(seed), sub_seed_index)
    return inputs, kwinputs


def stdout_to_array(stdout, *inputs, sep=" ", dtype=None, **kwinputs):
    """Parse one whitespace/sep-separated row of stdout into an array."""
    if isinstance(stdout, bytes):
        stdout = stdout.decode()
    parts = stdout.split() if sep == " " else stdout.split(sep)
    return np.array([p for p in parts if p != ""],
                    dtype=dtype or np.float64)


def run_external(command, *inputs, process_result=None, prepare_inputs=None,
                 stdout=True, subprocess_kwargs=None, **kwinputs):
    """Run a shell command once: format args, execute, process result."""
    inputs, kwinputs = unpack_meta(*inputs, **kwinputs)
    inputs, kwinputs = prepare_seed(*inputs, **kwinputs)
    if prepare_inputs:
        inputs, kwinputs = prepare_inputs(*inputs, **kwinputs)
    try:
        command = command.format(*inputs, **kwinputs)
    except KeyError as e:
        raise KeyError(f"The requested keyword {e} was not passed to the "
                       f'external operation: "{command}"') from None
    subprocess_kwargs_ = dict(shell=True, check=True)
    subprocess_kwargs_.update(subprocess_kwargs or {})
    completed = subprocess.run(command, **subprocess_kwargs_)
    result = completed.stdout if stdout else completed
    return process_result(result, *inputs, **kwinputs)


def external_operation(command, process_result=None, prepare_inputs=None,
                       sep=" ", stdout=True, subprocess_kwargs=None):
    """Wrap a shell command as an ELFI-compatible (host) operation.

    Format-string placeholders (``{0}``, ``{batch_size}``, ``{seed}``, ...)
    are filled from the node inputs and meta; stdout is parsed to a numpy
    array by default (reference ``tools.py:212-286``).
    """
    if process_result is None or isinstance(process_result, (str, np.dtype)):
        kwargs = dict(sep=sep)
        if isinstance(process_result, (str, np.dtype)):
            kwargs["dtype"] = str(process_result)
        process_result = partial(stdout_to_array, **kwargs)
        stdout = True
    if stdout is True:
        subprocess_kwargs = subprocess_kwargs or {}
        subprocess_kwargs["stdout"] = subprocess.PIPE
    return mark_host(partial(run_external, command,
                             process_result=process_result,
                             prepare_inputs=prepare_inputs, stdout=stdout,
                             subprocess_kwargs=subprocess_kwargs))
