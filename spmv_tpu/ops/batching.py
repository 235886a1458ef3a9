"""Sequential vmap rules for Pallas kernels.

``jax.vmap`` over a Pallas TPU kernel fails Mosaic lowering when the
batch dim lands on an ANY-memory-space operand with a nontrivial index map
(the DIA kernels stream x through HBM windows exactly that way). The
batching rule here maps the kernel LANE BY LANE with ``lax.map`` instead —
and for these kernels that is not a workaround but the right schedule:
they are HBM-bandwidth-bound, so concurrent batch lanes would only contend
for the same stream; sequential lanes run each at full bandwidth.

This is what makes operator-batched solves (``jax.vmap(cg)`` over a stack
of matrices — tests/test_vmap_batch.py) work on real TPU hardware, not
just in the interpreter.
"""
from __future__ import annotations

import jax


def sequential_vmap(fn):
    """Wrap ``fn(*args) -> pytree`` in a ``custom_vmap`` whose batching
    rule runs one batch lane at a time via ``lax.map``. Unbatched operands
    are closed over (NOT broadcast-materialized). All outputs are batched.
    """
    wrapped = jax.custom_batching.custom_vmap(fn)

    @wrapped.def_vmap
    def _rule(axis_size, in_batched, *args):
        flat_args, treedef = jax.tree.flatten(args)
        # in_batched is a LIST of per-arg pytrees-of-bools; its leaf order
        # matches the flattened args tuple
        flat_b = [bool(b) for b in jax.tree.leaves(tuple(in_batched))]
        assert len(flat_b) == len(flat_args)
        xs = [a for a, b in zip(flat_args, flat_b) if b]

        def body(xs_slice):
            it = iter(xs_slice)
            merged = [next(it) if b else a
                      for a, b in zip(flat_args, flat_b)]
            return fn(*jax.tree.unflatten(treedef, merged))

        out = jax.lax.map(body, xs)
        return out, jax.tree.map(lambda _: True, out)

    return wrapped
