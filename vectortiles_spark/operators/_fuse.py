"""Adjacent mapInArrow kernel fusion (guide §4.1).

Each chained ``mapInArrow`` operator is a separate plan node with its own
Python worker: consecutive passes pay a JVM->Python->JVM round trip per
node, shuttling the (heavy, nested-geometry) intermediate through Arrow
serialization each time, and a task running an N-deep chain keeps N
Python workers busy at once (measured: the clip->simplify->geom map
stage of the vector pipeline spent ~54 task-seconds for ~4 CPU-seconds
of kernel work at bench scale).

Operators that are pure batch-iterator transforms opt in by tagging
their output DataFrame with ``(parent, kernel)``; the next tagged-aware
operator composes its kernel with the previous one over the SAME parent,
so the whole chain becomes ONE MapInArrow node. The tag is an attribute
on the Python DataFrame object — composition only happens when the same
object flows from one operator call into the next (the normal pipeline
shape); any other usage keeps the uncomposed plan and identical
semantics, since the fused generator is literally ``g(f(batches))``.
"""

from __future__ import annotations

_ATTR = "_vts_arrow_kernel"


def tag(out_df, parent_df, kernel):
    """Mark ``out_df`` (parent.mapInArrow(kernel, ...)) as fusable."""
    setattr(out_df, _ATTR, (parent_df, kernel))
    return out_df


def tagged(df):
    """(parent, kernel) if ``df`` is a fusable mapInArrow result, else None."""
    return getattr(df, _ATTR, None)


def compose(prev_kernel, kernel):
    """Batch-iterator composition: feed prev_kernel's output batches
    straight into kernel — no JVM hop, no re-serialization."""

    def fused(batches):
        return kernel(prev_kernel(batches))

    return fused
