"""Shared jit-shape padding helpers.

Every device program in the framework pads its dynamic sizes to a small set
of static shapes so XLA compiles once per bucket instead of once per input
size.  These two policies were previously copy-pasted across the index, ops,
and model modules; they live here so a bucket-policy change cannot silently
miss a call site.
"""

from __future__ import annotations

__all__ = ["bucket", "round_up"]


def round_up(n: int, multiple: int) -> int:
    """Smallest positive multiple of ``multiple`` that is >= ``n``.

    Returns ``multiple`` (not 0) for ``n <= 0`` — padded buffers are never
    empty, which keeps downstream kernels free of zero-size edge cases."""
    return max(multiple, -(-n // multiple) * multiple)


def bucket(n: int, minimum: int = 256) -> int:
    """Round up to a power of two — geometric padding buckets bound the
    number of distinct jit shapes (hence compiles) to O(log max_size)."""
    size = minimum
    while size < n:
        size *= 2
    return size
