"""Code-point <-> UTF-16 position conversion.

The reference reports event positions in UTF-16 code units (JS string
indices); this engine reports Unicode code-point offsets (Python string
indices). The two agree for BMP-only documents; astral-plane characters
(emoji etc.) occupy two UTF-16 units but one code point. These helpers
convert between the schemes so index-sensitive consumers (or directly
ported reference goldens containing astral chars) can reconcile.
"""

from __future__ import annotations

import bisect

__all__ = ["utf16_offsets", "cp_to_utf16", "utf16_to_cp"]


def utf16_offsets(text: str) -> list[int]:
    """Sorted code-point indices of astral characters in ``text``."""
    return [i for i, ch in enumerate(text) if ord(ch) > 0xFFFF]


def cp_to_utf16(offsets: list[int], cp_index: int) -> int:
    """Map a code-point index to the corresponding UTF-16 unit index."""
    return cp_index + bisect.bisect_left(offsets, cp_index)


def utf16_to_cp(offsets: list[int], u16_index: int) -> int:
    """Map a UTF-16 unit index back to a code-point index."""
    # Each astral char before the position adds one extra UTF-16 unit.
    # A position pointing INSIDE a surrogate pair has no fixed point and
    # oscillates between the char's cp index and the one after; resolve
    # to the character's own index (the smaller value).
    cp = u16_index
    prev = -1
    while True:
        new_cp = u16_index - bisect.bisect_left(offsets, cp)
        if new_cp == cp:
            return cp
        if new_cp == prev:
            return min(cp, new_cp)
        prev = cp
        cp = new_cp
