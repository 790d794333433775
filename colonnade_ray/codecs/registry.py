"""Codec registry — the user-extension surface.

Graft of the reference's core design: the whole library is the
extension surface, users supply per-column encode (``a -> c``) and
decode (``c -> Maybe a``) functions and compose them
(colonnade/src/Colonnade.hs:110-120, siphon/src/Siphon.hs:751-763;
SURVEY.md §2.7 user-extension row).  Here a user codec implements the
``Codec`` protocol (estimate/encode/decode over numpy chunks) and
registers; the auto-selector consults it like the built-ins.
"""

from __future__ import annotations

from typing import Optional

from . import columns as _columns
from .base import Codec
from .ints import INT_CODECS


def register_int_codec(codec: Codec, consider: bool = True,
                       position: Optional[int] = None) -> None:
    """Register a user integer-stream codec.

    consider=True adds it to the selector's candidate order (at
    ``position``, default before 'plain' — remember: earlier position
    wins estimate ties, and selection must stay deterministic).
    """
    if not codec.name or codec.name in INT_CODECS:
        raise ValueError(f"codec name invalid or taken: {codec.name!r}")
    INT_CODECS[codec.name] = codec
    if consider:
        order = list(_columns.INT_CANDIDATE_ORDER)
        idx = position if position is not None else len(order) - 1
        order.insert(idx, codec.name)
        _columns.INT_CANDIDATE_ORDER = tuple(order)


def unregister_int_codec(name: str) -> None:
    INT_CODECS.pop(name, None)
    _columns.INT_CANDIDATE_ORDER = tuple(
        c for c in _columns.INT_CANDIDATE_ORDER if c != name
    )


def registered_codecs() -> dict:
    return dict(INT_CODECS)
