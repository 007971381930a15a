"""Codec registry.

The dynamic generalization of the reference's static per-column
encoding-policy table (/root/reference/src/bin/js2pq/main.rs:96-114,
SURVEY.md §2.6): instead of hard-coding "dictionary for tags,
BYTE_STREAM_SPLIT for sums_double", the selector picks from this
registry per column per block by measured size.
"""

from __future__ import annotations

import pyarrow as pa

from .alp import AlpCodec
from .base import Codec
from .bss import ByteStreamSplitCodec
from .dictionary import DictionaryCodec
from .fc import FrontCodec
from .foref import BitpackCodec, ForefCodec
from .fsst import FsstCodec
from .plain import PlainCodec
from .rle import RleCodec

_REGISTRY: dict[str, Codec] = {
    c.name: c
    for c in [
        PlainCodec(),
        DictionaryCodec(),
        RleCodec(),
        ForefCodec(),
        BitpackCodec(),
        ByteStreamSplitCodec(),
        AlpCodec(),
        FsstCodec(),
        FrontCodec(),
    ]
}


def get_codec(name: str) -> Codec:
    try:
        return _REGISTRY[name]
    except KeyError:
        raise ValueError(f"unknown codec {name!r}; have {sorted(_REGISTRY)}") from None


def all_codecs() -> dict[str, Codec]:
    return dict(_REGISTRY)


def codecs_for_type(t: pa.DataType) -> list[Codec]:
    return [c for c in _REGISTRY.values() if c.supports(t)]


__all__ = [
    "Codec",
    "get_codec",
    "all_codecs",
    "codecs_for_type",
]
