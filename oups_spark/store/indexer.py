"""Dataclass ⇔ directory-path indexer keys.

Same user contract as the reference's ``@toplevel`` / ``@sublevel``
decorators (reference: ``oups/store/indexer.py:294-413``): a frozen,
ordered dataclass whose ``int``/``str`` fields render to one path
level joined by ``field_sep`` (default ``-``); a nested ``@sublevel``
dataclass opens a subdirectory. Paths parse back into key instances.

This is pure metadata plumbing — no Spark feature involved; the path
a key renders to is where the dataset's parquet files + manifest
live, which at cluster scale maps onto a object-store prefix.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import get_type_hints

DEFAULT_FIELD_SEP = "-"
_ACCEPTED = (int, str)
_FORBIDDEN_CHARS = ("/", "\\", " ")


def _validate_fields(cls, field_sep: str) -> None:
    hints = get_type_hints(cls)
    fields = dataclasses.fields(cls)
    if not fields:
        raise TypeError(f"{cls.__name__}: at least one field required")
    for i, f in enumerate(fields):
        typ = hints[f.name]
        if dataclasses.is_dataclass(typ):
            if not getattr(typ, "__is_sublevel__", False):
                raise TypeError(
                    f"{cls.__name__}.{f.name}: nested dataclass must be @sublevel"
                )
            if i != len(fields) - 1:
                raise TypeError(
                    f"{cls.__name__}.{f.name}: a sublevel must be the last field"
                )
        elif typ not in _ACCEPTED:
            raise TypeError(
                f"{cls.__name__}.{f.name}: type {typ} not accepted (int/str only)"
            )


def _check_value(name: str, value, field_sep: str) -> None:
    if isinstance(value, str):
        if not value:
            raise ValueError(f"{name}: empty string not allowed")
        if field_sep in value:
            raise ValueError(f"{name}: {value!r} contains field separator {field_sep!r}")
        for ch in _FORBIDDEN_CHARS:
            if ch in value:
                raise ValueError(f"{name}: {value!r} contains forbidden char {ch!r}")


def _to_path(obj, field_sep: str) -> str:
    parts: list[str] = []
    own: list[str] = []
    for f in dataclasses.fields(obj):
        v = getattr(obj, f.name)
        if dataclasses.is_dataclass(v):
            parts.append(_to_path(v, field_sep))
        else:
            _check_value(f"{type(obj).__name__}.{f.name}", v, field_sep)
            own.append(str(v))
    head = field_sep.join(own)
    return "/".join([head, *parts]) if parts else head


def _from_path(cls, path: str, field_sep: str):
    levels = path.split("/")
    return _parse_levels(cls, levels, field_sep)


def _parse_levels(cls, levels: list[str], field_sep: str):
    hints = get_type_hints(cls)
    fields = dataclasses.fields(cls)
    scalar_fields = [f for f in fields if not dataclasses.is_dataclass(hints[f.name])]
    sub_fields = [f for f in fields if dataclasses.is_dataclass(hints[f.name])]
    if not levels:
        raise ValueError(f"{cls.__name__}: not enough path levels")
    head, rest = levels[0], levels[1:]
    values = head.split(field_sep)
    if len(values) != len(scalar_fields):
        raise ValueError(
            f"{cls.__name__}: level {head!r} has {len(values)} fields, "
            f"expected {len(scalar_fields)}"
        )
    kwargs = {}
    for f, raw in zip(scalar_fields, values):
        typ = hints[f.name]
        kwargs[f.name] = typ(raw)
    if sub_fields:
        (sub,) = sub_fields
        kwargs[sub.name] = _parse_levels(hints[sub.name], rest, field_sep)
    elif rest:
        raise ValueError(f"{cls.__name__}: extra path levels {rest}")
    return cls(**kwargs)


def _depth_of(cls) -> int:
    hints = get_type_hints(cls)
    for f in dataclasses.fields(cls):
        if dataclasses.is_dataclass(hints[f.name]):
            return 1 + _depth_of(hints[f.name])
    return 1


def sublevel(cls=None):
    """Mark a nested key level (one subdirectory)."""

    def wrap(c):
        c = dataclass(c, frozen=True, order=True)
        c.__is_sublevel__ = True
        _validate_fields(c, DEFAULT_FIELD_SEP)
        return c

    return wrap(cls) if cls is not None else wrap


def toplevel(cls=None, *, field_sep: str = DEFAULT_FIELD_SEP):
    """Make a frozen ordered dataclass usable as a store key.

    Adds ``to_path`` / ``from_path`` / ``depth`` and validation.
    """

    def wrap(c):
        # Inject value validation BEFORE applying @dataclass: the
        # generated __init__ only calls __post_init__ if it exists at
        # decoration time.
        orig_post = getattr(c, "__post_init__", None)

        def __post_init__(self):
            for f in dataclasses.fields(self):
                v = getattr(self, f.name)
                if not dataclasses.is_dataclass(v):
                    _check_value(f"{type(self).__name__}.{f.name}", v, field_sep)
            if orig_post:
                orig_post(self)

        c.__post_init__ = __post_init__
        c = dataclass(c, frozen=True, order=True)
        _validate_fields(c, field_sep)
        c.__is_toplevel__ = True
        c.__field_sep__ = field_sep
        c.to_path = property(lambda self: _to_path(self, field_sep))
        c.from_path = classmethod(lambda cls_, path: _from_path(cls_, path, field_sep))
        c.depth = classmethod(lambda cls_: _depth_of(cls_))
        return c

    return wrap(cls) if cls is not None else wrap


def is_toplevel(obj) -> bool:
    return getattr(obj, "__is_toplevel__", False)
