"""Nested configuration dictionary with slash-path access.

TPU-native re-implementation of the reference framework's config kernel
(capability parity with ``/root/reference/src/utils/config_dict.py``; see
SURVEY.md §2.1).  A :class:`ConfigDict` wraps a tree of plain dicts parsed
from YAML and provides:

* path access: ``cd['a/b/c'] == cd['a']['b']['c']``
* key aliasing: ``'batch size'`` and ``'batch_size'`` resolve to the same
  entry, whichever spelling the YAML used
* slash escaping: string *values* containing ``/`` (file paths, metric
  names) survive path splitting
* list traversal: when a value is a list of single-key dicts, a path can
  select one element by its key
* default injection (:meth:`get_or_update`, :meth:`fill_with_defaults`)
  driven by plain-dict parameter specs
* kwargs extraction for component constructors (:meth:`to_kwargs`)
* structural normalisation (:meth:`trim`, :meth:`expand`)

This file is pure Python with no JAX dependency: it runs on the host,
before any compilation happens.
"""
from __future__ import annotations

import copy as _copy
from typing import Any, Iterator, Optional, Tuple, Union

import yaml

__all__ = ["ConfigDict"]

# Sentinel used to escape '/' inside string values so that path splitting
# never cuts through a value.
_ESC = "\x1d//\x1d"

_MISSING = object()


def _variants(key: str):
    """Key spellings considered equivalent (space <-> underscore)."""
    yield key
    alt_us = key.replace(" ", "_")
    if alt_us != key:
        yield alt_us
    alt_sp = key.replace("_", " ")
    if alt_sp != key:
        yield alt_sp


def _escape(value):
    # idempotent: _ESC itself contains '/', so re-escaping an already
    # stored string (update() / get_or_update / elements_of re-ingest the
    # stored form) would corrupt it permanently
    if isinstance(value, str) and _ESC in value:
        return value
    if isinstance(value, str):
        return value.replace("/", _ESC)
    return value


def _unescape(value):
    if isinstance(value, str):
        return value.replace(_ESC, "/")
    return value


def unescape(value):
    """Public: recover '/' in strings read out of nested list/tuple values."""
    return _unescape(value)


class ConfigDict:
    """A nested mapping addressable by ``'/'``-separated key paths."""

    #: key paths whose values :meth:`trim` must never collapse
    PROTECTED = ("meta/technical/name_fields",)

    # ------------------------------------------------------------------
    # construction
    # ------------------------------------------------------------------

    def __init__(self, data: Optional[dict] = None):
        self._store: dict = {}
        if data:
            for key, value in data.items():
                self._store[key] = self._ingest(value)

    @classmethod
    def from_yaml(cls, path) -> "ConfigDict":
        with open(path, "r") as fh:
            return cls(yaml.full_load(fh))

    def _ingest(self, value):
        """Convert raw YAML values into stored form."""
        if isinstance(value, ConfigDict):
            return value
        if isinstance(value, dict):
            if all(isinstance(k, str) for k in value):
                return ConfigDict(value)
            return value
        if isinstance(value, (list, tuple)):
            return type(value)(self._ingest(v) for v in value)
        return _escape(value)

    # ------------------------------------------------------------------
    # key resolution
    # ------------------------------------------------------------------

    def _resolve_key(self, key: str) -> Optional[str]:
        """Return the stored spelling of *key*, or None."""
        for variant in _variants(key):
            if variant in self._store:
                return variant
        return None

    @staticmethod
    def _split(path: str) -> Tuple[str, Optional[str]]:
        head, sep, rest = path.partition("/")
        return head, (rest if sep else None)

    @staticmethod
    def _select_from_list(seq, key: str):
        """From a list of single-key ConfigDicts pick the one keyed *key*."""
        for element in seq:
            if isinstance(element, ConfigDict) and len(element) == 1 \
                    and element.key() == key:
                return element
        return None

    # ------------------------------------------------------------------
    # mapping protocol
    # ------------------------------------------------------------------

    def __getitem__(self, path: Optional[str]) -> Any:
        if path is None:
            return self
        head, rest = self._split(path)
        stored = self._resolve_key(head)
        value = self._store.get(stored) if stored is not None else None
        if rest is None:
            return _unescape(value)
        # descend
        if isinstance(value, (list, tuple)):
            if len(value) == 1 and isinstance(value[0], ConfigDict):
                value = value[0]
            else:
                nxt, rest2 = self._split(rest)
                chosen = self._select_from_list(value, nxt)
                if chosen is not None:
                    inner = chosen.value()
                    return inner if rest2 is None else inner[rest2]
                # no matching single-key element: the reference's match
                # loop falls through and returns the list itself
                # (config_dict.py:68-75)
                return _unescape(value)
        if isinstance(value, ConfigDict):
            return value[rest]
        if value is None:
            raise KeyError(path)
        # scalar mid-path: mirror dict behaviour
        raise KeyError(path)

    def __setitem__(self, path: str, value: Any):
        head, rest = self._split(path)
        if rest is None:
            stored = self._resolve_key(head) or head
            self._store[stored] = self._ingest(value)
            return
        stored = self._resolve_key(head)
        if stored is None:
            stored = head
            self._store[stored] = ConfigDict()
        child = self._store[stored]
        if child is None:
            # overwriting an explicit null with a subtree is benign
            child = ConfigDict()
            self._store[stored] = child
        if not isinstance(child, ConfigDict):
            # the reference indexes straight into the child
            # (config_dict.py:127: ``self.config_dict[key][rest] = value``),
            # so a list or scalar intermediate fails LOUDLY there — silently
            # replacing it here would drop sibling config entries
            raise TypeError(
                f"cannot set {path!r}: {head!r} holds a "
                f"{type(child).__name__}, not a ConfigDict")
        child[rest] = value

    def has(self, path: str) -> bool:
        head, rest = self._split(path)
        stored = self._resolve_key(head)
        if stored is None:
            return False
        if rest is None:
            return True
        value = self._store[stored]
        if isinstance(value, (list, tuple)):
            if len(value) == 1 and isinstance(value[0], ConfigDict):
                value = value[0]
            else:
                nxt, rest2 = self._split(rest)
                chosen = self._select_from_list(value, nxt)
                if chosen is None:
                    return False
                if rest2 is None:
                    return True
                inner = chosen.value()
                return inner.has(rest2) if isinstance(inner, ConfigDict) \
                    else False
        if isinstance(value, ConfigDict):
            return value.has(rest)
        return False

    def __contains__(self, path: str) -> bool:
        return self.has(path)

    def get(self, path: str, default=None):
        return self[path] if self.has(path) else default

    def pop(self, path: str, *default):
        if len(default) > 1:
            raise TypeError("pop() accepts at most one default value")
        head, rest = self._split(path)
        if rest is None:
            found = _MISSING
            for variant in _variants(head):
                if variant in self._store:
                    found = self._store.pop(variant)
            if found is not _MISSING:
                return _unescape(found)
            if default:
                return default[0]
            raise KeyError(path)
        stored = self._resolve_key(head)
        if stored is None or not isinstance(self._store[stored], ConfigDict):
            if default:
                return default[0]
            raise KeyError(path)
        return self._store[stored].pop(rest, *default)

    def popitem(self):
        return self._store.popitem()

    def clear(self):
        self._store.clear()

    def keys(self):
        return self._store.keys()

    def values(self):
        return self._store.values()

    def items(self):
        return self._store.items()

    def __iter__(self) -> Iterator[str]:
        return iter(self._store)

    def __len__(self) -> int:
        return len(self._store)

    def __eq__(self, other) -> bool:
        return isinstance(other, ConfigDict) and self._store == other._store

    def __repr__(self) -> str:
        return f"ConfigDict({self.to_dict()})"

    def copy(self) -> "ConfigDict":
        return _copy.deepcopy(self)

    def __deepcopy__(self, memo):
        clone = ConfigDict()
        clone._store = _copy.deepcopy(self._store, memo)
        return clone

    # ------------------------------------------------------------------
    # single-entry accessors
    # ------------------------------------------------------------------

    def key(self) -> str:
        if len(self._store) != 1:
            raise ValueError(
                f"key() needs exactly one entry, got {list(self._store)}")
        return next(iter(self._store))

    def value(self):
        if len(self._store) != 1:
            raise ValueError(
                f"value() needs exactly one entry, got {list(self._store)}")
        return _unescape(next(iter(self._store.values())))

    def item(self):
        return self.key(), self.value()

    # ------------------------------------------------------------------
    # typed getters
    # ------------------------------------------------------------------

    def get_str(self, path: Optional[str] = None) -> str:
        value = self[path]
        if isinstance(value, ConfigDict):
            value = value.key()
        return _unescape(value)

    def get_tuple(self, path: str, default=()) -> tuple:
        value = self.get(path, default)
        if not isinstance(value, (list, tuple)):
            value = (value,)
        return tuple(value)

    def get_str_tuple(self, path: str, default=()) -> Tuple[str, ...]:
        out = []
        for value in self.get_tuple(path, default):
            if isinstance(value, ConfigDict):
                value = value.key()
            out.append(_unescape(value))
        return tuple(out)

    # ------------------------------------------------------------------
    # defaults machinery
    # ------------------------------------------------------------------

    def get_or_update(self, path: str, default: Union[dict, Any],
                      final: bool = True, keep_key_seq: bool = False):
        """Read ``self[path]``; when absent, insert (and return) a default.

        ``default`` may be a spec table mapping parameter names to either a
        plain default value or a ``{'default': v, ...}`` spec, in which case
        the entry looked up is the last path segment (or the whole path when
        ``keep_key_seq``).  When ``final`` is False a string default is
        stored in expanded ``{name: {}}`` form so it can keep being built up.
        """
        if self.has(path):
            value = self[path]
        else:
            if isinstance(default, dict):
                lookup = path if keep_key_seq else path.rsplit("/", 1)[-1]
                spec = default[lookup]
                if isinstance(spec, dict):
                    value = spec.get("default", spec)
                else:
                    value = spec
            else:
                value = default
        if not final and isinstance(value, str):
            value = {value: {}}
        if isinstance(value, dict) and all(isinstance(k, str) for k in value):
            value = ConfigDict(value)
        self[path] = value
        return self[path] if isinstance(value, ConfigDict) else value

    def fill_with_defaults(self, spec_table: dict, final: bool = False,
                           keep_key_seq: bool = True) -> "ConfigDict":
        for path in spec_table:
            self.get_or_update(path, spec_table, final, keep_key_seq)
        return self

    def update(self, other: Union[dict, "ConfigDict"]):
        for key, value in other.items():
            if isinstance(value, ConfigDict):
                value = value.to_dict(lists_to_tuples=False,
                                      space_to_underscore=False)
            if not isinstance(value, dict):
                self[key] = value
            elif not self.has(key):
                self[key] = ConfigDict(value)
            else:
                self[key].update(value)

    def mask(self, *paths: str) -> "ConfigDict":
        """A deep copy with the given key paths removed."""
        clone = self.copy()
        for path in paths:
            if path in clone:
                try:
                    clone.pop(path)
                except KeyError:
                    # has() can traverse list elements that pop() cannot
                    # address (a path into a {name: {}} list entry); leave
                    # such paths in place rather than crash
                    pass
        return clone

    def to_kwargs(self, default_dict: dict,
                  key_seq: Optional[str] = None) -> dict:
        """Build constructor kwargs from a parameter-spec table.

        Each spec entry ``name -> {'argument name': a, 'default': d}`` (or a
        plain default) yields one kwarg; values come from ``self[key_seq]``
        with defaults injected in place.
        """
        if key_seq is None:
            key_seq = self.key()
        target = self[key_seq]
        if not isinstance(target, ConfigDict):
            target = ConfigDict()
            self[key_seq] = target
        kwargs = {}
        for name, spec in default_dict.items():
            arg = name
            if isinstance(spec, dict):
                arg = spec.get("argument name", spec.get("argument_name", name))
            kwargs[arg] = target.get_or_update(name, default_dict)
        return kwargs

    # ------------------------------------------------------------------
    # structural transforms
    # ------------------------------------------------------------------

    def elements_of(self, path: str):
        """Iterate ``self[path]`` as a list of ConfigDicts, normalising in
        place: scalars become 1-lists, bare names become ``{name: {}}``."""
        if not self.has(path):
            return
        value = self[path]
        if isinstance(value, (list, tuple)):
            value = list(value)
        else:
            value = [value]
        self[path] = value
        stored = self[path]
        for i, element in enumerate(stored):
            if not isinstance(element, ConfigDict):
                element = ConfigDict({element: {}})
                stored[i] = element
            yield element

    def _is_protected(self, key: str) -> bool:
        for protected in self.PROTECTED:
            parts = protected.split("/")
            if any(key == "/".join(parts[i:]) for i in range(len(parts))):
                return True
        return False

    def trim(self) -> "ConfigDict":
        """Collapse ``{name: {}}`` to ``name`` and 1-lists to their element."""
        def collapse(value):
            if isinstance(value, ConfigDict):
                if len(value) == 1:
                    inner = next(iter(value._store.values()))
                    if isinstance(inner, ConfigDict) and len(inner) == 0:
                        return value.key()
                return value.trim()
            if isinstance(value, (list, tuple)):
                if len(value) == 1:
                    return collapse(value[0])
                return type(value)(collapse(v) for v in value)
            return value

        out = ConfigDict()
        for key, value in self._store.items():
            out._store[key] = value if self._is_protected(key) else collapse(value)
        return out

    def expand(self):
        """Recursively replace bare string values (without '/') by
        ``{value: {}}`` so they can carry parameters."""
        for key in list(self._store):
            value = self._store[key]
            if isinstance(value, str) and _ESC not in value and "/" not in value:
                self._store[key] = ConfigDict({value: {}})
            elif isinstance(value, ConfigDict):
                value.expand()

    def depth(self) -> int:
        children = [v.depth() for v in self._store.values()
                    if isinstance(v, ConfigDict)]
        if not self._store:
            return 0
        return 1 + max(children, default=0)

    def to_dict(self, lists_to_tuples: bool = True,
                space_to_underscore: bool = True) -> dict:
        def out_value(value):
            if isinstance(value, ConfigDict):
                return value.to_dict(lists_to_tuples, space_to_underscore)
            if isinstance(value, (list, tuple)):
                seq_type = tuple if lists_to_tuples else type(value)
                return seq_type(out_value(v) for v in value)
            return _unescape(value)

        def out_key(key):
            key = _unescape(key)
            return key.replace(" ", "_") if space_to_underscore else key

        return {out_key(k): out_value(v) for k, v in self._store.items()}
