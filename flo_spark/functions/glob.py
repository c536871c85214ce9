"""Namespace glob -> regex translation with flo's exact semantics.

flo filters consumed events by a file-glob pattern over the event
namespace, evaluated by the Rust ``glob`` crate with
``case_sensitive=true, require_literal_separator=true``
(reference: flo-server/.../event_reader/namespace.rs:4-27).  The inline
tests at namespace.rs:30-101 are the de-facto spec:

- ``*``  matches any run of non-separator chars (may be empty; never
  crosses ``/``).
- ``?``  matches exactly one non-separator char.
- ``**`` matches zero or more whole path components; it must itself be
  a whole component — ``/***``, ``/**foo``, ``/foo**`` are invalid.
- ``[abc]`` / ``[a-z]`` / ``[!a-z]`` character classes; unclosed ``[``
  is invalid.
- No stars => exact string match only.
- ``/**/*`` is flo's match-everything fast path
  (event_reader/mod.rs:27-34): the filter is skipped entirely.

Spark usage: ``df.filter(F.col("namespace").rlike(glob_to_regex(p)))``
— a plain Catalyst predicate, so it participates in pushdown and
whole-stage codegen; no UDF involved.
"""

from __future__ import annotations

import re

_RE_SPECIAL = set(".^$+{}()|\\")

#: Patterns flo treats as "match everything" (event_reader/mod.rs:27-34).
MATCH_ALL_PATTERNS = frozenset({"/**/*", "**", "/**"})


class GlobError(ValueError):
    """Raised for patterns the Rust glob crate would reject."""


def is_match_all(pattern: str | None) -> bool:
    return pattern is None or pattern == "" or pattern in MATCH_ALL_PATTERNS


def _translate_component(comp: str) -> str:
    """Translate one path component (no '/') to a regex fragment."""
    if "**" in comp and comp != "**":
        raise GlobError(
            f"recursive wildcard '**' must form a single path component: {comp!r}"
        )
    out: list[str] = []
    i = 0
    n = len(comp)
    while i < n:
        c = comp[i]
        if c == "*":
            out.append("[^/]*")
            i += 1
        elif c == "?":
            out.append("[^/]")
            i += 1
        elif c == "[":
            j = i + 1
            negate = False
            if j < n and comp[j] in "!^":
                negate = True
                j += 1
            if j < n and comp[j] == "]":  # first ']' in a class is literal
                j += 1
            while j < n and comp[j] != "]":
                j += 1
            if j >= n:
                raise GlobError(f"unclosed character class in {comp!r}")
            body = comp[i + 1 + (1 if negate else 0) : j]
            body = body.replace("\\", "\\\\").replace("^", "\\^")
            # require_literal_separator: a negated class must still
            # refuse '/' (the positive body can never contain '/' —
            # components are split on it)
            out.append("[" + ("^/" if negate else "") + body + "]")
            i = j + 1
        elif c in _RE_SPECIAL:
            out.append("\\" + c)
            i += 1
        else:
            out.append(c)
            i += 1
    return "".join(out)


def glob_to_regex(pattern: str) -> str:
    """Translate a flo namespace glob into an anchored regex string.

    Raises GlobError on patterns the reference rejects
    (namespace.rs:37-43: ``/***``, ``/**foo``, ``/foo**``,
    ``/foo[unclosed``).
    """
    if pattern is None:
        raise GlobError("pattern must not be None")
    raw = pattern.split("/")
    # Translate components; None marks a recursive '**' component.
    # Collapse consecutive '**' runs — they are equivalent to one.
    parts: list[str | None] = []
    for comp in raw:
        p = None if comp == "**" else _translate_component(comp)
        if p is None and parts and parts[-1] is None:
            continue
        parts.append(p)

    if parts == [None]:  # pattern is exactly '**'
        return "^.*$"

    # Assemble, absorbing one adjacent '/' into each '**' so it can
    # match *zero* components ('/root/**/*suffix' matches
    # '/root/baz-suffix' — namespace.rs:55-57).
    out: list[str] = []
    emitted_any = False  # a normal component has been emitted
    pending_lead = False  # leading '**' awaiting its following component
    for i, p in enumerate(parts):
        if p is None:
            if not emitted_any:
                pending_lead = True  # leading '**/...'
            else:
                out.append("(?:/[^/]+)*")  # mid or trailing '**'
        else:
            if pending_lead:
                out.append("(?:[^/]+/)*")
                pending_lead = False
            elif emitted_any:
                out.append("/")  # separator after normal OR recursive part
            out.append(p)
            emitted_any = True
    return "^" + "".join(out) + "$"


def literal_first_segment(pattern: str | None) -> str | None:
    """The first path component of the pattern, iff it is fully literal.

    Used for namespace-prefix partition pruning: when a glob starts
    with a literal segment (``/orders/**`` -> ``orders``), a stream
    partitioned by first segment can skip every other prefix directory
    at the file listing — the directory-level analog of flo's index
    seek (SURVEY.md §4 'optional later' rule).  Returns None when the
    first component contains any glob metacharacter (pruning would be
    unsound) or the pattern matches everything."""
    if is_match_all(pattern):
        return None
    comps = pattern.split("/")
    idx = 1 if pattern.startswith("/") else 0
    if idx >= len(comps):
        return None
    c = comps[idx]
    if c == "" or any(ch in c for ch in "*?["):
        return None
    return c


def literal_prefix(pattern: str | None) -> str | None:
    """Longest leading LITERAL of the glob — every match must start
    with these characters, so they form a sound ``startswith``
    predicate.  Unlike the regex the glob compiles to, a StartsWith
    IS pushable into a parquet scan (Catalyst's StringStartsWith
    maps to row-group min/max pruning on the string column), so a
    prefixed glob like ``/orders/eu/*`` skips row groups whose
    namespace range cannot contain the prefix — the columnar analog
    of flo's per-reader glob (event_reader/mod.rs:60-74) evaluated
    from statistics alone.  Returns None when the pattern starts with
    a metacharacter or matches everything."""
    if pattern is None or is_match_all(pattern):
        return None
    out = []
    for ch in pattern:
        if ch in "*?[":
            break
        out.append(ch)
    return "".join(out) or None


def namespace_matches(pattern: str, namespace: str) -> bool:
    """Pure-Python evaluation (used in tests; Spark path uses rlike)."""
    if is_match_all(pattern):
        return True
    return re.match(glob_to_regex(pattern), namespace) is not None
