"""Property-based differential testing of the glob translator.

``glob_to_regex`` assembles component regexes with tricky ``**``
separator absorption; this file checks it against an INDEPENDENT
naive backtracking matcher (no regex, no shared assembly code) over
hypothesis-generated patterns and namespaces, plus targeted
invariants from the reference semantics (namespace.rs:30-101).

Pure-Python (no Spark session) — runs in milliseconds.
"""

from hypothesis import given, settings
from hypothesis import strategies as st

from flo_spark.functions.glob import GlobError, glob_to_regex, namespace_matches

# ---------------------------------------------------------------------------
# independent reference matcher (component-wise backtracking)
# ---------------------------------------------------------------------------


def _comp_match(pat: str, s: str) -> bool:
    """Single-component glob match: * ? [class] literals, no '/'."""

    def m(pi: int, si: int) -> bool:
        if pi == len(pat):
            return si == len(s)
        c = pat[pi]
        if c == "*":
            return any(m(pi + 1, k) for k in range(si, len(s) + 1))
        if si >= len(s):
            return False
        if c == "?":
            return m(pi + 1, si + 1)
        if c == "[":
            j = pi + 1
            negate = False
            if j < len(pat) and pat[j] in "!^":
                negate = True
                j += 1
            body_start = j
            if j < len(pat) and pat[j] == "]":
                j += 1
            while j < len(pat) and pat[j] != "]":
                j += 1
            body = pat[body_start:j]
            ok = False
            k = 0
            while k < len(body):
                if k + 2 < len(body) and body[k + 1] == "-":
                    if body[k] <= s[si] <= body[k + 2]:
                        ok = True
                    k += 3
                else:
                    if body[k] == s[si]:
                        ok = True
                    k += 1
            if negate:
                ok = not ok
            return ok and m(j + 1, si + 1)
        return c == s[si] and m(pi + 1, si + 1)

    return m(0, 0)


def _naive_match(pattern: str, ns: str) -> bool:
    pcomps = [c for c in pattern.split("/")]
    ncomps = ns.split("/")
    # collapse consecutive '**'
    collapsed: list[str] = []
    for c in pcomps:
        if c == "**" and collapsed and collapsed[-1] == "**":
            continue
        collapsed.append(c)

    def m(pi: int, ni: int) -> bool:
        if pi == len(collapsed):
            return ni == len(ncomps)
        if collapsed[pi] == "**":
            return any(m(pi + 1, k) for k in range(ni, len(ncomps) + 1))
        if ni >= len(ncomps):
            return False
        return _comp_match(collapsed[pi], ncomps[ni]) and m(pi + 1, ni + 1)

    return m(0, 0)


# ---------------------------------------------------------------------------
# strategies
# ---------------------------------------------------------------------------

_seg_chars = st.sampled_from("ab.")
_literal_seg = st.text(_seg_chars, min_size=0, max_size=3)
_pattern_comp = st.one_of(
    _literal_seg,
    st.just("*"),
    st.just("**"),
    st.just("?"),
    st.just("[ab]"),
    st.just("[!a]"),
    st.builds(lambda s: s + "*", _literal_seg),
    st.builds(lambda s: "*" + s, _literal_seg),
)
_pattern = st.builds(lambda cs: "/" + "/".join(cs), st.lists(_pattern_comp, min_size=1, max_size=4))
# Namespaces use non-empty components: flo's convention is
# '/'-separated path segments; empty components ('//', trailing '/')
# are degenerate and outside the reference's spec fixtures.
_ns_seg = st.text(_seg_chars, min_size=1, max_size=3)
_namespace = st.builds(
    lambda cs: "/" + "/".join(cs), st.lists(_ns_seg, min_size=1, max_size=5)
)


# ---------------------------------------------------------------------------
# properties
# ---------------------------------------------------------------------------


@settings(max_examples=400, deadline=None)
@given(pattern=_pattern, ns=_namespace)
def test_regex_agrees_with_naive_matcher(pattern, ns):
    assert namespace_matches(pattern, ns) == _naive_match(pattern, ns)


@settings(max_examples=200, deadline=None)
@given(ns=_namespace)
def test_match_all_patterns_match_everything(ns):
    for p in ("/**/*", "**", "/**"):
        assert namespace_matches(p, ns)


@settings(max_examples=200, deadline=None)
@given(ns=_namespace)
def test_literal_pattern_matches_only_itself(ns):
    # no wildcard chars => exact match semantics (namespace.rs:92-99)
    if any(c in ns for c in "*?["):
        return
    assert namespace_matches(ns, ns)
    assert not namespace_matches(ns, ns + "x")
    assert not namespace_matches(ns, "/pre" + ns)


@settings(max_examples=200, deadline=None)
@given(seg=st.text(st.sampled_from("ab"), min_size=1, max_size=4))
def test_single_star_never_crosses_separator(seg):
    # '/a/*' must not match '/a/<seg>/more' (namespace.rs:47-53)
    assert namespace_matches("/a/*", f"/a/{seg}")
    assert not namespace_matches("/a/*", f"/a/{seg}/more")


@settings(max_examples=100, deadline=None)
@given(
    depth=st.integers(min_value=0, max_value=4),
    seg=st.text(st.sampled_from("ab"), min_size=1, max_size=3),
)
def test_double_star_spans_any_depth(depth, seg):
    middle = "/".join(["x"] * depth)
    ns = "/root" + ("/" + middle if middle else "") + f"/{seg}"
    assert namespace_matches(f"/root/**/{seg}", ns)


def test_invalid_patterns_rejected():
    # the reference's rejection fixtures (namespace.rs:37-43)
    for bad in ("/***", "/**foo", "/foo**", "/foo[unclosed"):
        try:
            glob_to_regex(bad)
            raise AssertionError(f"{bad!r} should be rejected")
        except GlobError:
            pass


def test_case_sensitive():
    assert not namespace_matches("/Foo/*", "/foo/x")
