"""Glob semantics spec — table-driven from the reference's inline tests
(flo-server/.../event_reader/namespace.rs:30-101) and system-level tests
(flo-server/tests/sync_client_tests.rs:179-206)."""

import pytest

from flo_spark.functions.glob import (
    GlobError,
    glob_to_regex,
    is_match_all,
    namespace_matches,
)


@pytest.mark.parametrize("bad", ["/***", "/**foo", "/foo**", "/foo[unclosed"])
def test_invalid_glob_syntax_raises(bad):
    with pytest.raises(GlobError):
        glob_to_regex(bad)


def test_globbing_in_subdirectories():
    # namespace.rs:47-68
    assert namespace_matches("/*suffix", "/foo_suffix")
    assert namespace_matches("/*suffix", "/suffix")
    assert not namespace_matches("/*suffix", "/suffixPlusMore")
    assert not namespace_matches("/*suffix", "/foo/suffix")

    assert namespace_matches("/root/**/*suffix", "/root/foo/bar/baz-suffix")
    assert namespace_matches("/root/**/*suffix", "/root/baz-suffix")

    assert namespace_matches("/root/**/foo/bar*", "/root/foo/barista")
    assert namespace_matches("/root/**/foo/bar*", "/root/this/that/foo/baritone")
    assert namespace_matches("/root/**/foo/bar*", "/root/foo/foo/bar")
    assert not namespace_matches("/root/**/foo/bar*", "/root/foo/goo")
    assert not namespace_matches("/root/**/foo/bar*", "/root/bar")
    assert not namespace_matches("/root/**/foo/bar*", "/foo/barrel")


def test_double_star_matches_any_number_of_subdirectories():
    # namespace.rs:70-79
    assert namespace_matches("/foo/**/bar", "/foo/bar")
    assert namespace_matches("/foo/**/bar", "/foo/baz/bar")
    assert namespace_matches("/foo/**/bar", "/foo/this/that/the_other/bar")
    assert not namespace_matches("/foo/**/bar", "/foo/barrrrrrrr")
    assert not namespace_matches("/foo/**/bar", "/foo")


def test_slash_star_matches_all_top_level_namespaces():
    # namespace.rs:81-88
    assert namespace_matches("/*", "/foo")
    assert namespace_matches("/*", "/bar")
    assert not namespace_matches("/*", "/foo/bar")


def test_no_stars_means_exact_match():
    # namespace.rs:90-101
    assert not namespace_matches("/this", "/that")
    assert namespace_matches("/test/namespace", "/test/namespace")


def test_system_level_fixtures():
    # sync_client_tests.rs:179-206
    foods = ["/meals/breakfast/foods/bacon", "/meals/breakfast/foods/eggs"]
    drinks = ["/meals/breakfast/drinks/coffee", "/meals/lunch/drinks/soda"]
    exact = ["/meals/breakfast"]
    universe = foods + drinks + exact

    got = [n for n in universe if namespace_matches("/meals/breakfast/foods/*", n)]
    assert got == foods
    got = [n for n in universe if namespace_matches("/**/drinks/*", n)]
    assert got == drinks
    got = [n for n in universe if namespace_matches("/meals/breakfast", n)]
    assert got == exact


def test_match_all_fast_path():
    # event_reader/mod.rs:27-34 — '/**/*' means no filtering at all
    assert is_match_all("/**/*")
    assert is_match_all(None)
    assert is_match_all("")
    assert not is_match_all("/foo/*")


def test_question_mark_and_classes():
    assert namespace_matches("/a?c", "/abc")
    assert not namespace_matches("/a?c", "/a/c")  # ? never crosses '/'
    assert not namespace_matches("/a?c", "/ac")
    assert namespace_matches("/f[ao]o", "/foo")
    assert namespace_matches("/f[ao]o", "/fao")
    assert not namespace_matches("/f[ao]o", "/fxo")
    assert namespace_matches("/f[!ao]o", "/fxo")
    assert not namespace_matches("/f[!ao]o", "/foo")
    assert namespace_matches("/v[0-9]", "/v7")


def test_regex_metachars_are_literal():
    assert namespace_matches("/a.b", "/a.b")
    assert not namespace_matches("/a.b", "/axb")
    assert namespace_matches("/a+b(c)", "/a+b(c)")


def test_double_star_zero_components_edge():
    assert namespace_matches("/a/**/b/c", "/a/b/c")
    assert namespace_matches("/a/**/b/c", "/a/x/y/b/c")
    assert not namespace_matches("/a/**/b/c", "/a/xb/c")
    assert namespace_matches("/a/**", "/a")  # trailing ** matches zero
    assert namespace_matches("/a/**", "/a/b/c")


def test_literal_first_segment():
    from flo_spark.functions.glob import literal_first_segment as lfs

    assert lfs("/orders/**") == "orders"
    assert lfs("/orders/eu/*") == "orders"
    assert lfs("orders/*") == "orders"
    assert lfs("/meals/breakfast") == "meals"
    # non-literal or match-all => no pruning
    assert lfs("/*s*/**") is None
    assert lfs("/or?ers/**") is None
    assert lfs("/or[cd]ers/**") is None
    assert lfs("/**/foo") is None
    assert lfs("/**/*") is None
    assert lfs("**") is None
    assert lfs(None) is None
    assert lfs("/") is None
    assert lfs("") is None


def test_literal_prefix_extraction():
    from flo_spark.functions.glob import literal_prefix

    assert literal_prefix("/orders/eu/*") == "/orders/eu/"
    assert literal_prefix("/orders/e?/x") == "/orders/e"
    assert literal_prefix("/a/[bc]/d") == "/a/"
    assert literal_prefix("*anything") is None
    assert literal_prefix("/**/*") is None  # match-all fast path
    assert literal_prefix(None) is None
    assert literal_prefix("/plain/literal") == "/plain/literal"
