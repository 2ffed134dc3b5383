"""Golden table from the reference parser tests
(/root/reference/service/query/parser_test.go:22-164), values inlined."""

import pytest

from gloomy_spark.query import RegexPrefixError, regex_to_prefixes


@pytest.mark.parametrize(
    "pattern,expected",
    [
        ("žluťoučký", ["žluťoučký"]),
        ("te[dxa]Z", ["tedZ", "texZ", "teaZ"]),
        ("(foo)", ["foo"]),
        ("(foo)|(bar)|(baz)", ["foo", "bar", "baz"]),
        ("foo|bar", ["fooar", "fobar"]),
        ("(foo)|([bB]ar)", ["foo", "bar", "Bar"]),
        ("abc?d", ["abcd", "abd"]),
        ("me(to)?dic", ["metodic", "medic"]),
        ("me(tada)?[Tt]a", ["metadaTa", "metadata", "meTa", "meta"]),
        ("me(tad[aA]x)?", ["metadax", "metadAx", "me"]),
        ("foo.+z", ["foo*"]),
        ("foo.*z", ["foo*", "fooz"]),
        ("dogs?", ["dogs", "dog"]),
    ],
)
def test_golden_prefixes(pattern, expected):
    assert regex_to_prefixes(pattern) == expected


@pytest.mark.parametrize("bad", ["[hxXH", "[hx(foo)H]", "foo)", "", "?", "a("])
def test_parse_errors(bad):
    with pytest.raises(RegexPrefixError):
        regex_to_prefixes(bad)
