"""Query-language parser tests — port of query_parser/src/{parser,lexer}.rs tests."""

import pytest

from veloci_tpu.query.parser import (
    Options,
    ParseError,
    UserAST,
    parse,
    parse_with_opt,
)


def ast_str(query: str) -> str:
    return repr(parse(query))


def test_simple():
    assert parse("hallo") == UserAST.leaf("hallo")


def test_invalid():
    with pytest.raises(ParseError):
        parse("field:what:ok")


def test_phrases():
    assert parse('"cool")') == UserAST.leaf("cool")
    assert parse('"cooles teil")') == UserAST.leaf("cooles teil")


def test_parentheses():
    assert parse("(cool)") == UserAST.leaf("cool")
    assert parse("((((((cool))))))") == UserAST.leaf("cool")
    assert ast_str("((((((cool)))))) AND ((((((cool))))))") == '("cool" AND "cool")'
    assert ast_str("(super AND cool) OR fancy") == '(("super" AND "cool") OR "fancy")'
    assert ast_str("(super AND cool) OR (fancy)") == '(("super" AND "cool") OR "fancy")'
    assert ast_str("((super AND cool)) OR (fancy)") == '(("super" AND "cool") OR "fancy")'


def test_parentheses_disabled():
    opt = Options(no_parentheses=True)
    assert parse_with_opt("(cool)", opt) == UserAST.leaf("(cool)")
    assert repr(parse_with_opt("((((((cool)))))) AND ((((((cool))))))", opt)) == (
        '("((((((cool))))))" AND "((((((cool))))))")'
    )


def test_and_or():
    assert ast_str("super AND cool OR fancy") == '("super" AND ("cool" OR "fancy"))'
    assert ast_str("super OR cool AND fancy") == '("super" OR ("cool" AND "fancy"))'


def test_implicit_or():
    assert ast_str("super cool OR fancy") == '("super" OR ("cool" OR "fancy"))'
    assert ast_str("super cool") == '("super" OR "cool")'
    assert parse("super cool") == parse("super OR cool")


def test_levenshtein():
    assert parse("fancy~1") == UserAST.leaf("fancy", 1)
    with pytest.raises(ParseError):
        parse("fancy~")
    assert ast_str("super cool OR fancy~1") == '("super" OR ("cool" OR "fancy"~1))'


def test_levenshtein_disabled():
    opt = Options(no_levensthein=True)
    assert parse_with_opt("fancy~1", opt) == UserAST.leaf("fancy~1")


def test_attribute_and_levenshtein():
    assert parse("field:fancy~1") == UserAST.attributed(
        "field", UserAST.leaf("fancy", 1)
    )


def test_attribute_quoted_field():
    assert repr(parse('"field":fancy unlimited')) == '(field:"fancy" OR "unlimited")'


def test_quote_on_quote():
    assert ast_str('"field""cool"') == '("field" OR "cool")'


def test_attribute_simple():
    assert parse("field:fancy") == UserAST.attributed("field", UserAST.leaf("fancy"))


def test_disabled_attribute_simple():
    opt = Options(no_attributes=True)
    assert parse_with_opt("field:fancy", opt) == UserAST.leaf("field:fancy")


def test_attribute_after_text():
    assert ast_str("freestyle myattr:(super cool)") == (
        '("freestyle" OR myattr:("super" OR "cool"))'
    )


def test_attribute_errors():
    with pytest.raises(ParseError):
        parse("fancy:")


def test_attributed_block():
    assert ast_str("field:(fancy unlimited)") == 'field:("fancy" OR "unlimited")'


def test_multi_spaces():
    assert ast_str("a AND  b") == '("a" AND "b")'


def test_special_chars():
    assert ast_str("die drei ???") == '("die" OR ("drei" OR "???"))'
    assert ast_str("a+") == '"a+"'


def test_multi_and_or_to_flat():
    assert ast_str("a AND b AND c") == '("a" AND ("b" AND "c"))'
    assert ast_str("a OR b OR c") == '("a" OR ("b" OR "c"))'


def test_parse_query():
    assert ast_str("a AND b") == '("a" AND "b")'
    assert ast_str("a:b") == 'a:"b"'
    assert ast_str("a:b OR c") == '(a:"b" OR "c")'
    assert ast_str("a") == '"a"'
    assert ast_str("食べる AND b") == '("食べる" AND "b")'
    assert ast_str("a OR b AND c") == '("a" OR ("b" AND "c"))'


def test_parse_multi_literals():
    assert ast_str("a b") == '("a" OR "b")'
    assert ast_str('"a b"') == '"a b"'
    assert ast_str("feld:10 b") == '(feld:"10" OR "b")'


def test_and_or_keyword_edge_cases():
    # keywords need surrounding whitespace; leading AND/OR are literals
    assert ast_str("or OR") == '("or" OR "OR")'
    assert ast_str("OR OR OR") == '("OR" OR "OR")'
    assert ast_str("AND AND AND") == '("AND" AND "AND")'


def test_get_phrase_pairs():
    assert parse("super cool fancy").get_phrase_pairs() == {
        ("super", "cool"),
        ("cool", "fancy"),
    }
    assert parse("super cool nice great").get_phrase_pairs() == {
        ("super", "cool"),
        ("cool", "nice"),
        ("nice", "great"),
    }
    assert parse("myattr:(super cool)").get_phrase_pairs() == {("super", "cool")}
    assert parse("myattr:(super cool) different scope").get_phrase_pairs() == {
        ("super", "cool"),
        ("cool", "different"),
        ("different", "scope"),
    }


def test_walk_terms():
    terms = []
    parse("myattr:(super cool) AND fancy").walk_terms(terms.append)
    assert terms == ["super", "cool", "fancy"]


def test_filter_ast():
    ast = parse("super cool fancy")
    filtered = ast.filter_ast(
        lambda node, _attr: node.kind == UserAST.LEAF
        and node.filter.phrase == "cool"
    )
    assert repr(filtered) == '("super" OR "fancy")'
    ast = parse("myattr:(super cool)")
    assert ast.filter_ast(lambda n, a: True) is None
    filtered = ast.filter_ast(
        lambda node, _attr: node.kind == UserAST.LEAF
        and node.filter.phrase == "cool"
    )
    assert filtered == UserAST.attributed("myattr", UserAST.leaf("super"))
