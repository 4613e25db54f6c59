"""Standalone parser/compiler unit tests with hardcoded expectations
(verified against the reference implementation; these do NOT need the
reference checkout mounted)."""

import pytest

from sregex_tpu import parse, parse_multi, compile_regex, ParseError
from sregex_tpu.ast_nodes import dump_str
from sregex_tpu.bytecode import dump_program
from sregex_tpu.consts import SRE_REGEX_CASELESS


CASES_AST = [
    ("a|(ab)", "Cat(NgStar(Dot), TOPLEVEL(0, Paren(0, Alt(Lit(97), "
               "Paren(1, Cat(Lit(97), Lit(98)))))))"),
    ("a{2,4}", "Cat(NgStar(Dot), TOPLEVEL(0, Paren(0, Cat(Cat(Cat("
               "Lit(97), Lit(97)), Quest(Lit(97))), Quest(Lit(97))))))"),
    ("[a-z\\d]", "Cat(NgStar(Dot), TOPLEVEL(0, Paren(0, "
                 "CLASS([97, 122][48, 57]))))"),
    ("a??", "Cat(NgStar(Dot), TOPLEVEL(0, Paren(0, NgQuest(Lit(97)))))"),
    ("^a$", "Cat(NgStar(Dot), TOPLEVEL(0, Paren(0, Cat(Cat(ASSERT(^), "
            "Lit(97)), ASSERT($)))))"),
    ("\\x41\\o{101}", "Cat(NgStar(Dot), TOPLEVEL(0, Paren(0, "
                      "Cat(Lit(65), Lit(65)))))"),
    ("a{0}", "Cat(NgStar(Dot), TOPLEVEL(0, Paren(0, Nil)))"),
    ("[]a]", "Cat(NgStar(Dot), TOPLEVEL(0, Paren(0, "
             "CLASS([93, 93][97, 97]))))"),
    ("[\\d-x]", "Cat(NgStar(Dot), TOPLEVEL(0, Paren(0, "
                "CLASS([48, 57][45, 45][120, 120]))))"),
    ("({0,1}:x)", "Cat(NgStar(Dot), TOPLEVEL(0, Paren(0, Lit(120))))"),
]


@pytest.mark.parametrize("pattern,expected", CASES_AST)
def test_ast_dump(pattern, expected):
    ast, _ = parse(pattern)
    assert dump_str(ast) == expected


def test_caseless_literal_and_class():
    ast, _ = parse("a", SRE_REGEX_CASELESS)
    assert "CLASS([97, 97][65, 65])" in dump_str(ast)
    ast, _ = parse("[A-z]", SRE_REGEX_CASELESS)
    assert "CLASS([65, 122][97, 122][65, 90])" in dump_str(ast)


def test_program_dump():
    ast, ncaps = parse("a|(ab)")
    assert ncaps == 1
    prog = compile_regex(ast)
    assert dump_program(prog) == (
        " 0. split 3, 1\n"
        " 1. any\n"
        " 2. jmp 0\n"
        " 3. save 0\n"
        " 4. split 5, 7\n"
        " 5. char 97\n"
        " 6. jmp 11\n"
        " 7. save 2\n"
        " 8. char 97\n"
        " 9. char 98\n"
        "10. save 3\n"
        "11. save 1\n"
        "12. match 0\n")
    assert prog.leading_byte == 97
    assert prog.nullable == 0


def test_leading_bytes_nullable():
    prog = compile_regex(parse("a?")[0])
    assert prog.nullable == 1 and prog.leading_bytes is None
    prog = compile_regex(parse(".x")[0])
    assert prog.leading_bytes is None        # ANY declines prefilter
    prog = compile_regex(parse("[ab]x|cy")[0])
    assert prog.leading_bytes is not None and prog.leading_byte == -1


def test_multi_regex_numbering():
    ast, max_ncaps = parse_multi([b"(a)(b)", b"(c)"])
    assert max_ncaps == 2
    prog = compile_regex(ast)
    assert prog.nregexes == 2
    assert prog.multi_ncaps == [2, 1]
    # regex 0: $0 slots 0-1, groups at 2-5; regex 1: $0 slots 6-7,
    # group at 8-9
    assert prog.ovecsize == 2 * (3 + 2)


@pytest.mark.parametrize("pattern,offset", [
    ("(ab", 3), ("*a", 0), ("a**", 2), ("\\1", 0), ("a{600}", 1),
    ("[z-a]", 0), ("(?x)", 2), ("\\x{fff}", 0), ("a???", 3),
])
def test_parse_errors(pattern, offset):
    with pytest.raises(ParseError) as ei:
        parse(pattern)
    assert ei.value.offset == offset


def test_multi_error_attribution():
    with pytest.raises(ParseError) as ei:
        parse_multi([b"ok", b"(bad"])
    assert ei.value.regex_id == 1 and ei.value.offset == 4
