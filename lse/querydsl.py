"""Query DSL front-end: lexer, recursive-descent parser, AST.

Grammar parity with the reference front-end:
* lexer token set and rules — query/QueryLexer.java:10-140 (PHRASE with
  ``\\"``/``\\\\`` escapes, RANGE_SEP ``..``, sort:/field: detection by
  lookahead on ``:``, AND/OR/NOT case-insensitive keywords, MINUS, STAR);
* precedence NOT > AND (incl. implicit AND between adjacent clauses) > OR,
  left-associative — query/QueryParser.java:35-120;
* supported fields whitelist — query/QueryParser.java:8 (+ lang/repo for the
  source-code corpus, see constants.SUPPORTED_FIELDS);
* ``term*`` → prefix query; ``field:a..b`` → range query;
* direct-filename rewrite: a bare single token containing ``.`` and no
  operator chars is rewritten to ``filename:<token>`` before parsing —
  query/QueryEngine.java:103-127;
* errors carry position + original query — query/QueryParseException.java.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass
from typing import List, Optional, Tuple, Union

from .constants import MAX_QUERY_LENGTH, SUPPORTED_FIELDS


class QueryParseError(ValueError):
    """Parse error with the reference's rendering
    (query/QueryParseException.java:6-42): the exception text is
    ``Parse error at position N: <message>`` followed by the query and a
    ``^`` caret under the error position (clamped to the query length),
    and ``.suggestion`` carries the reference's fix hint — its exact
    strings, including the Chinese-language hints ported verbatim."""

    def __init__(self, message: str, position: int, query: str):
        caret_pos = max(0, min(position, len(query)))
        rendered = (
            f"Parse error at position {position}: {message}\n"
            f"{query}\n{' ' * caret_pos}^"
        )
        super().__init__(rendered)
        self.message = message
        self.position = position
        self.query = query
        self.suggestion = self._suggest_fix(position, query)

    @staticmethod
    def _suggest_fix(pos: int, query: str) -> str:
        # port of QueryParseException.suggestFix (same case order)
        if query is None or not query.strip():
            return "请输入非空查询"
        if pos >= len(query) and query.count('"') % 2 != 0:
            return "检测到未闭合引号，请补全右引号"
        return "请检查该位置附近的语法，例如括号、引号或布尔运算符"


class TT(enum.Enum):
    TERM = "TERM"
    PHRASE = "PHRASE"
    FIELD = "FIELD"
    SORT = "SORT"
    RANGE_SEP = "RANGE_SEP"
    LPAREN = "LPAREN"
    RPAREN = "RPAREN"
    AND = "AND"
    OR = "OR"
    NOT = "NOT"
    MINUS = "MINUS"
    STAR = "STAR"
    COLON = "COLON"
    EOF = "EOF"


@dataclass(frozen=True)
class LexToken:
    type: TT
    value: str
    position: int


# ---------------------------------------------------------------- AST nodes
@dataclass(frozen=True)
class Term:
    term: str


@dataclass(frozen=True)
class Prefix:
    prefix: str


@dataclass(frozen=True)
class Phrase:
    terms: Tuple[str, ...]


@dataclass(frozen=True)
class Field:
    field: str
    value: str


@dataclass(frozen=True)
class Range:
    field: str
    lo: str
    hi: str


@dataclass(frozen=True)
class Not:
    child: "Node"


@dataclass(frozen=True)
class Bool:
    op: str  # "AND" | "OR"
    left: "Node"
    right: "Node"


Node = Union[Term, Prefix, Phrase, Field, Range, Not, Bool]


@dataclass(frozen=True)
class SortDirective:
    field: str


@dataclass(frozen=True)
class ParseResult:
    ast: Node
    sort: Optional[SortDirective]


# ------------------------------------------------------------------- lexer
_BREAK_CHARS = {"(", ")", '"', ":", "*"}


def lex(query: str) -> List[LexToken]:
    if query is None:
        raise QueryParseError("query must not be None", 0, "")
    tokens: List[LexToken] = []
    i, n = 0, len(query)
    while i < n:
        ch = query[i]
        if ch.isspace():
            i += 1
            continue
        if ch == '"':
            i = _read_phrase(query, i, tokens)
            continue
        if ch == "(":
            tokens.append(LexToken(TT.LPAREN, "(", i)); i += 1; continue
        if ch == ")":
            tokens.append(LexToken(TT.RPAREN, ")", i)); i += 1; continue
        if ch == "*":
            tokens.append(LexToken(TT.STAR, "*", i)); i += 1; continue
        if ch == ":":
            tokens.append(LexToken(TT.COLON, ":", i)); i += 1; continue
        if ch == "-":
            tokens.append(LexToken(TT.MINUS, "-", i)); i += 1; continue
        if ch == "." and i + 1 < n and query[i + 1] == ".":
            tokens.append(LexToken(TT.RANGE_SEP, "..", i)); i += 2; continue

        start = i
        while i < n and not query[i].isspace() and query[i] not in _BREAK_CHARS:
            if query[i] == "." and i + 1 < n and query[i + 1] == ".":
                break
            i += 1
        if start == i:
            raise QueryParseError(f"unrecognized character: {ch}", i, query)
        value = query[start:i]
        upper = value.upper()
        if upper == "AND":
            tokens.append(LexToken(TT.AND, value, start)); continue
        if upper == "OR":
            tokens.append(LexToken(TT.OR, value, start)); continue
        if upper == "NOT":
            tokens.append(LexToken(TT.NOT, value, start)); continue
        at_colon = i < n and query[i] == ":"
        if value.lower() == "sort" and at_colon:
            tokens.append(LexToken(TT.SORT, value, start)); continue
        if at_colon and value and value[0].isalpha():
            tokens.append(LexToken(TT.FIELD, value, start)); continue
        tokens.append(LexToken(TT.TERM, value, start))
    tokens.append(LexToken(TT.EOF, "", n))
    return tokens


def _read_phrase(query: str, quote_idx: int, tokens: List[LexToken]) -> int:
    i = quote_idx + 1
    buf: List[str] = []
    closed = False
    n = len(query)
    while i < n:
        ch = query[i]
        if ch == "\\" and i + 1 < n and query[i + 1] in ('"', "\\"):
            buf.append(query[i + 1])
            i += 2
            continue
        if ch == '"':
            closed = True
            i += 1
            break
        buf.append(ch)
        i += 1
    if not closed:
        raise QueryParseError("unclosed quote", quote_idx, query)
    tokens.append(LexToken(TT.PHRASE, "".join(buf), quote_idx))
    return i


# ------------------------------------------------------------------ parser
_VALUE_TYPES = (TT.TERM, TT.PHRASE, TT.FIELD)
_IMPLICIT_AND_TYPES = (TT.TERM, TT.PHRASE, TT.FIELD, TT.LPAREN, TT.NOT, TT.MINUS)


class _Parser:
    def __init__(self, query: str):
        self.query = query if query is not None else ""
        self.tokens = lex(query)
        self.pos = 0

    def parse(self) -> ParseResult:
        ast = self._parse_or()
        if ast is None:
            raise QueryParseError("empty query", self._cur().position, self.query)
        sort = self._extract_sort()
        if self._cur().type != TT.EOF:
            raise QueryParseError(
                f"unexpected token: {self._cur().value}",
                self._cur().position,
                self.query,
            )
        return ParseResult(ast, sort)

    def _parse_or(self) -> Node:
        left = self._parse_and()
        while self._match(TT.OR):
            right = self._parse_and()
            left = Bool("OR", left, right)
        return left

    def _parse_and(self) -> Node:
        left = self._parse_clause()
        while True:
            if self._match(TT.AND):
                left = Bool("AND", left, self._parse_clause())
                continue
            if self._cur().type in _IMPLICIT_AND_TYPES:
                left = Bool("AND", left, self._parse_clause())
                continue
            break
        return left

    def _parse_clause(self) -> Node:
        if self._match(TT.AND) or self._match(TT.OR):
            return self._parse_clause()
        if self._match(TT.NOT) or self._match(TT.MINUS):
            return Not(self._parse_clause())
        return self._parse_expr()

    def _parse_expr(self) -> Node:
        t = self._cur()
        if t.type == TT.LPAREN:
            self._expect(TT.LPAREN, "missing left paren")
            grouped = self._parse_or()
            self._expect(TT.RPAREN, "missing right paren")
            return grouped
        if t.type == TT.FIELD:
            return self._parse_field()
        if t.type == TT.PHRASE:
            return self._parse_phrase()
        if t.type == TT.TERM:
            return self._parse_term_or_prefix()
        raise QueryParseError(f"cannot parse expression: {t.value}", t.position, self.query)

    def _parse_field(self) -> Node:
        field_tok = self._advance()
        field = field_tok.value.lower()
        if field not in SUPPORTED_FIELDS:
            raise QueryParseError(f"unsupported field: {field}", field_tok.position, self.query)
        self._expect(TT.COLON, "field query missing colon")
        value_tok = self._cur()
        if value_tok.type not in _VALUE_TYPES:
            raise QueryParseError("field query missing value", value_tok.position, self.query)
        self._advance()
        if self._match(TT.RANGE_SEP):
            to_tok = self._cur()
            if to_tok.type not in _VALUE_TYPES:
                raise QueryParseError("range query missing end value", to_tok.position, self.query)
            self._advance()
            return Range(field, value_tok.value, to_tok.value)
        return Field(field, value_tok.value)

    def _parse_phrase(self) -> Node:
        phrase = self._advance().value
        terms = tuple(t for t in phrase.split() if t.strip())
        if not terms:
            raise QueryParseError("phrase must not be empty", self._cur().position, self.query)
        return Phrase(terms)

    def _parse_term_or_prefix(self) -> Node:
        term_tok = self._advance()
        if self._match(TT.STAR):
            return Prefix(term_tok.value)
        return Term(term_tok.value)

    def _extract_sort(self) -> Optional[SortDirective]:
        if not self._match(TT.SORT):
            return None
        # the lexer only emits SORT when followed by ':'
        self._expect(TT.COLON, "sort directive missing colon")
        field_tok = self._cur()
        if field_tok.type not in (TT.TERM, TT.FIELD):
            raise QueryParseError("sort directive missing field", field_tok.position, self.query)
        self._advance()
        return SortDirective(field_tok.value)

    def _cur(self) -> LexToken:
        return self.tokens[self.pos]

    def _advance(self) -> LexToken:
        tok = self.tokens[self.pos]
        self.pos += 1
        return tok

    def _match(self, tt: TT) -> bool:
        if self.tokens[self.pos].type == tt:
            self.pos += 1
            return True
        return False

    def _expect(self, tt: TT, msg: str) -> None:
        if not self._match(tt):
            raise QueryParseError(msg, self._cur().position, self.query)


def normalize_direct_filename(query: Optional[str]) -> str:
    """Bare single token containing '.' and no operator chars →
    ``filename:<token>`` (QueryEngine.java:103-127)."""
    if query is None:
        return ""
    q = query.strip()
    if not q:
        return q
    if (
        ":" in q or " " in q or "\t" in q or '"' in q or "(" in q or ")" in q
        or "*" in q or "/" in q or "\\" in q or q.startswith("-")
    ):
        return q
    if "." not in q:
        return q
    return "filename:" + q


def parse(query: str) -> ParseResult:
    """Full front-end: guard, direct-filename rewrite, lex, parse."""
    if query is not None and len(query) > MAX_QUERY_LENGTH:
        raise QueryParseError("query too long", MAX_QUERY_LENGTH, query[:64] + "…")
    return _Parser(normalize_direct_filename(query)).parse()


def extract_query_terms(node: Node) -> set:
    """Lowercased terms referenced by the AST (QueryEngine.java:398-427)."""
    out: set = set()

    def walk(n: Node) -> None:
        if isinstance(n, Term):
            out.add(n.term.lower())
        elif isinstance(n, Prefix):
            out.add(n.prefix.lower())
        elif isinstance(n, Phrase):
            out.update(t.lower() for t in n.terms)
        elif isinstance(n, Bool):
            walk(n.left)
            walk(n.right)
        elif isinstance(n, Not):
            walk(n.child)

    walk(node)
    return out
