"""Restricted-regex → literal-prefix compiler (driver-side query rewrite).

The reference restricts the index search space *before* touching the index
by compiling its limited regex dialect into a set of literal prefixes
(semantics per /root/reference/service/query/parser.go:15-28 grammar and
the golden table in parser_test.go:22-164; dialect documented in the
reference README):

- atoms are unicode letters only;
- ``.`` matches anything → the enumerated alternative becomes ``prefix*``
  (a prefix search) and enumeration stops there;
- ``F?`` / ``F*`` make the preceding factor optional (both enumerate the
  same two alternatives — taken first, skipped second);
- ``F+`` keeps the factor exactly once (no useful prefix expansion);
- ``|`` binds to the *single preceding factor* (highest priority):
  ``foo|bar`` → {fooar, fobar}; use ``(foo)|(bar)`` for whole-word
  alternation;
- ``[abc]`` enumerates single characters; ``(R)`` groups.

This is a fresh implementation (recursive-descent over fragment graphs),
not a translation of the reference's stack/ATN machinery; only the
grammar and the enumeration order contract are shared.
"""

from __future__ import annotations

from dataclasses import dataclass, field

_EOF = "\x03"
_DOT = "\x00DOT"


class RegexPrefixError(ValueError):
    pass


@dataclass
class _Node:
    """Graph node: ``char`` is None (epsilon), a literal character, or
    ``_DOT``. Enumeration DFS follows ``children`` in insertion order."""

    char: str | None = None
    children: list["_Node"] = field(default_factory=list)

    def last(self) -> "_Node":
        cur = self
        while cur.children:
            cur = cur.children[0]
        return cur


@dataclass
class _Frag:
    start: _Node
    # the unique final node new fragments get appended to; reached by
    # following children[0] from start
    def end(self) -> _Node:
        return self.start.last()


def _is_atom(c: str) -> bool:
    return c != _EOF and c.isalpha()


class _Parser:
    def __init__(self, s: str):
        self.s = s
        self.i = 0

    def peek(self) -> str:
        return self.s[self.i] if self.i < len(self.s) else _EOF

    def advance(self) -> None:
        self.i += 1

    def expect(self, c: str) -> None:
        if self.peek() != c:
            raise RegexPrefixError(
                f"invalid input at {self.i}: got {self.peek()!r}, expected {c!r}"
            )
        self.advance()

    # R -> T R' ; R' -> R | eps(at ')' or EOF)
    def parse_regex(self) -> _Frag:
        c = self.peek()
        if not (_is_atom(c) or c in "([."):
            raise RegexPrefixError(f"parse error at {self.i} [rule R]")
        frag = self.parse_term()
        while True:
            c = self.peek()
            if _is_atom(c) or c in "([.":
                nxt = self.parse_term()
                frag.end().children.append(nxt.start)
            elif c == ")" or c == _EOF:
                return frag
            else:
                raise RegexPrefixError(f"parse error at {self.i} [rule R']")

    # T -> F T' ; T' -> '?'|'*'|'+'|'|'T | eps
    def parse_term(self) -> _Frag:
        frag = self.parse_factor()
        c = self.peek()
        if c in "?*":
            self.advance()
            beg, end = _Node(), _Node()
            beg.children.append(frag.start)   # taken path first
            frag.end().children.append(end)
            beg.children.append(end)          # skipped path second
            return _Frag(beg)
        if c == "+":
            # keep the factor once; no prefix-level repetition possible
            self.advance()
            return frag
        if c == "|":
            self.advance()
            other = self.parse_term()
            fork, join = _Node(), _Node()
            fork.children.append(frag.start)
            fork.children.append(other.start)
            frag.end().children.append(join)
            other.end().children.append(join)
            return _Frag(fork)
        if _is_atom(c) or c in "()[." or c == _EOF or c == "]":
            return frag
        raise RegexPrefixError(f"parse error at {self.i} [rule T']")

    # F -> atom | (R) | [list] | '.'
    def parse_factor(self) -> _Frag:
        c = self.peek()
        if c == "(":
            self.advance()
            frag = self.parse_regex()
            self.expect(")")
            return frag
        if c == "[":
            self.advance()
            container = _Node()
            while _is_atom(self.peek()):
                container.children.append(_Node(self.peek()))
                self.advance()
            self.expect("]")
            join = _Node()
            for child in container.children:
                child.children.append(join)
            return _Frag(container)
        if c == ".":
            self.advance()
            return _Frag(_Node(_DOT))
        if _is_atom(c):
            self.advance()
            return _Frag(_Node(c))
        raise RegexPrefixError(f"parse error at {self.i} [nonterm F]")


def regex_to_prefixes(pattern: str) -> list[str]:
    """Compile the restricted regex into literal alternatives. An
    alternative ending in ``*`` denotes a prefix search; anything else is
    an exact term. Order matches the reference's DFS enumeration."""
    p = _Parser(pattern)
    frag = p.parse_regex()
    if p.i < len(pattern):
        raise RegexPrefixError(f"incomplete expression, position {p.i}")

    alts: list[str] = []

    def dfs(node: _Node, prefix: str) -> None:
        if node.char == _DOT:
            # '.' absorbs the remainder → prefix search; children (any
            # trailing literal chars) cannot narrow a prefix further
            alts.append(prefix + "*")
            return
        cur = prefix + node.char if node.char is not None else prefix
        if not node.children:
            alts.append(cur)
        for child in node.children:
            dfs(child, cur)

    dfs(frag.start, "")
    return alts
