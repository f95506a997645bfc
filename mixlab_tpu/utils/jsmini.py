"""Minimal JavaScript parser + interpreter (pure Python).

Why this exists: the reference's frontend ran in real browsers
(frontend/src/lib.rs:27-106); this image ships no JS runtime at all, so
without a way to parse and execute JavaScript the rebuilt web client
(server/static/app.js) would be dead code from the test suite's point of
view — a single typo could brick the whole client unnoticed.  This module
provides:

  * a tokenizer + recursive-descent parser for the ES2017 subset the
    frontend uses (template literals, arrow functions, async/await,
    destructuring in for-of, spread, classes are rejected explicitly) —
    used to syntax-validate every shipped .js asset;
  * a scope linter that reports references to undeclared identifiers
    (beyond a browser-globals whitelist) — the realistic "typo bricks the
    client" failure class;
  * a tree-walking interpreter for a disciplined subset, rich enough to
    execute the pure session-mirror logic (server/static/session_core.js)
    under unit test: objects, arrays, Map/Set, closures, control flow,
    the common Array/String/Math/JSON/Object builtins.

It is NOT a general JS engine: no prototype chains, no getters/setters,
no generators, no `with`, limited `==` coercion.  The point is executable
tests for the client's pure logic, mirroring frontend/src/session.rs.
"""

from __future__ import annotations

import json
import math
import re
from typing import Any, Dict, List, Optional, Tuple

# ---------------------------------------------------------------------------
# tokenizer
# ---------------------------------------------------------------------------

KEYWORDS = {
    "var", "let", "const", "function", "return", "if", "else", "for", "while",
    "do", "break", "continue", "new", "delete", "typeof", "instanceof", "in",
    "switch", "case", "default", "try", "catch", "finally", "throw",
    "this", "null", "true", "false", "undefined", "void", "class", "extends",
    "super", "await", "yield",
}
# contextual words (get/set/of/async/static) lex as plain identifiers

PUNCT = [
    "...", "=>", "===", "!==", "**=", ">>>=", "<<=", ">>=", ">>>", "**",
    "==", "!=", "<=", ">=", "&&=", "||=", "??=", "&&", "||", "??", "?.",
    "++", "--", "+=", "-=", "*=", "/=", "%=", "&=", "|=", "^=", "<<", ">>",
    "{", "}", "(", ")", "[", "]", ";", ",", "<", ">", "+", "-", "*", "/",
    "%", "&", "|", "^", "!", "~", "?", ":", "=", ".", "`",
]

_ID_START = re.compile(r"[A-Za-z_$]")
_ID = re.compile(r"[A-Za-z0-9_$]*")
_NUM = re.compile(
    r"0[xX][0-9a-fA-F]+|0[bB][01]+|0[oO][0-7]+|"
    r"(?:[0-9]+\.?[0-9]*|\.[0-9]+)(?:[eE][+-]?[0-9]+)?"
)


class JsSyntaxError(SyntaxError):
    pass


class Token:
    __slots__ = ("kind", "value", "line", "col")

    def __init__(self, kind, value, line, col):
        self.kind = kind  # id, num, str, template, regex, punct, keyword, eof
        self.value = value
        self.line = line
        self.col = col

    def __repr__(self):
        return f"Token({self.kind},{self.value!r},l{self.line})"


def tokenize(src: str) -> List[Token]:
    toks: List[Token] = []
    i = 0
    line = 1
    n = len(src)

    def prev_significant():
        return toks[-1] if toks else None

    while i < n:
        c = src[i]
        if c == "\n":
            line += 1
            i += 1
            continue
        if c in " \t\r":
            i += 1
            continue
        if src.startswith("//", i):
            j = src.find("\n", i)
            i = n if j < 0 else j
            continue
        if src.startswith("/*", i):
            j = src.find("*/", i)
            if j < 0:
                raise JsSyntaxError(f"unterminated comment at line {line}")
            line += src.count("\n", i, j)
            i = j + 2
            continue
        col = i
        if _ID_START.match(c):
            m = _ID.match(src, i + 1)
            word = src[i : m.end()]
            i = m.end()
            toks.append(Token("keyword" if word in KEYWORDS else "id", word, line, col))
            continue
        if c.isdigit() or (c == "." and i + 1 < n and src[i + 1].isdigit()):
            m = _NUM.match(src, i)
            if not m:
                raise JsSyntaxError(f"bad number at line {line}")
            toks.append(Token("num", m.group(0), line, col))
            i = m.end()
            continue
        if c in "'\"":
            j = i + 1
            buf = []
            while j < n and src[j] != c:
                if src[j] == "\\":
                    buf.append(src[j : j + 2])
                    j += 2
                elif src[j] == "\n":
                    raise JsSyntaxError(f"unterminated string at line {line}")
                else:
                    buf.append(src[j])
                    j += 1
            if j >= n:
                raise JsSyntaxError(f"unterminated string at line {line}")
            toks.append(Token("str", _unescape("".join(buf)), line, col))
            i = j + 1
            continue
        if c == "`":
            # template literal: lex into parts [str, expr-tokens, str, ...]
            parts: List[Tuple[str, Any]] = []
            buf = []
            j = i + 1
            while j < n:
                if src[j] == "\\":
                    buf.append(src[j : j + 2])
                    j += 2
                    continue
                if src[j] == "`":
                    break
                if src.startswith("${", j):
                    parts.append(("str", _unescape("".join(buf))))
                    buf = []
                    depth = 1
                    k = j + 2
                    while k < n and depth:
                        if src[k] == "{":
                            depth += 1
                        elif src[k] == "}":
                            depth -= 1
                        elif src[k] in "'\"`":
                            q = src[k]
                            k += 1
                            while k < n and src[k] != q:
                                k += 2 if src[k] == "\\" else 1
                        k += 1
                    if depth:
                        raise JsSyntaxError(f"unterminated ${{}} at line {line}")
                    parts.append(("expr", src[j + 2 : k - 1]))
                    j = k
                    continue
                if src[j] == "\n":
                    line += 1
                buf.append(src[j])
                j += 1
            if j >= n:
                raise JsSyntaxError(f"unterminated template at line {line}")
            parts.append(("str", _unescape("".join(buf))))
            toks.append(Token("template", parts, line, col))
            i = j + 1
            continue
        if c == "/":
            # regex or divide: regex if previous token can't end an expression
            pt = prev_significant()
            is_regex = pt is None or (
                pt.kind == "punct" and pt.value not in (")", "]", "}")
            ) or (pt.kind == "keyword" and pt.value not in ("this", "true", "false", "null", "undefined"))
            if is_regex and not src.startswith("//", i) and not src.startswith("/*", i):
                j = i + 1
                in_class = False
                while j < n:
                    if src[j] == "\\":
                        j += 2
                        continue
                    if src[j] == "[":
                        in_class = True
                    elif src[j] == "]":
                        in_class = False
                    elif src[j] == "/" and not in_class:
                        break
                    elif src[j] == "\n":
                        raise JsSyntaxError(f"unterminated regex at line {line}")
                    j += 1
                if j >= n:
                    raise JsSyntaxError(f"unterminated regex at line {line}")
                body = src[i + 1 : j]
                m = _ID.match(src, j + 1)
                flags = src[j + 1 : m.end()]
                toks.append(Token("regex", (body, flags), line, col))
                i = m.end()
                continue
        for p in PUNCT:
            if src.startswith(p, i):
                if p == "`":
                    break  # handled above
                toks.append(Token("punct", p, line, col))
                i += len(p)
                break
        else:
            raise JsSyntaxError(f"unexpected character {c!r} at line {line}")
    toks.append(Token("eof", None, line, 0))
    return toks


_ESCAPES = {"n": "\n", "t": "\t", "r": "\r", "b": "\b", "f": "\f", "v": "\v", "0": "\0"}


def _unescape(s: str) -> str:
    out = []
    i = 0
    while i < len(s):
        if s[i] == "\\" and i + 1 < len(s):
            c = s[i + 1]
            if c == "u":
                if s[i + 2 : i + 3] == "{":
                    j = s.index("}", i)
                    out.append(chr(int(s[i + 3 : j], 16)))
                    i = j + 1
                    continue
                out.append(chr(int(s[i + 2 : i + 6], 16)))
                i += 6
                continue
            if c == "x":
                out.append(chr(int(s[i + 2 : i + 4], 16)))
                i += 4
                continue
            out.append(_ESCAPES.get(c, c))
            i += 2
        else:
            out.append(s[i])
            i += 1
    return "".join(out)


# ---------------------------------------------------------------------------
# parser (AST = tuples: (kind, ...))
# ---------------------------------------------------------------------------


ASSIGN_OPS = {"=", "+=", "-=", "*=", "/=", "%=", "&=", "|=", "^=", "<<=", ">>=",
              ">>>=", "**=", "&&=", "||=", "??="}

BIN_PREC = {
    "??": 1, "||": 2, "&&": 3, "|": 4, "^": 5, "&": 6,
    "==": 7, "!=": 7, "===": 7, "!==": 7,
    "<": 8, ">": 8, "<=": 8, ">=": 8, "instanceof": 8, "in": 8,
    "<<": 9, ">>": 9, ">>>": 9,
    "+": 10, "-": 10,
    "*": 11, "/": 11, "%": 11,
    "**": 12,
}


class Parser:
    def __init__(self, src: str):
        self.toks = tokenize(src)
        self.pos = 0

    # -- helpers -------------------------------------------------------------

    def peek(self, off=0) -> Token:
        return self.toks[min(self.pos + off, len(self.toks) - 1)]

    def next(self) -> Token:
        t = self.toks[self.pos]
        self.pos += 1
        return t

    def at(self, kind, value=None) -> bool:
        t = self.peek()
        return t.kind == kind and (value is None or t.value == value)

    def at_punct(self, *vals) -> bool:
        t = self.peek()
        return t.kind == "punct" and t.value in vals

    def expect(self, kind, value=None) -> Token:
        t = self.next()
        if t.kind != kind or (value is not None and t.value != value):
            raise JsSyntaxError(
                f"expected {value or kind}, got {t.value!r} at line {t.line}"
            )
        return t

    def eat_semi(self):
        if self.at_punct(";"):
            self.next()
        # ASI: tolerate missing semicolons

    # -- program -------------------------------------------------------------

    def parse_program(self):
        body = []
        while not self.at("eof"):
            body.append(self.statement())
        return ("program", body)

    # -- statements ----------------------------------------------------------

    def statement(self):
        t = self.peek()
        if (
            t.kind == "id" and t.value == "async"
            and self.peek(1).kind == "keyword" and self.peek(1).value == "function"
        ):
            self.next()
            return self.function(decl=True)  # executed synchronously
        if t.kind == "punct" and t.value == "{":
            return self.block()
        if t.kind == "punct" and t.value == ";":
            self.next()
            return ("empty",)
        if t.kind == "keyword":
            v = t.value
            if v in ("var", "let", "const"):
                d = self.var_decl()
                self.eat_semi()
                return d
            if v == "function":
                return self.function(decl=True)
            if v == "class":
                return self.class_decl()
            if v == "if":
                return self.if_stmt()
            if v == "for":
                return self.for_stmt()
            if v == "while":
                self.next()
                self.expect("punct", "(")
                cond = self.expression()
                self.expect("punct", ")")
                return ("while", cond, self.statement())
            if v == "do":
                self.next()
                body = self.statement()
                self.expect("keyword", "while")
                self.expect("punct", "(")
                cond = self.expression()
                self.expect("punct", ")")
                self.eat_semi()
                return ("dowhile", cond, body)
            if v == "return":
                self.next()
                if self.at_punct(";") or self.at_punct("}") or self.peek().line != t.line:
                    self.eat_semi()
                    return ("return", None)
                e = self.expression()
                self.eat_semi()
                return ("return", e)
            if v in ("break", "continue"):
                self.next()
                self.eat_semi()
                return (v,)
            if v == "switch":
                return self.switch_stmt()
            if v == "throw":
                self.next()
                e = self.expression()
                self.eat_semi()
                return ("throw", e)
            if v == "try":
                return self.try_stmt()
        e = self.expression()
        self.eat_semi()
        return ("expr", e)

    def block(self):
        self.expect("punct", "{")
        body = []
        while not self.at_punct("}"):
            body.append(self.statement())
        self.next()
        return ("block", body)

    def var_decl(self):
        kind = self.next().value
        decls = []
        while True:
            target = self.binding_target()
            init = None
            if self.at_punct("="):
                self.next()
                init = self.assignment()
            decls.append((target, init))
            if self.at_punct(","):
                self.next()
                continue
            break
        return ("var", kind, decls)

    def binding_target(self):
        if self.at_punct("["):
            self.next()
            elts = []
            while not self.at_punct("]"):
                if self.at_punct(","):
                    self.next()
                    elts.append(None)
                    continue
                if self.at_punct("..."):
                    self.next()
                    elts.append(("rest", self.binding_target()))
                else:
                    t = self.binding_target()
                    if self.at_punct("="):
                        self.next()
                        t = ("default", t, self.assignment())
                    elts.append(t)
                if self.at_punct(","):
                    self.next()
            self.expect("punct", "]")
            return ("arraypat", elts)
        if self.at_punct("{"):
            self.next()
            props = []
            while not self.at_punct("}"):
                key = self.next()
                if key.kind not in ("id", "str", "keyword"):
                    raise JsSyntaxError(f"bad destructuring key at line {key.line}")
                name = key.value
                tgt = ("name", name)
                if self.at_punct(":"):
                    self.next()
                    tgt = self.binding_target()
                if self.at_punct("="):
                    self.next()
                    tgt = ("default", tgt, self.assignment())
                props.append((name, tgt))
                if self.at_punct(","):
                    self.next()
            self.expect("punct", "}")
            return ("objpat", props)
        t = self.next()
        if t.kind != "id":
            raise JsSyntaxError(f"bad binding target {t.value!r} at line {t.line}")
        return ("name", t.value)

    def function(self, decl: bool):
        self.expect("keyword", "function")
        name = None
        if self.at("id"):
            name = self.next().value
        params = self.param_list()
        body = self.block()
        return ("funcdecl" if decl else "func", name, params, body)

    def param_list(self):
        self.expect("punct", "(")
        params = []
        while not self.at_punct(")"):
            if self.at_punct("..."):
                self.next()
                params.append(("rest", self.binding_target()))
            else:
                t = self.binding_target()
                if self.at_punct("="):
                    self.next()
                    t = ("default", t, self.assignment())
                params.append(t)
            if self.at_punct(","):
                self.next()
        self.next()
        return params

    def class_decl(self):
        self.expect("keyword", "class")
        name = self.next().value if self.at("id") else None
        if self.at("keyword", "extends"):
            self.next()
            self.unary()
        self.expect("punct", "{")
        methods = []
        while not self.at_punct("}"):
            if self.at_punct(";"):
                self.next()
                continue
            if self.at("id", "static") and not (
                self.peek(1).kind == "punct" and self.peek(1).value == "("
            ):
                self.next()
            mname = self.next().value
            params = self.param_list()
            body = self.block()
            methods.append((mname, params, body))
        self.next()
        return ("class", name, methods)

    def if_stmt(self):
        self.expect("keyword", "if")
        self.expect("punct", "(")
        cond = self.expression()
        self.expect("punct", ")")
        then = self.statement()
        alt = None
        if self.at("keyword", "else"):
            self.next()
            alt = self.statement()
        return ("if", cond, then, alt)

    def for_stmt(self):
        self.expect("keyword", "for")
        self.expect("punct", "(")
        init = None
        if self.at_punct(";"):
            self.next()
        else:
            if self.at("keyword", "var") or self.at("keyword", "let") or self.at("keyword", "const"):
                init = self.var_decl()
            else:
                init = ("expr", self.expression(no_in=True))
            if self.at("id", "of") or self.at("keyword", "in"):
                kind = self.next().value
                it = self.assignment()
                self.expect("punct", ")")
                body = self.statement()
                if init[0] == "var":
                    target = init[2][0][0]
                    declkind = init[1]
                else:
                    target = _expr_to_pattern(init[1])
                    declkind = None
                return ("for" + kind, declkind, target, it, body)
            self.expect("punct", ";")
        cond = None if self.at_punct(";") else self.expression()
        self.expect("punct", ";")
        step = None if self.at_punct(")") else self.expression()
        self.expect("punct", ")")
        return ("for", init, cond, step, self.statement())

    def switch_stmt(self):
        self.expect("keyword", "switch")
        self.expect("punct", "(")
        disc = self.expression()
        self.expect("punct", ")")
        self.expect("punct", "{")
        cases = []
        while not self.at_punct("}"):
            if self.at("keyword", "case"):
                self.next()
                test = self.expression()
                self.expect("punct", ":")
            else:
                self.expect("keyword", "default")
                self.expect("punct", ":")
                test = None
            body = []
            while not (self.at_punct("}") or self.at("keyword", "case") or self.at("keyword", "default")):
                body.append(self.statement())
            cases.append((test, body))
        self.next()
        return ("switch", disc, cases)

    def try_stmt(self):
        self.expect("keyword", "try")
        block = self.block()
        handler = None
        finalizer = None
        if self.at("keyword", "catch"):
            self.next()
            param = None
            if self.at_punct("("):
                self.next()
                param = self.binding_target()
                self.expect("punct", ")")
            handler = (param, self.block())
        if self.at("keyword", "finally"):
            self.next()
            finalizer = self.block()
        if handler is None and finalizer is None:
            raise JsSyntaxError(
                "try statement requires catch or finally"
            )
        return ("try", block, handler, finalizer)

    # -- expressions ---------------------------------------------------------

    def expression(self, no_in=False):
        e = self.assignment(no_in)
        while self.at_punct(","):
            self.next()
            e = ("comma", e, self.assignment(no_in))
        return e

    def assignment(self, no_in=False):
        # arrow-function lookahead
        arrow = self._try_arrow()
        if arrow is not None:
            return arrow
        left = self.conditional(no_in)
        if self.peek().kind == "punct" and self.peek().value in ASSIGN_OPS:
            op = self.next().value
            right = self.assignment(no_in)
            return ("assign", op, _expr_to_pattern(left) if op == "=" else left, right)
        return left

    def _try_arrow_inner(self):
        return self._arrow_at_point()

    def _try_arrow(self):
        arrow = self._async_arrow()
        if arrow is not None:
            return arrow
        return self._arrow_at_point()

    def _async_arrow(self):
        if self.at("id", "async") and (
            self.peek(1).kind == "id"
            or (self.peek(1).kind == "punct" and self.peek(1).value == "(")
        ):
            save = self.pos
            self.next()
            arrow = self._arrow_at_point()
            if arrow is not None:
                return arrow
            self.pos = save
        return None

    def _arrow_at_point(self):
        start = self.pos
        if self.at("id") and self.peek(1).kind == "punct" and self.peek(1).value == "=>":
            name = self.next().value
            self.next()
            params = [("name", name)]
            body = self.block() if self.at_punct("{") else ("return", self.assignment())
            return ("arrow", params, body)
        if self.at_punct("("):
            # scan to matching paren; if => follows, it's an arrow
            depth = 0
            j = self.pos
            while j < len(self.toks):
                t = self.toks[j]
                if t.kind == "punct" and t.value == "(":
                    depth += 1
                elif t.kind == "punct" and t.value == ")":
                    depth -= 1
                    if depth == 0:
                        break
                j += 1
            nxt = self.toks[j + 1] if j + 1 < len(self.toks) else None
            if nxt is not None and nxt.kind == "punct" and nxt.value == "=>":
                params = self.param_list()
                self.expect("punct", "=>")
                body = self.block() if self.at_punct("{") else ("return", self.assignment())
                return ("arrow", params, body)
        self.pos = start
        return None

    def conditional(self, no_in=False):
        cond = self.nullish(no_in)
        if self.at_punct("?") and not self.at_punct("?."):
            self.next()
            then = self.assignment()
            self.expect("punct", ":")
            alt = self.assignment(no_in)
            return ("cond", cond, then, alt)
        return cond

    def nullish(self, no_in=False):
        return self.binary(1, no_in)

    def binary(self, min_prec, no_in=False):
        left = self.unary()
        while True:
            t = self.peek()
            op = t.value if t.kind == "punct" else (
                t.value if t.kind == "keyword" and t.value in ("instanceof", "in") else None
            )
            if op == "in" and no_in:
                break
            prec = BIN_PREC.get(op)
            if prec is None or prec < min_prec:
                break
            self.next()
            right = self.binary(prec + 1, no_in)
            left = ("binop", op, left, right)
        return left

    def unary(self):
        t = self.peek()
        if t.kind == "punct" and t.value in ("!", "~", "+", "-", "++", "--"):
            self.next()
            if t.value in ("++", "--"):
                return ("update", t.value, self.unary(), True)
            return ("unary", t.value, self.unary())
        if t.kind == "keyword" and t.value in ("typeof", "void", "delete", "await"):
            self.next()
            return ("unary", t.value, self.unary())
        if t.kind == "keyword" and t.value == "new":
            self.next()
            callee = self.member_only(self.primary())
            args = []
            if self.at_punct("("):
                args = self.arguments()
            return self.call_tail(("new", callee, args))
        e = self.call_tail(self.primary())
        t = self.peek()
        if t.kind == "punct" and t.value in ("++", "--"):
            self.next()
            return ("update", t.value, e, False)
        return e

    def member_only(self, e):
        while True:
            if self.at_punct("."):
                self.next()
                e = ("member", e, self.next().value)
            elif self.at_punct("["):
                self.next()
                idx = self.expression()
                self.expect("punct", "]")
                e = ("index", e, idx)
            else:
                return e

    def call_tail(self, e):
        while True:
            if self.at_punct("."):
                self.next()
                prop = self.next()
                # property names are identifiers/keywords, never numbers:
                # `1..2` must be a syntax error like in real engines
                if prop.kind not in ("id", "keyword"):
                    raise JsSyntaxError(
                        f"invalid property name {prop.value!r}"
                    )
                e = ("member", e, prop.value)
            elif self.at_punct("?."):
                self.next()
                if self.at_punct("("):
                    e = ("optcall", e, self.arguments())
                else:
                    e = ("optmember", e, self.next().value)
            elif self.at_punct("["):
                self.next()
                idx = self.expression()
                self.expect("punct", "]")
                e = ("index", e, idx)
            elif self.at_punct("("):
                e = ("call", e, self.arguments())
            elif self.at("template"):
                # tagged template: parse and treat as call with joined string
                tpl = self.next().value
                e = ("call", e, [("template", tpl)])
            else:
                return e

    def arguments(self):
        self.expect("punct", "(")
        args = []
        while not self.at_punct(")"):
            if self.at_punct("..."):
                self.next()
                args.append(("spread", self.assignment()))
            else:
                args.append(self.assignment())
            if self.at_punct(","):
                self.next()
        self.next()
        return args

    def primary(self):
        t = self.next()
        if t.kind == "num":
            v = t.value
            if v.startswith(("0x", "0X", "0b", "0B", "0o", "0O")):
                return ("num", float(int(v, 0)))
            return ("num", float(v))
        if t.kind == "str":
            return ("str", t.value)
        if t.kind == "regex":
            return ("regex", t.value[0], t.value[1])
        if t.kind == "template":
            return ("template", t.value)
        if t.kind == "id":
            return ("name", t.value)
        if t.kind == "keyword":
            v = t.value
            if v == "true":
                return ("bool", True)
            if v == "false":
                return ("bool", False)
            if v == "null":
                return ("null",)
            if v == "undefined":
                return ("undefined",)
            if v == "this":
                return ("this",)
            if v == "function":
                self.pos -= 1
                return self.function(decl=False)
            if v == "class":
                self.pos -= 1
                return self.class_decl()
            if v == "new":
                self.pos -= 1
                return self.unary()
            if v == "await":
                return ("unary", "await", self.assignment())
            raise JsSyntaxError(f"unexpected keyword {v!r} at line {t.line}")
        if t.kind == "punct":
            if t.value == "(":
                e = self.expression()
                self.expect("punct", ")")
                return e
            if t.value == "[":
                elts = []
                while not self.at_punct("]"):
                    if self.at_punct(","):
                        self.next()
                        elts.append(("undefined",))
                        continue
                    if self.at_punct("..."):
                        self.next()
                        elts.append(("spread", self.assignment()))
                    else:
                        elts.append(self.assignment())
                    if self.at_punct(","):
                        self.next()
                self.next()
                return ("array", elts)
            if t.value == "{":
                props = []
                while not self.at_punct("}"):
                    if self.at_punct("..."):
                        self.next()
                        props.append(("spread", self.assignment()))
                    else:
                        kt = self.next()
                        # async method shorthand: `async name() {}`
                        if (
                            kt.kind == "id" and kt.value == "async"
                            and self.peek().kind in ("id", "str")
                        ):
                            kt = self.next()
                        computed = False
                        if kt.kind == "punct" and kt.value == "[":
                            keyexpr = self.assignment()
                            self.expect("punct", "]")
                            key = keyexpr
                            computed = True
                        elif kt.kind in ("id", "str", "keyword"):
                            key = kt.value
                        elif kt.kind == "num":
                            key = str(_num_key(kt.value))
                        else:
                            raise JsSyntaxError(
                                f"bad object key at line {kt.line}"
                            )
                        if self.at_punct("("):  # method shorthand
                            params = self.param_list()
                            body = self.block()
                            props.append(("prop", key, ("func", None, params, body), computed))
                        elif self.at_punct(":"):
                            self.next()
                            props.append(("prop", key, self.assignment(), computed))
                        else:  # shorthand — only identifiers may elide the
                            # value (`{ const }` is a real-engine error)
                            if kt.kind != "id":
                                raise JsSyntaxError(
                                    f"bad shorthand property {key!r} at "
                                    f"line {kt.line}"
                                )
                            props.append(("prop", key, ("name", key), computed))
                    if self.at_punct(","):
                        self.next()
                self.next()
                return ("object", props)
        raise JsSyntaxError(f"unexpected token {t.value!r} at line {t.line}")


def _num_key(v: str):
    f = float(v)
    return int(f) if f.is_integer() else f


def _expr_to_pattern(e):
    """Reinterpret an expression as an assignment/binding pattern."""
    if e[0] in ("name", "member", "index", "arraypat", "objpat"):
        return e
    if e[0] == "array":
        return ("arraypat", [None if x[0] == "undefined" else _expr_to_pattern(x) for x in e[1]])
    if e[0] == "object":
        return ("objpat", [(k, _expr_to_pattern(v)) for (_, k, v, _c) in e[1]])
    return e


def parse(src: str):
    """Parse a full script; raises JsSyntaxError on any syntax error."""
    return Parser(src).parse_program()


# ---------------------------------------------------------------------------
# scope lint
# ---------------------------------------------------------------------------

BROWSER_GLOBALS = {
    "window", "document", "location", "navigator", "console", "WebSocket",
    "setTimeout", "setInterval", "clearTimeout", "clearInterval", "fetch",
    "requestAnimationFrame", "cancelAnimationFrame", "JSON", "Math", "Map",
    "Set", "Array", "Object", "String", "Number", "Boolean", "Promise",
    "Error", "TypeError", "RangeError", "parseInt", "parseFloat", "isNaN",
    "isFinite", "NaN", "Infinity", "undefined", "MediaSource", "URL", "Blob",
    "Uint8Array", "Int16Array", "Float32Array", "DataView", "ArrayBuffer",
    "AudioContext", "XMLHttpRequest", "FormData", "FileReader", "Date",
    "performance", "localStorage", "alert", "confirm", "prompt", "Symbol",
    "encodeURIComponent", "decodeURIComponent", "encodeURI", "decodeURI",
    "Option", "Image", "Audio", "atob", "btoa", "crypto",
    "globalThis", "queueMicrotask", "structuredClone", "TextDecoder",
    "TextEncoder", "CustomEvent", "Event", "history", "RegExp",
    "module", "exports", "require",
}


def lint_undeclared(src: str, extra_globals=()) -> List[str]:
    """Return names referenced but never declared (typo detector)."""
    ast = parse(src)
    declared = set(BROWSER_GLOBALS) | set(extra_globals)
    used: Dict[str, int] = {}

    def declare_pattern(pat, out):
        if pat is None:
            return
        k = pat[0]
        if k == "name":
            out.add(pat[1])
        elif k == "arraypat":
            for p in pat[1]:
                declare_pattern(p, out)
        elif k == "objpat":
            for _, p in pat[1]:
                declare_pattern(p, out)
        elif k in ("default", "rest"):
            declare_pattern(pat[1], out)

    def hoist(node, out):
        """Collect declarations in a node (function-scope approximation:
        every var/let/const/function anywhere in the file counts — this is
        a typo detector, not a scoping validator)."""
        if not isinstance(node, tuple):
            return
        k = node[0]
        if k == "var":
            for tgt, _init in node[2]:
                declare_pattern(tgt, out)
        elif k in ("funcdecl", "func", "arrow"):
            if k != "arrow" and node[1]:
                out.add(node[1])
            for p in (node[2] if k != "arrow" else node[1]):
                declare_pattern(p, out)
        elif k == "class" and node[1]:
            out.add(node[1])
        elif k in ("forof", "forin"):
            declare_pattern(node[2], out)
        elif k == "try" and node[2] is not None:
            declare_pattern(node[2][0], out)
        for sub in node[1:]:
            if isinstance(sub, tuple):
                hoist(sub, out)
            elif isinstance(sub, list):
                for x in sub:
                    if isinstance(x, tuple):
                        hoist(x, out)
                    elif isinstance(x, list):
                        for y in x:
                            if isinstance(y, tuple):
                                hoist(y, out)
                    elif isinstance(x, Tuple):
                        hoist(x, out)

    def walk_uses(node):
        if not isinstance(node, tuple):
            return
        k = node[0]
        if k == "name":
            if node[1] not in declared:
                used[node[1]] = used.get(node[1], 0) + 1
            return
        if k == "member":
            walk_uses(node[1])
            return
        if k == "optmember":
            walk_uses(node[1])
            return
        if k == "prop":
            walk_uses(node[2])
            return
        for sub in node[1:]:
            if isinstance(sub, tuple):
                walk_uses(sub)
            elif isinstance(sub, list):
                for x in sub:
                    if isinstance(x, tuple):
                        walk_uses(x)
                    elif isinstance(x, list):
                        for y in x:
                            if isinstance(y, tuple):
                                walk_uses(y)
                    elif isinstance(x, tuple):
                        walk_uses(x)

    hoist(ast, declared)
    # template literals embed sub-expressions as source strings
    def walk_templates(node):
        if not isinstance(node, (tuple, list)):
            return
        if isinstance(node, tuple) and node and node[0] == "template":
            for kind, payload in node[1]:
                if kind == "expr":
                    sub = parse(payload)
                    hoist(sub, declared)
                    walk_uses(sub)
            return
        for sub in (node[1:] if isinstance(node, tuple) else node):
            walk_templates(sub)

    walk_uses(ast)
    walk_templates(ast)
    return sorted(used)


# ---------------------------------------------------------------------------
# interpreter
# ---------------------------------------------------------------------------


class _Undefined:
    _inst = None

    def __new__(cls):
        if cls._inst is None:
            cls._inst = super().__new__(cls)
        return cls._inst

    def __repr__(self):
        return "undefined"

    def __bool__(self):
        return False


UNDEFINED = _Undefined()


class JSObject:
    def __init__(self, props=None):
        self.props: Dict[str, Any] = props or {}

    def __repr__(self):
        return "JSObject(" + repr(self.props) + ")"


class _CallableJSObject(JSObject):
    """A JSObject that is also invocable — `Number` is both a namespace
    (Number.isInteger) and a conversion function (arr.map(Number))."""

    def __init__(self, fn, props=None):
        super().__init__(props)
        self._fn = fn

    def __call__(self, *args):
        return self._fn(args[0]) if args else self._fn(UNDEFINED)


class JSArray(list):
    pass


class JSMap:
    def __init__(self, items=None):
        self.d: Dict[Any, Any] = {}
        if items:
            for k, v in items:
                self.d[k] = v


class JSSet:
    def __init__(self, items=None):
        self.s = list(items or [])  # preserves insertion order, allows any vals


class JSFunction:
    def __init__(self, name, params, body, env, interp, is_arrow=False, this=None):
        self.name = name
        self.params = params
        self.body = body
        self.env = env
        self.interp = interp
        self.is_arrow = is_arrow
        self.this = this  # lexical this for arrows

    def __call__(self, *args, this=UNDEFINED):
        return self.interp.call_function(self, list(args), this)


class JSError(Exception):
    """A thrown JS value."""

    def __init__(self, value):
        self.value = value
        super().__init__(js_repr(value))


class _Break(Exception):
    pass


class _Continue(Exception):
    pass


class _Return(Exception):
    def __init__(self, value):
        self.value = value


class Environment:
    __slots__ = ("vars", "parent")

    def __init__(self, parent=None):
        self.vars: Dict[str, Any] = {}
        self.parent = parent

    def lookup(self, name):
        e = self
        while e is not None:
            if name in e.vars:
                return e.vars
            e = e.parent
        return None

    def get(self, name):
        d = self.lookup(name)
        if d is None:
            raise JSError(f"ReferenceError: {name} is not defined")
        return d[name]

    def set(self, name, value):
        d = self.lookup(name)
        if d is None:
            # implicit global (sloppy mode)
            e = self
            while e.parent is not None:
                e = e.parent
            e.vars[name] = value
        else:
            d[name] = value

    def declare(self, name, value):
        self.vars[name] = value


def truthy(v) -> bool:
    if v is None or v is UNDEFINED:
        return False
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        return v != 0 and not math.isnan(v)
    if isinstance(v, str):
        return len(v) > 0
    return True


def js_num(v) -> float:
    if isinstance(v, bool):
        return 1.0 if v else 0.0
    if isinstance(v, float):
        return v
    if isinstance(v, str):
        try:
            return float(v) if v.strip() else 0.0
        except ValueError:
            return float("nan")
    if v is None:
        return 0.0
    return float("nan")


def js_str(v) -> str:
    if isinstance(v, str):
        return v
    if v is UNDEFINED:
        return "undefined"
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e21:
            return str(int(v))
        return repr(v)
    if isinstance(v, JSArray):
        return ",".join("" if x in (None, UNDEFINED) else js_str(x) for x in v)
    if isinstance(v, JSObject):
        return "[object Object]"
    if isinstance(v, (JSFunction,)) or callable(v):
        return f"function {getattr(v, 'name', '') or ''}() {{ ... }}"
    return str(v)


def js_repr(v) -> str:
    if isinstance(v, str):
        return json.dumps(v)
    if isinstance(v, JSArray):
        return "[" + ", ".join(js_repr(x) for x in v) + "]"
    if isinstance(v, JSObject):
        return "{" + ", ".join(f"{k}: {js_repr(x)}" for k, x in v.props.items()) + "}"
    if isinstance(v, JSMap):
        return "Map(" + str(len(v.d)) + ")"
    return js_str(v)


def strict_eq(a, b) -> bool:
    if a is UNDEFINED or b is UNDEFINED:
        return a is b
    if a is None or b is None:
        return a is b
    if isinstance(a, bool) or isinstance(b, bool):
        return isinstance(a, bool) and isinstance(b, bool) and a == b
    if isinstance(a, float) and isinstance(b, float):
        return a == b
    if isinstance(a, str) and isinstance(b, str):
        return a == b
    return a is b


def loose_eq(a, b) -> bool:
    nullish_a = a is None or a is UNDEFINED
    nullish_b = b is None or b is UNDEFINED
    if nullish_a or nullish_b:
        return nullish_a and nullish_b
    if isinstance(a, str) and isinstance(b, float):
        return js_num(a) == b
    if isinstance(a, float) and isinstance(b, str):
        return a == js_num(b)
    if isinstance(a, bool) or isinstance(b, bool):
        return js_num(a) == js_num(b)
    return strict_eq(a, b)


def _to_key(v) -> Any:
    """Map keys: JS Map uses same-value-zero; we use hashable natives and
    identity for objects."""
    if isinstance(v, (str, float, bool)) or v is None or v is UNDEFINED:
        return v
    return id(v)


class Interpreter:
    def __init__(self, extra_globals: Optional[Dict[str, Any]] = None):
        self.globals = Environment()
        self._install_builtins()
        self.timers: List[Tuple[float, Any]] = []  # (delay_ms, callback)
        if extra_globals:
            for k, v in extra_globals.items():
                self.globals.declare(k, v)

    # -- public --------------------------------------------------------------

    def run(self, src: str):
        ast = parse(src)
        return self.exec_block(ast[1], self.globals)

    def run_timers(self):
        """Fire queued setTimeout callbacks (in delay order), once."""
        timers = sorted(self.timers, key=lambda t: t[0])
        self.timers = []
        for _, cb in timers:
            self.call_any(cb, [])

    def call_any(self, fn, args, this=UNDEFINED):
        if isinstance(fn, JSFunction):
            return self.call_function(fn, args, this)
        if callable(fn):
            return fn(*args)
        raise JSError(f"TypeError: {js_repr(fn)} is not a function")

    # -- builtins --------------------------------------------------------------

    def _install_builtins(self):
        g = self.globals

        def _log(*args):
            return UNDEFINED

        console = JSObject({"log": _log, "warn": _log, "error": _log, "info": _log})
        g.declare("console", console)
        g.declare("undefined", UNDEFINED)
        g.declare("NaN", float("nan"))
        g.declare("Infinity", float("inf"))
        g.declare("globalThis", JSObject({}))

        mathobj = JSObject({
            "max": lambda *a: max((js_num(x) for x in a), default=-float("inf")),
            "min": lambda *a: min((js_num(x) for x in a), default=float("inf")),
            "abs": lambda x=0.0: abs(js_num(x)),
            "floor": lambda x=0.0: float(math.floor(js_num(x))),
            "ceil": lambda x=0.0: float(math.ceil(js_num(x))),
            "round": lambda x=0.0: float(math.floor(js_num(x) + 0.5)),
            "trunc": lambda x=0.0: float(math.trunc(js_num(x))),
            "sqrt": lambda x=0.0: math.sqrt(js_num(x)),
            "pow": lambda a=0.0, b=0.0: js_num(a) ** js_num(b),
            "sin": lambda x=0.0: math.sin(js_num(x)),
            "cos": lambda x=0.0: math.cos(js_num(x)),
            "atan2": lambda a=0.0, b=0.0: math.atan2(js_num(a), js_num(b)),
            "hypot": lambda *a: math.hypot(*(js_num(x) for x in a)),
            "log10": lambda x=0.0: math.log10(js_num(x)),
            "log2": lambda x=0.0: math.log2(js_num(x)),
            "log": lambda x=0.0: math.log(js_num(x)),
            "sign": lambda x=0.0: float((js_num(x) > 0) - (js_num(x) < 0)),
            "random": lambda: 0.5,  # deterministic for tests
            "PI": math.pi,
            "E": math.e,
        })
        g.declare("Math", mathobj)

        def _js_jsonable(v):
            # JS number formatting: integral doubles print without a
            # fractional part, and stringify is compact by default
            if isinstance(v, float) and v.is_integer() and abs(v) < 1e15:
                return int(v)
            if isinstance(v, list):
                return [_js_jsonable(x) for x in v]
            if isinstance(v, dict):
                return {k: _js_jsonable(x) for k, x in v.items()}
            return v

        def _json_stringify(v, *_a):
            return json.dumps(_js_jsonable(_to_python(v)),
                              separators=(",", ":"))

        def _json_parse(s):
            return _from_python(json.loads(s))

        g.declare("JSON", JSObject({"stringify": _json_stringify, "parse": _json_parse}))

        def _object_keys(o):
            if isinstance(o, JSObject):
                return JSArray(o.props.keys())
            if isinstance(o, JSArray):
                return JSArray(str(i) for i in range(len(o)))
            return JSArray()

        def _object_values(o):
            if isinstance(o, JSObject):
                return JSArray(o.props.values())
            return JSArray()

        def _object_entries(o):
            if isinstance(o, JSObject):
                return JSArray(JSArray([k, v]) for k, v in o.props.items())
            return JSArray()

        def _object_assign(target, *srcs):
            for s in srcs:
                if isinstance(s, JSObject):
                    target.props.update(s.props)
            return target

        def _object_freeze(o):
            return o

        g.declare("Object", JSObject({
            "keys": _object_keys, "values": _object_values,
            "entries": _object_entries, "assign": _object_assign,
            "freeze": _object_freeze,
            "fromEntries": lambda pairs: JSObject(
                {js_str(k): v for k, v in (tuple(p) for p in pairs)}
            ),
        }))

        def _array_isarray(v):
            return isinstance(v, JSArray)

        def _array_from(v, fn=None):
            items = list(_iterate(v))
            if fn is not None:
                items = [self.call_any(fn, [x, float(i)]) for i, x in enumerate(items)]
            return JSArray(items)

        g.declare("Array", JSObject({"isArray": _array_isarray, "from": _array_from,
                                     "of": lambda *a: JSArray(a)}))
        g.declare("Number", _CallableJSObject(js_num, {
            "isInteger": lambda v=UNDEFINED: isinstance(v, float) and v.is_integer(),
            "isFinite": lambda v=UNDEFINED: isinstance(v, float) and math.isfinite(v),
            "isNaN": lambda v=UNDEFINED: isinstance(v, float) and math.isnan(v),
            "parseFloat": lambda s="": js_num(s),
            "MAX_SAFE_INTEGER": float(2**53 - 1),
        }))
        g.declare("String", lambda v=UNDEFINED: js_str(v))
        g.declare("Boolean", lambda v=UNDEFINED: truthy(v))
        g.declare("parseInt", lambda s="", base=10.0: _parse_int(s, base))
        g.declare("parseFloat", lambda s="": js_num(s))
        g.declare("isNaN", lambda v=UNDEFINED: math.isnan(js_num(v)))
        g.declare("isFinite", lambda v=UNDEFINED: math.isfinite(js_num(v)))

        g.declare("Map", _MapCtor)
        g.declare("Set", _SetCtor)
        g.declare("Error", _ErrorCtor)
        g.declare("TypeError", _ErrorCtor)
        g.declare("RangeError", _ErrorCtor)

        def _set_timeout(cb, delay=0.0, *a):
            self.timers.append((js_num(delay), cb))
            return float(len(self.timers))

        g.declare("setTimeout", _set_timeout)
        g.declare("clearTimeout", lambda *_a: UNDEFINED)

    # -- statements ------------------------------------------------------------

    def exec_block(self, stmts, env):
        # hoist function declarations
        for st in stmts:
            if st[0] == "funcdecl":
                env.declare(st[1], JSFunction(st[1], st[2], st[3], env, self))
        result = UNDEFINED
        for st in stmts:
            result = self.exec_stmt(st, env)
        return result

    def exec_stmt(self, node, env):
        k = node[0]
        if k == "expr":
            return self.eval(node[1], env)
        if k == "var":
            for target, init in node[2]:
                val = self.eval(init, env) if init is not None else UNDEFINED
                self.bind_pattern(target, val, env, declare=True)
            return UNDEFINED
        if k == "funcdecl":
            return UNDEFINED  # hoisted
        if k == "block":
            return self.exec_block(node[1], Environment(env))
        if k == "if":
            if truthy(self.eval(node[1], env)):
                return self.exec_stmt(node[2], Environment(env))
            if node[3] is not None:
                return self.exec_stmt(node[3], Environment(env))
            return UNDEFINED
        if k == "while":
            while truthy(self.eval(node[1], env)):
                try:
                    self.exec_stmt(node[2], Environment(env))
                except _Break:
                    break
                except _Continue:
                    continue
            return UNDEFINED
        if k == "dowhile":
            while True:
                try:
                    self.exec_stmt(node[2], Environment(env))
                except _Break:
                    break
                except _Continue:
                    pass
                if not truthy(self.eval(node[1], env)):
                    break
            return UNDEFINED
        if k == "for":
            _, init, cond, step, body = node
            loop_env = Environment(env)
            if init is not None:
                self.exec_stmt(init, loop_env)
            # per-iteration binding for let/const loop variables (ES6
            # 13.7.4.7 CreatePerIterationEnvironment): each iteration gets
            # its OWN copy of the loop bindings so closures created in the
            # body capture that iteration's value, not the final one
            fresh_binding = init is not None and init[0] == "var" and init[1] in (
                "let", "const"
            )
            while cond is None or truthy(self.eval(cond, loop_env)):
                try:
                    self.exec_stmt(body, Environment(loop_env))
                except _Break:
                    break
                except _Continue:
                    pass
                if fresh_binding:
                    nxt = Environment(env)
                    nxt.vars = dict(loop_env.vars)
                    loop_env = nxt
                if step is not None:
                    self.eval(step, loop_env)
            return UNDEFINED
        if k == "forof":
            _, declkind, target, it_expr, body = node
            it = self.eval(it_expr, env)
            for item in _iterate(it):
                loop_env = Environment(env)
                self.bind_pattern(target, item, loop_env, declare=True)
                try:
                    self.exec_stmt(body, loop_env)
                except _Break:
                    break
                except _Continue:
                    continue
            return UNDEFINED
        if k == "forin":
            _, declkind, target, it_expr, body = node
            it = self.eval(it_expr, env)
            keys = (
                list(it.props.keys()) if isinstance(it, JSObject)
                else [str(i) for i in range(len(it))] if isinstance(it, JSArray)
                else []
            )
            for key_ in keys:
                loop_env = Environment(env)
                self.bind_pattern(target, key_, loop_env, declare=True)
                try:
                    self.exec_stmt(body, loop_env)
                except _Break:
                    break
                except _Continue:
                    continue
            return UNDEFINED
        if k == "return":
            raise _Return(self.eval(node[1], env) if node[1] is not None else UNDEFINED)
        if k == "break":
            raise _Break()
        if k == "continue":
            raise _Continue()
        if k == "throw":
            raise JSError(self.eval(node[1], env))
        if k == "try":
            _, block, handler, finalizer = node
            try:
                self.exec_stmt(block, Environment(env))
            except JSError as e:
                if handler is not None:
                    henv = Environment(env)
                    if handler[0] is not None:
                        self.bind_pattern(handler[0], e.value, henv, declare=True)
                    self.exec_stmt(handler[1], henv)
                elif finalizer is None:
                    raise
            finally:
                if finalizer is not None:
                    self.exec_stmt(finalizer, Environment(env))
            return UNDEFINED
        if k == "switch":
            _, disc_expr, cases = node
            disc = self.eval(disc_expr, env)
            senv = Environment(env)
            matched = False
            try:
                for test, body in cases:
                    if not matched and test is not None and strict_eq(
                        self.eval(test, senv), disc
                    ):
                        matched = True
                    if matched:
                        self.exec_block(body, senv)
                if not matched:
                    take = False
                    for test, body in cases:
                        if test is None:
                            take = True
                        if take:
                            self.exec_block(body, senv)
            except _Break:
                pass
            return UNDEFINED
        if k == "empty":
            return UNDEFINED
        if k == "class":
            raise JSError("classes are outside the jsmini interpreter subset")
        raise JSError(f"unsupported statement {k}")

    # -- patterns ------------------------------------------------------------

    def bind_pattern(self, pat, value, env, declare=False):
        k = pat[0]
        if k == "name":
            if declare:
                env.declare(pat[1], value)
            else:
                env.set(pat[1], value)
            return
        if k == "member":
            obj = self.eval(pat[1], env)
            self.set_member(obj, pat[2], value)
            return
        if k == "index":
            obj = self.eval(pat[1], env)
            idx = self.eval(pat[2], env)
            self.set_index(obj, idx, value)
            return
        if k == "default":
            if value is UNDEFINED:
                value = self.eval(pat[2], env)
            self.bind_pattern(pat[1], value, env, declare)
            return
        if k == "arraypat":
            items = list(_iterate(value)) if value not in (None, UNDEFINED) else []
            i = 0
            for sub in pat[1]:
                if sub is None:
                    i += 1
                    continue
                if sub[0] == "rest":
                    self.bind_pattern(sub[1], JSArray(items[i:]), env, declare)
                    break
                self.bind_pattern(sub, items[i] if i < len(items) else UNDEFINED, env, declare)
                i += 1
            return
        if k == "objpat":
            for name, sub in pat[1]:
                v = self.get_member(value, name) if value not in (None, UNDEFINED) else UNDEFINED
                self.bind_pattern(sub, v, env, declare)
            return
        raise JSError(f"unsupported pattern {k}")

    # -- expressions -----------------------------------------------------------

    def eval(self, node, env):
        k = node[0]
        if k == "num":
            return node[1]
        if k == "str":
            return node[1]
        if k == "bool":
            return node[1]
        if k == "null":
            return None
        if k == "undefined":
            return UNDEFINED
        if k == "name":
            return env.get(node[1])
        if k == "this":
            d = env.lookup("this")
            return d["this"] if d else UNDEFINED
        if k == "template":
            out = []
            for kind, payload in node[1]:
                if kind == "str":
                    out.append(payload)
                else:
                    sub = Parser(payload).expression()
                    out.append(js_str(self.eval(sub, env)))
            return "".join(out)
        if k == "array":
            items = []
            for e in node[1]:
                if e[0] == "spread":
                    items.extend(_iterate(self.eval(e[1], env)))
                else:
                    items.append(self.eval(e, env))
            return JSArray(items)
        if k == "object":
            obj = JSObject()
            for p in node[1]:
                if p[0] == "spread":
                    src = self.eval(p[1], env)
                    if isinstance(src, JSObject):
                        obj.props.update(src.props)
                    continue
                _, key, vexpr, computed = p
                key_s = js_str(self.eval(key, env)) if computed else key
                val = self.eval(vexpr, env)
                if isinstance(val, JSFunction) and val.name is None:
                    val.name = key_s
                obj.props[key_s] = val
            return obj
        if k in ("func", "funcdecl"):
            return JSFunction(node[1], node[2], node[3], env, self)
        if k == "arrow":
            d = env.lookup("this")
            return JSFunction(None, node[1], node[2], env, self, is_arrow=True,
                              this=d["this"] if d else UNDEFINED)
        if k == "binop":
            return self.binop(node[1], node[2], node[3], env)
        if k == "unary":
            return self.unary_op(node[1], node[2], env)
        if k == "update":
            _, op, target, prefix = node
            old = js_num(self.eval(target, env))
            new = old + (1.0 if op == "++" else -1.0)
            self.assign_to(target, new, env)
            return new if prefix else old
        if k == "assign":
            _, op, target, rhs = node
            if op == "=":
                val = self.eval(rhs, env)
                self.bind_pattern(_expr_to_pattern(target), val, env, declare=False)
                return val
            if op in ("&&=", "||=", "??="):
                cur = self.eval(target, env)
                if op == "&&=" and not truthy(cur):
                    return cur
                if op == "||=" and truthy(cur):
                    return cur
                if op == "??=" and cur not in (None, UNDEFINED):
                    return cur
                val = self.eval(rhs, env)
                self.assign_to(target, val, env)
                return val
            cur = self.eval(target, env)
            val = self.binop_values(op[:-1], cur, self.eval(rhs, env))
            self.assign_to(target, val, env)
            return val
        if k == "cond":
            return self.eval(node[2] if truthy(self.eval(node[1], env)) else node[3], env)
        if k == "comma":
            self.eval(node[1], env)
            return self.eval(node[2], env)
        if k == "member":
            return self.get_member(self.eval(node[1], env), node[2])
        if k == "optmember":
            base = self.eval(node[1], env)
            if base in (None, UNDEFINED):
                return UNDEFINED
            return self.get_member(base, node[2])
        if k == "index":
            return self.get_index(self.eval(node[1], env), self.eval(node[2], env))
        if k == "call":
            return self.eval_call(node, env)
        if k == "optcall":
            fn = self.eval(node[1], env)
            if fn in (None, UNDEFINED):
                return UNDEFINED
            args = self._eval_args(node[2], env)
            return self.call_any(fn, args)
        if k == "new":
            ctor = self.eval(node[1], env)
            args = self._eval_args(node[2], env)
            if ctor in (_MapCtor, _SetCtor, _ErrorCtor):
                return ctor(*args)
            if isinstance(ctor, JSFunction):
                obj = JSObject()
                ret = self.call_function(ctor, args, obj)
                # real-JS semantics: a constructor returning an object
                # overrides the freshly created one (`new Option(...)`)
                if isinstance(ret, (JSObject, JSArray, JSMap, JSSet)):
                    return ret
                return obj
            if callable(ctor):
                return ctor(*args)
            raise JSError("TypeError: not a constructor")
        if k == "regex":
            raise JSError("regex literals are outside the jsmini interpreter subset")
        raise JSError(f"unsupported expression {k}")

    def _eval_args(self, arg_nodes, env):
        args = []
        for a in arg_nodes:
            if a[0] == "spread":
                args.extend(_iterate(self.eval(a[1], env)))
            else:
                args.append(self.eval(a, env))
        return args

    def eval_call(self, node, env):
        _, callee, arg_nodes = node
        args = self._eval_args(arg_nodes, env)
        if callee[0] in ("member", "optmember"):
            base = self.eval(callee[1], env)
            if callee[0] == "optmember" and base in (None, UNDEFINED):
                return UNDEFINED
            method = self.get_member(base, callee[2])
            if method is UNDEFINED:
                raise JSError(
                    f"TypeError: {js_repr(base)[:40]}.{callee[2]} is not a function"
                )
            if isinstance(method, JSFunction):
                return self.call_function(method, args, base)
            return method(*args)
        if callee[0] == "index":
            base = self.eval(callee[1], env)
            method = self.get_index(base, self.eval(callee[2], env))
            if isinstance(method, JSFunction):
                return self.call_function(method, args, base)
            return method(*args)
        fn = self.eval(callee, env)
        return self.call_any(fn, args)

    def call_function(self, fn: JSFunction, args, this=UNDEFINED):
        env = Environment(fn.env)
        env.declare("this", fn.this if fn.is_arrow else this)
        env.declare("arguments", JSArray(args))
        i = 0
        for p in fn.params:
            if p[0] == "rest":
                self.bind_pattern(p[1], JSArray(args[i:]), env, declare=True)
                break
            self.bind_pattern(p, args[i] if i < len(args) else UNDEFINED, env, declare=True)
            i += 1
        body = fn.body
        try:
            if body[0] == "return":  # expression-bodied arrow
                return self.eval(body[1], env)
            self.exec_stmt(body, env)
        except _Return as r:
            return r.value
        return UNDEFINED

    # -- operators -------------------------------------------------------------

    def binop(self, op, ln, rn, env):
        if op == "&&":
            l = self.eval(ln, env)
            return self.eval(rn, env) if truthy(l) else l
        if op == "||":
            l = self.eval(ln, env)
            return l if truthy(l) else self.eval(rn, env)
        if op == "??":
            l = self.eval(ln, env)
            return self.eval(rn, env) if l in (None, UNDEFINED) else l
        return self.binop_values(op, self.eval(ln, env), self.eval(rn, env))

    def binop_values(self, op, a, b):
        if op == "+":
            if isinstance(a, str) or isinstance(b, str):
                return js_str(a) + js_str(b)
            return js_num(a) + js_num(b)
        if op == "-":
            return js_num(a) - js_num(b)
        if op == "*":
            return js_num(a) * js_num(b)
        if op == "/":
            d = js_num(b)
            n = js_num(a)
            if d == 0:
                return float("nan") if n == 0 else math.copysign(float("inf"), n) * math.copysign(1, d)
            return n / d
        if op == "%":
            d = js_num(b)
            return float("nan") if d == 0 else math.fmod(js_num(a), d)
        if op == "**":
            return js_num(a) ** js_num(b)
        if op == "===":
            return strict_eq(a, b)
        if op == "!==":
            return not strict_eq(a, b)
        if op == "==":
            return loose_eq(a, b)
        if op == "!=":
            return not loose_eq(a, b)
        if op in ("<", ">", "<=", ">="):
            if isinstance(a, str) and isinstance(b, str):
                pass
            else:
                a, b = js_num(a), js_num(b)
                if math.isnan(a) or math.isnan(b):
                    return False
            return {"<": a < b, ">": a > b, "<=": a <= b, ">=": a >= b}[op]
        if op in ("&", "|", "^", "<<", ">>", ">>>"):
            ia, ib = _to_int32(a), _to_int32(b)
            if op == "&":
                return float(ia & ib)
            if op == "|":
                return float(ia | ib)
            if op == "^":
                return float(ia ^ ib)
            if op == "<<":
                return float(_wrap_int32(ia << (ib & 31)))
            if op == ">>":
                return float(ia >> (ib & 31))
            if op == ">>>":
                return float((ia & 0xFFFFFFFF) >> (ib & 31))
        if op == "instanceof":
            if b is _MapCtor:
                return isinstance(a, JSMap)
            if b is _SetCtor:
                return isinstance(a, JSSet)
            if b is _ErrorCtor:
                return isinstance(a, JSObject) and "message" in a.props
            return False
        if op == "in":
            if isinstance(b, JSObject):
                return js_str(a) in b.props
            if isinstance(b, JSArray):
                return js_num(a) < len(b)
            return False
        raise JSError(f"unsupported operator {op}")

    def unary_op(self, op, operand, env):
        if op == "typeof":
            try:
                v = self.eval(operand, env)
            except JSError:
                return "undefined"
            if v is UNDEFINED:
                return "undefined"
            if v is None:
                return "object"
            if isinstance(v, bool):
                return "boolean"
            if isinstance(v, float):
                return "number"
            if isinstance(v, str):
                return "string"
            if isinstance(v, JSFunction) or callable(v):
                return "function"
            return "object"
        if op == "delete":
            if operand[0] == "member":
                obj = self.eval(operand[1], env)
                if isinstance(obj, JSObject):
                    obj.props.pop(operand[2], None)
                return True
            if operand[0] == "index":
                obj = self.eval(operand[1], env)
                idx = self.eval(operand[2], env)
                if isinstance(obj, JSObject):
                    obj.props.pop(js_str(idx), None)
                return True
            return True
        v = self.eval(operand, env)
        if op == "!":
            return not truthy(v)
        if op == "-":
            return -js_num(v)
        if op == "+":
            return js_num(v)
        if op == "~":
            return float(_wrap_int32(~_to_int32(v)))
        if op == "void":
            return UNDEFINED
        if op == "await":
            return v  # no event loop: promises resolve synchronously or not at all
        raise JSError(f"unsupported unary {op}")

    def assign_to(self, target, value, env):
        if target[0] == "name":
            env.set(target[1], value)
        elif target[0] == "member":
            self.set_member(self.eval(target[1], env), target[2], value)
        elif target[0] == "index":
            self.set_index(self.eval(target[1], env), self.eval(target[2], env), value)
        else:
            raise JSError("invalid assignment target")

    # -- member access -----------------------------------------------------------

    def get_member(self, base, name):
        if base is None or base is UNDEFINED:
            raise JSError(f"TypeError: cannot read {name!r} of {js_str(base)}")
        if isinstance(base, JSObject):
            if name in base.props:
                return base.props[name]
            return UNDEFINED
        if isinstance(base, JSArray):
            return _array_member(self, base, name)
        if isinstance(base, str):
            return _string_member(self, base, name)
        if isinstance(base, JSMap):
            return _map_member(self, base, name)
        if isinstance(base, JSSet):
            return _set_member(self, base, name)
        if isinstance(base, float):
            if name == "toFixed":
                return lambda nd=0.0: f"{base:.{int(nd)}f}"
            if name == "toString":
                return lambda *a: js_str(base)
            return UNDEFINED
        if isinstance(base, bool):
            return UNDEFINED
        if callable(base):
            if name == "call":
                return lambda this=UNDEFINED, *a: self.call_any(base, list(a), this)
            if name == "apply":
                return lambda this=UNDEFINED, a=None: self.call_any(
                    base, list(a or []), this
                )
            if name == "bind":
                def bound(this=UNDEFINED, *pre):
                    return lambda *a: self.call_any(base, list(pre) + list(a), this)
                return bound
            if name == "name":
                return getattr(base, "name", "") or ""
            return UNDEFINED
        return UNDEFINED

    def set_member(self, base, name, value):
        if isinstance(base, JSObject):
            # accessor support for host environments (the browser-DOM stub
            # needs `el.innerHTML = x` to mutate the element tree): an
            # object may carry a `__setters__` JSObject mapping property
            # name -> fn(value); real JS would use defineProperty getters/
            # setters, which are outside the jsmini subset.
            setters = base.props.get("__setters__")
            if isinstance(setters, JSObject) and name in setters.props:
                self.call_any(setters.props[name], [value], this=base)
                return
            base.props[name] = value
            return
        if isinstance(base, JSArray) and name == "length":
            n = int(js_num(value))
            del base[n:]
            return
        raise JSError(f"TypeError: cannot set {name!r} on {js_repr(base)[:40]}")

    def get_index(self, base, idx):
        if isinstance(base, JSArray):
            if isinstance(idx, float) and idx.is_integer():
                i = int(idx)
                return base[i] if 0 <= i < len(base) else UNDEFINED
            return self.get_member(base, js_str(idx))
        if isinstance(base, str):
            if isinstance(idx, float) and idx.is_integer():
                i = int(idx)
                return base[i] if 0 <= i < len(base) else UNDEFINED
            return self.get_member(base, js_str(idx))
        if isinstance(base, JSObject):
            return base.props.get(js_str(idx), UNDEFINED)
        return self.get_member(base, js_str(idx))

    def set_index(self, base, idx, value):
        if isinstance(base, JSArray) and isinstance(idx, float) and idx.is_integer():
            i = int(idx)
            while len(base) <= i:
                base.append(UNDEFINED)
            base[i] = value
            return
        if isinstance(base, JSObject):
            base.props[js_str(idx)] = value
            return
        raise JSError("TypeError: cannot index-assign")


def _parse_int(s, base=10.0):
    try:
        return float(int(js_str(s).strip() or "x", int(base)))
    except ValueError:
        m = re.match(r"\s*[+-]?[0-9]+", js_str(s))
        return float(int(m.group(0))) if m else float("nan")


def _to_int32(v) -> int:
    f = js_num(v)
    if math.isnan(f) or math.isinf(f):
        return 0
    return _wrap_int32(int(f))


def _wrap_int32(i: int) -> int:
    i &= 0xFFFFFFFF
    return i - 0x100000000 if i >= 0x80000000 else i


def _iterate(v):
    if isinstance(v, JSArray):
        return list(v)
    if isinstance(v, str):
        return list(v)
    if isinstance(v, JSMap):
        return [JSArray([k, val]) for k, val in v.d.items()]
    if isinstance(v, JSSet):
        return list(v.s)
    if isinstance(v, JSObject):
        raise JSError("TypeError: object is not iterable")
    if v in (None, UNDEFINED):
        raise JSError("TypeError: undefined is not iterable")
    return []


def _MapCtor(items=None):
    if items is not None:
        return JSMap([(tuple(_iterate(p))[0], tuple(_iterate(p))[1]) for p in _iterate(items)])
    return JSMap()


def _SetCtor(items=None):
    return JSSet(_iterate(items) if items is not None else None)


def _ErrorCtor(message=""):
    return JSObject({"message": js_str(message), "name": "Error",
                     "stack": ""})


def _array_member(interp, arr: JSArray, name):
    if name == "length":
        return float(len(arr))
    def method(fn):
        fn.name = name
        return fn
    if name == "push":
        def push(*a):
            arr.extend(a)
            return float(len(arr))
        return push
    if name == "pop":
        return lambda: arr.pop() if arr else UNDEFINED
    if name == "shift":
        return lambda: arr.pop(0) if arr else UNDEFINED
    if name == "unshift":
        def unshift(*a):
            arr[0:0] = a
            return float(len(arr))
        return unshift
    if name == "map":
        return lambda fn: JSArray(
            interp.call_any(fn, [x, float(i), arr]) for i, x in enumerate(list(arr))
        )
    if name == "forEach":
        def for_each(fn):
            for i, x in enumerate(list(arr)):
                interp.call_any(fn, [x, float(i), arr])
            return UNDEFINED
        return for_each
    if name == "filter":
        return lambda fn: JSArray(
            x for i, x in enumerate(list(arr)) if truthy(interp.call_any(fn, [x, float(i), arr]))
        )
    if name == "find":
        def find(fn):
            for i, x in enumerate(list(arr)):
                if truthy(interp.call_any(fn, [x, float(i), arr])):
                    return x
            return UNDEFINED
        return find
    if name == "findIndex":
        def find_index(fn):
            for i, x in enumerate(list(arr)):
                if truthy(interp.call_any(fn, [x, float(i), arr])):
                    return float(i)
            return -1.0
        return find_index
    if name == "some":
        return lambda fn: any(
            truthy(interp.call_any(fn, [x, float(i), arr])) for i, x in enumerate(list(arr))
        )
    if name == "every":
        return lambda fn: all(
            truthy(interp.call_any(fn, [x, float(i), arr])) for i, x in enumerate(list(arr))
        )
    if name == "reduce":
        def reduce(fn, *init):
            items = list(arr)
            if init:
                acc = init[0]
                start = 0
            else:
                acc = items[0]
                start = 1
            for i in range(start, len(items)):
                acc = interp.call_any(fn, [acc, items[i], float(i), arr])
            return acc
        return reduce
    if name == "join":
        return lambda sep=",": js_str(sep).join(
            "" if x in (None, UNDEFINED) else js_str(x) for x in arr
        )
    if name == "slice":
        def slice_(start=0.0, end=None):
            s = int(start)
            e = len(arr) if end is None else int(end)
            return JSArray(arr[s:e] if s >= 0 else arr[s:e])
        return slice_
    if name == "splice":
        def splice(start=0.0, count=None, *items):
            s = int(start)
            c = len(arr) - s if count is None else int(count)
            removed = JSArray(arr[s : s + c])
            arr[s : s + c] = items
            return removed
        return splice
    if name == "indexOf":
        def index_of(v):
            for i, x in enumerate(arr):
                if strict_eq(x, v):
                    return float(i)
            return -1.0
        return index_of
    if name == "includes":
        return lambda v: any(strict_eq(x, v) for x in arr)
    if name == "concat":
        def concat(*others):
            out = JSArray(arr)
            for o in others:
                if isinstance(o, JSArray):
                    out.extend(o)
                else:
                    out.append(o)
            return out
        return concat
    if name == "reverse":
        def reverse():
            arr.reverse()
            return arr
        return reverse
    if name == "sort":
        def sort(fn=None):
            import functools

            if fn is None:
                arr.sort(key=js_str)
            else:
                arr.sort(key=functools.cmp_to_key(
                    lambda a, b: (lambda r: (r > 0) - (r < 0))(js_num(interp.call_any(fn, [a, b])))
                ))
            return arr
        return sort
    if name == "fill":
        def fill(v, start=0.0, end=None):
            e = len(arr) if end is None else int(end)
            for i in range(int(start), e):
                arr[i] = v
            return arr
        return fill
    if name == "flat":
        def flat(depth=1.0):
            out = JSArray()
            for x in arr:
                if isinstance(x, JSArray) and depth >= 1:
                    out.extend(x)
                else:
                    out.append(x)
            return out
        return flat
    if name == "entries":
        return lambda: JSArray(JSArray([float(i), x]) for i, x in enumerate(arr))
    if name == "keys":
        return lambda: JSArray(float(i) for i in range(len(arr)))
    if name == "values":
        return lambda: JSArray(arr)
    return UNDEFINED


def _string_member(interp, s: str, name):
    if name == "length":
        return float(len(s))
    if name == "split":
        def split(sep=UNDEFINED, limit=None):
            if sep is UNDEFINED:
                return JSArray([s])
            parts = s.split(js_str(sep)) if sep != "" else list(s)
            return JSArray(parts if limit is None else parts[: int(limit)])
        return split
    if name == "slice":
        return lambda a=0.0, b=None: s[int(a): (None if b is None else int(b))]
    if name == "substring":
        def substring(a=0.0, b=None):
            i = max(0, int(a))
            j = len(s) if b is None else max(0, int(b))
            if i > j:
                i, j = j, i
            return s[i:j]
        return substring
    if name == "toUpperCase":
        return lambda: s.upper()
    if name == "toLowerCase":
        return lambda: s.lower()
    if name == "trim":
        return lambda: s.strip()
    if name == "startsWith":
        return lambda p, at=0.0: s.startswith(js_str(p), int(at))
    if name == "endsWith":
        return lambda p: s.endswith(js_str(p))
    if name == "includes":
        return lambda p: js_str(p) in s
    if name == "indexOf":
        return lambda p, at=0.0: float(s.find(js_str(p), int(at)))
    if name == "lastIndexOf":
        return lambda p: float(s.rfind(js_str(p)))
    if name == "charAt":
        return lambda i=0.0: s[int(i)] if 0 <= int(i) < len(s) else ""
    if name == "charCodeAt":
        return lambda i=0.0: float(ord(s[int(i)])) if 0 <= int(i) < len(s) else float("nan")
    if name == "replace":
        return lambda a, b: s.replace(js_str(a), js_str(b), 1)
    if name == "replaceAll":
        return lambda a, b: s.replace(js_str(a), js_str(b))
    if name == "padStart":
        return lambda n, fill=" ": s.rjust(int(n), js_str(fill)[:1] or " ")
    if name == "padEnd":
        return lambda n, fill=" ": s.ljust(int(n), js_str(fill)[:1] or " ")
    if name == "repeat":
        return lambda n: s * int(n)
    if name == "concat":
        return lambda *a: s + "".join(js_str(x) for x in a)
    if name == "toString":
        return lambda: s
    return UNDEFINED


def _map_member(interp, m: JSMap, name):
    if name == "size":
        return float(len(m.d))
    if name == "get":
        return lambda k: m.d.get(_to_key(k), UNDEFINED)
    if name == "set":
        def set_(k, v):
            m.d[_to_key(k)] = v
            return m
        return set_
    if name == "has":
        return lambda k: _to_key(k) in m.d
    if name == "delete":
        return lambda k: m.d.pop(_to_key(k), _MISSING) is not _MISSING
    if name == "clear":
        return lambda: (m.d.clear(), UNDEFINED)[1]
    if name == "forEach":
        def for_each(fn):
            for k, v in list(m.d.items()):
                interp.call_any(fn, [v, k, m])
            return UNDEFINED
        return for_each
    if name == "keys":
        return lambda: JSArray(m.d.keys())
    if name == "values":
        return lambda: JSArray(m.d.values())
    if name == "entries":
        return lambda: JSArray(JSArray([k, v]) for k, v in m.d.items())
    return UNDEFINED


_MISSING = object()


def _set_member(interp, st: JSSet, name):
    if name == "size":
        return float(len(st.s))
    if name == "add":
        def add(v):
            if not any(strict_eq(x, v) for x in st.s):
                st.s.append(v)
            return st
        return add
    if name == "has":
        return lambda v: any(strict_eq(x, v) for x in st.s)
    if name == "delete":
        def delete(v):
            for i, x in enumerate(st.s):
                if strict_eq(x, v):
                    st.s.pop(i)
                    return True
            return False
        return delete
    if name == "forEach":
        def for_each(fn):
            for x in list(st.s):
                interp.call_any(fn, [x, x, st])
            return UNDEFINED
        return for_each
    if name == "clear":
        return lambda: (st.s.clear(), UNDEFINED)[1]
    return UNDEFINED


def _to_python(v):
    if v is UNDEFINED:
        return None
    if isinstance(v, JSArray):
        return [_to_python(x) for x in v]
    if isinstance(v, JSObject):
        return {k: _to_python(x) for k, x in v.props.items() if x is not UNDEFINED}
    if isinstance(v, float) and v.is_integer() and abs(v) < 2**53:
        return int(v)
    return v


def _from_python(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, (int, float)):
        return float(v)
    if isinstance(v, str):
        return v
    if isinstance(v, list):
        return JSArray(_from_python(x) for x in v)
    if isinstance(v, dict):
        return JSObject({str(k): _from_python(x) for k, x in v.items()})
    return v


def evaluate(src: str, extra_globals: Optional[Dict[str, Any]] = None) -> Interpreter:
    """Run a script; returns the Interpreter (globals inspectable)."""
    interp = Interpreter(extra_globals)
    interp.run(src)
    return interp
