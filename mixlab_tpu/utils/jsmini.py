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
    "of", "switch", "case", "default", "try", "catch", "finally", "throw",
    "this", "null", "true", "false", "undefined", "void", "class", "extends",
    "super", "async", "await", "yield", "static", "get", "set",
}

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
            if v == "async" and self.peek(1).kind == "keyword" and self.peek(1).value == "function":
                self.next()
                fn = self.function(decl=True)
                return ("async",) + fn[1:] if False else fn  # treat as sync
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
            if self.at("keyword", "static"):
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
            if self.at("keyword", "of") or self.at("keyword", "in"):
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

    def _try_arrow(self):
        start = self.pos
        is_async = False
        if self.at("keyword", "async") and self.peek(1).kind in ("id",) or (
            self.at("keyword", "async") and self.peek(1).kind == "punct" and self.peek(1).value == "("
        ):
            is_async = True
            self.next()
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
            if v == "async":
                # async function expr / async arrow handled earlier; treat
                # `async function` here
                if self.at("keyword", "function"):
                    return self.function(decl=False)
                return ("name", "async")
            if v in ("get", "set", "of", "static"):  # contextual keywords
                return ("name", v)
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
                        else:  # shorthand
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
