"""The compound query language ``func(arg1; arg2; kw=v)`` (SURVEY.md §2.10 U1).

Faithful re-implementation of the reference grammar
(src/compound/parser.py:26-203): find the outer call (first '(' +
trailing ')'), split args on depth-0 ';', classify arg vs kwarg ('=' outside
parens), recurse on positional args.  Two deliberate differences from the
reference:

- the function registry is an explicit dict (the reference resolves names
  via getattr on the timeseries_functions module, cp:57-60);
- each node is parsed once into an AST and evaluation is lazy-Spark: every
  registered function returns a DataFrame transformation, so the whole
  formula becomes ONE Catalyst plan executed at the sink — the reference
  evaluates eagerly inside-out and re-scans nested text O(depth) times
  (its own TODO, cp:8-10).

Errors raise ParseError/TsError instead of returning {'error': ...} values.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from tsengine.core import TsError


class ParseError(TsError):
    pass


@dataclass
class Call:
    name: str
    args: list = field(default_factory=list)  # Call | str literals
    kwargs: dict = field(default_factory=dict)  # str -> str


def find_func(text: str):
    """cp:86-115: split ``name(argstring)``."""
    s_1 = re.search(r"\(", text)
    s_2 = re.search(r"\)$", text)
    if not s_1 and not s_2:
        return ("", text)  # bare literal
    if s_1 and s_2:
        return (text[: s_1.start()], text[s_1.start() + 1 : s_2.start()])
    raise ParseError("Incorrect syntax")


def is_kwarg(st: str):
    """cp:176-203."""
    for ind, elem in enumerate(st):
        if elem in "()":
            return ("arg", st, None)
        if elem == "=":
            if ind == 0 or len(st) < ind + 2:
                raise ParseError("Invalid syntax")
            return ("kwarg", st[:ind], st[ind + 1 :])
    return ("arg", None, None)


def parse_args(args_text: str):
    """cp:118-173: depth-0 ';' tokenization."""
    args: list[str] = []
    kwargs: dict[str, str] = {}
    level = 0
    st = ""
    for ch in args_text:
        if ch == "(":
            level += 1
            st += ch
        elif ch == ")":
            level -= 1
            st += ch
        elif ch == ";" and level == 0:
            _classify(st, args, kwargs)
            st = ""
        else:
            st += ch
    if level != 0:
        raise ParseError("Invalid syntax")
    _classify(st, args, kwargs)
    return args, kwargs


def _classify(st, args, kwargs):
    kind, k, v = is_kwarg(st)
    if kind == "arg":
        args.append(st)
    else:
        kwargs[k] = v


def parse(text: str) -> Call | str:
    """Recursive parse to an AST (single pass per level; unlike cp:69-74 the
    evaluation below walks the AST, not the raw text)."""
    if not text:
        raise ParseError("Not valid formula")
    text = text.replace(" ", "")
    name, inner = find_func(text)
    if name == "" and "(" not in text:
        return text  # bare literal
    if name == "":
        # '(expr)' grouping: reference parses the inner text as a call
        return parse(inner)
    arg_strs, kwargs = parse_args(inner) if inner else ([], {})
    args = [parse(a) for a in arg_strs if a is not None and a != ""] if inner else []
    return Call(name, args, kwargs)


class Evaluator:
    """Walks the AST against a function registry.  kwargs stay strings and
    each registered function coerces (reference behavior, tf:132-137)."""

    def __init__(self, registry: dict):
        self.registry = registry

    def eval(self, node):
        if isinstance(node, str):
            return node
        if node.name not in self.registry:
            raise ParseError(f"Unknown function: {node.name}")
        fn = self.registry[node.name]
        # reference parity (ts_list_function decorator, tf:42-45): a kwarg
        # the target function does not accept is a semantic error with the
        # reference's message, not a Python TypeError
        import inspect

        try:
            params = inspect.signature(fn).parameters
        except (TypeError, ValueError):  # builtins without signatures
            params = None
        if params is not None and not any(
            p.kind == p.VAR_KEYWORD for p in params.values()
        ):
            for k in node.kwargs:
                if k not in params:
                    raise TsError(f"unknown argument {k}")
        args = [self.eval(a) for a in node.args]
        return fn(*args, **node.kwargs)

    def run(self, text: str):
        return self.eval(parse(text))
