"""Differential test: the jq→Column compiler vs an independent Python
interpreter of the SAME documented subset semantics.

The compiler (``functions/jq_compile.py``) turns jq programs into Catalyst
expressions; bugs there are structural (associativity, null handling,
operator precedence) and invisible to single-value goldens. This file
re-implements the documented semantics as a direct AST interpreter — no
Column machinery shared — and checks both agree on hundreds of randomized
inputs evaluated in ONE Spark job.

Spec mirrored (the *documented* columnar deltas from dynamic jq, see the
module docstring of jq_compile.py): SQL null propagation in arithmetic and
ordering comparisons, total ``==``/``!=``, jq truthiness (only null/false
falsey) with NULL-input coalescing to false in boolean contexts, ``/``
always float, ``%`` C-style truncated on longs, empty-stream→None.
"""

from __future__ import annotations

import math
import random
import re

import pytest
from pyspark.sql import functions as F

from funcify_feature_eng_spark.functions.jq_compile import compile_jq, parse


# ------------------------------------------------- independent interpreter


def _truthy(v):
    return v is not None and v is not False


def _num(v):
    return None if v is None else float(v)


_ENV: list[tuple[str, object]] = []


def _ev(node, cur):
    """Evaluate the parsed AST over a plain Python value."""
    k = node[0]
    if k == "identity":
        return cur
    if k == "pipe":
        return _ev(node[2], _ev(node[1], cur))
    if k == "var":
        for name, v in reversed(_ENV):
            if name == node[1]:
                return v
        raise AssertionError(f"unbound ${node[1]}")
    if k == "bind":
        _ENV.append((node[2], _ev(node[1], cur)))
        try:
            return _ev(node[3], cur)
        finally:
            _ENV.pop()
    if k == "reduce":
        src, var, init_n, upd_n = node[1], node[2], node[3], node[4]
        stream = _ev(("arr", [src]), cur)
        acc = _ev(init_n, cur)
        for x in stream or []:
            _ENV.append((var, x))
            try:
                acc = _ev(upd_n, acc)
            finally:
                _ENV.pop()
        return acc
    if k == "lit":
        return node[1]
    if k == "field":
        base = _ev(node[1], cur)
        return None if base is None else base.get(node[2])
    if k == "index":
        base = _ev(node[1], cur)
        if base is None:
            return None
        i = node[2]
        if -len(base) <= i < len(base):
            return base[i]
        return None
    if k == "slice":
        base = _ev(node[1], cur)
        if base is None:
            return None
        return base[node[2]:node[3]]  # jq slice ≡ Python slice clamping
    if k == "arr":
        items = node[1]
        if len(items) == 1:
            st = items[0]
            stages = _flatten_pipe(st)
            head_splits = (stages[0][0] == "call" and stages[0][1] == "splits")
            if stages[0][0] == "iterate" or head_splits:
                if head_splits:
                    if cur is None:
                        return None
                    out = re.split(stages[0][2][1], cur)
                else:
                    base = _ev(stages[0][1], cur)
                    if base is None:
                        return None
                    out = list(base)
                for s in stages[1:]:
                    if s[0] == "call" and s[1] == "select":
                        out = [x for x in out if _truthy(_ev(s[2], x))]
                    else:
                        out = [_ev(s, x) for x in out]
                return out
        return [_ev(n, cur) for n in items]
    if k == "obj":
        return {key: _ev(n, cur) for key, n in node[1]}
    if k == "interp":
        parts = []
        for p in node[1]:
            if isinstance(p, str):
                parts.append(p)
            else:
                v = _ev(p, cur)
                parts.append("null" if v is None else _tostr(v))
        return "".join(parts)
    if k == "not":
        return not _truthy(cur)
    if k == "neg":
        v = _ev(node[1], cur)
        return None if v is None else -v
    if k == "if":
        for cond, then in node[1]:
            if _truthy(_ev(cond, cur)):
                return _ev(then, cur)
        return _ev(node[2], cur) if node[2] is not None else cur
    if k == "alt":
        l = _ev(node[1], cur)
        return l if _truthy(l) else _ev(node[2], cur)
    if k in ("and", "or"):
        l = _truthy(_ev(node[1], cur))
        r = _truthy(_ev(node[2], cur))
        return (l and r) if k == "and" else (l or r)
    if k == "cmp":
        op, l, r = node[1], _ev(node[2], cur), _ev(node[3], cur)
        if op == "==":
            return l == r if (l is None) == (r is None) else False
        if op == "!=":
            return not (l == r if (l is None) == (r is None) else False)
        if l is None or r is None:
            return None  # SQL ordering-comparison null propagation
        return {"<": l < r, "<=": l <= r, ">": l > r, ">=": l >= r}[op]
    if k == "arith":
        op, l, r = node[1], _ev(node[2], cur), _ev(node[3], cur)
        if op == "+" and (isinstance(l, str) or isinstance(r, str)):
            return None if (l is None or r is None) else l + r
        if op == "+" and (isinstance(l, list) or isinstance(r, list)):
            return None if (l is None or r is None) else l + r
        if l is None or r is None:
            return None
        if op == "+":
            return l + r
        if op == "-":
            return l - r
        if op == "*":
            return l * r
        if op == "/":
            return float(l) / float(r)
        if op == "%":  # C-style: truncate operands to long, remainder
            la, lb = int(l), int(r)
            return la - int(la / lb) * lb if lb else None
    if k == "typefilter":
        # static filters resolve at compile time; inputs here are matched
        return cur
    if k == "builtin":
        return _builtin(node[1], cur)
    if k == "call":
        return _call(node[1], node[2], cur)
    if k == "call2":
        raise NotImplementedError("sub/gsub covered by golden tests")
    raise AssertionError(f"unhandled node {node!r}")


def _flatten_pipe(n):
    if n[0] == "pipe":
        return _flatten_pipe(n[1]) + _flatten_pipe(n[2])
    return [n]


def _tostr(v):
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return str(v)
    return str(v)


def _builtin(name, cur):
    if cur is None:
        return None
    if name == "length":
        return len(cur) if isinstance(cur, (list, str)) else abs(cur)
    if name == "floor":
        return math.floor(cur)
    if name == "ceil":
        return math.ceil(cur)
    if name in ("abs", "fabs"):
        return abs(cur)
    if name == "tostring":
        return _tostr(cur)
    if name == "tonumber":
        return float(cur)
    if name == "round":
        # half away from zero, like C round() / Spark HALF_UP
        return int(math.floor(cur + 0.5)) if cur >= 0 else int(math.ceil(cur - 0.5))
    if name == "sqrt":
        return math.sqrt(cur)
    if name == "add":
        return sum(cur) if cur else None
    if name == "min":
        return min(cur) if cur else None
    if name == "max":
        return max(cur) if cur else None
    if name == "sort":
        return sorted(cur)
    if name == "unique":
        return sorted(set(cur))
    if name == "reverse":
        return list(reversed(cur))
    if name == "first":
        return cur[0] if cur else None
    if name == "last":
        return cur[-1] if cur else None
    if name == "any":
        return any(bool(x) for x in cur if x is not None)
    if name == "all":
        return all(bool(x) for x in cur if x is not None)
    if name == "ascii_downcase":
        return "".join(chr(ord(c) + 32) if "A" <= c <= "Z" else c for c in cur)
    if name == "ascii_upcase":
        return "".join(chr(ord(c) - 32) if "a" <= c <= "z" else c for c in cur)
    raise AssertionError(f"unhandled builtin {name}")


def _call(name, arg, cur):
    if name == "select":
        return cur if _truthy(_ev(arg, cur)) else None
    if cur is None:
        return None
    if name == "map":
        stages = _flatten_pipe(arg)
        out = list(cur)
        for s in stages:
            if s[0] == "call" and s[1] == "select":
                out = [x for x in out if _truthy(_ev(s[2], x))]
            else:
                out = [_ev(s, x) for x in out]
        return out
    if name == "sort_by":
        keyed = [(_ev(arg, x), i, x) for i, x in enumerate(cur)]
        keyed.sort(key=lambda t: (t[0] is not None, t[0], t[1]))
        return [x for _, _, x in keyed]
    if name == "any":
        return any(_truthy(_ev(arg, x)) for x in cur)
    if name == "all":
        return all(_truthy(_ev(arg, x)) for x in cur)
    if name == "join":
        return arg[1].join(cur)
    if name == "split":
        return cur.split(arg[1])
    if name == "ltrimstr":
        return cur[len(arg[1]):] if cur.startswith(arg[1]) else cur
    if name == "rtrimstr":
        return cur[: -len(arg[1])] if cur.endswith(arg[1]) else cur
    if name == "startswith":
        return cur.startswith(arg[1])
    if name == "endswith":
        return cur.endswith(arg[1])
    if name == "has":
        # array form: index exists
        i = _ev(arg, cur)
        return 0 <= i < len(cur)
    if name in ("min_by", "max_by"):
        if not cur:
            return None
        best = cur[0]
        for x in cur[1:]:
            kx, kb = _ev(arg, x), _ev(arg, best)
            def lt(a, b):
                if a is None:
                    return b is not None
                if b is None:
                    return False
                return a < b
            if name == "min_by":
                if lt(kx, kb):
                    best = x
            else:
                if not lt(kx, kb):
                    best = x
        return best
    if name in ("group_by", "unique_by"):
        # jq: stable sort by key, split into runs of null-safe-equal keys
        def _eq(a, b):
            return (a is None and b is None) or a == b
        keys = []
        for x in cur:
            kx = _ev(arg, x)
            if not any(_eq(kx, k) for k in keys):
                keys.append(kx)
        keys.sort(key=lambda k: (k is not None, k))
        groups = [[x for x in cur if _eq(_ev(arg, x), k)] for k in keys]
        if name == "group_by":
            return groups
        return [g[0] for g in groups]
    raise AssertionError(f"unhandled call {name}")


# ------------------------------------------------------------- the battery

NUM_PROGRAMS = [
    ". + 1",
    "(. * 2) - (. / 4)",
    ". % 7",
    "- . + 3",
    "if . > 0 then . else - . end",
    "if . < -5 then \"lo\" elif . < 5 then \"mid\" else \"hi\" end",
    "(. > 3) and (. < 100)",
    "(. < 0) or (. == 0)",
    ". // -99",
    "(numbers | if . >= 0 then floor else null end) // -1",
    "floor",
    "ceil",
    "fabs | sqrt",
    "round",
    "tostring",
    '"v=\\(round)"',
    "{x: ., y: (. * 2)} | .y",
    "[., . + 1] | last",
]

ARR_PROGRAMS = [
    "length",
    "add // 0",
    "min // -1",
    "max // -1",
    "sort",
    "unique",
    "reverse",
    "first // -1",
    "last // -1",
    "map(. * 2)",
    "map(select(. > 0))",
    "map(select(. >= 0) | . + 10) | length",
    "[.[] | select(. < 0) | - .]",
    "sort_by(- .)",
    "any(. > 5)",
    "all(. > -100)",
    "map(. > 0) | any",
    "map(floor)",
    "add // 0 | round",
    ".[0] // -7",
    ".[2] // -7",
    ".[-1] // -7",
    "reduce .[] as $x (0; . + $x)",
    "reduce .[] as $x (0; . + ($x * $x))",
    "reduce .[] as $x (0; . + 1)",
    "reduce .[] as $x (0; if $x > . then $x else . end)",
    ". as $a | reduce .[] as $x (0; . + $x)",
    "reduce .[] as $x (0; . + $x) as $s | [.[] | . - $s] | length",
    ".[1:3]",
    ".[1:]",
    ".[:2] | length",
    ".[-2:]",
    ".[2:1] | length",
    ".[-10:2]",
    "sort | .[1:-1]",
    "has(0)",
    "has(2)",
    "group_by(floor) | length",
    "group_by(floor) | map(length)",
    "group_by(. > 0) | map(add)",
    "unique_by(floor) | length",
    "unique_by(floor) | map(floor)",
    "min_by(floor) // -999",
    "max_by(floor) // -999",
    "min_by(- .) // -999",
    "max_by(. * .) // -999",
]

STR_PROGRAMS = [
    "length",
    "ascii_upcase",
    "ascii_downcase",
    '. + "_sfx"',
    'ltrimstr("ab")',
    'rtrimstr("yz")',
    'startswith("a")',
    'endswith("z")',
    'split("b") | length',
    'split("a") | join("-")',
    '"pre.\\(ascii_upcase).post"',
    'if startswith("a") then ascii_upcase else . end',
    ".[1:4]",
    ".[:3]",
    ".[-2:]",
    ".[1:-1]",
    '[splits("b")] | length',
    '[splits("[ab]")] | join("/")',
    '[splits(" ") | length] | add // 0',
]


def _rand_nums(rng, n):
    pool = [None, 0.0, -1.0, 1.0, 2.5, -2.5, 0.5]
    return [
        rng.choice(pool) if rng.random() < 0.4 else round(rng.uniform(-50, 50), 3)
        for _ in range(n)
    ]


def _rand_arrs(rng, n):
    out = []
    for _ in range(n):
        if rng.random() < 0.1:
            out.append(None)
        else:
            out.append([round(rng.uniform(-20, 20), 2) for _ in range(rng.randrange(0, 6))])
    return out


def _rand_strs(rng, n):
    alpha = "abyz AZ_"
    out = []
    for _ in range(n):
        if rng.random() < 0.1:
            out.append(None)
        else:
            out.append("".join(rng.choice(alpha) for _ in range(rng.randrange(0, 8))))
    return out


def _close(a, b):
    if isinstance(a, float) and isinstance(b, float):
        return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9)
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(_close(x, y) for x, y in zip(a, b))
    # compiled ints may come back as float (jq numbers are doubles) — align
    if isinstance(a, (int, float)) and isinstance(b, (int, float)) \
            and not isinstance(a, bool) and not isinstance(b, bool):
        return math.isclose(float(a), float(b), rel_tol=1e-9, abs_tol=1e-9)
    return a == b


def _run_battery(spark, programs, values, in_type, spark_type):
    df = spark.createDataFrame([(i, v) for i, v in enumerate(values)],
                               f"i long, v {spark_type}")
    cols = [F.col("i")]
    asts = []
    for j, prog in enumerate(programs):
        cols.append(compile_jq(prog, input_type=in_type)(F.col("v")).alias(f"c{j}"))
        asts.append(parse(prog))
    rows = {r["i"]: r for r in df.select(*cols).collect()}
    mismatches = []
    for i, v in enumerate(values):
        for j, (prog, ast) in enumerate(zip(programs, asts)):
            got = rows[i][f"c{j}"]
            want = _ev(ast, v)
            if isinstance(got, tuple):  # struct Row → dict for comparison
                got = got.asDict()
            if not _close(got, want):
                mismatches.append((prog, v, got, want))
    assert not mismatches, f"{len(mismatches)} divergences, first 5: {mismatches[:5]}"


def test_differential_numbers(spark):
    rng = random.Random(41)
    _run_battery(spark, NUM_PROGRAMS, _rand_nums(rng, 120), "number", "double")


def test_differential_arrays(spark):
    rng = random.Random(42)
    _run_battery(spark, ARR_PROGRAMS, _rand_arrs(rng, 120), "array", "array<double>")


def test_differential_strings(spark):
    rng = random.Random(43)
    _run_battery(spark, STR_PROGRAMS, _rand_strs(rng, 120), "string", "string")
