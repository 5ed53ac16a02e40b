"""HOF loop-invariant lint — the let-binding house rule as a tripwire.

Spark performs NO common-subexpression elimination inside higher-order
-function lambdas: a loop-invariant expensive expression (a tokenize
regex chain, an md5, a split) referenced in a transform/aggregate/
filter lambda is re-evaluated once PER ELEMENT — O(n^2) regex work per
document. This bit the repo three times (minhash shingles r5, bigram
family r6, winnowing/Gopher r7 — 275 s -> 4.9 s at sf1 after
let-binding, SCALING.md round-7 addendum 3). The rule:

    any expression referenced inside a HOF lambda must be a lambda
    variable, a let-bound value, or a column attribute — never an
    inline expensive expression chain.

This lint walks every query/operator module's AST and flags, inside
any Python lambda passed to a known HOF, a call to a known-expensive
builder whose own argument subtree does NOT reference any lambda
parameter — i.e. a loop-invariant expensive computation. Per-element
work (the expensive call consuming the lambda variable) is fine and
not flagged; functions/binding.let itself is clean by construction
(the expensive value is the HOF's *input array*, outside the lambda).

SQL-string lambdas (F.expr("transform(..., x -> ...)")) get a
coarser check: an expensive SQL builder appearing after a `->` arrow
is flagged unless every occurrence consumes a lambda variable name
bound in the same string.

Usage:  python tools/hof_lint.py   (exit 1 on findings)
"""

from __future__ import annotations

import ast
import re
import sys
from pathlib import Path

ROOT = Path("/root/repo/bigdata_jobmatching_spark")

# HOFs whose lambda runs once per array element.
HOFS = {
    "transform", "filter", "exists", "forall", "aggregate", "reduce",
    "zip_with", "map_filter", "transform_keys", "transform_values",
    "map_zip_with",
}

# Python-side builders whose evaluation is expensive per call: regex
# chains, tokenizers, cryptographic hashes, string splits. Cheap
# arithmetic/struct accessors are deliberately absent.
EXPENSIVE = {
    "tokens", "split", "sentences", "regexp_replace", "regexp_extract",
    "regexp_extract_all", "regexp_substr", "regexp_instr", "md5",
    "sha1", "sha2", "crc32", "xxhash64", "from_json", "parse_url",
}

# SQL-side spellings for the F.expr() string pass.
SQL_EXPENSIVE = re.compile(
    r"\b(regexp_replace|regexp_extract|regexp_extract_all|split|md5|"
    r"sha1|sha2|xxhash64|from_json|sentences)\s*\("
)
SQL_LAMBDA = re.compile(r"(\(?\s*\w+(?:\s*,\s*\w+)*\s*\)?)\s*->")


def _call_name(node: ast.Call) -> str | None:
    f = node.func
    if isinstance(f, ast.Attribute):
        return f.attr
    if isinstance(f, ast.Name):
        return f.id
    return None


def _names_in(node: ast.AST) -> set[str]:
    return {n.id for n in ast.walk(node) if isinstance(n, ast.Name)}


def _lint_lambda_body(
    lam: ast.Lambda, path: Path, findings: list[str]
) -> None:
    params = {a.arg for a in lam.args.args}
    for node in ast.walk(lam.body):
        if not isinstance(node, ast.Call):
            continue
        name = _call_name(node)
        if name not in EXPENSIVE:
            continue
        arg_names: set[str] = set()
        for a in list(node.args) + [kw.value for kw in node.keywords]:
            arg_names |= _names_in(a)
        if arg_names & params:
            continue  # consumes the lambda variable: per-element work
        findings.append(
            f"{path}:{node.lineno}: loop-invariant `{name}(...)` inside "
            f"a HOF lambda (params {sorted(params)}) — let-bind it "
            f"(functions/binding.let) or materialize a column first"
        )


def _lint_sql_string(s: str, lineno: int, path: Path,
                     findings: list[str]) -> None:
    if "->" not in s:
        return
    # Full SELECT statements are DuckDB oracle twins, not Spark
    # F.expr fragments — the lint guards the SPARK plan, and DuckDB
    # does its own subexpression handling; skip them.
    if re.search(r"\bSELECT\b", s, re.IGNORECASE):
        return
    lambda_vars: set[str] = set()
    for m in SQL_LAMBDA.finditer(s):
        lambda_vars |= {
            v.strip() for v in m.group(1).strip("() ").split(",")
        }
    for m in SQL_EXPENSIVE.finditer(s):
        # only flag occurrences AFTER the first arrow (inside a body)
        if s.rfind("->", 0, m.start()) == -1:
            continue
        # consuming a lambda var close by? crude containment check on
        # the call's argument span
        depth, i = 0, m.end() - 1
        end = len(s)
        while i < len(s):
            if s[i] == "(":
                depth += 1
            elif s[i] == ")":
                depth -= 1
                if depth == 0:
                    end = i
                    break
            i += 1
        arg_text = s[m.end():end]
        toks = set(re.findall(r"\b\w+\b", arg_text))
        if toks & lambda_vars:
            continue
        findings.append(
            f"{path}:{lineno}: loop-invariant SQL `{m.group(1)}(...)` "
            f"after a `->` lambda arrow in an expr string — let-bind "
            f"or hoist it"
        )


def lint_source(src: str, path: Path) -> list[str]:
    findings: list[str] = []
    tree = ast.parse(src)
    for node in ast.walk(tree):
        if isinstance(node, ast.Call):
            name = _call_name(node)
            if name in HOFS:
                for a in node.args:
                    if isinstance(a, ast.Lambda):
                        _lint_lambda_body(a, path, findings)
        if isinstance(node, ast.Constant) and isinstance(node.value, str):
            _lint_sql_string(node.value, node.lineno, path, findings)
    return findings


def lint() -> list[str]:
    findings: list[str] = []
    for path in sorted(ROOT.rglob("*.py")):
        findings.extend(lint_source(path.read_text(), path))
    return findings


def main() -> int:
    findings = lint()
    if not findings:
        print("OK: no loop-invariant expensive expressions in HOF lambdas")
        return 0
    for f in findings:
        print(f)
    print(f"\n{len(findings)} HOF-CSE findings")
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
