"""ACL key-glob fidelity: _glob_to_regex must agree with Redis
`stringmatchlen` (util.c) on EVERY pattern — including the corners a
naive glob translator gets wrong (']' closing an empty class, raw range
ends, unterminated classes, trailing backslashes). The referee here is
a direct Python port of the public C algorithm, and the gate is a
seeded fuzz over a metacharacter-heavy alphabet."""

from __future__ import annotations

import random
import re

import pytest

from redisgears_spark.engine import _glob_to_regex


def stringmatchlen(pattern: str, string: str) -> bool:
    """Direct port of Redis util.c stringmatchlen (public source)."""
    p, s = 0, 0
    P, S = len(pattern), len(string)
    while p < P and s <= S:
        c = pattern[p]
        if c == "*":
            while p + 1 < P and pattern[p + 1] == "*":
                p += 1
            if p + 1 == P:
                return True
            for skip in range(S - s + 1):
                if stringmatchlen(pattern[p + 1 :], string[s + skip :]):
                    return True
            return False
        elif c == "?":
            if s == S:
                return False
            s += 1
            p += 1
        elif c == "[":
            p += 1
            neg = p < P and pattern[p] == "^"
            if neg:
                p += 1
            match = False
            while True:
                if p < P and pattern[p] == "\\" and P - p >= 2:
                    p += 1
                    if s < S and pattern[p] == string[s]:
                        match = True
                elif p < P and pattern[p] == "]":
                    break
                elif p >= P:
                    p -= 1
                    break
                elif P - p >= 3 and pattern[p + 1] == "-":
                    start, end = pattern[p], pattern[p + 2]
                    if start > end:
                        start, end = end, start
                    p += 2
                    if s < S and start <= string[s] <= end:
                        match = True
                else:
                    if s < S and pattern[p] == string[s]:
                        match = True
                p += 1
            if neg:
                match = not match
            if not match:
                return False
            s += 1
            p += 1
        elif c == "\\":
            if P - p >= 2:
                p += 1
            if s == S or pattern[p] != string[s]:
                return False
            s += 1
            p += 1
        else:
            if s == S or pattern[p] != string[s]:
                return False
            s += 1
            p += 1
        if s == S:
            while p < P and pattern[p] == "*":
                p += 1
            break
    return p == P and s == S


def _matches(pattern: str, key: str) -> bool:
    return re.fullmatch(_glob_to_regex(pattern), key) is not None


@pytest.mark.parametrize(
    "pattern,key,want",
    [
        # review-found corners (round 7): ']' closes immediately
        ("[]]", "]", False),  # empty class + literal ']' needs TWO chars
        ("[]]", "a]", False),  # empty class matches NO char
        ("[^]]", "a]", True),  # negated-empty matches any char, then ']'
        # raw range ends: '[a-]' is the swapped range ']'..'a'
        ("[a-]", "^", True),
        ("[a-]", "a", True),
        ("[a-]", "b", False),
        ("[a-]]", "]", True),  # range a..']' (swapped), one char
        # unterminated class closes at pattern end (NOT an error)
        ("user:[ab", "user:a", True),
        ("user:[ab", "user:c", False),
        # trailing backslash is a literal backslash
        ("user:\\", "user:\\", True),
        ("user:\\", "user:x", False),
        # escaped char cannot start a range: after the escape consumes
        # '\\a' as a literal, '-' is current and its NEXT char is 'z'
        # (not '-'), so '-' and 'z' are literals too — class {a, -, z}
        ("[\\a-z]", "a", True),
        ("[\\a-z]", "-", True),
        ("[\\a-z]", "m", False),
        ("[\\a-z]", "z", True),
        # classic surface
        ("user:[ab]*", "user:a1", True),
        ("user:[ab]*", "user:c1", False),
        ("k[0-9]", "k7", True),
        ("k[9-0]", "k7", True),  # out-of-order bounds swap
        ("n[^ab]", "nc", True),
        ("n[^ab]", "na", False),
    ],
)
def test_corner_cases_match_redis(pattern, key, want):
    assert stringmatchlen(pattern, key) is want  # referee sanity
    assert _matches(pattern, key) is want


def test_fuzz_against_stringmatchlen_port():
    alphabet = list("ab]-^\\*?[09z\n")  # \n: '*'/'?' must match newline
    rng = random.Random(7)
    for _ in range(20000):
        pat = "".join(
            rng.choice(alphabet) for _ in range(rng.randint(0, 6))
        )
        key = "".join(
            rng.choice("ab]-^\\09z\n") for _ in range(rng.randint(0, 4))
        )
        want = stringmatchlen(pat, key)
        got = _matches(pat, key)
        assert got is want, (pat, key, want, got)
