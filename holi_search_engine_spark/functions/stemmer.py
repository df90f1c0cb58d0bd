"""Porter stemmer, matching the reference's canonical tartarus Java
implementation (``/root/reference/src/cis5550/jobs/Stemmer.java``, the
Porter 1980 release-4 Java version) exactly, including:

- words of length <= 2 are returned unchanged (``Stemmer.java:360``:
  ``if (k > 1)`` guards all steps);
- the Bug-1/Bug-2 guards (``step3``/``step5`` k==0 returns, ``j >= 0`` in
  the ``-ion`` test);
- non-alpha characters are treated as consonants (``cons()`` default case),
  which matters because the indexer stems digit-bearing tokens too
  (``Indexer.java:109-128``, quirk Q6).

The hot path never calls this per Spark row: :func:`stem_series` stems the
*unique* tokens of an Arrow batch once (Zipf token distributions make
uniques a small fraction of tokens) and maps back via a pandas categorical —
batch-level vectorization per the no-per-row-Python rule.
"""

from __future__ import annotations

import functools

import pandas as pd

_VOWELS = frozenset("aeiou")


class _PorterStemmer:
    """Direct transliteration of Stemmer.java; operates on a char list."""

    __slots__ = ("b", "k", "j")

    def _cons(self, i: int) -> bool:
        ch = self.b[i]
        if ch in _VOWELS:
            return False
        if ch == "y":
            return True if i == 0 else not self._cons(i - 1)
        return True

    def _m(self) -> int:
        n = 0
        i = 0
        j = self.j
        while True:
            if i > j:
                return n
            if not self._cons(i):
                break
            i += 1
        i += 1
        while True:
            while True:
                if i > j:
                    return n
                if self._cons(i):
                    break
                i += 1
            i += 1
            n += 1
            while True:
                if i > j:
                    return n
                if not self._cons(i):
                    break
                i += 1
            i += 1

    def _vowelinstem(self) -> bool:
        return any(not self._cons(i) for i in range(self.j + 1))

    def _doublec(self, j: int) -> bool:
        if j < 1:
            return False
        if self.b[j] != self.b[j - 1]:
            return False
        return self._cons(j)

    def _cvc(self, i: int) -> bool:
        if i < 2 or not self._cons(i) or self._cons(i - 1) or not self._cons(i - 2):
            return False
        return self.b[i] not in ("w", "x", "y")

    def _ends(self, s: str) -> bool:
        l = len(s)
        o = self.k - l + 1
        if o < 0:
            return False
        for i in range(l):
            if self.b[o + i] != s[i]:
                return False
        self.j = self.k - l
        return True

    def _setto(self, s: str) -> None:
        o = self.j + 1
        for i, ch in enumerate(s):
            if o + i < len(self.b):
                self.b[o + i] = ch
            else:
                self.b.append(ch)
        self.k = self.j + len(s)

    def _r(self, s: str) -> None:
        if self._m() > 0:
            self._setto(s)

    def _step1(self) -> None:
        b, ends, setto = self.b, self._ends, self._setto
        if b[self.k] == "s":
            if ends("sses"):
                self.k -= 2
            elif ends("ies"):
                setto("i")
            elif b[self.k - 1] != "s":
                self.k -= 1
        if ends("eed"):
            if self._m() > 0:
                self.k -= 1
        elif (ends("ed") or ends("ing")) and self._vowelinstem():
            self.k = self.j
            if ends("at"):
                setto("ate")
            elif ends("bl"):
                setto("ble")
            elif ends("iz"):
                setto("ize")
            elif self._doublec(self.k):
                self.k -= 1
                if b[self.k] in ("l", "s", "z"):
                    self.k += 1
            elif self._m() == 1 and self._cvc(self.k):
                setto("e")

    def _step2(self) -> None:
        if self._ends("y") and self._vowelinstem():
            self.b[self.k] = "i"

    def _step3(self) -> None:
        if self.k == 0:
            return
        ends, r = self._ends, self._r
        c = self.b[self.k - 1]
        if c == "a":
            if ends("ational"):
                r("ate")
            elif ends("tional"):
                r("tion")
        elif c == "c":
            if ends("enci"):
                r("ence")
            elif ends("anci"):
                r("ance")
        elif c == "e":
            if ends("izer"):
                r("ize")
        elif c == "l":
            if ends("bli"):
                r("ble")
            elif ends("alli"):
                r("al")
            elif ends("entli"):
                r("ent")
            elif ends("eli"):
                r("e")
            elif ends("ousli"):
                r("ous")
        elif c == "o":
            if ends("ization"):
                r("ize")
            elif ends("ation"):
                r("ate")
            elif ends("ator"):
                r("ate")
        elif c == "s":
            if ends("alism"):
                r("al")
            elif ends("iveness"):
                r("ive")
            elif ends("fulness"):
                r("ful")
            elif ends("ousness"):
                r("ous")
        elif c == "t":
            if ends("aliti"):
                r("al")
            elif ends("iviti"):
                r("ive")
            elif ends("biliti"):
                r("ble")
        elif c == "g":
            if ends("logi"):
                r("log")

    def _step4(self) -> None:
        ends, r = self._ends, self._r
        c = self.b[self.k]
        if c == "e":
            if ends("icate"):
                r("ic")
            elif ends("ative"):
                r("")
            elif ends("alize"):
                r("al")
        elif c == "i":
            if ends("iciti"):
                r("ic")
        elif c == "l":
            if ends("ical"):
                r("ic")
            elif ends("ful"):
                r("")
        elif c == "s":
            if ends("ness"):
                r("")

    def _step5(self) -> None:
        if self.k == 0:
            return
        ends = self._ends
        c = self.b[self.k - 1]
        if c == "a":
            if not ends("al"):
                return
        elif c == "c":
            if not ends("ance") and not ends("ence"):
                return
        elif c == "e":
            if not ends("er"):
                return
        elif c == "i":
            if not ends("ic"):
                return
        elif c == "l":
            if not ends("able") and not ends("ible"):
                return
        elif c == "n":
            if (
                not ends("ant")
                and not ends("ement")
                and not ends("ment")
                and not ends("ent")
            ):
                return
        elif c == "o":
            if not (
                (ends("ion") and self.j >= 0 and self.b[self.j] in ("s", "t"))
                or ends("ou")
            ):
                return
        elif c == "s":
            if not ends("ism"):
                return
        elif c == "t":
            if not ends("ate") and not ends("iti"):
                return
        elif c == "u":
            if not ends("ous"):
                return
        elif c == "v":
            if not ends("ive"):
                return
        elif c == "z":
            if not ends("ize"):
                return
        else:
            return
        if self._m() > 1:
            self.k = self.j

    def _step6(self) -> None:
        self.j = self.k
        if self.b[self.k] == "e":
            a = self._m()
            if a > 1 or (a == 1 and not self._cvc(self.k - 1)):
                self.k -= 1
        if self.b[self.k] == "l" and self._doublec(self.k) and self._m() > 1:
            self.k -= 1

    def stem(self, word: str) -> str:
        self.b = list(word)
        self.k = len(word) - 1
        self.j = 0
        if self.k > 1:
            self._step1()
            self._step2()
            self._step3()
            self._step4()
            self._step5()
            self._step6()
        return "".join(self.b[: self.k + 1])


_stemmer = _PorterStemmer()


@functools.lru_cache(maxsize=1 << 20)
def stem_word(word: str) -> str:
    """Stem one (lowercase) token; cached across batches."""
    return _stemmer.stem(word)


def stem_series(tokens: pd.Series) -> pd.Series:
    """Stem a pandas Series of tokens, computing each unique token once.

    Categorical round-trip: O(uniques) Python work per Arrow batch instead of
    O(rows) — the vectorized-stemming strategy of SURVEY.md §8 stage 1.
    """
    if len(tokens) == 0:
        return tokens.astype(object)
    mapping = {t: stem_word(t) for t in pd.unique(tokens.dropna())}
    return tokens.map(mapping)


def stem_unique_map(tokens: pd.Series) -> dict[str, str]:
    """token -> stem for each unique token in the series."""
    return {t: stem_word(t) for t in pd.unique(tokens.dropna())}
