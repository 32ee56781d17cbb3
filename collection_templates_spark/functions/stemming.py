"""Stemming for the batch search analyzer (SURVEY §2.10 parity).

The reference's ES mapping defines an ``english_stemmer`` analyzer
(standard tokenizer → lowercase → porter_stem) for collection names
(/root/reference/research/learning-to-rank/populate.py:86-104). Two
public re-expressions here:

- ``SUFFIX_RULES`` + ``suffix_stem_expr`` / ``suffix_stem_sql`` /
  ``suffix_stem_py``: a fixed ordered longest-match suffix table (the
  spirit of Porter steps 1/4 without the measure conditions), generated
  into a native Spark CASE chain, an identical DuckDB CASE chain, and a
  plain-Python applier from the SAME table — so search scoring is fully
  JVM-side AND fully oracled. It diverges from porter_stem where Porter's
  m-measure guards or multi-step chaining matter (e.g. "agreed": porter's
  eed-rule yields "agree", this table's ed-rule yields "agre");
  divergences are pinned in tests/test_stemming.py.
- ``porter_stem``: the complete original Porter algorithm (Porter, 1980,
  "An algorithm for suffix stripping" — public domain spec), for callers
  needing exact ES ``porter_stem`` token parity. Python-only; apply via
  functions/udfs.compute_on_distinct, never per-row in a hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Ordered first-match-wins suffix rules: (suffix, replacement,
#: min_remaining_stem_len). Longest/most-specific first. Shared verbatim
#: by the Spark expression, the oracle SQL, and the Python applier.
#:
#: Design constraint — SINGLE-PASS CONSISTENCY: Porter achieves
#: plural/base agreement ("filters"/"filtered"/"filter" → one stem) by
#: running five sequential steps with m-measure guards; a one-pass table
#: can't chain rules, so every rule here is chosen such that the
#: inflected form and its base map to the SAME stem in one application
#: ("ers"→"er" rather than stripping "er" from the base; "ies"→"y" to the
#: base form rather than porter's "i"). stem(stem(x)) == stem(x) is
#: pinned by tests over the corpus vocabulary.
SUFFIX_RULES: tuple[tuple[str, str, int], ...] = (
    ("ational", "ate", 2),
    ("ization", "ize", 2),
    ("iveness", "ive", 2),
    ("fulness", "ful", 2),
    ("ousness", "ous", 2),
    ("tional", "tion", 2),
    ("biliti", "ble", 2),
    ("ations", "ate", 2),
    ("ation", "ate", 2),
    ("sses", "ss", 2),
    ("xes", "x", 2),
    ("ches", "ch", 2),
    ("shes", "sh", 2),
    ("ness", "", 3),
    ("ments", "", 3),
    ("ment", "", 3),
    ("ings", "", 3),
    ("ing", "", 3),
    ("ies", "y", 2),  # to the BASE form (queries→query), not porter's "i" —
    #                   a y→i rule would re-fire on other rules' outputs
    #                   (payments→pay→"pai") and break idempotence
    ("edly", "", 3),
    ("ed", "", 3),
    ("ly", "", 3),
    ("ers", "er", 2),
    ("ss", "ss", 1),  # identity: keeps "-ss" words out of the "-s" rule
    ("ous", "ous", 1),  # identity: "-ous" adjectives (incl. the ousness
    #                     rule's own output) must not lose their s
    ("s", "", 2),
)


def suffix_stem_expr(col: Column) -> Column:
    """The rule table as one native CASE chain (no UDF, codegen-friendly)."""
    expr = None
    for sfx, repl, min_len in SUFFIX_RULES:
        cond = col.endswith(sfx) & (F.length(col) - len(sfx) >= min_len)
        stemmed = F.concat(
            F.substring(col, F.lit(1), F.length(col) - len(sfx)), F.lit(repl)
        )
        expr = F.when(cond, stemmed) if expr is None else expr.when(cond, stemmed)
    return expr.otherwise(col)


def suffix_stem_sql(var: str) -> str:
    """The SAME rule table as a DuckDB CASE chain over SQL expression
    ``var`` — generated from one source so the engines cannot drift."""
    branches = []
    for sfx, repl, min_len in SUFFIX_RULES:
        repl_sql = f" || '{repl}'" if repl else ""
        branches.append(
            f"WHEN ends_with({var}, '{sfx}') "
            f"AND length({var}) - {len(sfx)} >= {min_len} "
            f"THEN substr({var}, 1, length({var}) - {len(sfx)}){repl_sql}"
        )
    return "CASE " + " ".join(branches) + f" ELSE {var} END"


def suffix_stem_py(word: str) -> str:
    """The SAME rule table in Python (for stemming query terms driver-side)."""
    for sfx, repl, min_len in SUFFIX_RULES:
        if word.endswith(sfx) and len(word) - len(sfx) >= min_len:
            return word[: -len(sfx)] + repl
    return word


# ---------------------------------------------------------------------------
# Full Porter (1980) — exact ES porter_stem parity for Python-side callers.
# ---------------------------------------------------------------------------

_VOWELS = "aeiou"


def _is_cons(word: str, i: int) -> bool:
    c = word[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _is_cons(word, i - 1)
    return True


def _measure(stem: str) -> int:
    """m = number of VC sequences in the [C](VC)^m[V] form."""
    m, prev_cons = 0, True
    started_vowel = False
    for i in range(len(stem)):
        cons = _is_cons(stem, i)
        if not cons:
            started_vowel = True
        elif started_vowel:
            m += 1
            started_vowel = False
        prev_cons = cons  # noqa: F841 — clarity
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(word: str) -> bool:
    return (
        len(word) >= 2
        and word[-1] == word[-2]
        and _is_cons(word, len(word) - 1)
    )


def _cvc(word: str) -> bool:
    """*o condition: stem ends cvc where the final c is not w, x or y."""
    if len(word) < 3:
        return False
    return (
        _is_cons(word, len(word) - 3)
        and not _is_cons(word, len(word) - 2)
        and _is_cons(word, len(word) - 1)
        and word[-1] not in "wxy"
    )


def _replace(word: str, sfx: str, repl: str, min_m: int) -> str | None:
    if not word.endswith(sfx):
        return None
    stem = word[: -len(sfx)] if sfx else word
    if _measure(stem) > min_m - 1:
        return stem + repl
    return word


def porter_stem(word: str) -> str:  # noqa: C901 — the algorithm is a table
    """Original Porter stemmer (Porter 1980), steps 1a–5b."""
    w = word.lower()
    if len(w) <= 2:
        return w

    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # step 1b
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    elif (w.endswith("ed") and _has_vowel(w[:-2])) or (
        w.endswith("ing") and _has_vowel(w[:-3])
    ):
        w = w[:-2] if w.endswith("ed") else w[:-3]
        if w.endswith(("at", "bl", "iz")):
            w += "e"
        elif _ends_double_cons(w) and w[-1] not in "lsz":
            w = w[:-1]
        elif _measure(w) == 1 and _cvc(w):
            w += "e"

    # step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # step 2
    for sfx, repl in (
        ("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
        ("anci", "ance"), ("izer", "ize"), ("abli", "able"),
        ("alli", "al"), ("entli", "ent"), ("eli", "e"), ("ousli", "ous"),
        ("ization", "ize"), ("ation", "ate"), ("ator", "ate"),
        ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
        ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"),
        ("biliti", "ble"),
    ):
        if w.endswith(sfx):
            if _measure(w[: -len(sfx)]) > 0:
                w = w[: -len(sfx)] + repl
            break

    # step 3
    for sfx, repl in (
        ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
        ("ical", "ic"), ("ful", ""), ("ness", ""),
    ):
        if w.endswith(sfx):
            if _measure(w[: -len(sfx)]) > 0:
                w = w[: -len(sfx)] + repl
            break

    # step 4
    for sfx in (
        "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
        "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive",
        "ize",
    ):
        if w.endswith(sfx):
            stem = w[: -len(sfx)]
            if sfx == "ion" and (not stem or stem[-1] not in "st"):
                break
            if _measure(stem) > 1:
                w = stem
            break

    # step 5a
    if w.endswith("e"):
        stem = w[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _cvc(stem)):
            w = stem
    # step 5b
    if _measure(w) > 1 and _ends_double_cons(w) and w.endswith("l"):
        w = w[:-1]
    return w
