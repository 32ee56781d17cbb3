"""Name curation / normalization (SURVEY §2.7 F1-F3, F12-F13).

Reference semantics:
- ``curate_name``       create_merged.py:373-380
- ``force_normalize``   create_merged.py:163-184 (ens_cure chain)
- ``curate_member``     create_merged.py:187-209
- ``extract_article_name`` / ``extract_id``  create_collections.py:609-630

``ens_normalize`` / ``unidecode`` are not available in this container; when
importable they are used, otherwise the fallback ``ens_cure`` applies an
ENSIP-15-shape stdlib pipeline (r13 verdict #3): lowercase NFC → strip the
"ignored" class (default-ignorable Cf format chars: ZWSP, soft hyphen,
ZWJ/ZWNJ, BOM) → NFKC-fold the "mapped" compatibility subset (fullwidth
forms, ligatures, super/subscripts) → strip ENS-disallowed punctuation →
reject non-Latin scripts. This reproduces the reference's golden cases
(tests/test_wiki_api.py:135-148) and the ignorable/fullwidth classes the
real library maps. Remaining documented divergences (what stdlib cannot
express, each rejected-not-mangled so no wrong name is ever emitted):
emoji sequences (no emoji-validity data), ENSIP NSM rules for combining
marks that survive casefold (İ → i+U+0307), and fraction folds that NFKC
expands with U+2044. The unidecode-if-Latin step (create_merged.py:171-175)
is a no-op under the fallback — the goldens keep accented Latin characters.

Spark integration: these run as Python functions inside pandas UDFs applied
to DISTINCT inputs, then joined back (Opt-6 — the reference's own
interesting-score-cache DAG does this manually, create_merged.py:223-288).
At 21M members / ~2.1M distinct labels that is a 10× Python-cost reduction
before any parallelism.
"""

from __future__ import annotations

import re
import unicodedata
from urllib.parse import unquote

try:  # pragma: no cover - not present in this container
    from ens_normalize import DisallowedSequence, ens_cure  # type: ignore

    HAVE_ENS_NORMALIZE = True
except ImportError:  # pragma: no cover
    HAVE_ENS_NORMALIZE = False

    class DisallowedSequence(ValueError):  # type: ignore[no-redef]
        """Raised when a name cannot be cured into an allowed form."""

    # characters ens_cure removes outright (disallowed but curable)
    _CURE_STRIP = re.compile(r"[\s_.\"'()\[\]{},:;!?/\\|+=*&^%$#@~`<>]")

    def _is_allowed_char(ch: str) -> bool:
        if ch.isdigit() or ch == "-":
            return True
        if not ch.isalpha():
            return False
        # Latin-script letters only (incl. accented); other scripts raise —
        # matches the reference golden where Greek input is rejected.
        name = unicodedata.name(ch, "")
        return name.startswith("LATIN")

    def ens_cure(text: str) -> str:  # type: ignore[no-redef]
        cured = unicodedata.normalize("NFC", text).lower()
        # ENSIP-15 "ignored" class via stdlib (r13 verdict #3): default-
        # ignorable format characters (category Cf — ZWSP, soft hyphen,
        # ZWJ/ZWNJ outside emoji, BOM) are removed, as the real
        # ens_normalize mapping does, instead of rejecting the name.
        cured = "".join(
            ch for ch in cured if unicodedata.category(ch) != "Cf"
        )
        # ENSIP-15 "mapped" class subset via NFKC: compatibility forms
        # (fullwidth letters/digits, ligatures, super/subscripts) fold
        # to their canonical ASCII/Latin equivalents. NFKC can surface
        # uppercase (e.g. roman numerals), so lowercase again.
        cured = unicodedata.normalize("NFKC", cured).lower()
        cured = _CURE_STRIP.sub("", cured)
        if not cured:
            raise DisallowedSequence(f"nothing left after curing {text!r}")
        for ch in cured:
            if not _is_allowed_char(ch):
                raise DisallowedSequence(f"disallowed character {ch!r} in {text!r}")
        return cured


def force_normalize(member: str) -> str:
    """ens_cure then strip hyphens/apostrophes, re-curing if changed
    (reference configure_force_normalize, create_merged.py:163-184)."""
    curated = ens_cure(member)
    curated2 = curated.replace("-", "").replace("'", "")
    if curated2 != curated:
        curated2 = ens_cure(curated2)
    return curated2


def extract_article_name(article: str) -> str:
    """Strip the en-wiki URL prefix (create_collections.py:609-621)."""
    if not article.startswith(("http://", "https://")):
        return article
    m = re.match(r"https?://en\.wikipedia\.org/wiki/(.+)", article)
    return m.group(1) if m else article


def extract_id(link: str) -> str:
    """Strip the wikidata entity prefix (create_collections.py:624-627)."""
    prefix = "http://www.wikidata.org/entity/"
    if link.startswith(prefix + "Q"):
        return link[len(prefix):]
    return link


def strip_eth(name: str) -> str:
    """Remove a trailing ``.eth`` (create_merged.py:347-348)."""
    return name[:-4] if name.endswith(".eth") else name


def curate_name(collection_article: str) -> str:
    """Collection display name from its article title
    (create_merged.py:373-380)."""
    name = extract_article_name(collection_article)
    name = name.replace("_", " ")
    name = unquote(name)
    name = re.sub("^List of ", "", name)
    name = re.sub("^Category:", "", name)
    return name[0].upper() + name[1:] if name else name


def curate_member(member: str) -> tuple[str, list[str]] | None:
    """Member label + tokenization, or None if uncurable / too short
    (create_merged.py:187-209)."""
    member = unquote(member)
    member = member.replace(".", "").replace("-", "").replace("'", "")
    member = member.replace('"', "")
    member = re.sub(r" *\(.*\)$", "", member)
    try:
        curated = force_normalize(member)
    except DisallowedSequence:
        return None
    tokenized = []
    for token in member.split(" "):
        try:
            tokenized.append(force_normalize(token))
        except DisallowedSequence:
            pass
    if len(curated) >= 3:
        return curated, tokenized
    return None
