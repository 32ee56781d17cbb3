"""Golden tests for curation/normalization/hashing scalar functions.

Goldens from the reference's tests/test_wiki_api.py:135-148 (via FIXTURES.md
§10); keccak/namehash vectors are the public Ethereum test vectors.
"""

import pytest

from collection_templates_spark.functions.hashing import keccak256, namehash
from collection_templates_spark.functions.normalize import (
    curate_member,
    curate_name,
    extract_article_name,
    extract_id,
    strip_eth,
)


def test_curate_name_goldens():
    assert curate_name("Adolfo_Pérez_Esquivel") == "Adolfo Pérez Esquivel"
    assert (
        curate_name("Category:Nobel_Peace_Prize_laureates")
        == "Nobel Peace Prize laureates"
    )
    assert curate_name("List_of_sovereign_states") == "Sovereign states"
    assert curate_name("https://en.wikipedia.org/wiki/List_of_lakes") == "Lakes"


def test_curate_member_goldens():
    assert curate_member("Adolfo_Pérez_Esquivel") == (
        "adolfopérezesquivel",
        ["adolfopérezesquivel"],
    )
    assert curate_member("Betty Williams (peace activist)") == (
        "bettywilliams",
        ["betty", "williams"],
    )
    assert curate_member("ιοσρβυνγ") is None  # non-Latin rejected
    assert curate_member("ab") is None  # min length 3 (P12)


def test_curate_member_adversarial():
    """Adversarial inputs pinning the F2 fallback chain (force_normalize,
    normalize.py:53-71). Cases marked DIVERGES differ from a real
    ens_normalize install, which maps rather than rejects some inputs —
    each divergence is rejected-not-mangled, so no wrong name is ever
    emitted; when ens_normalize is importable the real chain takes over."""
    # accent-preserving Latin (the reference golden's behavior)
    assert curate_member("ÉCOLE Primaire") == ("écoleprimaire", ["école", "primaire"])
    assert curate_member("naïve café") == ("naïvecafé", ["naïve", "café"])
    # hyphen+apostrophe strip then re-cure (create_merged.py:171-181)
    assert curate_member("O'Brien-Smith") == ("obriensmith", ["obriensmith"])
    # cure-stripped punctuation/underscore/whitespace
    assert curate_member("a_b c") == ("abc", ["ab", "c"])
    assert curate_member("semi;colon") == ("semicolon", ["semicolon"])
    # non-Latin scripts rejected (golden parity: Greek case above)
    assert curate_member("Тест") is None  # Cyrillic
    assert curate_member("日本語") is None  # CJK
    assert curate_member("abcΩabc") is None  # mixed Latin+Greek
    # DIVERGES: real ens_cure allows valid emoji names; fallback rejects
    # (stdlib has no emoji-sequence validity data)
    assert curate_member("💎💎💎") is None
    # ENSIP-15 "ignored" class (r13 verdict #3): default-ignorable Cf
    # characters are STRIPPED like the real mapping, not rejected
    assert curate_member("ab​cd") == ("abcd", ["abcd"])  # U+200B inside
    assert curate_member("soft­hyphen") == (  # U+00AD inside
        "softhyphen",
        ["softhyphen"],
    )
    # ENSIP-15 "mapped" class subset via NFKC: fullwidth forms fold
    assert curate_member("ｆｕｌｌｗｉｄｔｈ") == (
        "fullwidth",
        ["fullwidth"],
    )
    assert curate_member("Ａｂｃ (movie)") == ("abc", ["abc"])
    assert curate_member("ﬁnal ligature") == (
        "finalligature",
        ["final", "ligature"],
    )
    assert curate_member("x² + y²") == ("x2y2", ["x2", "y2"])
    # 'İ'.lower() yields i + combining U+0307; combining marks are outside
    # the fallback's allowed set (real ens_normalize maps this) — rejected
    # (DIVERGES: stdlib NFKC cannot express the ENSIP NSM rules)
    assert curate_member("İstanbul") is None
    # min-length gate after curing, not before (P12)
    assert curate_member("xx") is None


def test_curate_name_percent_encoding():
    """curate_name unquotes AFTER underscore→space (create_merged.py:373-380
    order): encoded punctuation and accents survive into the display name."""
    assert curate_name("List_of_%22quoted%22_things") == '"quoted" things'
    assert curate_name("Category:%C3%89cole_types") == "École types"


def test_extract_and_strip():
    assert extract_id("http://www.wikidata.org/entity/Q42") == "Q42"
    assert extract_id("Q42") == "Q42"
    assert extract_article_name("https://en.wikipedia.org/wiki/Foo_Bar") == "Foo_Bar"
    assert extract_article_name("Foo_Bar") == "Foo_Bar"
    assert strip_eth("abc.eth") == "abc"
    assert strip_eth("abc") == "abc"


def test_keccak_vectors():
    assert (
        keccak256(b"").hex()
        == "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"
    )
    assert (
        keccak256(b"abc").hex()
        == "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45"
    )
    # multi-block message (> 136-byte rate)
    assert keccak256(b"x" * 300) == keccak256(b"x" * 300)


def test_namehash_vectors():
    assert namehash("") == "0x" + "00" * 32
    assert (
        namehash("eth")
        == "0x93cdeb708b7545dc668eb9280176169d1c33cfd8ed6f04690a0bcc88a93fc4ae"
    )
    assert (
        namehash("foo.eth")
        == "0xde9b09fd7c5f901e23a3f19fecc54828e9c848539801e86591bd9801b019f84f"
    )
    with pytest.raises(ValueError):
        from collection_templates_spark.functions.hashing import label_to_hash

        label_to_hash("a.b")


def test_banner_matches_cpython_global_random():
    import random

    from collection_templates_spark.functions.scoring import banner_image

    random.seed("Q42")
    expected = f"tc-{random.randint(0, 19):02d}.png"
    assert banner_image("Q42") == expected


def test_ens_cure_upgrade_path(monkeypatch):
    """F2 guarded import (r4 verdict #8): when ``ens_normalize`` is
    importable, its ``ens_cure`` drives force_normalize/curate_member
    with no code changes; in this container the documented fallback is
    bound instead. Simulate the lib appearing by monkeypatching the
    module binding and assert the full routing (including the
    strip-hyphens-then-re-cure step running on the LIB's output)."""
    from collection_templates_spark.functions import normalize as N

    assert not N.HAVE_ENS_NORMALIZE  # container state: fallback bound

    calls = []

    def fake_lib_cure(text):
        calls.append(text)
        return text.lower()

    monkeypatch.setattr(N, "ens_cure", fake_lib_cure)
    assert N.force_normalize("A-B") == "ab"
    assert calls == ["A-B", "ab"]  # initial cure + re-cure after strip

    def rejecting_cure(text):
        raise N.DisallowedSequence("nope")

    monkeypatch.setattr(N, "ens_cure", rejecting_cure)
    assert N.curate_member("Anything") is None  # lib rejection → None
