"""Vectorized keccak/namehash must agree byte-for-byte with the scalar
reference implementation (which is itself pinned by public test vectors)."""

import random

from collection_templates_spark.functions.hashing import (
    keccak256,
    keccak256_batch,
    namehash,
    namehash_batch,
)


def test_keccak_batch_matches_scalar():
    rnd = random.Random(7)
    msgs = [b""]
    for n in (1, 7, 31, 64, 134, 135, 136, 137, 300, 1000):
        msgs.append(bytes(rnd.randrange(256) for _ in range(n)))
    got = keccak256_batch(msgs)
    for m, g in zip(msgs, got):
        assert g == keccak256(m), f"len={len(m)}"


def test_keccak_known_vector():
    # keccak256("") — the canonical Ethereum empty-string digest
    assert keccak256(b"").hex() == (
        "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"
    )
    assert keccak256_batch([b""])[0].hex() == (
        "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"
    )


def test_namehash_batch_matches_scalar():
    rnd = random.Random(11)
    names = [
        "vitalik.eth",
        "foo.eth",
        "ümlaut-ünicode.eth",
        "a.eth",
        ("x" * 200) + ".eth",  # >1 keccak block label → scalar fallback
        "multi.label.eth",  # 3 levels → scalar fallback
        "eth",  # 1 level
        "",
        None,
    ]
    names += [
        "".join(rnd.choice("abcdefghij-0123456789") for _ in range(rnd.randrange(1, 40)))
        + ".eth"
        for _ in range(200)
    ]
    got = namehash_batch(names)
    for n, g in zip(names, got):
        if n is None:
            assert g is None
        else:
            assert g == namehash(n), n


def test_namehash_public_vector():
    # EIP-137 example vector
    assert namehash("foo.eth") == (
        "0xde9b09fd7c5f901e23a3f19fecc54828e9c848539801e86591bd9801b019f84f"
    )
