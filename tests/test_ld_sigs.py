"""LD-Signatures tests mirroring the reference's own vectors
(ld-sigs.rkt:826-860): sign/verify round-trip positive, wrong-key
negative, plus tamper detection."""

import pytest

from racket_linkeddata_spark.core.ld_sigs import (
    generate_rsa_keypair,
    sign_jsonld,
    verify_jsonld,
)

LADY_GAGA_CONCERT = {
    "@context": [
        {
            "ical": "http://www.w3.org/2002/12/cal/ical#",
            "xsd": "http://www.w3.org/2001/XMLSchema#",
            "ical:dtstart": {"@type": "xsd:dateTime"},
            "proof": "https://w3id.org/security#proof",
        },
        "https://w3id.org/security/v1",
    ],
    "ical:summary": "Lady Gaga Concert",
    "ical:location": "New Orleans Arena, New Orleans, Louisiana, USA",
    "ical:dtstart": "2011-04-09T20:00Z",
}


@pytest.fixture(scope="module")
def keys():
    return generate_rsa_keypair(), generate_rsa_keypair()


def test_sign_verify_roundtrip(keys):
    (priv, pub), _ = keys
    signed = sign_jsonld(LADY_GAGA_CONCERT, priv,
                         nonce="abop;ihaoighiopsahgoihgsd",
                         created="2024-01-01T00:00:00Z")
    assert verify_jsonld(signed, pub)


def test_wrong_key_fails(keys):
    (priv, _), (_, pub2) = keys
    signed = sign_jsonld(LADY_GAGA_CONCERT, priv,
                         created="2024-01-01T00:00:00Z")
    assert not verify_jsonld(signed, pub2)


def test_tampered_document_fails(keys):
    (priv, pub), _ = keys
    signed = sign_jsonld(LADY_GAGA_CONCERT, priv,
                         created="2024-01-01T00:00:00Z")
    tampered = dict(signed)
    tampered["ical:summary"] = "Free Lady Gaga Concert"
    assert not verify_jsonld(tampered, pub)


def test_signing_deterministic_given_created(keys):
    (priv, pub), _ = keys
    s1 = sign_jsonld(LADY_GAGA_CONCERT, priv, created="2024-01-01T00:00:00Z")
    s2 = sign_jsonld(LADY_GAGA_CONCERT, priv, created="2024-01-01T00:00:00Z")
    assert s1 == s2
    assert verify_jsonld(s1, pub)
