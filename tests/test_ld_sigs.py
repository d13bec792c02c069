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


def _proof_node(signed):
    """The proof node in the compacted output (term or full-IRI key)."""
    key = [k for k in signed
           if k == "proof" or k.endswith("security#proof")][0]
    node = signed[key]
    node = node[0] if isinstance(node, list) else node
    inner = node.get("@graph", node)
    return inner[0] if isinstance(inner, list) else inner


def test_unknown_suite_type_rejected(keys):
    (priv, pub), _ = keys
    signed = sign_jsonld(LADY_GAGA_CONCERT, priv,
                         created="2024-01-01T00:00:00Z")
    # rewrite the proof's type: reference errors on unknown suites
    # (ld-sigs.rkt:778-780); we must not verify under the wrong algorithm
    import copy
    forged = copy.deepcopy(signed)
    inner = _proof_node(forged)
    type_key = [k for k in inner if k in ("type", "@type")][0]
    inner[type_key] = "https://example.org/#BogusSignature9999"
    assert not verify_jsonld(forged, pub)


def test_malformed_signature_value_returns_false(keys):
    (priv, pub), _ = keys
    signed = sign_jsonld(LADY_GAGA_CONCERT, priv,
                         created="2024-01-01T00:00:00Z")
    import copy
    broken = copy.deepcopy(signed)
    inner = _proof_node(broken)
    key = [k for k in inner if "signatureValue" in k][0]
    inner[key] = "!!!not-base64!!!"
    assert not verify_jsonld(broken, pub)  # must not raise


def test_full_security_context_terms_roundtrip(keys):
    """Terms beyond the round-1 minimal set (owner, expiration,
    digestValue...) must expand via the pinned security/v1 URL — a doc
    using them signs and verifies, and tampering one still fails."""
    (priv, pub), _ = keys
    doc = {
        "@context": ["https://w3id.org/security/v1",
                     {"ical": "http://www.w3.org/2002/12/cal/ical#"}],
        "@type": "CryptographicKey",
        "owner": "https://example.com/i/alice",
        "expiration": "2026-01-01T00:00:00Z",
        "digestValue": "abc123",
        "publicKeyPem": "---FAKE PEM---",
        "ical:summary": "key record",
    }
    signed = sign_jsonld(doc, priv, created="2024-01-01T00:00:00Z")
    assert verify_jsonld(signed, pub)
    # the terms actually expanded (not dropped): owner must appear as IRI
    from racket_linkeddata_spark.core.expand import expand
    from racket_linkeddata_spark.core.ld_sigs import default_contexts
    exp = expand(doc, remote_contexts=default_contexts())
    assert exp[0]["https://w3id.org/security#owner"][0]["@id"] == \
        "https://example.com/i/alice"
    assert "https://w3id.org/security#expiration" in exp[0]
    tampered = dict(signed)
    tampered["owner"] = "https://example.com/i/mallory"
    assert not verify_jsonld(tampered, pub)


def test_verify_resolving_key_by_creator_iri(keys):
    """Key fetch by IRI (ld-sigs.rkt:783-792): the verifier dereferences
    the proof's dc:creator through a document loader and verifies
    against the fetched key document's publicKeyPem."""
    from racket_linkeddata_spark.core.ld_sigs import verify_jsonld_resolving
    from racket_linkeddata_spark.sources.remote_doc import (
        PinnedDocumentLoader, PinnedEntry)

    (priv, pub), (_, pub2) = keys
    key_iri = "https://example.com/keys/alice#main"
    key_doc = {
        "@context": "https://w3id.org/security/v1",
        "@id": key_iri,
        "@type": "CryptographicKey",
        "publicKeyPem": pub,
    }
    wrong_key_doc = dict(key_doc, publicKeyPem=pub2)
    signed = sign_jsonld(LADY_GAGA_CONCERT, priv, creator=key_iri,
                         created="2024-01-01T00:00:00Z")

    loader = PinnedDocumentLoader({
        key_iri: PinnedEntry(document=key_doc,
                             content_type="application/ld+json")})
    assert verify_jsonld_resolving(signed, loader)

    wrong = PinnedDocumentLoader({
        key_iri: PinnedEntry(document=wrong_key_doc,
                             content_type="application/ld+json")})
    assert not verify_jsonld_resolving(signed, wrong)

    missing = PinnedDocumentLoader({})
    assert not verify_jsonld_resolving(signed, missing)  # 404 -> False


def test_verify_resolving_multi_key_document(keys):
    """Round-2 ADVICE: a document carrying two valid proofs from two
    DIFFERENT keys must verify — each proof is checked against its own
    creator's key, not the whole proof set against every key."""
    from racket_linkeddata_spark.core.ld_sigs import (
        SEC_PROOF, default_contexts, verify_jsonld_resolving)
    from racket_linkeddata_spark.core.expand import expand
    from racket_linkeddata_spark.sources.remote_doc import (
        PinnedDocumentLoader, PinnedEntry)

    (priv_a, pub_a), (priv_b, pub_b) = keys
    iri_a = "https://example.com/keys/alice#main"
    iri_b = "https://example.com/keys/bob#main"

    signed_a = sign_jsonld(LADY_GAGA_CONCERT, priv_a, creator=iri_a,
                           created="2024-01-01T00:00:00Z")
    signed_b = sign_jsonld(LADY_GAGA_CONCERT, priv_b, creator=iri_b,
                           created="2024-01-01T00:00:00Z")
    ctxs = default_contexts(None)
    node_a = expand(signed_a, remote_contexts=ctxs)[0]
    node_b = expand(signed_b, remote_contexts=ctxs)[0]
    merged = dict(node_a)
    merged[SEC_PROOF] = list(node_a[SEC_PROOF]) + list(node_b[SEC_PROOF])

    def key_doc(iri, pem):
        return PinnedEntry(
            document={"@context": "https://w3id.org/security/v1",
                      "@id": iri, "@type": "CryptographicKey",
                      "publicKeyPem": pem},
            content_type="application/ld+json")

    loader = PinnedDocumentLoader({iri_a: key_doc(iri_a, pub_a),
                                   iri_b: key_doc(iri_b, pub_b)})
    assert verify_jsonld_resolving(merged, loader)

    # swapping the two keys must fail both proofs
    swapped = PinnedDocumentLoader({iri_a: key_doc(iri_a, pub_b),
                                    iri_b: key_doc(iri_b, pub_a)})
    assert not verify_jsonld_resolving(merged, swapped)
