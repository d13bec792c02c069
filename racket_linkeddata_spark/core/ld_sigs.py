"""Linked Data Signatures over canonical N-Quads.

Mirrors the reference's working surface (ld-sigs.rkt): the
CwebberSignature2018-style suite signs the URDNA2015-canonical N-Quads of
the expanded document with the proof node attached minus its
signatureValue (make-proof-object, ld-sigs.rkt:196-237; verify-proof,
ld-sigs.rkt:245-263; entries lds-sign-jsonld ld-sigs.rkt:581-598 and
lds-verify-jsonld ld-sigs.rkt:727-824). RSA PKCS#1 v1.5 + SHA-256
(digest/sign semantics); PEM codec via `cryptography` (pem.rkt's role).

The ocap-ld proof purposes are deliberately out of scope — they are
half-'TODO in the reference itself (ld-sigs.rkt:391-406, 563-566).

The w3id security/v1 context the reference pins (ld-sigs.rkt:147-149)
is registered under the same pinned URL as a full term map written from
the spec'd IRIs (the public https://w3id.org/security# vocabulary) —
documents using any security/v1 term expand correctly, not just the
handful this suite itself writes.
"""

from __future__ import annotations

import base64
from datetime import datetime, timezone
from typing import Any, Dict, Optional

from .compact import compact
from .expand import expand
from .to_rdf import to_rdf
from .urdna2015 import canonical_nquads

SEC = "https://w3id.org/security#"
SECURITY_CONTEXT_URL = "https://w3id.org/security/v1"
DC = "http://purl.org/dc/terms/"

SEC_PROOF = SEC + "proof"
SEC_SIGNATURE_VALUE = SEC + "signatureValue"
SEC_NONCE = SEC + "nonce"
SEC_DOMAIN = SEC + "domain"
SEC_PUBLIC_KEY_PEM = SEC + "publicKeyPem"
DC_CREATOR = DC + "creator"
DC_CREATED = DC + "created"

SUITE_URI = "https://dustycloud.org/#CwebberSignature2018"

# Full w3id security/v1 term map, written from the spec'd IRIs of the
# public security vocabulary (same pinned URL the reference uses,
# ld-sigs.rkt:147-149). `proof` is carried as a full IRI by this suite
# but registered as a term too so user documents can use it.
SECURITY_V1_CONTEXT: Dict[str, Any] = {
    "@context": {
        "id": "@id",
        "type": "@type",
        "dc": DC,
        "sec": SEC,
        "xsd": "http://www.w3.org/2001/XMLSchema#",

        "EcdsaKoblitzSignature2016": "sec:EcdsaKoblitzSignature2016",
        "EncryptedMessage": "sec:EncryptedMessage",
        "GraphSignature2012": "sec:GraphSignature2012",
        "LinkedDataSignature2015": "sec:LinkedDataSignature2015",
        "LinkedDataSignature2016": "sec:LinkedDataSignature2016",
        "CryptographicKey": "sec:Key",

        "authenticationTag": "sec:authenticationTag",
        "canonicalizationAlgorithm": "sec:canonicalizationAlgorithm",
        "cipherAlgorithm": "sec:cipherAlgorithm",
        "cipherData": "sec:cipherData",
        "cipherKey": "sec:cipherKey",
        "created": {"@id": "dc:created", "@type": "xsd:dateTime"},
        "creator": {"@id": "dc:creator", "@type": "@id"},
        "digestAlgorithm": "sec:digestAlgorithm",
        "digestValue": "sec:digestValue",
        "domain": "sec:domain",
        "encryptionKey": "sec:encryptionKey",
        "expiration": {"@id": "sec:expiration", "@type": "xsd:dateTime"},
        "expires": {"@id": "sec:expiration", "@type": "xsd:dateTime"},
        "initializationVector": "sec:initializationVector",
        "iterationCount": "sec:iterationCount",
        "nonce": "sec:nonce",
        "normalizationAlgorithm": "sec:normalizationAlgorithm",
        "owner": {"@id": "sec:owner", "@type": "@id"},
        "password": "sec:password",
        "privateKey": {"@id": "sec:privateKey", "@type": "@id"},
        "privateKeyPem": "sec:privateKeyPem",
        "proof": {"@id": "sec:proof"},
        "publicKey": {"@id": "sec:publicKey", "@type": "@id"},
        "publicKeyPem": "sec:publicKeyPem",
        "publicKeyService": {"@id": "sec:publicKeyService", "@type": "@id"},
        "revoked": {"@id": "sec:revoked", "@type": "xsd:dateTime"},
        "salt": "sec:salt",
        "signature": "sec:signature",
        "signatureAlgorithm": "sec:signingAlgorithm",
        "signatureValue": "sec:signatureValue",
    }
}

# backwards-compat alias (round-1 name)
MINIMAL_SECURITY_CONTEXT = SECURITY_V1_CONTEXT


def default_contexts(extra: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
    ctxs = {SECURITY_CONTEXT_URL: SECURITY_V1_CONTEXT}
    if extra:
        ctxs.update(extra)
    return ctxs


def rfc3339_now() -> str:
    """UTC second-resolution stamp (date-utils.rkt:5-18)."""
    return datetime.now(timezone.utc).strftime("%Y-%m-%dT%H:%M:%SZ")


def _canonicalize(expanded_doc: Any, remote_contexts) -> str:
    quads = to_rdf(expanded_doc, remote_contexts=remote_contexts)
    return canonical_nquads(quads)


def _rsa_sign(private_key_pem: str, data: bytes) -> bytes:
    from cryptography.hazmat.primitives import hashes, serialization
    from cryptography.hazmat.primitives.asymmetric import padding

    key = serialization.load_pem_private_key(
        private_key_pem.encode(), password=None)
    return key.sign(data, padding.PKCS1v15(), hashes.SHA256())


def _rsa_verify(public_key_pem: str, signature: bytes, data: bytes) -> bool:
    from cryptography.exceptions import InvalidSignature
    from cryptography.hazmat.primitives import hashes, serialization
    from cryptography.hazmat.primitives.asymmetric import padding

    key = serialization.load_pem_public_key(public_key_pem.encode())
    try:
        key.verify(signature, data, padding.PKCS1v15(), hashes.SHA256())
        return True
    except InvalidSignature:
        return False


def sign_jsonld(
    document: Dict[str, Any],
    private_key_pem: str,
    *,
    creator: Optional[str] = None,
    created: Optional[str] = None,
    nonce: Optional[str] = None,
    domain: Optional[str] = None,
    remote_contexts: Optional[Dict[str, Any]] = None,
) -> Dict[str, Any]:
    """Sign: expand -> build proof (sans signatureValue) -> attach ->
    canonicalize -> RSA-SHA256 -> attach signatureValue -> compact with
    the original context (lds-sign-jsonld, ld-sigs.rkt:581-598)."""
    ctxs = default_contexts(remote_contexts)
    expanded = expand(document, remote_contexts=ctxs)
    if len(expanded) != 1:
        raise ValueError("sign_jsonld expects a single top-level node")
    node = dict(expanded[0])

    proof: Dict[str, Any] = {
        "@type": SUITE_URI,
        DC_CREATED: [{"@value": created or rfc3339_now()}],
    }
    if creator is not None:
        proof[DC_CREATOR] = [{"@id": creator}]
    if nonce is not None:
        proof[SEC_NONCE] = [{"@value": nonce}]
    if domain is not None:
        proof[SEC_DOMAIN] = [{"@value": domain}]

    node[SEC_PROOF] = [dict(proof)]
    tbs = _canonicalize([node], ctxs)
    sig = base64.b64encode(
        _rsa_sign(private_key_pem, tbs.encode("utf-8"))).decode("ascii")
    proof[SEC_SIGNATURE_VALUE] = [{"@value": sig}]
    node[SEC_PROOF] = [proof]

    context = document.get("@context", {})
    return compact([node], context, remote_contexts=ctxs,
                   already_expanded=True)


def _unwrap_proof(proof_entry: Any) -> Dict[str, Any]:
    proof = proof_entry.get("@graph", [proof_entry])
    return dict(proof[0]) if isinstance(proof, list) else dict(proof)


def _verify_single_proof(node: Dict[str, Any], proof_entry: Any,
                         public_key_pem: str, ctxs) -> bool:
    """Verify ONE proof of an expanded node against one key: detach its
    signatureValue, re-attach the proof alone, canonicalize, RSA verify
    (verify-proof, ld-sigs.rkt:245-263). The canonicalized form carries
    only THIS proof, matching what sign_jsonld signed."""
    proof = _unwrap_proof(proof_entry)
    # unknown suite types are an error in the reference
    # (ld-sigs.rkt:778-780); we reject them rather than verifying a
    # proof under the wrong algorithm
    if proof.get("@type") not in ([SUITE_URI], SUITE_URI):
        return False
    sig_entries = proof.pop(SEC_SIGNATURE_VALUE, None)
    if not sig_entries:
        return False
    try:
        sig = base64.b64decode(sig_entries[0]["@value"], validate=True)
    except (Exception,):  # malformed b64 / non-string @value
        return False
    check_node = dict(node)
    check_node[SEC_PROOF] = [proof]
    tbs = _canonicalize([check_node], ctxs)
    return _rsa_verify(public_key_pem, sig, tbs.encode("utf-8"))


def verify_jsonld(
    signed_document: Dict[str, Any],
    public_key_pem: str,
    *,
    remote_contexts: Optional[Dict[str, Any]] = None,
) -> bool:
    """Verify every proof against the given key (the single-key entry,
    lds-verify-jsonld ld-sigs.rkt:727-824). Multi-key documents belong in
    verify_jsonld_resolving, which fetches each proof's own key."""
    ctxs = default_contexts(remote_contexts)
    expanded = expand(signed_document, remote_contexts=ctxs)
    if len(expanded) != 1:
        return False
    node = dict(expanded[0])
    proofs = node.get(SEC_PROOF)
    if not proofs:
        return False
    return all(_verify_single_proof(node, p, public_key_pem, ctxs)
               for p in proofs)


def verify_jsonld_resolving(
    signed_document: Dict[str, Any],
    loader,
    *,
    remote_contexts: Optional[Dict[str, Any]] = None,
) -> bool:
    """Verify, fetching the signing key BY the proof's creator IRI
    (lds-verify-jsonld's key fetch, ld-sigs.rkt:783-792): dereference
    dc:creator through a document loader (sources/remote_doc.py — pinned
    map offline, HTTP on a driver with network), expand the key document
    with the security context, and verify against its sec:publicKeyPem.
    Returns False on any resolution failure rather than raising.

    Each proof is verified individually against ITS OWN creator's key —
    a document carrying valid proofs from two different keys verifies
    (round-2 ADVICE: the old path re-ran the all-proofs check per key,
    so multi-key documents always failed)."""
    ctxs = default_contexts(remote_contexts)
    try:
        expanded = expand(signed_document, remote_contexts=ctxs)
    except Exception:
        return False
    if len(expanded) != 1:
        return False
    node = dict(expanded[0])
    proofs = node.get(SEC_PROOF) or []
    for proof_entry in proofs:
        proof = _unwrap_proof(proof_entry)
        creators = proof.get(DC_CREATOR) or []
        if not creators or "@id" not in creators[0]:
            return False
        try:
            key_doc = loader.load(creators[0]["@id"]).document
            key_expanded = expand(key_doc, remote_contexts=ctxs)
            pem_entries = key_expanded[0].get(SEC_PUBLIC_KEY_PEM) or []
            pem = pem_entries[0]["@value"]
        except Exception:
            return False
        if not _verify_single_proof(node, proof_entry, pem, ctxs):
            return False
    return bool(proofs)


def generate_rsa_keypair(bits: int = 2048):
    """(private_pem, public_pem) helper for tests."""
    from cryptography.hazmat.primitives import serialization
    from cryptography.hazmat.primitives.asymmetric import rsa

    key = rsa.generate_private_key(public_exponent=65537, key_size=bits)
    priv = key.private_bytes(
        serialization.Encoding.PEM,
        serialization.PrivateFormat.PKCS8,
        serialization.NoEncryption()).decode()
    pub = key.public_key().public_bytes(
        serialization.Encoding.PEM,
        serialization.PublicFormat.SubjectPublicKeyInfo).decode()
    return priv, pub
